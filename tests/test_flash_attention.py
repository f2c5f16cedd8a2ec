"""Flash self-attention kernel: parity with the XLA formulation and with the
torch-semantics MultiheadAttention, plus gradients through the custom VJP.
Runs in pallas interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svol_tpu.models.layers import MultiheadAttention
from svol_tpu.ops.pallas.flash_attention import (
    attention_reference,
    flash_self_attention,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.mark.parametrize("shape", [
    (2, 4, 96, 32),   # even q blocks
    (1, 2, 100, 32),  # ragged q tail (padded block rows discarded)
    (2, 8, 196, 32),  # SVOL-like ratio, small
])
def test_flash_matches_reference(rng, shape):
    B, H, L, d = shape
    q = jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)
    scale = d**-0.5
    got = flash_self_attention(q, k, v, scale)
    exp = attention_reference(
        q.reshape(B * H, L, d), k.reshape(B * H, L, d), v.reshape(B * H, L, d),
        scale,
    ).reshape(B, H, L, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                               atol=1e-5, rtol=1e-5)


def test_flash_grad_matches_reference(rng):
    B, H, L, d = 1, 2, 64, 16
    q = jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)
    scale = d**-0.5

    def loss_flash(q, k, v):
        return (flash_self_attention(q, k, v, scale) ** 2).sum()

    def loss_ref(q, k, v):
        r = attention_reference(q.reshape(B * H, L, d), k.reshape(B * H, L, d),
                                v.reshape(B * H, L, d), scale)
        return (r ** 2).sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a).reshape(np.asarray(b).shape), np.asarray(b),
            atol=1e-4, rtol=1e-4,
        )


def test_mha_flash_path_matches_exact(rng):
    """MultiheadAttention(use_flash=True) on the unmasked no-weights path
    must reproduce the exact f32 module output (same params)."""
    B, L, D, H = 2, 52, 32, 4
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    exact = MultiheadAttention(d_model=D, num_heads=H, dtype=jnp.float32)
    flash = MultiheadAttention(d_model=D, num_heads=H, dtype=jnp.float32,
                               use_flash=True)
    variables = exact.init(jax.random.PRNGKey(0), x, x, x)
    out_e, w = exact.apply(variables, x, x, x, need_weights=False)
    out_f, w_f = flash.apply(variables, x, x, x, need_weights=False)
    assert w is None and w_f is None
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_e),
                               atol=1e-5, rtol=1e-5)
    # masked call falls back to the XLA path (flash has no mask support)
    mask = jnp.zeros((B, L), bool).at[:, -5:].set(True)
    out_m, _ = flash.apply(variables, x, x, x, key_padding_mask=mask,
                           need_weights=False)
    out_m_e, _ = exact.apply(variables, x, x, x, key_padding_mask=mask,
                             need_weights=False)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_m_e),
                               atol=1e-6)


def test_int8_flash_close_to_reference(rng):
    """The int8-MXU variant (serving path): 8-bit q/k/v + 1/127 weight
    requantization bounds the deviation from the exact f32 attention."""
    from svol_tpu.ops.pallas.flash_attention import (
        attention_reference,
        flash_attention_int8,
    )

    BH, L, d = 4, 64, 32
    q = jnp.asarray(rng.standard_normal((BH, L, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((BH, L, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((BH, L, d)), jnp.float32)
    ref = attention_reference(q, k, v, d ** -0.5)
    out = flash_attention_int8(q, k, v, d ** -0.5, True)  # interpret
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel
    # gradients flow (backward rematerializes the f32 reference)
    g = jax.grad(lambda a: flash_attention_int8(a, k, v, d ** -0.5, True).sum())(q)
    assert np.isfinite(np.asarray(g)).all()


def test_full_model_quantize_attention(rng):
    """--quantize int8 --quantize_attention runs end to end and stays close
    to the float model."""
    from svol_tpu.config import DataConfig, ModelConfig, SvolConfig
    from svol_tpu.models import build_model

    def cfg(q, qa=False):
        return SvolConfig(
            data=DataConfig(num_frames=2, max_boxes_per_frame=2, image_size=64),
            model=ModelConfig(hidden_dim=32, nheads=4, num_layers=1,
                              num_queries=4, num_queries_per_frame=2,
                              cmt_dim_feedforward=64, compute_dtype="float32",
                              quantize=q, quantize_attention=qa),
        )

    batch = {
        "src_sketch": rng.uniform(size=(1, 1, 64, 64, 3)).astype(np.float32),
        "src_video": rng.uniform(size=(1, 2, 64, 64, 3)).astype(np.float32),
        "src_sketch_mask": np.ones((1, 1), np.float32),
        "src_video_mask": np.ones((1, 2), np.float32),
    }
    model_f = build_model(cfg(None))
    model_qa = build_model(cfg("int8", qa=True))
    variables = model_f.init(jax.random.PRNGKey(0), **batch)
    out_f = model_f.apply(variables, **batch)
    out_qa = model_qa.apply(variables, **batch)
    for key in ("pred_logits", "pred_boxes"):
        a, b = np.asarray(out_f[key]), np.asarray(out_qa[key])
        assert np.isfinite(b).all()
        assert np.abs(a - b).max() < 0.6, (key, np.abs(a - b).max())
