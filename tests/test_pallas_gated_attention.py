"""Equivalence of the fused gated cross-attention kernel (interpret mode on
CPU) vs the XLA reference formulation, plus torch parity of the gate math."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svol_tpu.ops.pallas.gated_attention import (
    gated_attention_fused,
    gated_attention_reference,
)

B, L, D, H = 2, 64, 32, 4


def random_problem(rng):
    return (
        rng.normal(size=(B, 1, D)).astype(np.float32),
        rng.normal(size=(B, L, D)).astype(np.float32),
        rng.normal(size=(B, L, D)).astype(np.float32),
        rng.normal(size=(D, D)).astype(np.float32) * 0.1,
        rng.normal(size=(D,)).astype(np.float32) * 0.1,
        rng.normal(size=(D, D)).astype(np.float32) * 0.1,
        rng.normal(size=(D,)).astype(np.float32) * 0.1,
    )


def test_fused_matches_reference(rng):
    args = random_problem(rng)
    g_ref, out_ref = gated_attention_reference(*args, H)
    g_fused, out_fused = gated_attention_fused(*args, H, True)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref), atol=1e-5)


def test_fused_gradients_match_reference(rng):
    args = random_problem(rng)

    def loss_fused(*a):
        g, out = gated_attention_fused(*a, H, True)
        return (out**2).sum() + (g**2).sum()

    def loss_ref(*a):
        g, out = gated_attention_reference(*a, H)
        return (out**2).sum() + (g**2).sum()

    g1 = jax.grad(loss_fused, argnums=tuple(range(7)))(*map(jnp.asarray, args))
    g2 = jax.grad(loss_ref, argnums=tuple(range(7)))(*map(jnp.asarray, args))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_gate_matches_torch_mha_weights(rng):
    """The head-averaged gate must equal torch MultiheadAttention's returned
    attention weights for q=sketch, k=v=k_input (cross_modal_transformer.py:124)."""
    torch = pytest.importorskip("torch")

    sketch, k_input, mem, wq, bq, wk, bk = random_problem(rng)
    g, _ = gated_attention_reference(sketch, k_input, mem, wq, bq, wk, bk, H)

    mha = torch.nn.MultiheadAttention(D, H, batch_first=True)
    with torch.no_grad():
        wv = np.zeros((D, D), np.float32)
        in_w = np.concatenate([wq.T, wk.T, wv], 0)
        in_b = np.concatenate([bq, bk, np.zeros(D, np.float32)], 0)
        mha.in_proj_weight.copy_(torch.from_numpy(in_w))
        mha.in_proj_bias.copy_(torch.from_numpy(in_b))
        mha.out_proj.weight.copy_(torch.eye(D))
        mha.out_proj.bias.zero_()
        _, t_w = mha(
            torch.from_numpy(sketch), torch.from_numpy(k_input),
            torch.from_numpy(k_input),
        )
    np.testing.assert_allclose(np.asarray(g), t_w.numpy()[:, 0, :], atol=2e-5)


def test_model_flag_equivalence(rng):
    """SVANet with use_pallas=True (interpret on CPU) equals the XLA path."""
    from svol_tpu.config import DataConfig, ModelConfig, SvolConfig
    from svol_tpu.models import build_model

    T, K, IMG = 2, 3, 64

    def cfg(use_pallas):
        return SvolConfig(
            data=DataConfig(num_frames=T, max_boxes_per_frame=K, image_size=IMG),
            model=ModelConfig(
                hidden_dim=32, nheads=4, num_layers=2, num_queries=T * K,
                num_queries_per_frame=K, cmt_dim_feedforward=64,
                compute_dtype="float32", use_pallas_attention=use_pallas,
            ),
        )

    inputs = dict(
        src_sketch=jnp.asarray(rng.uniform(size=(1, 1, IMG, IMG, 3)), jnp.float32),
        src_video=jnp.asarray(rng.uniform(size=(1, T, IMG, IMG, 3)), jnp.float32),
        src_sketch_mask=jnp.ones((1, 1), jnp.float32),
        src_video_mask=jnp.ones((1, T), jnp.float32),
    )
    m1 = build_model(cfg(False))
    m2 = build_model(cfg(True))
    v1 = m1.init(jax.random.PRNGKey(0), **inputs)
    out1 = m1.apply(v1, **inputs)
    out2 = m2.apply(v1, **inputs)  # identical params, different kernel path
    np.testing.assert_allclose(
        np.asarray(out1["pred_boxes"]), np.asarray(out2["pred_boxes"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out1["pred_logits"]), np.asarray(out2["pred_logits"]), atol=1e-4
    )
