"""Numerical parity of our attention primitive vs torch.nn.MultiheadAttention.

The reference model is built from torch MultiheadAttention blocks; SVOL's
gating trick depends on its exact head-averaged weight semantics
(cross_modal_transformer.py:124-125). We copy weights into the torch module
and require outputs + weights to agree to float32 tolerance.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from svol_tpu.models.layers import MultiheadAttention

D, H, B, LQ, LK = 32, 4, 3, 5, 7


def build_pair(rng, key_padding=False):
    mha = MultiheadAttention(d_model=D, num_heads=H)
    q = rng.normal(size=(B, LQ, D)).astype(np.float32)
    k = rng.normal(size=(B, LK, D)).astype(np.float32)
    v = rng.normal(size=(B, LK, D)).astype(np.float32)
    mask = None
    if key_padding:
        mask = np.zeros((B, LK), bool)
        mask[:, -2:] = True
    import jax

    params = mha.init(jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(k),
                      jnp.asarray(v), key_padding_mask=mask)

    tmha = torch.nn.MultiheadAttention(D, H, batch_first=True)
    p = params["params"]
    with torch.no_grad():
        in_w = np.concatenate(
            [p[n]["kernel"].T for n in ("q_proj", "k_proj", "v_proj")], 0
        )
        in_b = np.concatenate(
            [p[n]["bias"] for n in ("q_proj", "k_proj", "v_proj")], 0
        )
        tmha.in_proj_weight.copy_(torch.from_numpy(in_w))
        tmha.in_proj_bias.copy_(torch.from_numpy(in_b))
        tmha.out_proj.weight.copy_(torch.from_numpy(np.asarray(p["out_proj"]["kernel"]).T))
        tmha.out_proj.bias.copy_(torch.from_numpy(np.asarray(p["out_proj"]["bias"])))
    return mha, params, tmha, q, k, v, mask


@pytest.mark.parametrize("key_padding", [False, True])
def test_mha_matches_torch(rng, key_padding):
    mha, params, tmha, q, k, v, mask = build_pair(rng, key_padding)
    out, w = mha.apply(params, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                       key_padding_mask=mask)
    with torch.no_grad():
        t_out, t_w = tmha(
            torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
            key_padding_mask=torch.from_numpy(mask) if mask is not None else None,
        )
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(w), t_w.numpy(), atol=2e-5)


def test_layernorm_eps_matches_torch(rng):
    import flax.linen as nn

    from svol_tpu.models.layers import LN_EPS

    x = rng.normal(size=(4, 16)).astype(np.float32) * 5
    ln = nn.LayerNorm(epsilon=LN_EPS)
    import jax

    params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(ln.apply(params, jnp.asarray(x)))
    t_ln = torch.nn.LayerNorm(16)
    with torch.no_grad():
        exp = t_ln(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, exp, atol=1e-5)
