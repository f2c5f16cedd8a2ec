"""Fused Pallas LayerNorm (ops/pallas/layer_norm.py): numerics identical to
flax.linen.LayerNorm (the module it substitutes in the ViT fast path) and
gradients equal to the reference formulation."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from svol_tpu.ops.pallas.layer_norm import (
    fused_layer_norm,
    layer_norm_reference,
)


def test_matches_flax_layer_norm(rng):
    for shape, dtype in (((6, 197, 768), jnp.float32),
                         ((3, 50, 64), jnp.bfloat16),
                         ((7, 768), jnp.float32)):
        x = rng.standard_normal(shape).astype(np.float32)
        scale = rng.uniform(0.5, 1.5, shape[-1]).astype(np.float32)
        bias = rng.normal(scale=0.2, size=shape[-1]).astype(np.float32)

        ln = nn.LayerNorm(epsilon=1e-12, dtype=dtype)
        params = {"params": {"scale": scale, "bias": bias}}
        want = np.asarray(ln.apply(params, jnp.asarray(x, dtype)),
                          np.float32)
        got = np.asarray(
            fused_layer_norm(jnp.asarray(x, dtype), scale, bias, 1e-12),
            np.float32)
        atol = 1e-6 if dtype == jnp.float32 else 2e-2
        np.testing.assert_allclose(got, want, atol=atol), shape


def test_gradients_match_reference(rng):
    x = rng.standard_normal((4, 33, 96)).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, 96).astype(np.float32)
    bias = rng.normal(scale=0.2, size=96).astype(np.float32)

    def loss_fused(x, s, b):
        return (fused_layer_norm(x, s, b, 1e-6) ** 2).sum()

    def loss_ref(x, s, b):
        return (layer_norm_reference(x, s, b, 1e-6) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)
