"""Fused LayerNorm Pallas kernel (ViT encoder fast path).

The ViT profile (PERFORMANCE.md round 5) showed each encoder layer spending
~1.27 ms/step in LayerNorm elementwise fusions at 465 GB/s — XLA splits the
f32 statistics reduction and the normalize-scale-bias apply into separate
HBM passes over the (50k tokens, 768) activation. One VMEM-resident pass
computes row statistics and writes the normalized output directly: traffic
drops to read-x + write-y (~0.19 ms at HBM peak for the ViT shape).

Forward-only kernel: the backward runs the plain-XLA reference formulation
via custom_vjp (LN backward needs the same statistics; recomputing them in
XLA keeps the VJP simple and exact — inference is the hot path here).

Numerics match ``flax.linen.LayerNorm`` (f32 statistics, biased variance,
epsilon inside rsqrt, output cast to the compute dtype):
tests/test_fused_layer_norm.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl

try:  # pragma: no cover
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def layer_norm_reference(x: Array, scale: Array, bias: Array,
                         eps: float) -> Array:
    """Plain-XLA formulation, identical math to flax.linen.LayerNorm."""
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - m), axis=-1, keepdims=True)
    y = (xf - m) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _kernel(x_ref, s_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[0].astype(jnp.float32)  # (BL, D)
    m = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - m), axis=-1, keepdims=True)
    y = (x - m) * jax.lax.rsqrt(var + eps)
    y = y * s_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


# rows per grid step: Mosaic requires the second-minor block dim be a
# multiple of 8 (or the whole axis), so the row count pads up to _BL and
# the pad rows are sliced off after — ≤511 junk rows of bounded extra
# traffic vs per-shape divisor hunting. 512 x 768 f32 working set = 3 MB.
_BL = 512


def _pallas_forward(x2: Array, scale: Array, bias: Array, eps: float,
                    interpret: bool) -> Array:
    N, D = x2.shape
    if N <= _BL:
        bl, pad = N, 0  # single block equal to the whole axis — always legal
    else:
        bl = _BL
        pad = (-N) % bl
        if pad:
            x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    n_rows = N + pad
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(n_rows // bl,),
        in_specs=[
            pl.BlockSpec((1, bl, D), lambda i: (0, i, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bl, D), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((1, n_rows, D), x2.dtype),
        interpret=interpret,
        **kwargs,
    )(x2[None], scale[None], bias[None])[0]
    return out[:N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_ln(x2: Array, scale: Array, bias: Array, eps: float,
              interpret: bool) -> Array:
    return _pallas_forward(x2, scale, bias, eps, interpret)


def _fwd(x2, scale, bias, eps, interpret):
    return _pallas_forward(x2, scale, bias, eps, interpret), (x2, scale, bias)


def _bwd(eps, interpret, res, g):
    x2, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: layer_norm_reference(x_, s_, b_, eps),
        x2, scale, bias)
    return vjp(g)


_fused_ln.defvjp(_fwd, _bwd)


def fused_layer_norm(x: Array, scale: Array, bias: Array,
                     eps: float = 1e-12) -> Array:
    """LayerNorm over the last axis of ``x`` (any leading shape), fused on
    TPU, interpret elsewhere."""
    interpret = jax.default_backend() != "tpu"
    lead = x.shape[:-1]
    D = x.shape[-1]
    y = _fused_ln(x.reshape(-1, D), scale, bias, eps, interpret)
    return y.reshape(*lead, D)
