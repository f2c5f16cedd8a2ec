"""Flash-style self-attention Pallas kernel for SVOL's attention shapes.

The cross-modal layer's video self-attention (L = T*49 = 1568 tokens,
8 heads x 32 dims — cross_modal_transformer.py:137-143) is bandwidth-bound in
the XLA formulation: the (B, H, L, L) logits/weights tensors round-trip HBM
(~315 MB per call at bs=8 bf16), costing ~3.7 ms of the ~18 ms inference
step. The built-in Pallas flash kernel measured *slower* here (tuned for
head_dim >= 128; PERFORMANCE.md round 1), so this kernel is shaped for
SVOL: one (batch*head, q-block) grid step holds a full (BQ, L) logits tile
in VMEM — L is small enough that no online-softmax streaming over key blocks
is needed — computes the exact f32 softmax, and writes only the (BQ, d)
output. Logits never touch HBM; traffic drops to q/k/v reads + out write.

No masking: faithful to the reference's video/query self-attention, which
passes no key-padding mask (cross_modal_transformer.py:137-149). The masked
token->content cross-attention keeps the XLA path.

Differentiation: forward runs the kernel; backward rematerializes the XLA
reference formulation via custom_vjp (same pattern as gated_attention.py).

VMEM per grid step (BQ=224, L=1568): logits f32 1.4 MB + k/v bf16
(lane-padded to 128) 0.8 MB + q/out small ~= 2.5 MB.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl

try:  # TPU-only module; CPU tests run the kernel in interpret mode
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def attention_reference(q: Array, k: Array, v: Array, scale: float) -> Array:
    """Pure-XLA formulation ((BH, Lq, d) x (BH, Lk, d)); the backward pass."""
    logits = jnp.einsum(
        "bqd,bkd->bqk", q * scale, k, preferred_element_type=jnp.float32
    )
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum(
        "bqk,bkd->bqd", w.astype(q.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # (BQ, d)
    k = k_ref[0]  # (L, d)
    logits = jax.lax.dot_general(
        q * jnp.asarray(scale, q.dtype), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, L) f32, VMEM-resident
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(
        w.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


# largest f32 logits tile we let a single grid step hold; 1568x1568 (the
# SVOL video self-attention, 9.8 MB) fits comfortably in the 64 MB budget
_MAX_LOGITS_TILE_BYTES = 24 * 1024 * 1024


def _block_q(lq: int, lk: int) -> int:
    # Full-row blocks measured fastest on the SVOL shape (one grid step per
    # batch-head: K/V read once, no per-block grid overhead — 1282 vs
    # 1414 us/call at bq=224; scripts/bench_flash_block.py). Fall back to the
    # largest <=256 divisor when the f32 logits tile would outgrow VMEM.
    # SVOL_FLASH_BLOCK_Q overrides for experiments.
    import os

    override = os.environ.get("SVOL_FLASH_BLOCK_Q")
    if override and lq % int(override) == 0:
        return int(override)
    if lq * lk * 4 <= _MAX_LOGITS_TILE_BYTES:
        return lq
    for bq in (256, 224, 192, 160, 128, 112, 96, 80, 64, 48, 32, 16):
        if lq % bq == 0:
            return bq
    return 128


def _pallas_forward(q: Array, k: Array, v: Array, scale: float,
                    interpret: bool) -> Array:
    BH, Lq, d = q.shape
    Lk = k.shape[1]
    bq = _block_q(Lq, Lk)
    grid = (BH, pl.cdiv(Lq, bq))
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Lk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Lk, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Lq, d), q.dtype),
        interpret=interpret,
        **kwargs,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q: Array, k: Array, v: Array, scale: float,
                    interpret: bool = False) -> Array:
    """Unmasked attention, (BH, Lq, d) layout. Exact f32 softmax in VMEM."""
    return _pallas_forward(q, k, v, scale, interpret)


def _fwd(q, k, v, scale, interpret):
    return _pallas_forward(q, k, v, scale, interpret), (q, k, v)


def _bwd(scale, interpret, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(lambda a, b, c: attention_reference(a, b, c, scale),
                     q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)


def flash_self_attention(q: Array, k: Array, v: Array, scale: float) -> Array:
    """Public entry: (B, H, L, d) in/out; fused on TPU, interpret elsewhere."""
    B, H, Lq, d = q.shape
    Lk = k.shape[2]
    interpret = jax.default_backend() != "tpu"
    out = flash_attention(
        q.reshape(B * H, Lq, d), k.reshape(B * H, Lk, d),
        v.reshape(B * H, Lk, d), scale, interpret,
    )
    return out.reshape(B, H, Lq, d)


# ---------------------------------------------------------------------------
# int8 variant (serving path, --quantize_attention): head_dim=32 fills only
# 32/128 of the MXU contraction at bf16, capping QK/PV at quarter rate; the
# int8 MXU units run 2x, halving that penalty. q/k/v are quantized per
# tensor outside the kernel; the softmax stays exact f32 in VMEM; the
# attention weights requantize with the STATICALLY known scale 1/127
# (softmax output lives in [0, 1]).
# ---------------------------------------------------------------------------


def _quant_sym(x: Array):
    amax = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-8)
    s = amax / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
    return xq.astype(jnp.int8), s


def _pallas_forward_int8(q: Array, k: Array, v: Array, scale: float,
                         interpret: bool) -> Array:
    BH, Lq, d = q.shape
    Lk = k.shape[1]
    bq = _block_q(Lq, Lk)
    qq, sq = _quant_sym(q)
    kq, sk = _quant_sym(k)
    vq, sv = _quant_sym(v)
    # runtime scales enter the kernel as a (1, 1) operand (logit scale) and
    # as an XLA epilogue multiply (value scale)
    grid = (BH, pl.cdiv(Lq, bq))
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    out_i32ish = pl.pallas_call(
        _kernel_int8_runtime_scale,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Lk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Lk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Lq, d), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(qq, kq, vq, (sq * sk * jnp.float32(scale)).reshape(1, 1))
    # the 1/127 weight factor cancels inside the kernel's per-row
    # scale; only the value scale remains
    return (out_i32ish * sv).astype(q.dtype)


def _kernel_int8_runtime_scale(q_ref, k_ref, v_ref, ls_ref, o_ref):
    logits = jax.lax.dot_general(
        q_ref[0], k_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (BQ, L) i32
    logits = logits.astype(jnp.float32) * ls_ref[0, 0]
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    # per-row weight requantization: w/denom in [0, wmax_row]; scaling each
    # row by its own max keeps the int8 step size ~wmax/127 instead of a
    # global 1/127, which matters for diffuse rows (small weights, small
    # outputs — a fixed step drowns them in noise)
    wmax = jnp.max(e, axis=-1, keepdims=True)
    wq = jnp.round(e * (127.0 / wmax)).astype(jnp.int8)
    acc = jax.lax.dot_general(
        wq, v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    row_scale = wmax / (127.0 * denom)  # (BQ, 1) f32
    o_ref[0] = acc.astype(jnp.float32) * row_scale


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_int8(q: Array, k: Array, v: Array, scale: float,
                         interpret: bool = False) -> Array:
    """int8-MXU attention, (BH, Lq, d) layout; exact f32 softmax in VMEM."""
    return _pallas_forward_int8(q, k, v, scale, interpret)


def _fwd_int8(q, k, v, scale, interpret):
    return _pallas_forward_int8(q, k, v, scale, interpret), (q, k, v)


flash_attention_int8.defvjp(_fwd_int8, _bwd)


def flash_self_attention_int8(q: Array, k: Array, v: Array,
                              scale: float) -> Array:
    """(B, H, L, d) int8-MXU attention; quantization error bounded by 8-bit
    symmetric q/k/v + weight requantization at 1/127."""
    B, H, Lq, d = q.shape
    Lk = k.shape[2]
    interpret = jax.default_backend() != "tpu"
    out = flash_attention_int8(
        q.reshape(B * H, Lq, d), k.reshape(B * H, Lk, d),
        v.reshape(B * H, Lk, d), scale, interpret,
    )
    return out.reshape(B, H, Lq, d)
