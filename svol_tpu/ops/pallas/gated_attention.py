"""Fused gated sketch->video cross-attention Pallas kernel.

SVOL's signature op (cross_modal_transformer.py:122-126): a single sketch
token queries the video sequence and the head-averaged attention *weights*
gate the stream:

    q   = s  @ Wq + bq                         # (1, D)
    k   = (mem + pos) @ Wk + bk                # (L, D)
    a_h = softmax_L(q_h . k_h / sqrt(hd))      # per head
    g   = mean_h a_h                           # (L,)
    out = g * mem                              # gate, residual added outside

Flash-attention kernels can't produce this — they never materialize the
weights. The fused kernel does the k-projection (MXU), per-head logits (one
(L,D)x(D,H) matmul against a head-indicator matrix — no sub-lane reshapes),
softmax over L, head average, and the gating multiply in one VMEM-resident
pass per batch element, so the (L, D) stream is read once and neither the
projected keys nor the (L, H) logits ever touch HBM.

Differentiation: forward runs the kernel; backward rematerializes the same
math in XLA via jax.vjp of the reference formulation (custom_vjp). Training
pays one extra fused recompute; inference gets the fully fused path.

VMEM budget per grid step (fp32, L=1568, D=256): kin/mem/out 3 x 1.6 MB +
weights 0.5 MB + logits 0.05 MB ~= 5.4 MB — comfortably inside ~16 MB.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl

try:  # TPU-only module; CPU tests run the kernel in interpret mode
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def gated_attention_reference(
    sketch: Array,  # (B, 1, D)
    k_input: Array,  # (B, L, D) = mem + pos
    mem: Array,  # (B, L, D)
    wq: Array,  # (D, D)
    bq: Array,  # (D,)
    wk: Array,  # (D, D)
    bk: Array,  # (D,)
    num_heads: int,
) -> Tuple[Array, Array]:
    """Pure-XLA formulation; also the source of the backward pass."""
    B, L, D = k_input.shape
    hd = D // num_heads
    q = (jnp.einsum("bod,de->boe", sketch, wq) + bq)  # (B, 1, D)
    k = (jnp.einsum("bld,de->ble", k_input, wk) + bk)  # (B, L, D)
    qh = q.reshape(B, num_heads, hd)
    kh = k.reshape(B, L, num_heads, hd)
    logits = jnp.einsum(
        "blhe,bhe->blh", kh, qh * (hd**-0.5), preferred_element_type=jnp.float32
    )
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=1)  # over L
    g = w.mean(axis=-1)  # (B, L)
    out = mem * g[..., None].astype(mem.dtype)
    return g.astype(mem.dtype), out


def _kernel(s_ref, kin_ref, mem_ref, wq_ref, bq_ref, wk_ref, bk_ref,
            head_map_ref, att_ref, out_ref, *, num_heads: int, scale: float):
    f32 = jnp.float32
    q = (
        jnp.dot(s_ref[0].astype(f32), wq_ref[:].astype(f32),
                preferred_element_type=f32)
        + bq_ref[:].astype(f32)
    )  # (1, D)
    k = (
        jnp.dot(kin_ref[0].astype(f32), wk_ref[:].astype(f32),
                preferred_element_type=f32)
        + bk_ref[:].astype(f32)
    )  # (L, D)
    kq = k * q  # broadcast multiply: (L, D)
    # per-head reduction as an MXU matmul against the head-indicator matrix
    logits = jnp.dot(kq, head_map_ref[:].astype(f32),
                     preferred_element_type=f32) * scale  # (L, H)
    m = jnp.max(logits, axis=0, keepdims=True)
    e = jnp.exp(logits - m)
    w = e / jnp.sum(e, axis=0, keepdims=True)  # softmax over L, per head
    g = jnp.sum(w, axis=1, keepdims=True) * (1.0 / num_heads)  # (L, 1)
    att_ref[0] = g.astype(att_ref.dtype)
    out_ref[0] = (mem_ref[0].astype(f32) * g).astype(out_ref.dtype)


def _pallas_forward(sketch, k_input, mem, wq, bq, wk, bk, num_heads: int,
                    interpret: bool):
    B, L, D = k_input.shape
    hd = D // num_heads
    # head-indicator matrix: (D, H), 1 where feature d belongs to head h
    head_map = (
        jnp.arange(D)[:, None] // hd == jnp.arange(num_heads)[None, :]
    ).astype(jnp.float32)

    kernel = functools.partial(_kernel, num_heads=num_heads, scale=hd**-0.5)
    grid = (B,)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        )
    att, out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0)),  # sketch (B, 1, D)
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((D, D), lambda b: (0, 0)),
            pl.BlockSpec((1, D), lambda b: (0, 0)),
            pl.BlockSpec((D, D), lambda b: (0, 0)),
            pl.BlockSpec((1, D), lambda b: (0, 0)),
            pl.BlockSpec((D, num_heads), lambda b: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, L, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, 1), mem.dtype),
            jax.ShapeDtypeStruct((B, L, D), mem.dtype),
        ],
        interpret=interpret,
        **kwargs,
    )(
        sketch.reshape(B, 1, D),
        k_input, mem,
        wq, bq.reshape(1, D), wk, bk.reshape(1, D),
        head_map,
    )
    return att[..., 0], out  # (B, L), (B, L, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def gated_attention_fused(sketch, k_input, mem, wq, bq, wk, bk,
                          num_heads: int, interpret: bool = False):
    return _pallas_forward(sketch, k_input, mem, wq, bq, wk, bk, num_heads,
                           interpret)


def _fused_fwd(sketch, k_input, mem, wq, bq, wk, bk, num_heads, interpret):
    out = _pallas_forward(sketch, k_input, mem, wq, bq, wk, bk, num_heads,
                          interpret)
    return out, (sketch, k_input, mem, wq, bq, wk, bk)


def _fused_bwd(num_heads, interpret, residuals, cotangents):
    sketch, k_input, mem, wq, bq, wk, bk = residuals
    _, vjp = jax.vjp(
        lambda s, ki, m, a, b, c, d: gated_attention_reference(
            s, ki, m, a, b, c, d, num_heads
        ),
        sketch, k_input, mem, wq, bq, wk, bk,
    )
    return vjp(cotangents)


gated_attention_fused.defvjp(_fused_fwd, _fused_bwd)


def gated_cross_attention(sketch, k_input, mem, wq, bq, wk, bk,
                          num_heads: int) -> Tuple[Array, Array]:
    """Public entry: fused on TPU, interpret-mode elsewhere (tests)."""
    interpret = jax.default_backend() != "tpu"
    return gated_attention_fused(sketch, k_input, mem, wq, bq, wk, bk,
                                 num_heads, interpret)
