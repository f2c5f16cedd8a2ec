"""Pallas 3x3 conv with W-pair output packing — the stage-1 MXU experiment.

SVOL's ResNet stage-1 convs (56^2 spatial, C_in = C_out = 64) run at ~60%
MFU under XLA: the 64 output channels fill only half of the MXU's 128
output lanes (PERFORMANCE.md "Where the time goes"; VERDICT r2 next-round
item #7). This kernel packs TWO adjacent W-pixels into the output lanes —
out[(n, i, jp), (parity, c)] is a (rows, 128) tile — so the matmul issues
full-width MXU passes.

Formulation (implicit GEMM, one frame per grid step):
    col(2*jp + po + dj - 1) for po in {0,1}, dj in {0,1,2} covers exactly
    4 distinct columns per output pair jp: (jp-1, odd), (jp, even),
    (jp, odd), (jp+1, even). Stacking those 4 column groups x 3 rows (di)
    gives a (56*28, 3*256) input tile and a (768, 128) weight matrix in
    which each output column has 3*3*64 = 576 nonzero rows — a 75% dense
    matmul, vs the ~60% lane utilization of the unpacked conv. The packed
    input tile is built in VMEM from three static shifted views of the
    halo-padded input block (VPU copies, ~2.4 MB/frame — cheap next to the
    matmul).

Exact math: float32 accumulation of the same 576 MACs per output element;
both entry points reproduce ``lax.conv_general_dilated`` up to dtype
rounding (tests/test_packed_conv.py). Measured verdict on the chip lives in
PERFORMANCE.md (scripts/bench_conv_stage1.py); reference conv topology:
lib/modeling/backbone.py:72-89 (torchvision resnet34 layer1).

Two implementations of the same formulation:

* ``packed_conv3x3`` — fused Pallas kernel (packing + matmul in VMEM).
  Does NOT lower on this jaxlib's Mosaic: the in-kernel lane-concatenate of
  three shifted views carries mismatched (sublane, lane) vpad offsets and
  trips "Not implemented: result/input offset mismatch on non-concat
  dimension". Kept for newer toolchains (same status as the Pallas LSAP,
  ops/hungarian.py).
* ``packed_conv3x3_xla`` — identical math as plain XLA ops: the packed
  (N, H, W/2, 12C) operand is built with pads/slices/concats (pure data
  movement XLA fuses) feeding ONE dot_general. This is the measurable
  variant on today's toolchain.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl

try:  # TPU-only module; CPU tests run in interpret mode
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def pack_w_pairs(x: Array) -> Array:
    """(N, H, W, C) -> (N, H, W//2, 2C): channel dim = (parity, c)."""
    N, H, W, C = x.shape
    return x.reshape(N, H, W // 2, 2 * C)


def unpack_w_pairs(x: Array) -> Array:
    """Inverse of :func:`pack_w_pairs`."""
    N, H, Wp, C2 = x.shape
    return x.reshape(N, H, Wp * 2, C2 // 2)


def build_packed_kernel(w: Array) -> Array:
    """HWIO (3, 3, C, F) -> (3*4C, 2F) stacked weight matrix.

    Row layout per di (4 column-group slots of C rows each):
      slot 0: (jp-1, odd)  — feeds po=0 via dj=0
      slot 1: (jp,   even) — feeds po=0 via dj=1 and po=1 via dj=0
      slot 2: (jp,   odd)  — feeds po=0 via dj=2 and po=1 via dj=1
      slot 3: (jp+1, even) — feeds po=1 via dj=2
    Column layout: (po, f).
    """
    kh, kw, C, F = w.shape
    assert (kh, kw) == (3, 3), (kh, kw)
    wf = w.astype(jnp.float32)
    blocks = []
    for di in range(3):
        z = jnp.zeros((C, F), jnp.float32)
        slot = [
            jnp.concatenate([wf[di, 0], z], axis=1),         # (jp-1, odd)
            jnp.concatenate([wf[di, 1], wf[di, 0]], axis=1),  # (jp, even)
            jnp.concatenate([wf[di, 2], wf[di, 1]], axis=1),  # (jp, odd)
            jnp.concatenate([z, wf[di, 2]], axis=1),          # (jp+1, even)
        ]
        blocks.append(jnp.concatenate(slot, axis=0))  # (4C, 2F)
    return jnp.concatenate(blocks, axis=0)  # (12C, 2F)


def _packed_operand(xp: Array, H: int, Wp: int, C: int) -> Array:
    """(N, H+2, Wp+2, 2C) halo-padded packed input -> (N, H, Wp, 12C)
    stacked column-group operand (the kernel's VMEM build, as XLA ops)."""
    groups = []
    for di in range(3):
        rows = xp[:, di:di + H]  # (N, H, Wp+2, 2C)
        left = rows[:, :, 0:Wp, C:]          # (jp-1, odd)
        center = rows[:, :, 1:Wp + 1, :]     # (jp, even+odd)
        right = rows[:, :, 2:Wp + 2, :C]     # (jp+1, even)
        groups.append(jnp.concatenate([left, center, right], axis=-1))
    return jnp.concatenate(groups, axis=-1)  # (N, H, Wp, 12C)


def packed_conv3x3_xla(x: Array, w: Array) -> Array:
    """The W-pair-packed conv as plain XLA: packed operand built from
    pads/slices/concats, then ONE (N*H*W/2, 12C) x (12C, 2F) dot_general.

    Same 576 f32-accumulated MACs per output element as the Pallas kernel
    and the XLA conv; requires even W. Output dtype follows ``x``.
    """
    N, H, W, C = x.shape
    F = w.shape[-1]
    assert W % 2 == 0, W
    Wp = W // 2
    xp = jnp.pad(pack_w_pairs(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
    xs = _packed_operand(xp, H, Wp, C)
    wk = build_packed_kernel(w).astype(x.dtype)  # (12C, 2F)
    acc = jax.lax.dot_general(
        xs.reshape(N * H * Wp, 12 * C), wk,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = acc.reshape(N, H, Wp, 2 * F).astype(x.dtype)
    return unpack_w_pairs(out)


def _kernel(x_ref, w_ref, o_ref, *, H: int, Wp: int, C: int):
    # x_ref: (1, H+2, Wp+2, 2C) halo-padded packed input block
    # w_ref: (12C, 2F) stacked weights;  o_ref: (1, H, Wp, 2F)
    x = x_ref[0]
    groups = []
    for di in range(3):
        rows = x[di:di + H]  # (H, Wp+2, 2C) static slice
        left = rows[:, 0:Wp, C:]        # (jp-1, odd)   -> C lanes
        center = rows[:, 1:Wp + 1, :]   # (jp, even+odd) -> 2C lanes
        right = rows[:, 2:Wp + 2, :C]   # (jp+1, even)  -> C lanes
        groups.append(jnp.concatenate([left, center, right], axis=-1))
    xs = jnp.concatenate(groups, axis=-1)  # (H, Wp, 12C)
    acc = jax.lax.dot_general(
        xs.reshape(H * Wp, 12 * C), w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = acc.reshape(H, Wp, -1).astype(o_ref.dtype)


def packed_conv3x3(x: Array, w: Array, interpret: bool | None = None) -> Array:
    """3x3 stride-1 pad-1 conv, NHWC x HWIO, via the W-pair-packed matmul.

    Requires even W. Output dtype follows ``x``.
    """
    N, H, W, C = x.shape
    F = w.shape[-1]
    assert W % 2 == 0, W
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Wp = W // 2
    xp = pack_w_pairs(x)  # (N, H, Wp, 2C)
    xp = jnp.pad(xp, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wk = build_packed_kernel(w).astype(x.dtype)  # (12C, 2F)

    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    out = pl.pallas_call(
        functools.partial(_kernel, H=H, Wp=Wp, C=C),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, H + 2, Wp + 2, 2 * C), lambda n: (n, 0, 0, 0)),
            pl.BlockSpec((12 * C, 2 * F), lambda n: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, Wp, 2 * F), lambda n: (n, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, Wp, 2 * F), x.dtype),
        interpret=interpret,
        **kwargs,
    )(xp, wk)
    return unpack_w_pairs(out)
