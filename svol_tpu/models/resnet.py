"""Flax ResNet-18/34/50 with torchvision-compatible topology.

The reference uses torchvision resnet34 (video, truncated before avgpool ->
7x7x512 map per frame) and resnet18 (sketch, truncated before fc -> 512-d
global vector) — lib/modeling/backbone.py:133-141. This is a from-scratch
NHWC Flax implementation of the same topology so torchvision checkpoints can
be ported tensor-for-tensor (see svol_tpu/utils/torch_port.py).

TPU notes:
  * NHWC layout (XLA's native conv layout on TPU).
  * BatchNorm under jit with a batch-sharded input computes means over the
    *global* batch automatically (the mean over a sharded axis inserts the
    collective), so DP training gets synced BN for free — the reference needs
    apex SyncBN for this (train.py:65-68).
  * ``stem='space_to_depth'`` replaces the 7x7/s2 entry conv with the
    mathematically-equivalent space-to-depth (block 2) + 4x4/s1 conv — the
    standard TPU ResNet stem optimization: a 3-channel 224x224 stride-2 conv
    badly underfills the MXU's 128 input lanes, while the rearranged 12-in
    4x4 conv runs at 1/4 the spatial extent with 4x the channels.
    ``conv7_to_s2d_kernel`` rearranges trained 7x7 weights exactly, so
    torchvision ports and conv7-trained checkpoints carry over losslessly
    (tests/test_resnet_stem.py proves bitwise-level equivalence).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp
from jax import Array, lax

# torch BatchNorm defaults
BN_EPS = 1e-5
BN_MOMENTUM = 0.9  # flax momentum = 1 - torch momentum (0.1)


class QuantizableConv(nn.Module):
    """Bias-free NHWC conv, param-compatible with ``nn.Conv`` (same "kernel"
    name, HWIO shape, lecun-normal init) so checkpoints and the torchvision
    port (utils/torch_port.py) are oblivious to it.

    ``quantize=None`` reproduces nn.Conv's computation exactly (same dtype
    promotion + lax.conv_general_dilated call). ``quantize='int8'`` runs the
    int8 MXU path (ops/quant.py): per-tensor activation scale (dynamic, or
    static when a calibrated ``quant`` collection is present),
    per-output-channel weight scales, int32 accumulation — inference-only.

    Calibration: apply the int8 model with ``mutable=["quant"]`` on sample
    batches — each conv records its running input amax into the ``quant``
    collection while computing the *exact float* output (so calibration
    statistics aren't polluted by upstream quantization error). Passing the
    collected collection back in (immutably) switches the conv to static
    scales — the quantize round/clip then fuses into the previous op's
    epilogue instead of waiting on an abs-max reduction
    (scripts/bench_int8.py: 1.26x static vs 1.19x dynamic on the dominant
    conv shape).
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Union[int, Tuple[Tuple[int, int], Tuple[int, int]]] = 0
    dtype: Optional[jnp.dtype] = None
    quantize: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, kernel_scale: float = 1.0) -> Array:
        """``kernel_scale``: compile-time constant folded into the kernel —
        conv(s*x, k) == conv(x, s*k), so the stem conv absorbs the uint8
        pixel normalization (1/255) for free instead of paying a full
        HBM read+write pass over the pixels (0.9 ms/train-step measured,
        scripts/profile_train.py 'div'). The stored parameter stays
        UNSCALED (checkpoint/port compatibility)."""
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features), jnp.float32,
        )
        if kernel_scale != 1.0:
            kernel = kernel * kernel_scale
        if self.quantize == "int8":
            from svol_tpu.ops.quant import int8_conv

            # NB: init() makes every collection mutable — the calibration
            # branch must not trigger there or init would grow a 'quant'
            # collection and break param-tree compatibility
            if self.is_mutable_collection("quant") and not self.is_initializing():
                amax = self.variable("quant", "amax",
                                     lambda: jnp.zeros((), jnp.float32))
                amax.value = jnp.maximum(
                    amax.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
                # exact float output during calibration
            else:
                static_amax = (
                    jnp.asarray(self.get_variable("quant", "amax"), jnp.float32)
                    if self.has_variable("quant", "amax") else None
                )
                return int8_conv(x, kernel, self.strides, self.padding,
                                 out_dtype=self.dtype or x.dtype,
                                 static_amax=static_amax)
        elif self.quantize is not None:
            raise NotImplementedError(f"quantize={self.quantize!r}")

        x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            x, kernel, window_strides=self.strides, padding=pad,
            dimension_numbers=dn,
        )


def max_pool_3x3_s2(x: Array, impl: str = "reduce_window") -> Array:
    """The stem's 3x3 stride-2 pad-1 max pool, in two formulations.

    ``reduce_window``: flax/XLA native — its GRADIENT lowers to
    ``select_and_scatter``, the single most expensive op in the round-4
    train-step trace (3.5 ms/step at bs=16, HBM-bound —
    scripts/profile_train.py). ``shifted_max``: elementwise max over the 9
    strided window shifts; identical forward values (same max over the same
    windows), and its autodiff is a fusable compare/select/pad chain with no
    select_and_scatter (A/B: scripts/bench_maxpool.py). Backward differs
    only on tied window maxima (ties route to one element vs split among
    shifts — both valid subgradients; ties arise at ReLU-clamped zeros).
    """
    if impl == "reduce_window":
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    assert impl == "shifted_max", impl
    N, H, W, C = x.shape
    Ho, Wo = (H - 1) // 2 + 1, (W - 1) // 2 + 1
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=-jnp.inf)
    out = None
    for i in range(3):
        for j in range(3):
            s = lax.slice(
                xp, (0, i, j, 0),
                (N, i + 2 * Ho - 1, j + 2 * Wo - 1, C), (1, 2, 2, 1),
            )
            out = s if out is None else jnp.maximum(out, s)
    return out


def space_to_depth(x: Array, block: int = 2) -> Array:
    """(N, H, W, C) -> (N, H/b, W/b, b*b*C), channel-minor order (di, dj, c)."""
    N, H, W, C = x.shape
    b = block
    x = x.reshape(N, H // b, b, W // b, b, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(N, H // b, W // b, b * b * C)


def conv7_to_s2d_kernel(k: Array) -> Array:
    """Rearrange a 7x7 stride-2 conv kernel (HWIO: (7, 7, C, F)) into the
    exactly-equivalent 4x4 stride-1 kernel (4, 4, 4C, F) over
    space-to-depth(2) inputs.

    Derivation: output o(i,j) of the original conv reads input rows
    2i + (a-3), a in [0, 7). Writing 2i + (a-3) = 2(i+q) + di with
    q in {-2..1}, di in {0, 1} gives a = 2(q+2) + di - 1 — i.e. the 7x7
    kernel zero-padded by one leading row/col to 8x8, then split into
    (tap, parity) pairs. The s2d conv uses padding (2, 1) so tap index q+2
    lands on block i+q, matching the original padding=3.
    """
    kp = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (8, 8, C, F)
    C, F = k.shape[2], k.shape[3]
    kp = kp.reshape(4, 2, 4, 2, C, F)  # (q_i, di, r_j, dj, C, F)
    kp = kp.transpose(0, 2, 1, 3, 4, 5)  # (q_i, r_j, di, dj, C, F)
    return kp.reshape(4, 4, 4 * C, F)


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    dtype: Optional[jnp.dtype] = None
    quantize: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        conv = partial(QuantizableConv, dtype=self.dtype,
                       quantize=None if train else self.quantize)
        bn = partial(
            nn.BatchNorm, use_running_average=not train, momentum=BN_MOMENTUM,
            epsilon=BN_EPS, dtype=self.dtype,
        )
        residual = x
        y = conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                 padding=1, name="conv1")(x)
        y = bn(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3), padding=1, name="conv2")(y)
        y = bn(name="bn2")(y)
        if residual.shape != y.shape:
            residual = conv(self.filters, (1, 1),
                            strides=(self.stride, self.stride),
                            name="downsample_conv")(x)
            residual = bn(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int
    stride: int = 1
    dtype: Optional[jnp.dtype] = None
    expansion: int = 4
    quantize: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        conv = partial(QuantizableConv, dtype=self.dtype,
                       quantize=None if train else self.quantize)
        bn = partial(
            nn.BatchNorm, use_running_average=not train, momentum=BN_MOMENTUM,
            epsilon=BN_EPS, dtype=self.dtype,
        )
        residual = x
        y = conv(self.filters, (1, 1), name="conv1")(x)
        y = nn.relu(bn(name="bn1")(y))
        y = conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                 padding=1, name="conv2")(y)
        y = nn.relu(bn(name="bn2")(y))
        y = conv(self.filters * self.expansion, (1, 1), name="conv3")(y)
        y = bn(name="bn3")(y)
        if residual.shape != y.shape:
            residual = conv(self.filters * self.expansion, (1, 1),
                            strides=(self.stride, self.stride),
                            name="downsample_conv")(x)
            residual = bn(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet trunk. ``include_pool=True`` appends global average pooling
    (the reference's sketch path, ``children()[:-1]``); otherwise the final
    7x7 feature map is returned (video path, ``children()[:-2]``)."""

    stage_sizes: Sequence[int]
    block: type = BasicBlock
    include_pool: bool = False
    dtype: Optional[jnp.dtype] = None
    stem: str = "conv7"  # conv7 (torch layout) | space_to_depth (equivalent)
    quantize: Optional[str] = None  # int8 inference path (ops/quant.py)
    # rematerialize each residual block's activations in the backward pass
    # (jax.checkpoint per block via nn.remat) — trades ~1 extra forward of
    # FLOPs for not stashing the block's interior activations in HBM. The
    # param tree is unchanged (tests/test_remat.py).
    remat: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False,
                 input_scale: float = 1.0) -> Array:
        # x: (N, H, W, 3); ``input_scale`` multiplies the input — folded
        # into the stem conv's kernel (conv is linear), so uint8 pixels can
        # skip the /255 normalization pass (QuantizableConv.kernel_scale)
        q = None if train else self.quantize
        if self.stem == "space_to_depth":
            y = QuantizableConv(64, (4, 4), strides=(1, 1),
                                padding=((2, 1), (2, 1)), dtype=self.dtype,
                                quantize=q, name="conv1_s2d")(
                space_to_depth(x), kernel_scale=input_scale)
        elif self.stem == "conv7":
            y = QuantizableConv(64, (7, 7), strides=(2, 2), padding=3,
                                dtype=self.dtype, quantize=q, name="conv1")(
                x, kernel_scale=input_scale)
        else:
            raise ValueError(f"unknown stem {self.stem!r}")
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        # torch MaxPool2d(3, stride=2, padding=1)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for stage, n_blocks in enumerate(self.stage_sizes):
            filters = 64 * (2**stage)
            for b in range(n_blocks):
                stride = 2 if stage > 0 and b == 0 else 1
                blk = self.block(filters=filters, stride=stride,
                                 dtype=self.dtype, quantize=self.quantize,
                                 name=f"layer{stage + 1}_{b}")
                if self.remat:
                    y = nn.remat(lambda m, a: m(a, train=train))(blk, y)
                else:
                    y = blk(y, train=train)

        if self.include_pool:
            y = y.mean(axis=(1, 2))  # (N, C)
        return y


def resnet18(include_pool: bool = False, dtype=None, name: str = "resnet18",
             stem: str = "conv7", quantize: Optional[str] = None,
             remat: bool = False) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), block=BasicBlock,
                  include_pool=include_pool, dtype=dtype, stem=stem,
                  quantize=quantize, remat=remat, name=name)


def resnet34(include_pool: bool = False, dtype=None, name: str = "resnet34",
             stem: str = "conv7", quantize: Optional[str] = None,
             remat: bool = False) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block=BasicBlock,
                  include_pool=include_pool, dtype=dtype, stem=stem,
                  quantize=quantize, remat=remat, name=name)


def resnet50(include_pool: bool = False, dtype=None, name: str = "resnet50",
             stem: str = "conv7", quantize: Optional[str] = None,
             remat: bool = False) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block=Bottleneck,
                  include_pool=include_pool, dtype=dtype, stem=stem,
                  quantize=quantize, remat=remat, name=name)
