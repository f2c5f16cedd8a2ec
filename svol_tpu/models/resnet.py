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
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

# torch BatchNorm defaults
BN_EPS = 1e-5
BN_MOMENTUM = 0.9  # flax momentum = 1 - torch momentum (0.1)


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
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

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
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

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        # x: (N, H, W, 3)
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        # torch MaxPool2d(3, stride=2, padding=1)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for stage, n_blocks in enumerate(self.stage_sizes):
            filters = 64 * (2**stage)
            for b in range(n_blocks):
                stride = 2 if stage > 0 and b == 0 else 1
                y = self.block(filters=filters, stride=stride, dtype=self.dtype,
                               name=f"layer{stage + 1}_{b}")(y, train=train)

        if self.include_pool:
            y = y.mean(axis=(1, 2))  # (N, C)
        return y


def resnet18(include_pool: bool = False, dtype=None, name: str = "resnet18") -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), block=BasicBlock,
                  include_pool=include_pool, dtype=dtype, name=name)


def resnet34(include_pool: bool = False, dtype=None, name: str = "resnet34") -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block=BasicBlock,
                  include_pool=include_pool, dtype=dtype, name=name)


def resnet50(include_pool: bool = False, dtype=None, name: str = "resnet50") -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block=Bottleneck,
                  include_pool=include_pool, dtype=dtype, name=name)
