"""Positional encodings (port of lib/modeling/position_encoding.py).

The reference factory has latent bugs (wrong kwarg names at
position_encoding.py:104-107,117-120); this port fixes them while keeping the
three variants and the sine math identical (mask-cumsum positions).
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from svol_tpu.models.layers import LN_EPS


class PositionEmbeddingSine(nn.Module):
    """1-D sine embedding over the cumulative sum of the validity mask
    (position_encoding.py:35-71). Produces (B, L, 2*num_pos_feats)."""

    num_pos_feats: int = 64
    temperature: float = 10000.0
    normalize: bool = True
    scale: float = 2 * math.pi
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, mask: Array) -> Array:
        # mask: (B, L) with True/1 = valid
        x_embed = jnp.cumsum(mask.astype(jnp.float32), axis=1)  # (B, L)
        if self.normalize:
            eps = 1e-6
            x_embed = x_embed / (x_embed[:, -1:] + eps) * self.scale

        dim_t = jnp.arange(self.num_pos_feats, dtype=jnp.float32)
        dim_t = self.temperature ** (2 * jnp.floor(dim_t / 2) / self.num_pos_feats)
        pos_x = x_embed[:, :, None] / dim_t  # (B, L, F)
        pos = jnp.stack(
            [jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])], axis=3
        ).reshape(x_embed.shape[0], x_embed.shape[1], -1)
        if self.dtype is not None:
            pos = pos.astype(self.dtype)
        return pos


class TrainablePositionalEncoding(nn.Module):
    """Learned absolute positions + LayerNorm + dropout applied to the input
    (position_encoding.py:10-32). Note: unlike the other variants this returns
    input+pos, matching the reference."""

    max_position_embeddings: int
    hidden_size: int
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, mask: Array, deterministic: bool = True) -> Array:
        L = x.shape[1]
        pos_ids = jnp.arange(L)
        table = nn.Embed(
            self.max_position_embeddings, self.hidden_size, dtype=self.dtype,
            name="position_embeddings",
        )(pos_ids)  # (L, D)
        out = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x + table[None])
        out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
        return out


class PositionEmbeddingLearned(nn.Module):
    """2-D learned row/col embedding (position_encoding.py:74-98); expects
    (B, H, W, C)-shaped input maps."""

    num_pos_feats: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, mask: Array) -> Array:
        h, w = x.shape[1], x.shape[2]
        col = nn.Embed(50, self.num_pos_feats, embedding_init=nn.initializers.uniform(1.0),
                       dtype=self.dtype, name="col_embed")(jnp.arange(w))
        row = nn.Embed(50, self.num_pos_feats, embedding_init=nn.initializers.uniform(1.0),
                       dtype=self.dtype, name="row_embed")(jnp.arange(h))
        pos = jnp.concatenate(
            [
                jnp.broadcast_to(col[None, :, :], (h, w, self.num_pos_feats)),
                jnp.broadcast_to(row[:, None, :], (h, w, self.num_pos_feats)),
            ],
            axis=-1,
        )  # (H, W, 2F)
        return jnp.broadcast_to(pos[None], (x.shape[0], h, w, pos.shape[-1]))


def make_position_embedding(kind: str, hidden_dim: int, max_positions: int,
                            dropout: float, dtype=None, name: str = "pos"):
    """Factory mirroring build_position_encoding (position_encoding.py:101-129)
    with its kwarg bugs fixed. The sine variant takes num_pos_feats=hidden_dim
    and emits exactly hidden_dim features (the interleave at
    position_encoding.py:70 keeps the size; its shape comment is wrong). The
    2-D learned variant emits 2*num_pos_feats, so it gets hidden_dim//2 here —
    the reference passes hidden_dim and would crash if that path were used."""
    if kind == "sine":
        return PositionEmbeddingSine(num_pos_feats=hidden_dim, dtype=dtype, name=name)
    if kind == "trainable":
        return TrainablePositionalEncoding(
            max_position_embeddings=max_positions, hidden_size=hidden_dim,
            dropout=dropout, dtype=dtype, name=name,
        )
    if kind == "learned":
        return PositionEmbeddingLearned(num_pos_feats=hidden_dim // 2, dtype=dtype, name=name)
    raise ValueError(f"not supported {kind}")
