"""Vanilla DETR encoder-decoder transformer (port of lib/modeling/transformer.py).

Used by the SketchDETR baseline head and the SVANet fusion-ablation variants.
Batch-first throughout; pre-/post-norm variants; the decoder returns the
per-layer (normed) intermediate states and the head-averaged cross-attention
weights, matching transformer.py:116-160.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from svol_tpu.models.layers import LN_EPS, MultiheadAttention, get_activation


class TransformerEncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = False
    dtype: Optional[jnp.dtype] = None
    use_flash: bool = False

    @nn.compact
    def __call__(self, src: Array, pos: Array, key_padding_mask: Optional[Array],
                 deterministic: bool = True) -> Array:
        ln = lambda name: nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name=name)
        drop = lambda x: nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)
        attn = MultiheadAttention(
            d_model=self.d_model, num_heads=self.nhead, dropout=self.dropout,
            dtype=self.dtype, use_flash=self.use_flash, name="self_attn",
        )

        def ffn(x, name1="linear1", name2="linear2"):
            h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name=name1)(x)
            h = drop(get_activation(self.activation)(h))
            return nn.Dense(self.d_model, dtype=self.dtype, name=name2)(h)

        if self.normalize_before:
            s2 = ln("norm1")(src)
            qk = s2 + pos
            a, _ = attn(qk, qk, s2, key_padding_mask=key_padding_mask,
                        deterministic=deterministic, need_weights=False)
            src = src + drop(a)
            s2 = ln("norm2")(src)
            return src + drop(ffn(s2))
        qk = src + pos
        a, _ = attn(qk, qk, src, key_padding_mask=key_padding_mask,
                    deterministic=deterministic, need_weights=False)
        src = ln("norm1")(src + drop(a))
        return ln("norm2")(src + drop(ffn(src)))


class TransformerDecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = False
    dtype: Optional[jnp.dtype] = None
    use_flash: bool = False

    @nn.compact
    def __call__(self, tgt: Array, memory: Array, pos: Array, query_pos: Array,
                 memory_key_padding_mask: Optional[Array],
                 deterministic: bool = True) -> Tuple[Array, Array]:
        ln = lambda name: nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name=name)
        drop = lambda x: nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)
        self_attn = MultiheadAttention(
            d_model=self.d_model, num_heads=self.nhead, dropout=self.dropout,
            dtype=self.dtype, use_flash=self.use_flash, name="self_attn",
        )
        cross_attn = MultiheadAttention(
            d_model=self.d_model, num_heads=self.nhead, dropout=self.dropout,
            dtype=self.dtype, name="multihead_attn",
        )

        def ffn(x):
            h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
            h = drop(get_activation(self.activation)(h))
            return nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)

        if self.normalize_before:
            t2 = ln("norm1")(tgt)
            qk = t2 + query_pos
            a, _ = self_attn(qk, qk, t2, deterministic=deterministic,
                             need_weights=False)
            tgt = tgt + drop(a)
            t2 = ln("norm2")(tgt)
            a, att = cross_attn(t2 + query_pos, memory + pos, memory,
                                key_padding_mask=memory_key_padding_mask,
                                deterministic=deterministic)
            tgt = tgt + drop(a)
            t2 = ln("norm3")(tgt)
            return tgt + drop(ffn(t2)), att
        qk = tgt + query_pos
        a, _ = self_attn(qk, qk, tgt, deterministic=deterministic,
                         need_weights=False)
        tgt = ln("norm1")(tgt + drop(a))
        a, att = cross_attn(tgt + query_pos, memory + pos, memory,
                            key_padding_mask=memory_key_padding_mask,
                            deterministic=deterministic)
        tgt = ln("norm2")(tgt + drop(a))
        return ln("norm3")(tgt + drop(ffn(tgt))), att


class Transformer(nn.Module):
    """DETR transformer: encoder over the source sequence, decoder refining
    learned queries, per-layer intermediate outputs (transformer.py:18-81)."""

    d_model: int = 256
    nhead: int = 8
    num_encoder_layers: int = 2
    num_decoder_layers: int = 2
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = False
    dtype: Optional[jnp.dtype] = None
    use_flash: bool = False

    @nn.compact
    def __call__(
        self,
        src: Array,  # (B, L, D)
        pad_mask: Optional[Array],  # (B, L) True = padded
        query_embed: Array,  # (Q, D) or (B, Q, D)
        pos: Array,  # (B, L, D)
        deterministic: bool = True,
    ):
        B = src.shape[0]
        if query_embed.ndim == 2:
            query_pos = jnp.broadcast_to(
                query_embed[None], (B,) + query_embed.shape
            ).astype(src.dtype)
        else:
            query_pos = query_embed.astype(src.dtype)

        memory = src
        for i in range(self.num_encoder_layers):
            memory = TransformerEncoderLayer(
                d_model=self.d_model, nhead=self.nhead,
                dim_feedforward=self.dim_feedforward, dropout=self.dropout,
                activation=self.activation, normalize_before=self.normalize_before,
                dtype=self.dtype, use_flash=self.use_flash,
                name=f"encoder_layer{i}",
            )(memory, pos, pad_mask, deterministic=deterministic)
        if self.normalize_before:
            memory = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                                  name="encoder_norm")(memory)

        tgt = jnp.zeros_like(query_pos)
        decoder_norm = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                                    name="decoder_norm")
        intermediates, att_weights = [], []
        for i in range(self.num_decoder_layers):
            tgt, att = TransformerDecoderLayer(
                d_model=self.d_model, nhead=self.nhead,
                dim_feedforward=self.dim_feedforward, dropout=self.dropout,
                activation=self.activation, normalize_before=self.normalize_before,
                dtype=self.dtype, use_flash=self.use_flash,
                name=f"decoder_layer{i}",
            )(tgt, memory, pos, query_pos, pad_mask, deterministic=deterministic)
            intermediates.append(decoder_norm(tgt))
            att_weights.append(att)

        hs = jnp.stack(intermediates)  # (layers, B, Q, D)
        return hs, memory, jnp.stack(att_weights)
