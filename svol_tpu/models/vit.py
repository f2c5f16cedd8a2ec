"""Flax ViT-B/16 with HuggingFace ViTModel-compatible topology.

The reference's ViT path runs ``google/vit-base-patch16-224-in21k`` per frame
and per sketch, taking the CLS token of the final (LayerNorm'ed) hidden state
(lib/modeling/backbone.py:11-62). That loop decodes one image at a time on
host; here the whole (N*T) frame batch goes through one batched forward.

Weights can be ported from an HF checkpoint with
svol_tpu/utils/torch_port.py; random init otherwise (no network egress in
this environment).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

LN_EPS_VIT = 1e-12  # HF ViT layer_norm_eps


class ViTEncoderLayer(nn.Module):
    hidden_size: int = 768
    num_heads: int = 12
    mlp_dim: int = 3072
    dtype: Optional[jnp.dtype] = None
    # fused VMEM-softmax attention (ops/pallas/flash_attention.py): ViT
    # attention is unmasked, so the kernel applies directly; at L=197 /
    # head_dim=64 the f32 logits tile is 0.16 MB — one grid step per
    # batch-head. Exact f32 softmax (MORE precise than the bf16-softmax
    # einsum path below); equivalence in tests/test_sketch_vit.py.
    use_flash: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        # Pre-LN transformer block (HF ViTLayer)
        h = nn.LayerNorm(epsilon=LN_EPS_VIT, dtype=self.dtype, name="ln_before")(x)
        head_dim = self.hidden_size // self.num_heads
        B, L, _ = h.shape
        q = nn.Dense(self.hidden_size, dtype=self.dtype, name="q")(h)
        k = nn.Dense(self.hidden_size, dtype=self.dtype, name="k")(h)
        v = nn.Dense(self.hidden_size, dtype=self.dtype, name="v")(h)
        q = q.reshape(B, L, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        if self.use_flash:
            from svol_tpu.ops.pallas.flash_attention import flash_self_attention

            attn = flash_self_attention(q, k, v, head_dim**-0.5)
        else:
            logits = jnp.einsum("bhqd,bhkd->bhqk", q * head_dim**-0.5, k,
                                preferred_element_type=jnp.float32)
            w = nn.softmax(logits.astype(jnp.float32), axis=-1)
            if self.dtype is not None:
                w = w.astype(self.dtype)
            attn = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, L, self.hidden_size)
        attn = nn.Dense(self.hidden_size, dtype=self.dtype, name="attn_out")(attn)
        x = x + attn

        h = nn.LayerNorm(epsilon=LN_EPS_VIT, dtype=self.dtype, name="ln_after")(x)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp_in")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="mlp_out")(h)
        return x + h


class ViT(nn.Module):
    """ViT encoder returning (last_hidden_state, pre_ln_hidden_state).

    ``last_hidden_state`` has the final LayerNorm applied (the reference's
    ``norm_*_feats=True`` default); the pre-LN tensor corresponds to
    ``hidden_states[-1]`` (backbone.py:33-36)."""

    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    patch_size: int = 16
    image_size: int = 224
    dtype: Optional[jnp.dtype] = None
    # rematerialize each encoder layer in the backward pass (nn.remat);
    # param tree unchanged (tests/test_remat.py)
    remat: bool = False
    # fused flash attention in every encoder layer (see ViTEncoderLayer)
    use_flash: bool = False

    @nn.compact
    def __call__(self, images: Array, deterministic: bool = True):
        # images: (N, H, W, 3)
        N = images.shape[0]
        patches = nn.Conv(
            self.hidden_size, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            dtype=self.dtype, name="patch_embed",
        )(images)  # (N, 14, 14, D)
        x = patches.reshape(N, -1, self.hidden_size)
        n_patches = x.shape[1]

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.hidden_size))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (N, 1, self.hidden_size)).astype(x.dtype), x],
            axis=1,
        )
        pos = self.param(
            "pos_embed", nn.initializers.normal(stddev=0.02),
            (1, n_patches + 1, self.hidden_size),
        )
        x = x + pos.astype(x.dtype)

        for i in range(self.num_layers):
            layer = ViTEncoderLayer(
                hidden_size=self.hidden_size, num_heads=self.num_heads,
                mlp_dim=self.mlp_dim, dtype=self.dtype,
                use_flash=self.use_flash, name=f"layer{i}",
            )
            if self.remat:
                x = nn.remat(
                    lambda m, a: m(a, deterministic=deterministic)
                )(layer, x)
            else:
                x = layer(x, deterministic=deterministic)

        pre_ln = x
        x = nn.LayerNorm(epsilon=LN_EPS_VIT, dtype=self.dtype, name="ln_final")(x)
        return x, pre_ln


def vit_base_patch16(dtype=None, name: str = "vit",
                     remat: bool = False, use_flash: bool = False) -> ViT:
    return ViT(dtype=dtype, remat=remat, use_flash=use_flash, name=name)
