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


class FusedLayerNorm(nn.Module):
    """Param-tree drop-in for ``nn.LayerNorm`` ("scale"/"bias" leaves under
    the same module name) running the one-pass Pallas kernel
    (ops/pallas/layer_norm.py): XLA otherwise splits the f32 statistics
    reduction and the normalize/scale/bias apply into separate HBM passes
    over the (tokens, D) activation — ~1.27 ms/layer in the ViT profile."""

    epsilon: float = LN_EPS_VIT
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from svol_tpu.ops.pallas.layer_norm import fused_layer_norm

        D = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (D,))
        bias = self.param("bias", nn.initializers.zeros, (D,))
        y = fused_layer_norm(x, scale, bias, self.epsilon)
        return y.astype(self.dtype) if self.dtype is not None else y


def _layer_norm(mod: nn.Module, name: str, x: Array, fused: bool) -> Array:
    # fused=False ALWAYS for now: the one-pass Pallas LN measured a large
    # NEGATIVE on the chip (ViT step 2875 -> 2129 frames/s) — the per-row
    # mean/var are cross-LANE reductions (D=768 on the lane axis), which
    # the VPU serializes far below the HBM rate XLA's split-pass
    # formulation sustains. Kernel + tests kept (ops/pallas/layer_norm.py)
    # as the documented experiment; a sublane-major variant would need an
    # in-VMEM transpose that costs what it saves. PERFORMANCE.md round 5.
    del fused
    return nn.LayerNorm(epsilon=LN_EPS_VIT, dtype=mod.dtype, name=name)(x)


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
        h = _layer_norm(self, "ln_before", x, self.use_flash)
        head_dim = self.hidden_size // self.num_heads
        B, L, _ = h.shape
        q = nn.Dense(self.hidden_size, dtype=self.dtype, name="q")(h)
        k = nn.Dense(self.hidden_size, dtype=self.dtype, name="k")(h)
        v = nn.Dense(self.hidden_size, dtype=self.dtype, name="v")(h)
        if self.use_flash:
            # (B, L, D)-native kernel: the einsum path below needs
            # head-major operands, paying two full HBM transpose passes per
            # tensor per layer (~0.6 ms/layer in the ViT profile); the
            # kernel consumes the q/k/v Dense outputs directly (heads are
            # lane-aligned column slices inside the kernel) and its output
            # feeds the out-projection untransposed.
            from svol_tpu.ops.pallas.flash_attention import (
                flash_self_attention_bld,
            )

            attn = flash_self_attention_bld(q, k, v, head_dim**-0.5,
                                            self.num_heads)
        else:
            q = q.reshape(B, L, self.num_heads, head_dim).transpose(0, 2, 1, 3)
            k = k.reshape(B, L, self.num_heads, head_dim).transpose(0, 2, 1, 3)
            v = v.reshape(B, L, self.num_heads, head_dim).transpose(0, 2, 1, 3)
            logits = jnp.einsum("bhqd,bhkd->bhqk", q * head_dim**-0.5, k,
                                preferred_element_type=jnp.float32)
            w = nn.softmax(logits.astype(jnp.float32), axis=-1)
            if self.dtype is not None:
                w = w.astype(self.dtype)
            attn = jnp.einsum("bhqk,bhkd->bhqd", w, v)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, L, self.hidden_size)
        attn = nn.Dense(self.hidden_size, dtype=self.dtype, name="attn_out")(attn)
        x = x + attn

        h = _layer_norm(self, "ln_after", x, self.use_flash)
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
    # apply the final LayerNorm to the CLS token only: LN is per-token, so
    # when the consumer reads just hidden[:, 0] (the reference's CLS path,
    # backbone.py:33-36) normalizing the other 196 rows is dead work — one
    # full HBM pass over the (N*T, 197, 768) activation saved. EXACT for
    # the CLS feature; the returned hidden state then has seq length 1.
    final_ln_cls_only: bool = False

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
        if self.final_ln_cls_only:
            x = x[:, :1]
        x = nn.LayerNorm(epsilon=LN_EPS_VIT, dtype=self.dtype, name="ln_final")(x)
        return x, pre_ln


def vit_base_patch16(dtype=None, name: str = "vit",
                     remat: bool = False, use_flash: bool = False,
                     final_ln_cls_only: bool = False) -> ViT:
    return ViT(dtype=dtype, remat=remat, use_flash=use_flash,
               final_ln_cls_only=final_ln_cls_only, name=name)
