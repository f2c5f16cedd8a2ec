"""Shared Flax layers with PyTorch-parity semantics.

These deliberately reproduce the exact math of ``torch.nn.MultiheadAttention``
(pre-scaled queries, additive -inf key-padding mask, attention weights
*averaged over heads* — the detail SVOL's gated cross-attention depends on,
``lib/modeling/cross_modal_transformer.py:124-125``) and of the reference's
small MLP / projection blocks, but batch-first and jit-friendly.
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

# torch.nn.LayerNorm default eps (flax default is 1e-6)
LN_EPS = 1e-5


def get_activation(name: str) -> Callable[[Array], Array]:
    if name == "relu":
        return nn.relu
    if name == "gelu":
        return nn.gelu
    if name == "glu":
        return nn.glu
    raise ValueError(f"activation should be relu/gelu/glu, not {name}")


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention-equivalent, batch-first.

    Returns (output, weights) where weights are averaged over heads, matching
    torch's default ``average_attn_weights=True`` which the reference relies
    on for its attention-as-gate trick.
    """

    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None
    use_flash: bool = False  # fused VMEM-softmax kernel on the unmasked path
    flash_int8: bool = False  # int8-MXU QK/PV variant (serving path)

    @nn.compact
    def __call__(
        self,
        query: Array,  # (B, Lq, D)
        key: Array,  # (B, Lk, D)
        value: Array,  # (B, Lk, D)
        key_padding_mask: Optional[Array] = None,  # (B, Lk) True = padded
        deterministic: bool = True,
        need_weights: bool = True,
    ) -> tuple[Array, Optional[Array]]:
        head_dim = self.d_model // self.num_heads
        assert head_dim * self.num_heads == self.d_model

        dense = lambda name: nn.Dense(
            self.d_model,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name=name,
        )
        q = dense("q_proj")(query)
        k = dense("k_proj")(key)
        v = dense("v_proj")(value)

        B, Lq, _ = q.shape
        Lk = k.shape[1]
        # (B, H, L, hd)
        q = q.reshape(B, Lq, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(B, Lk, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(B, Lk, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        # tensor parallelism (parallel/mesh.py): heads shard over the active
        # plan's 'model' axis (no-op otherwise). The Pallas flash kernel is
        # a custom call XLA cannot partition on its own; under TP it runs
        # per-shard through shard_map_attention_heads (each device's local
        # (B/dp, H/tp, L, d) block is a complete attention problem), so the
        # fused path survives tp>1. The only genuine fallback is tp>1
        # combined with sp>1, where sequence parallelism shards the L rows
        # the kernel must see whole.
        from svol_tpu.parallel.mesh import (
            active_model_axis_size,
            active_seq_axis_size,
            shard_attention_heads,
            shard_map_attention_heads,
        )

        q = shard_attention_heads(q)
        k = shard_attention_heads(k)
        v = shard_attention_heads(v)

        tp = active_model_axis_size()
        if (
            self.use_flash
            and not need_weights
            and key_padding_mask is None
            and (self.dropout == 0.0 or deterministic)
            and (tp == 1 or active_seq_axis_size() == 1)
        ):
            # fused path: (Lq, Lk) logits stay in VMEM with an exact f32
            # softmax — never written to HBM (ops/pallas/flash_attention.py).
            # More precise than the bf16 fast path below AND faster: the
            # materialized weights dominate these blocks' HBM traffic.
            from svol_tpu.ops.pallas.flash_attention import (
                flash_self_attention,
                flash_self_attention_int8,
            )

            if tp > 1:
                # head-parallel fused kernel: shard_map hands each device
                # its local heads (the int8/calibration variants stay
                # single-chip — serving is a tp=1 configuration, config.py)
                scale = head_dim**-0.5
                out = shard_map_attention_heads(
                    lambda q_, k_, v_: flash_self_attention(q_, k_, v_, scale),
                    q, k, v,
                )
                out = out.transpose(0, 2, 1, 3).reshape(B, Lq, self.d_model)
                return dense("out_proj")(out), None

            # int8 attention is a serving-path optimization (config.py
            # documents quantization as inference-only): training forwards
            # (deterministic=False) stay on the exact kernel so gradients
            # never see straight-through-quantized activations
            if self.flash_int8 and deterministic:
                scale = head_dim**-0.5
                if self.is_mutable_collection("quant") and not self.is_initializing():
                    # calibration pass (ops/quant.calibrate_scales): record
                    # running per-tensor amax of the projected q/k/v while
                    # computing the EXACT output — same protocol as
                    # QuantizableConv, so one calibration run covers convs
                    # and attention together
                    for name, t in (("amax_q", q), ("amax_k", k), ("amax_v", v)):
                        var = self.variable("quant", name,
                                            lambda: jnp.zeros((), jnp.float32))
                        var.value = jnp.maximum(
                            var.value, jnp.max(jnp.abs(t.astype(jnp.float32))))
                    out = flash_self_attention(q, k, v, scale)
                else:
                    static_amax = (
                        tuple(jnp.asarray(self.get_variable("quant", n),
                                          jnp.float32)
                              for n in ("amax_q", "amax_k", "amax_v"))
                        if self.has_variable("quant", "amax_q") else None
                    )
                    out = flash_self_attention_int8(
                        q, k, v, scale, static_amax=static_amax)
            else:
                out = flash_self_attention(q, k, v, head_dim**-0.5)
            out = out.transpose(0, 2, 1, 3).reshape(B, Lq, self.d_model)
            return dense("out_proj")(out), None

        bf16_fast_path = (
            not need_weights
            and self.dtype is not None
            and jnp.dtype(self.dtype) == jnp.bfloat16
        )
        if bf16_fast_path:
            # keep the (B, H, Lq, Lk) logits in bf16 (halves the dominant
            # HBM traffic of these attention blocks; measured ~17% faster at
            # SVOL shapes, max output deviation ~4e-3). The max-subtraction
            # and the normalizing sum stay in f32 for stability. Weights
            # returned to callers always use the exact f32 softmax below.
            # NOTE: active in eval too, so scores can drift ~4e-3 vs an f32
            # run of the same checkpoint; bit-reproducible metric runs should
            # pass --compute_dtype float32 (README "Accuracy parity").
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", q * (head_dim**-0.5), k,
                preferred_element_type=jnp.bfloat16,
            )
            if key_padding_mask is not None:
                logits = jnp.where(
                    key_padding_mask[:, None, None, :],
                    jnp.finfo(jnp.bfloat16).min, logits,
                )
            m = jax.lax.stop_gradient(
                logits.max(axis=-1, keepdims=True).astype(jnp.float32)
            )
            e = jnp.exp((logits.astype(jnp.float32) - m).astype(jnp.bfloat16))
            denom = e.sum(axis=-1, keepdims=True, dtype=jnp.float32)
            weights = (e / denom.astype(jnp.bfloat16)).astype(self.dtype)
        else:
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", q * (head_dim**-0.5), k,
                preferred_element_type=jnp.float32,
            )
            if key_padding_mask is not None:
                neg = jnp.finfo(jnp.float32).min
                logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
            weights = nn.softmax(logits.astype(jnp.float32), axis=-1)
            if self.dtype is not None:
                weights = weights.astype(self.dtype)
        if self.dropout > 0.0 and not deterministic:
            weights = nn.Dropout(rate=self.dropout)(weights, deterministic=False)

        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, self.d_model)
        out = dense("out_proj")(out)

        if not need_weights:
            # skipping the head-average lets XLA avoid materializing the
            # (B, H, Lq, Lk) weights as a program output — on SVOL shapes
            # (L = 1568) that tensor dominates head runtime
            return out, None
        avg_weights = weights.mean(axis=1)  # (B, Lq, Lk) — torch default
        return out, avg_weights


class GatedSketchVideoAttention(nn.Module):
    """Block 1 of the cross-modal layer: attention-weights-as-gate.

    Owns the q/k projection parameters (same tree layout as
    AttentionWeightsOnly for checkpoint interop) and dispatches between the
    XLA formulation and the fused Pallas kernel
    (svol_tpu/ops/pallas/gated_attention.py). Returns (att1 (B, 1, L),
    gated (B, L, D)) where gated = att1^T * mem (residual added by caller).
    """

    d_model: int
    num_heads: int
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, sketch: Array, k_input: Array, mem: Array):
        init = nn.initializers.xavier_uniform()
        wq = self.param("q_proj_kernel", init, (self.d_model, self.d_model))
        bq = self.param("q_proj_bias", nn.initializers.zeros, (self.d_model,))
        wk = self.param("k_proj_kernel", init, (self.d_model, self.d_model))
        bk = self.param("k_proj_bias", nn.initializers.zeros, (self.d_model,))

        from svol_tpu.ops.pallas.gated_attention import (
            gated_attention_reference,
            gated_cross_attention,
        )

        if self.use_pallas:
            g, gated = gated_cross_attention(
                sketch, k_input, mem, wq, bq, wk, bk, self.num_heads
            )
        else:
            g, gated = gated_attention_reference(
                sketch, k_input, mem, wq, bq, wk, bk, self.num_heads
            )
        return g[:, None, :], gated


class TransformerMLP(nn.Module):
    """ViT-style MLP: fc1 -> act -> fc2 (cross_modal_transformer.py:163-179)."""

    hidden_features: int
    out_features: int
    activation: str = "gelu"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(
            self.hidden_features,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="fc1",
        )(x)
        x = get_activation(self.activation)(x)
        x = nn.Dense(
            self.out_features,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="fc2",
        )(x)
        return x


class BoxHeadMLP(nn.Module):
    """DETR-style head MLP with ReLU between layers (svanet.py:144-156)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"layer{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


class LinearLayer(nn.Module):
    """LayerNorm -> Dropout -> Linear [-> ReLU] (svanet.py:159-181)."""

    out_dim: int
    layer_norm: bool = True
    dropout: float = 0.1
    relu: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        if self.layer_norm:
            x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)
        x = nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="linear")(x)
        if self.relu:
            x = nn.relu(x)
        return x


class InputProjection(nn.Module):
    """Stack of n LinearLayers projecting backbone features to hidden_dim
    (svanet.py:49-60: relu on all but the last projection layer)."""

    hidden_dim: int
    n_layers: int = 2
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        relu_flags = [True] * self.n_layers
        relu_flags[self.n_layers - 1] = False
        for i in range(self.n_layers):
            x = LinearLayer(
                out_dim=self.hidden_dim,
                layer_norm=True,
                dropout=self.dropout,
                relu=relu_flags[i],
                dtype=self.dtype,
                name=f"proj{i}",
            )(x, deterministic=deterministic)
        return x
