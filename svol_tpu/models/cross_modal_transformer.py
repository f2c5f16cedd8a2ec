"""Cross-modal transformer — SVOL's core architecture, rebuilt batch-first.

Per layer (reference math at lib/modeling/cross_modal_transformer.py:105-160):
  1. sketch->video cross-attention where the single sketch token queries the
     video sequence and the *attention weights* (head-averaged) gate the video
     features: ``mem = LN(src_vid + att1 * src_vid)``  (:122-127).
     The attention output itself is discarded — only q/k projections matter.
  2. video self-attention + residual + LN, then MLP + residual + LN (:137-143).
     NB: no key-padding mask here, faithfully matching the reference.
  3. query-token self-attention + residual + LN (:145-149).
  4. token->content cross-attention with the video key-padding mask, residual
     + LN, then MLP + residual + LN (:151-158).

The decoder state starts at zeros (:56) and is refined across layers; all
per-layer outputs and the four attention maps are returned (:75-81).

TPU notes: everything is batch-first (B, L, D) — no torch-style seq-first
transposes; layers are materialized as separate Flax submodules (shapes are
static, XLA fuses the small matmuls; a lax.scan over stacked params is not
worth it at num_layers=2). The optional Pallas path fuses block 1's
weights-as-gate pattern, which flash-attention kernels cannot produce since
they never materialize attention weights.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from svol_tpu.models.layers import (
    LN_EPS,
    GatedSketchVideoAttention,
    MultiheadAttention,
    TransformerMLP,
)


class CrossModalTransformerLayer(nn.Module):
    d_model: int = 256
    nhead: int = 8
    dim_feedforward: int = 2048
    activation: str = "gelu"
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False
    use_flash: bool = False
    flash_int8: bool = False
    # Mixture-of-Experts FFN (models/moe.py): >1 replaces both dense MLPs
    # with Switch-routed expert MLPs, shardable over the 'expert' mesh axis.
    moe_experts: int = 0
    moe_capacity_factor: float = 1.25

    def _mlp(self, name: str) -> nn.Module:
        if self.moe_experts > 1:
            from svol_tpu.models.moe import MoEMLP

            return MoEMLP(
                num_experts=self.moe_experts,
                hidden_features=self.dim_feedforward,
                out_features=self.d_model,
                capacity_factor=self.moe_capacity_factor,
                activation=self.activation,
                dtype=self.dtype,
                name=name,
            )
        return TransformerMLP(
            hidden_features=self.dim_feedforward, out_features=self.d_model,
            activation=self.activation, dtype=self.dtype, name=name,
        )

    @nn.compact
    def __call__(
        self,
        mem: Array,  # (B, L, D) video stream
        src_skch: Array,  # (B, 1, D)
        out: Array,  # (B, Q, D) query stream
        vid_pad_mask: Array,  # (B, L) True = padded
        vid_pos: Array,  # (B, L, D)
        query_pos: Array,  # (B, Q, D)
        deterministic: bool = True,
        need_weights: bool = False,
    ):
        from svol_tpu.parallel.mesh import shard_video_tokens

        ln = lambda name: nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name=name)

        # --- (1) sketch->video gate -------------------------------------
        att1, gated = GatedSketchVideoAttention(
            d_model=self.d_model, num_heads=self.nhead, dtype=self.dtype,
            use_pallas=self.use_pallas, name="sketch_video_cross_attn",
        )(src_skch, mem + vid_pos, mem)  # att1 (B,1,L), gated (B,L,D)
        # keep the video stream token-sharded over 'seq' through the layer
        # (no-op off-mesh): the self-attention below then partitions as
        # sharded-Q/gathered-KV with (L, L/seq)-sharded logits per device
        mem = shard_video_tokens(ln("norm1")(mem + gated))

        # --- (2) video self-attention + MLP ------------------------------
        qk = mem + vid_pos
        attn_out, att2 = MultiheadAttention(
            d_model=self.d_model, num_heads=self.nhead, dtype=self.dtype,
            use_flash=self.use_flash, flash_int8=self.flash_int8,
            name="content_self_attn",
        )(qk, qk, mem, deterministic=deterministic, need_weights=need_weights)
        mem = ln("norm2")(attn_out + mem)
        mem = shard_video_tokens(ln("norm3")(mem + self._mlp("mlp1")(mem)))

        # --- (3) query-token self-attention ------------------------------
        qk = out + query_pos
        attn_out, att3 = MultiheadAttention(
            d_model=self.d_model, num_heads=self.nhead, dtype=self.dtype,
            use_flash=self.use_flash, flash_int8=self.flash_int8,
            name="token_self_attn",
        )(qk, qk, out, deterministic=deterministic, need_weights=need_weights)
        out = ln("norm4")(attn_out + out)

        # --- (4) token->content cross-attention + MLP ---------------------
        attn_out, att4 = MultiheadAttention(
            d_model=self.d_model, num_heads=self.nhead, dtype=self.dtype,
            name="content_token_cross_attn",
        )(out + query_pos, mem + vid_pos, mem,
          key_padding_mask=vid_pad_mask, deterministic=deterministic,
          need_weights=need_weights)
        out = ln("norm5")(out + attn_out)
        out = ln("norm6")(out + self._mlp("mlp2")(out))

        return mem, out, att1, att2, att3, att4


class CrossModalTransformer(nn.Module):
    """Stack of CrossModalTransformerLayers (cross_modal_transformer.py:9-81).

    Returns (outputs, att1, att2, att3, att4) where outputs is
    (num_layers, B, Q, D) — the per-layer query states feeding SVANet's aux
    losses — and att_i are the stacked per-layer attention maps.
    """

    d_model: int = 256
    nhead: int = 8
    num_layers: int = 2
    dim_feedforward: int = 2048
    activation: str = "gelu"
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False
    use_flash: bool = False
    flash_int8: bool = False
    # MoE FFN (models/moe.py); incompatible with pipeline (config.validate)
    moe_experts: int = 0
    moe_capacity_factor: float = 1.25
    # GPipe pipeline parallelism (parallel/pipeline.py): stack the layers
    # into one vmapped submodule ("layers", stage axis shardable over the
    # mesh's 'pipe' axis) and rotate microbatches through the stages.
    # Changes the parameter tree layout (transformer/layers vs
    # transformer/layer{i}); pipeline.stack_transformer_layers converts.
    pipeline: bool = False
    pp_microbatches: int = 0  # 0 = num_layers (minimum that fills stages)
    # rematerialize each layer's activations in the backward pass
    # (nn.remat): attention logits/weights and MLP hiddens recompute from
    # the layer inputs instead of living in HBM across the whole backward.
    # Math- and param-tree-identical (tests/test_remat.py).
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        src_vid: Array,  # (B, L, D)
        src_skch: Array,  # (B, 1, D)
        vid_pad_mask: Array,  # (B, L) True = padded
        vid_pos: Array,  # (B, L, D)
        query_embed: Array,  # (Q, D) learned queries
        deterministic: bool = True,
        need_weights: bool = False,
    ):
        B = src_vid.shape[0]
        query_pos = jnp.broadcast_to(
            query_embed[None], (B,) + query_embed.shape
        ).astype(src_vid.dtype)
        out = jnp.zeros_like(query_pos)  # decoder state starts at zeros (:56)
        mem = src_vid

        if self.pipeline:
            return self._pipelined(
                mem, src_skch, out, vid_pad_mask, vid_pos, query_pos,
                deterministic, need_weights,
            )

        outputs, a1s, a2s, a3s, a4s = [], [], [], [], []
        for i in range(self.num_layers):
            layer = CrossModalTransformerLayer(
                d_model=self.d_model,
                nhead=self.nhead,
                dim_feedforward=self.dim_feedforward,
                activation=self.activation,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                use_flash=self.use_flash,
                flash_int8=self.flash_int8,
                moe_experts=self.moe_experts,
                moe_capacity_factor=self.moe_capacity_factor,
                name=f"layer{i}",
            )
            if self.remat:
                mem, out, a1, a2, a3, a4 = nn.remat(
                    lambda m, *a: m(*a, deterministic=deterministic,
                                    need_weights=need_weights)
                )(layer, mem, src_skch, out, vid_pad_mask, vid_pos, query_pos)
            else:
                mem, out, a1, a2, a3, a4 = layer(
                    mem, src_skch, out, vid_pad_mask, vid_pos, query_pos,
                    deterministic=deterministic, need_weights=need_weights)
            outputs.append(out)
            a1s.append(a1)
            a2s.append(a2)
            a3s.append(a3)
            a4s.append(a4)

        stack = lambda xs: jnp.stack(xs) if xs[0] is not None else None
        return (
            jnp.stack(outputs),  # (layers, B, Q, D)
            stack(a1s),  # (layers, B, 1, L) — always produced (it's the gate)
            stack(a2s),  # (layers, B, L, L) — only when need_weights
            stack(a3s),  # (layers, B, Q, Q)
            stack(a4s),  # (layers, B, Q, L)
        )

    def _pipelined(
        self, mem, src_skch, out, vid_pad_mask, vid_pos, query_pos,
        deterministic, need_weights,
    ):
        """GPipe schedule over the layer stack (parallel/pipeline.py docs).

        One vmapped layer call per tick computes every stage in parallel
        (XLA partitions the stage axis over the mesh's 'pipe' axis); the
        (S, mb, ...) buffers shift one stage per tick via jnp.roll — a
        collective-permute when the stage axis is sharded. The schedule is
        unrolled (M, S are small static ints), so collecting stage s's
        tick-(m+s) output — microbatch m's layer-s state, which feeds
        SVANet's aux losses exactly like the sequential branch — is pure
        Python indexing. Numerically identical to the sequential stack:
        microbatching only re-orders a computation whose examples never
        interact inside the transformer (tests/test_pipeline_parallel.py).
        """
        from svol_tpu.parallel.mesh import shard_pipeline_stages
        from svol_tpu.parallel.pipeline import (
            microbatch_merge,
            microbatch_split,
        )

        S = self.num_layers
        M = self.pp_microbatches or S

        layer_cls = CrossModalTransformerLayer
        if self.remat:
            # remat each stage tick; the two trailing bools are static
            # (argnums count the bound module as 0)
            layer_cls = nn.remat(CrossModalTransformerLayer,
                                 static_argnums=(7, 8))
        StagedLayers = nn.vmap(
            layer_cls,
            in_axes=(0, 0, 0, 0, 0, 0, None, None),
            out_axes=0,
            variable_axes={"params": 0},  # stacked (S, ...) parameters
            split_rngs={"params": True},
        )
        staged = StagedLayers(
            d_model=self.d_model,
            nhead=self.nhead,
            dim_feedforward=self.dim_feedforward,
            activation=self.activation,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            use_flash=self.use_flash,
            flash_int8=self.flash_int8,
            name="layers",
        )

        # (M, mb, ...) microbatch views; `out` is injected as zeros (the
        # decoder state starts at zeros), so only its shape matters.
        inputs = {
            "mem": microbatch_split(mem, M),
            "skch": microbatch_split(src_skch, M),
            "out": microbatch_split(out, M),
            "mask": microbatch_split(vid_pad_mask, M),
            "pos": microbatch_split(vid_pos, M),
            "qpos": microbatch_split(query_pos, M),
        }
        # (S, mb, ...) rotating stage buffers, initially empty
        bufs = {
            k: jnp.zeros((S,) + v.shape[1:], v.dtype) for k, v in inputs.items()
        }

        hist = []
        for t in range(M + S - 1):
            # shift every stream one stage down and feed microbatch t (or a
            # dead zero slot once the injection phase is over) into stage 0
            for k in bufs:
                inj = (
                    inputs[k][t] if t < M else jnp.zeros_like(inputs[k][0])
                )
                bufs[k] = shard_pipeline_stages(
                    jnp.roll(bufs[k], 1, axis=0).at[0].set(inj)
                )
            mem_b, out_b, a1, a2, a3, a4 = staged(
                bufs["mem"], bufs["skch"], bufs["out"], bufs["mask"],
                bufs["pos"], bufs["qpos"], deterministic, need_weights,
            )
            bufs["mem"] = shard_pipeline_stages(mem_b)
            bufs["out"] = shard_pipeline_stages(out_b)
            hist.append((out_b, a1, a2, a3, a4))

        def collect(idx: int):
            """Per-layer results: stage s produced microbatch m's layer-s
            output at tick m + s."""
            if hist[0][idx] is None:
                return None
            per_layer = []
            for s in range(S):
                mbs = jnp.stack([hist[m + s][idx][s] for m in range(M)])
                per_layer.append(microbatch_merge(mbs))
            return jnp.stack(per_layer)  # (layers, B, ...)

        return tuple(collect(i) for i in range(5))
