"""SVANet — DETR-style set-prediction head over the cross-modal transformer.

Port of lib/modeling/svanet.py:14-141:
  * 2-layer LayerNorm+Dropout+Linear input projections for video & sketch
    (svanet.py:51-60), sine positional embeddings (svanet.py:85-89),
  * ``num_queries`` learned query embeddings (svanet.py:48),
  * CrossModalTransformer core,
  * linear fg/bg class head + 3-layer MLP box head with sigmoid
    (svanet.py:42-46, 125-127),
  * per-decoder-layer auxiliary outputs (svanet.py:133-137).

Output is a dict of stacked arrays rather than a list of per-layer dicts —
``pred_logits``/``pred_boxes`` hold the last layer, ``aux_logits``/
``aux_boxes`` hold layers 0..n-2 as (n_aux, B, Q, ...) arrays so the aux loss
vmaps over them inside one jit.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from svol_tpu.models.cross_modal_transformer import CrossModalTransformer
from svol_tpu.models.layers import BoxHeadMLP, InputProjection
from svol_tpu.models.positional import make_position_embedding


class SVANet(nn.Module):
    input_vid_dim: int = 512
    input_skch_dim: int = 512
    hidden_dim: int = 256
    nheads: int = 8
    num_layers: int = 2
    num_queries: int = 320
    dim_feedforward: int = 2048
    input_dropout: float = 0.4
    aux_loss: bool = True
    use_sketch_pos: bool = True
    n_input_proj: int = 2
    num_classes: int = 2
    sketch_position_embedding: str = "sine"
    video_position_embedding: str = "sine"
    max_video_positions: int = 32 * 49
    max_sketch_positions: int = 1
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False
    use_flash: bool = False
    flash_int8: bool = False
    # MoE FFN in the cross-modal transformer (models/moe.py)
    moe_experts: int = 0
    moe_capacity_factor: float = 1.25
    # pipeline parallelism over the transformer layers (parallel/pipeline.py)
    pipeline: bool = False
    pp_microbatches: int = 0
    # per-layer activation remat in the transformer (--remat transformer/full)
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        src_sketch: Array,  # (B, L_skch, D_skch)
        src_sketch_mask: Array,  # (B, L_skch) 1 = valid
        src_video: Array,  # (B, L_vid, D_vid)
        src_video_mask: Array,  # (B, L_vid) 1 = valid
        deterministic: bool = True,
        return_attention: bool = False,
    ) -> Dict[str, Any]:
        vid = InputProjection(
            hidden_dim=self.hidden_dim, n_layers=self.n_input_proj,
            dropout=self.input_dropout, dtype=self.dtype, name="input_video_proj",
        )(src_video, deterministic=deterministic)
        skch = InputProjection(
            hidden_dim=self.hidden_dim, n_layers=self.n_input_proj,
            dropout=self.input_dropout, dtype=self.dtype, name="input_sketch_proj",
        )(src_sketch, deterministic=deterministic)

        vid_valid = src_video_mask.astype(bool)
        vid_pos = make_position_embedding(
            self.video_position_embedding, self.hidden_dim,
            self.max_video_positions, self.input_dropout, dtype=self.dtype,
            name="video_position_embed",
        )(vid, vid_valid)
        # Sketch positions are computed for parity but, like the reference's
        # transformer (cross_modal_transformer.py:105-160), never consumed:
        # the sketch token is a single query with no sequence structure.
        if self.use_sketch_pos and self.sketch_position_embedding != "sine":
            _ = make_position_embedding(
                self.sketch_position_embedding, self.hidden_dim,
                self.max_sketch_positions, self.input_dropout, dtype=self.dtype,
                name="sketch_position_embed",
            )(skch, src_sketch_mask.astype(bool))

        query_embed = self.param(
            "query_embed",
            nn.initializers.normal(stddev=1.0),  # torch nn.Embedding default
            (self.num_queries, self.hidden_dim),
        )

        hs, att1, att2, att3, att4 = CrossModalTransformer(
            d_model=self.hidden_dim,
            nhead=self.nheads,
            num_layers=self.num_layers,
            dim_feedforward=self.dim_feedforward,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            use_flash=self.use_flash,
            flash_int8=self.flash_int8,
            moe_experts=self.moe_experts,
            moe_capacity_factor=self.moe_capacity_factor,
            pipeline=self.pipeline,
            pp_microbatches=self.pp_microbatches,
            remat=self.remat,
            name="transformer",
        )(vid, skch, ~vid_valid, vid_pos, query_embed,
          deterministic=deterministic, need_weights=return_attention)

        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="class_embed")(hs)
        boxes = nn.sigmoid(
            BoxHeadMLP(
                hidden_dim=self.hidden_dim, output_dim=4, num_layers=3,
                dtype=self.dtype, name="bbox_embed",
            )(hs)
        )
        # (layers, B, Q, ...) -> last layer is the prediction, rest are aux
        out: Dict[str, Any] = {
            "pred_logits": logits[-1],
            "pred_boxes": boxes[-1],
        }
        if return_attention:
            # visualization-only; materializing (layers, B, L, L) maps costs
            # more device time than the rest of the head combined
            out["attention_maps"] = {
                "att1": att1, "att2": att2, "att3": att3, "att4": att4,
            }
        if self.aux_loss and self.num_layers > 1:
            out["aux_logits"] = logits[:-1]
            out["aux_boxes"] = boxes[:-1]
        return out
