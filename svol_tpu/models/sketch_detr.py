"""SketchDETR baseline head (port of lib/modeling/sketch_detr.py).

Reimplementation of "sketch-guided object localization": per frame, a vanilla
DETR runs with the sketch feature concatenated into every query embedding
(sketch_detr.py:47-75; 100 queries per frame, sketch_detr.py:129).

TPU-first restructuring: the reference loops over frames in Python, running T
separate transformer calls per batch (sketch_detr.py:50). Here the frame axis
folds into the batch axis — one big (B*T)-batched transformer call, MXU-sized
— and outputs come back stacked as (B, T, Q', ...).

The reference's factory needs config fields that don't exist (args.mode /
args.feat_dim, sketch_detr.py:126-127) and its loss path asserts an
incompatible query count (matcher.py:56) — i.e. it is latently broken
upstream. This port defines the working semantics: each frame's queries match
that frame's targets (see SetCriterion's sketch_detr path).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from svol_tpu.models.layers import BoxHeadMLP, InputProjection
from svol_tpu.models.positional import make_position_embedding
from svol_tpu.models.transformer import Transformer


class SketchDETR(nn.Module):
    input_vid_dim: int = 512
    input_skch_dim: int = 512
    hidden_dim: int = 256
    nheads: int = 8
    enc_layers: int = 2
    dec_layers: int = 2
    num_queries_per_frame: int = 100  # sketch_detr.py:129
    dim_feedforward: int = 1024
    dropout: float = 0.1
    input_dropout: float = 0.1
    pre_norm: bool = False
    aux_loss: bool = True
    num_classes: int = 2
    video_position_embedding: str = "sine"
    dtype: Optional[jnp.dtype] = None
    use_flash: bool = False

    @nn.compact
    def __call__(
        self,
        src_sketch: Array,  # (B, 1, D_skch)
        src_sketch_mask: Array,  # (B, 1)
        src_video: Array,  # (B, L_vid, D_vid); L_vid = T * tokens_per_frame
        src_video_mask: Array,  # (B, L_vid)
        num_frames: Optional[int] = None,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        B, L, Dv = src_video.shape
        T = num_frames if num_frames is not None else L
        tok = L // T  # tokens per frame (1 for ViT, 49 for ResNet)
        Qf = self.num_queries_per_frame

        # fold frames into the batch: (B*T, tok, D)
        frames = src_video.reshape(B * T, tok, Dv)
        frame_mask = src_video_mask.reshape(B * T, tok).astype(bool)

        src = InputProjection(
            hidden_dim=self.hidden_dim, n_layers=2, dropout=self.input_dropout,
            dtype=self.dtype, name="input_video_proj",
        )(frames, deterministic=deterministic)
        pos = make_position_embedding(
            self.video_position_embedding, self.hidden_dim, tok,
            self.input_dropout, dtype=self.dtype, name="video_position_embed",
        )(src, frame_mask)

        # queries: learned embedding ++ sketch feature, projected
        # (sketch_detr.py:55-58)
        query_embed = self.param(
            "query_embed", nn.initializers.normal(stddev=1.0),
            (Qf, self.hidden_dim),
        )
        sk = jnp.repeat(src_sketch, T, axis=0)  # (B*T, 1, D_skch)
        sk = jnp.broadcast_to(sk, (B * T, Qf, sk.shape[-1]))
        qe = jnp.broadcast_to(
            query_embed[None], (B * T, Qf, self.hidden_dim)
        ).astype(sk.dtype)
        queries = jnp.concatenate([qe, sk], axis=-1)
        queries = InputProjection(
            hidden_dim=self.hidden_dim, n_layers=2, dropout=self.input_dropout,
            dtype=self.dtype, name="input_query_proj",
        )(queries, deterministic=deterministic)

        hs, _, _ = Transformer(
            d_model=self.hidden_dim, nhead=self.nheads,
            num_encoder_layers=self.enc_layers, num_decoder_layers=self.dec_layers,
            dim_feedforward=self.dim_feedforward, dropout=self.dropout,
            normalize_before=self.pre_norm, dtype=self.dtype,
            use_flash=self.use_flash, name="transformer",
        )(src, ~frame_mask, queries, pos, deterministic=deterministic)
        # hs: (layers, B*T, Qf, d)

        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="class_embed")(hs)
        boxes = nn.sigmoid(
            BoxHeadMLP(hidden_dim=self.hidden_dim, output_dim=4, num_layers=3,
                       dtype=self.dtype, name="bbox_embed")(hs)
        )
        n_layers = logits.shape[0]
        logits = logits.reshape(n_layers, B, T * Qf, self.num_classes)
        boxes = boxes.reshape(n_layers, B, T * Qf, 4)

        out: Dict[str, Any] = {
            "pred_logits": logits[-1],
            "pred_boxes": boxes[-1],
            "queries_per_frame": Qf,
        }
        if self.aux_loss and n_layers > 1:
            out["aux_logits"] = logits[:-1]
            out["aux_boxes"] = boxes[:-1]
        return out
