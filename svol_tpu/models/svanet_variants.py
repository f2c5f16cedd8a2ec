"""SVANet fusion-ablation variants (port of lib/modeling/svanet_variants.py).

Three alternate sketch-video fusion modes over the vanilla DETR transformer
(the paper's ablations; the reference file is dead code — its import is
commented out at model.py:5 and it needs undefined config fields — but the
capability is preserved here behind ``--sketch_head svanet_variant``):

  * ``concat_to_seq``: sketch feature broadcast along the video sequence and
    channel-concatenated, joint projection (svanet_variants.py:86-135)
  * ``append_to_seq``: projected sketch token prepended to the projected
    video sequence (svanet_variants.py:137-190)
  * ``concat_to_qry``: sketch concatenated into every learned query
    (svanet_variants.py:192-247)
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from svol_tpu.models.layers import BoxHeadMLP, InputProjection
from svol_tpu.models.positional import make_position_embedding
from svol_tpu.models.transformer import Transformer


class SVANetVariant(nn.Module):
    mode: str = "concat_to_seq"
    input_vid_dim: int = 512
    input_skch_dim: int = 512
    hidden_dim: int = 256
    nheads: int = 8
    enc_layers: int = 2
    dec_layers: int = 2
    num_queries: int = 320
    dim_feedforward: int = 1024
    dropout: float = 0.1
    input_dropout: float = 0.4
    n_input_proj: int = 2
    pre_norm: bool = False
    aux_loss: bool = True
    use_sketch_pos: bool = True
    num_classes: int = 2
    sketch_position_embedding: str = "sine"
    video_position_embedding: str = "sine"
    dtype: Optional[jnp.dtype] = None
    use_flash: bool = False

    @nn.compact
    def __call__(
        self,
        src_sketch: Array,  # (B, 1, D_skch)
        src_sketch_mask: Array,  # (B, 1)
        src_video: Array,  # (B, L, D_vid)
        src_video_mask: Array,  # (B, L)
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        B, L, _ = src_video.shape
        det = deterministic
        proj = lambda name: InputProjection(
            hidden_dim=self.hidden_dim, n_layers=self.n_input_proj,
            dropout=self.input_dropout, dtype=self.dtype, name=name,
        )
        vid_pos_embed = make_position_embedding(
            self.video_position_embedding, self.hidden_dim, L,
            self.input_dropout, dtype=self.dtype, name="video_position_embed",
        )
        query_embed = self.param(
            "query_embed", nn.initializers.normal(stddev=1.0),
            (self.num_queries, self.hidden_dim),
        )

        vid_valid = src_video_mask.astype(bool)

        if self.mode == "concat_to_seq":
            sk = jnp.broadcast_to(src_sketch, (B, L, src_sketch.shape[-1]))
            src = proj("input_proj")(
                jnp.concatenate([sk, src_video], axis=-1), deterministic=det
            )
            pad_mask = ~vid_valid
            pos = vid_pos_embed(src, vid_valid)
            queries = query_embed
        elif self.mode == "append_to_seq":
            sk = proj("input_sketch_proj")(src_sketch, deterministic=det)
            vid = proj("input_video_proj")(src_video, deterministic=det)
            sk_valid = src_sketch_mask.astype(bool)
            if self.use_sketch_pos:
                sk_pos = make_position_embedding(
                    self.sketch_position_embedding, self.hidden_dim, 1,
                    self.input_dropout, dtype=self.dtype,
                    name="sketch_position_embed",
                )(sk, sk_valid)
            else:
                sk_pos = jnp.zeros_like(sk)
            src = jnp.concatenate([sk, vid], axis=1)
            pad_mask = ~jnp.concatenate([sk_valid, vid_valid], axis=1)
            pos = jnp.concatenate([sk_pos, vid_pos_embed(vid, vid_valid)], axis=1)
            queries = query_embed
        elif self.mode == "concat_to_qry":
            src = proj("input_video_proj")(src_video, deterministic=det)
            pad_mask = ~vid_valid
            pos = vid_pos_embed(src, vid_valid)
            sk = jnp.broadcast_to(
                src_sketch, (B, self.num_queries, src_sketch.shape[-1])
            )
            qe = jnp.broadcast_to(
                query_embed[None], (B, self.num_queries, self.hidden_dim)
            ).astype(sk.dtype)
            queries = proj("input_query_proj")(
                jnp.concatenate([qe, sk], axis=-1), deterministic=det
            )
        else:
            raise NotImplementedError(self.mode)

        hs, memory, att = Transformer(
            d_model=self.hidden_dim, nhead=self.nheads,
            num_encoder_layers=self.enc_layers,
            num_decoder_layers=self.dec_layers,
            dim_feedforward=self.dim_feedforward, dropout=self.dropout,
            normalize_before=self.pre_norm, dtype=self.dtype,
            use_flash=self.use_flash, name="transformer",
        )(src, pad_mask, queries, pos, deterministic=det)

        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="class_embed")(hs)
        boxes = nn.sigmoid(
            BoxHeadMLP(hidden_dim=self.hidden_dim, output_dim=4, num_layers=3,
                       dtype=self.dtype, name="bbox_embed")(hs)
        )
        out: Dict[str, Any] = {
            "pred_logits": logits[-1],
            "pred_boxes": boxes[-1],
            "attention_maps": {"decoder_cross_att": att},
        }
        if self.aux_loss and logits.shape[0] > 1:
            out["aux_logits"] = logits[:-1]
            out["aux_boxes"] = boxes[:-1]
        return out
