"""Top-level model: backbone + sketch head (port of lib/modeling/model.py).

The reference expands the (B, 1)/(B, T) input masks to token granularity with
repeat_interleave (model.py:21-22); here the same expansion happens with a
static repeat factor derived from the backbone type.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from svol_tpu.config import SvolConfig
from svol_tpu.models.backbone import (
    backbone_feature_dims,
    build_backbone,
    tokens_per_frame,
)
from svol_tpu.models.svanet import SVANet


class SketchLocalizationModel(nn.Module):
    config: SvolConfig

    def setup(self) -> None:
        cfg = self.config
        dtype = jnp.dtype(cfg.model.compute_dtype) if cfg.model.compute_dtype else None
        self.dtype = dtype
        self.backbone = build_backbone(
            cfg.model.backbone, dtype=dtype, resnet_stem=cfg.model.resnet_stem,
            quantize=cfg.model.quantize,
            remat=cfg.model.remat in ("backbone", "full"),
            use_flash=cfg.model.use_flash_attention,
        )
        vid_dim, skch_dim = backbone_feature_dims(cfg.model.backbone)
        self.tokens_per_frame = tokens_per_frame(cfg.model.backbone, cfg.data.image_size)

        if cfg.model.sketch_head == "svanet":
            self.head = SVANet(
                input_vid_dim=vid_dim,
                input_skch_dim=skch_dim,
                hidden_dim=cfg.model.hidden_dim,
                nheads=cfg.model.nheads,
                num_layers=cfg.model.num_layers,
                num_queries=cfg.model.num_queries,
                dim_feedforward=cfg.model.cmt_dim_feedforward,
                input_dropout=cfg.model.input_dropout,
                aux_loss=cfg.model.aux_loss,
                use_sketch_pos=cfg.model.use_sketch_pos,
                n_input_proj=cfg.model.n_input_proj,
                num_classes=cfg.model.num_classes,
                sketch_position_embedding=cfg.model.sketch_position_embedding,
                video_position_embedding=cfg.model.video_position_embedding,
                max_video_positions=cfg.data.num_frames * self.tokens_per_frame,
                max_sketch_positions=cfg.data.num_input_sketches,
                dtype=dtype,
                use_pallas=cfg.model.use_pallas_attention,
                use_flash=cfg.model.use_flash_attention,
                flash_int8=(cfg.model.quantize == "int8"
                            and cfg.model.quantize_attention),
                moe_experts=cfg.model.moe_experts,
                moe_capacity_factor=cfg.model.moe_capacity_factor,
                pipeline=cfg.train.pp_devices > 1,
                pp_microbatches=cfg.train.pp_microbatches,
                remat=cfg.model.remat in ("transformer", "full"),
                name="head",
            )
        elif cfg.model.sketch_head == "sketch_detr":
            from svol_tpu.models.sketch_detr import SketchDETR

            self.head = SketchDETR(
                input_vid_dim=vid_dim,
                input_skch_dim=skch_dim,
                hidden_dim=cfg.model.hidden_dim,
                nheads=cfg.model.nheads,
                enc_layers=cfg.model.enc_layers,
                dec_layers=cfg.model.dec_layers,
                num_queries_per_frame=cfg.model.sketch_detr_num_queries,
                dim_feedforward=cfg.model.dim_feedforward,
                dropout=cfg.model.dropout,
                input_dropout=cfg.model.input_dropout,
                pre_norm=cfg.model.pre_norm,
                aux_loss=cfg.model.aux_loss,
                dtype=dtype,
                use_flash=cfg.model.use_flash_attention,
                name="head",
            )
        elif cfg.model.sketch_head == "svanet_variant":
            from svol_tpu.models.svanet_variants import SVANetVariant

            self.head = SVANetVariant(
                mode=cfg.model.variant_mode,
                input_vid_dim=vid_dim,
                input_skch_dim=skch_dim,
                hidden_dim=cfg.model.hidden_dim,
                nheads=cfg.model.nheads,
                enc_layers=cfg.model.enc_layers,
                dec_layers=cfg.model.dec_layers,
                num_queries=cfg.model.num_queries,
                dim_feedforward=cfg.model.dim_feedforward,
                dropout=cfg.model.dropout,
                input_dropout=cfg.model.input_dropout,
                n_input_proj=cfg.model.n_input_proj,
                pre_norm=cfg.model.pre_norm,
                aux_loss=cfg.model.aux_loss,
                dtype=dtype,
                use_flash=cfg.model.use_flash_attention,
                name="head",
            )
        else:
            raise NotImplementedError(cfg.model.sketch_head)

    def __call__(
        self,
        src_sketch: Array,  # (B, 1, H, W, 3): uint8 pixels or floats in [0, 1]
        src_video: Array,  # (B, T, H, W, 3): uint8 pixels or floats in [0, 1]
        src_sketch_mask: Array,  # (B, 1) 1 = valid
        src_video_mask: Array,  # (B, T) 1 = valid
        train: bool = False,
        return_attention: bool = False,
    ) -> Dict[str, Any]:
        # pixels travel host->device as uint8 (4x less transfer than f32);
        # normalization to [0, 1] happens here, on device. For the ResNet
        # backbone the /255 FOLDS INTO the stem conv's kernel (conv is
        # linear: conv(x/255, k) == conv(x, k/255)) — the division was a
        # full HBM read+write pass over the pixel tensor (0.9 ms/train-step,
        # scripts/profile_train.py 'div'); scaling the (7,7,3,64) kernel is
        # free. ViT normalizes inside its own wrapper, so it keeps the
        # explicit division.
        f = self.dtype or jnp.float32
        fold = self.config.model.backbone == "resnet"
        video_scale = sketch_scale = 1.0
        if jnp.issubdtype(src_video.dtype, jnp.integer):
            src_video = src_video.astype(f)
            if fold:
                video_scale = 1.0 / 255.0
            else:
                src_video = src_video / 255.0
        if jnp.issubdtype(src_sketch.dtype, jnp.integer):
            src_sketch = src_sketch.astype(f)
            if fold:
                sketch_scale = 1.0 / 255.0
            else:
                src_sketch = src_sketch / 255.0

        if fold:
            feat_sketch, feat_video = self.backbone(
                src_sketch, src_video, train=train,
                sketch_scale=sketch_scale, video_scale=video_scale)
        else:
            feat_sketch, feat_video = self.backbone(src_sketch, src_video,
                                                    train=train)

        # sequence parallelism: keep the video token axis sharded over the
        # active mesh's 'seq' axis into the head (no-op off-mesh) — the conv
        # trunk above is frame-independent (zero-comm), and this constraint
        # lets XLA partition the head's video self-attention too
        from svol_tpu.parallel.mesh import shard_video_tokens

        feat_video = shard_video_tokens(feat_video)

        L_sketch = feat_sketch.shape[1]
        rep = feat_video.shape[1] // src_video.shape[1]  # tokens per frame
        sketch_mask = jnp.repeat(src_sketch_mask, L_sketch, axis=1)
        video_mask = jnp.repeat(src_video_mask, rep, axis=1)

        kwargs = {}
        if self.config.model.sketch_head == "sketch_detr":
            kwargs["num_frames"] = src_video.shape[1]
        elif self.config.model.sketch_head == "svanet":
            kwargs["return_attention"] = return_attention
        return self.head(
            feat_sketch, sketch_mask, feat_video, video_mask,
            deterministic=not train, **kwargs,
        )


def build_model(config: SvolConfig) -> SketchLocalizationModel:
    return SketchLocalizationModel(config=config)
