"""Video + sketch feature backbones (port of lib/modeling/backbone.py).

ResNet path (default in every reference recipe, train_quickdraw.sh:28):
  * sketch -> ResNet-18 with global pool -> one 512-d vector   (backbone.py:135)
  * video  -> ResNet-34 without pool -> per-frame 7x7x512 map  (backbone.py:137)
    flattened to (B, T*49, 512) in (t, h, w) order              (backbone.py:81-88)

ViT path: ViT-B/16 per frame & sketch, CLS token of the normalized final
hidden state (backbone.py:11-62). The reference loops frame-by-frame on host
(and has an undefined-``device`` bug, backbone.py:32,50); here the whole
(B*T) frame batch is one batched forward — the MXU-friendly formulation.

All images arrive as (… , H, W, 3) float32 in [0, 1] (the reference applies
only ToTensor, no ImageNet normalization — svol_dataset.py:218-229). The ViT
path additionally applies the (x - 0.5) / 0.5 scaling that
ViTFeatureExtractor would perform.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from svol_tpu.models.resnet import resnet18, resnet34, resnet50
from svol_tpu.models.vit import vit_base_patch16


class ResNetBackbone(nn.Module):
    video_arch: str = "resnet34"
    sketch_arch: str = "resnet18"
    dtype: Optional[jnp.dtype] = None
    stem: str = "conv7"  # or 'space_to_depth' (models/resnet.py)
    quantize: Optional[str] = None  # int8 inference convs (ops/quant.py)
    remat: bool = False  # per-block activation remat (models/resnet.py)

    @nn.compact
    def __call__(
        self,
        sketch: Array,  # (B, 1, H, W, 3)
        video: Array,  # (B, T, H, W, 3)
        train: bool = False,
        sketch_scale: float = 1.0,  # folded into the stem conv kernel
        video_scale: float = 1.0,  # (uint8 /255 for free — models/resnet.py)
    ) -> Tuple[Array, Array]:
        make = {"resnet18": resnet18, "resnet34": resnet34, "resnet50": resnet50}

        skch_net = make[self.sketch_arch](include_pool=True, dtype=self.dtype,
                                          stem=self.stem, quantize=self.quantize,
                                          remat=self.remat,
                                          name="sketch_backbone")
        vid_net = make[self.video_arch](include_pool=False, dtype=self.dtype,
                                        stem=self.stem, quantize=self.quantize,
                                        remat=self.remat,
                                        name="video_backbone")

        B, T = video.shape[0], video.shape[1]
        src_sketch = skch_net(sketch[:, 0], train=train,
                              input_scale=sketch_scale)[:, None, :]  # (B, 1, C)

        frames = video.reshape((B * T,) + video.shape[2:])
        fmap = vid_net(frames, train=train, input_scale=video_scale)  # (B*T, h, w, C)
        h, w, c = fmap.shape[1:]
        # (t, h, w) token order — matches the reference flatten (backbone.py:86)
        src_video = fmap.reshape(B, T * h * w, c)
        return src_sketch, src_video


class ViTBackbone(nn.Module):
    norm_sketch_feats: bool = True
    remat: bool = False  # per-encoder-layer activation remat (models/vit.py)
    use_sketch_cls_token: bool = True
    norm_vid_feats: bool = True
    use_vid_cls_token: bool = True
    dtype: Optional[jnp.dtype] = None
    # fused flash attention in the ViT encoder layers (models/vit.py) —
    # driven by config.model.use_flash_attention like the head's attention
    use_flash: bool = False

    @nn.compact
    def __call__(
        self,
        sketch: Array,  # (B, 1, H, W, 3)
        video: Array,  # (B, T, H, W, 3)
        train: bool = False,
    ) -> Tuple[Array, Array]:
        # final-LN only over the CLS row when that is all the pick reads
        # (exact — LN is per-token; saves a full HBM pass per sub-backbone)
        s_cls_only = self.norm_sketch_feats and self.use_sketch_cls_token
        v_cls_only = self.norm_vid_feats and self.use_vid_cls_token
        vit_s = vit_base_patch16(dtype=self.dtype, remat=self.remat,
                                 use_flash=self.use_flash,
                                 final_ln_cls_only=s_cls_only,
                                 name="sketch_backbone")
        vit_v = vit_base_patch16(dtype=self.dtype, remat=self.remat,
                                 use_flash=self.use_flash,
                                 final_ln_cls_only=v_cls_only,
                                 name="video_backbone")

        scale = lambda x: (x - 0.5) / 0.5  # ViTFeatureExtractor normalize

        def pick(hidden, pre_ln, norm, use_cls):
            feats = hidden if norm else pre_ln
            return feats[:, 0, :] if use_cls else feats[:, 1:, :].mean(axis=1)

        s_hidden, s_pre = vit_s(scale(sketch[:, 0]), deterministic=not train)
        src_sketch = pick(s_hidden, s_pre, self.norm_sketch_feats,
                          self.use_sketch_cls_token)[:, None, :]  # (B, 1, D)

        B, T = video.shape[0], video.shape[1]
        frames = scale(video.reshape((B * T,) + video.shape[2:]))
        v_hidden, v_pre = vit_v(frames, deterministic=not train)
        per_frame = pick(v_hidden, v_pre, self.norm_vid_feats,
                         self.use_vid_cls_token)  # (B*T, D)
        src_video = per_frame.reshape(B, T, -1)
        return src_sketch, src_video


def backbone_feature_dims(backbone: str) -> Tuple[int, int]:
    """(input_vid_dim, input_skch_dim) the head should expect; mirrors the
    args mutation in the reference factory (backbone.py:124-125,140-141)."""
    if "vit" in backbone:
        return 768, 768
    if "resnet" in backbone:
        return 512, 512
    raise NotImplementedError(backbone)


def tokens_per_frame(backbone: str, image_size: int = 224) -> int:
    """Video sequence length per frame: 49 for the ResNet 7x7 map, 1 for the
    ViT CLS path — determines the mask repeat factor (model.py:22)."""
    if "vit" in backbone:
        return 1
    if "resnet" in backbone:
        return (image_size // 32) ** 2
    raise NotImplementedError(backbone)


def build_backbone(backbone: str, dtype=None, resnet_stem: str = "conv7",
                   quantize=None, remat: bool = False,
                   use_flash: bool = False) -> nn.Module:
    if "vit" in backbone:
        if quantize:
            raise NotImplementedError("--quantize supports ResNet backbones only")
        return ViTBackbone(dtype=dtype, remat=remat, use_flash=use_flash,
                           name="backbone")
    if "resnet" in backbone:
        return ResNetBackbone(dtype=dtype, stem=resnet_stem, quantize=quantize,
                              remat=remat, name="backbone")
    raise NotImplementedError(backbone)
