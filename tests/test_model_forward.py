"""Forward-shape and jit smoke tests for the full model on tiny configs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svol_tpu.config import DataConfig, ModelConfig, SvolConfig
from svol_tpu.losses.criterion import build_criterion
from svol_tpu.models import build_model

T, K, HID = 2, 3, 32
Q = T * K
IMG = 64  # ResNet stride 32 -> 2x2 map -> 4 tokens/frame


def tiny_config(backbone="resnet", head="svanet", **model_kw):
    return SvolConfig(
        data=DataConfig(num_frames=T, max_boxes_per_frame=K, image_size=IMG),
        model=ModelConfig(
            backbone=backbone, sketch_head=head, hidden_dim=HID, nheads=4,
            num_layers=2, num_queries=Q, num_queries_per_frame=K,
            cmt_dim_feedforward=64, dim_feedforward=64,
            compute_dtype="float32", **model_kw,
        ),
    )


def make_inputs(rng, B=2, img=IMG):
    return dict(
        src_sketch=jnp.asarray(rng.uniform(size=(B, 1, img, img, 3)), jnp.float32),
        src_video=jnp.asarray(rng.uniform(size=(B, T, img, img, 3)), jnp.float32),
        src_sketch_mask=jnp.ones((B, 1), jnp.float32),
        src_video_mask=jnp.ones((B, T), jnp.float32),
    )


def test_resnet_svanet_forward_shapes(rng):
    cfg = tiny_config()
    model = build_model(cfg)
    inputs = make_inputs(rng)
    variables = model.init(jax.random.PRNGKey(0), **inputs)
    out = model.apply(variables, **inputs, return_attention=True)
    B = 2
    assert out["pred_logits"].shape == (B, Q, 2)
    assert out["pred_boxes"].shape == (B, Q, 4)
    assert out["aux_logits"].shape == (1, B, Q, 2)
    boxes = np.asarray(out["pred_boxes"])
    assert (boxes >= 0).all() and (boxes <= 1).all()  # sigmoid range
    # attention maps: 4 tokens/frame at 64px -> L = T*4 = 8
    assert out["attention_maps"]["att1"].shape == (2, B, 1, T * 4)
    assert out["attention_maps"]["att2"].shape == (2, B, T * 4, T * 4)
    # default path omits the maps entirely (hot-path memory saving)
    assert "attention_maps" not in model.apply(variables, **inputs)


def test_vit_svanet_forward_shapes(rng):
    cfg = tiny_config(backbone="vit")
    cfg.data.image_size = 32
    model = build_model(cfg)
    inputs = make_inputs(rng, img=32)
    variables = model.init(jax.random.PRNGKey(0), **inputs)
    out = model.apply(variables, **inputs, return_attention=True)
    assert out["pred_logits"].shape == (2, Q, 2)
    # ViT path: 1 token per frame
    assert out["attention_maps"]["att4"].shape == (2, 2, Q, T)


def test_forward_jits_and_matches_eager(rng):
    cfg = tiny_config()
    model = build_model(cfg)
    inputs = make_inputs(rng)
    variables = model.init(jax.random.PRNGKey(0), **inputs)

    eager = model.apply(variables, **inputs)
    jitted = jax.jit(lambda v, i: model.apply(v, **i))(variables, inputs)
    np.testing.assert_allclose(
        np.asarray(eager["pred_boxes"]), np.asarray(jitted["pred_boxes"]), atol=1e-5
    )


def test_model_plus_criterion_end_to_end(rng):
    cfg = tiny_config()
    model = build_model(cfg)
    crit = build_criterion(cfg)
    inputs = make_inputs(rng)
    variables = model.init(jax.random.PRNGKey(0), **inputs)

    B = 2
    boxes = np.zeros((B, T, K, 4), np.float32)
    valid = np.zeros((B, T, K), bool)
    boxes[:, :, 0] = [0.5, 0.5, 0.2, 0.2]
    valid[:, :, 0] = True

    @jax.jit
    def run(v):
        out = model.apply(v, **inputs)
        return crit(out, {"boxes": jnp.asarray(boxes), "box_valid": jnp.asarray(valid)})

    losses = run(variables)
    for k in ("loss_label", "loss_bbox", "loss_giou", "loss_overall",
              "loss_label_0", "loss_bbox_0"):
        assert np.isfinite(float(losses[k])), k


def test_padded_frames_are_background_only(rng):
    """Short-video padding: masked frames have no valid boxes; all their
    queries must be matched to background (svol_dataset.py:310-319 mask
    semantics)."""
    cfg = tiny_config()
    model = build_model(cfg)
    inputs = make_inputs(rng)
    # second frame padded
    inputs["src_video_mask"] = jnp.asarray([[1.0, 0.0]] * 2)
    variables = model.init(jax.random.PRNGKey(0), **inputs)
    out = model.apply(variables, **inputs)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()


def test_uint8_fold_matches_float_path(rng):
    """uint8 pixels skip the /255 normalization pass — the scale folds into
    the stem conv's kernel (conv is linear; models/resnet.py
    QuantizableConv.kernel_scale). The folded path must match feeding
    pre-divided float pixels to float32 rounding noise."""
    cfg = tiny_config()
    model = build_model(cfg)
    u8 = dict(
        src_sketch=np.asarray(rng.integers(0, 256, (2, 1, IMG, IMG, 3)), np.uint8),
        src_video=np.asarray(rng.integers(0, 256, (2, T, IMG, IMG, 3)), np.uint8),
        src_sketch_mask=np.ones((2, 1), np.float32),
        src_video_mask=np.ones((2, T), np.float32),
    )
    fl = dict(u8, src_sketch=u8["src_sketch"].astype(np.float32) / 255.0,
              src_video=u8["src_video"].astype(np.float32) / 255.0)
    variables = model.init(jax.random.PRNGKey(0), **fl)
    out_u8 = model.apply(variables, **u8)
    out_fl = model.apply(variables, **fl)
    np.testing.assert_allclose(np.asarray(out_u8["pred_boxes"]),
                               np.asarray(out_fl["pred_boxes"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_u8["pred_logits"]),
                               np.asarray(out_fl["pred_logits"]), atol=1e-4)


def test_vit_flash_attention_matches_einsum():
    """The fused flash kernel in the ViT encoder (models/vit.py use_flash)
    must be a pure drop-in: same params, same outputs as the einsum
    formulation (f32, interpret mode on CPU). VERDICT r4 Next #3 groundwork
    — the ViT path's attention is where flash applies at head_dim 64."""
    import jax
    import numpy as np

    from svol_tpu.models.vit import ViT

    kw = dict(hidden_size=64, num_layers=2, num_heads=4, mlp_dim=128,
              patch_size=16, image_size=32)
    vit_ein = ViT(**kw)
    vit_flash = ViT(use_flash=True, **kw)

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(3, 32, 32, 3)).astype(np.float32)
    params = vit_ein.init(jax.random.PRNGKey(0), x)
    h_ein, pre_ein = vit_ein.apply(params, x)
    h_flash, pre_flash = vit_flash.apply(params, x)  # same tree, no new params
    np.testing.assert_allclose(np.asarray(h_flash), np.asarray(h_ein),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(pre_flash), np.asarray(pre_ein),
                               atol=2e-5)


def test_vit_final_ln_cls_only_is_exact():
    """final_ln_cls_only normalizes just the CLS row — per-token LayerNorm
    makes that EXACTLY the [:, 0] slice of the full normalization (the dead
    196 rows were one full HBM pass per sub-backbone)."""
    import jax
    import numpy as np

    from svol_tpu.models.vit import ViT

    kw = dict(hidden_size=64, num_layers=2, num_heads=4, mlp_dim=128,
              patch_size=16, image_size=32)
    full = ViT(**kw)
    cls_only = ViT(final_ln_cls_only=True, **kw)

    rng = np.random.default_rng(1)
    x = rng.uniform(size=(3, 32, 32, 3)).astype(np.float32)
    params = full.init(jax.random.PRNGKey(0), x)  # same tree for both
    h_full, pre_full = full.apply(params, x)
    h_cls, pre_cls = cls_only.apply(params, x)
    assert h_cls.shape == (3, 1, 64)
    np.testing.assert_array_equal(np.asarray(h_cls[:, 0]),
                                  np.asarray(h_full[:, 0]))
    np.testing.assert_array_equal(np.asarray(pre_cls), np.asarray(pre_full))
