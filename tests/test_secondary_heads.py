"""SketchDETR + SVANet-variant heads and rectangular per-frame matching."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from svol_tpu.config import DataConfig, LossConfig, ModelConfig, SvolConfig
from svol_tpu.losses.criterion import build_criterion
from svol_tpu.losses.matcher import match_per_frame_rect
from svol_tpu.models import build_model

T, K, HID, IMG = 2, 3, 32, 64
QF = 7  # sketch_detr queries per frame (toy)


def np_giou(b1, b2):
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = a1[:, None] + a2[None, :] - inter
    lt2 = np.minimum(b1[:, None, :2], b2[None, :, :2])
    rb2 = np.maximum(b1[:, None, 2:], b2[None, :, 2:])
    wh2 = np.clip(rb2 - lt2, 0, None)
    area = wh2[..., 0] * wh2[..., 1]
    return inter / union - (area - union) / area


def cxcywh_to_xyxy(b):
    cx, cy, w, h = np.moveaxis(b, -1, 0)
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def test_rect_matching_matches_scipy(rng):
    B = 2
    logits = rng.normal(size=(B, T * QF, 2)).astype(np.float32)
    pred = rng.uniform(0.2, 0.7, size=(B, T * QF, 4)).astype(np.float32)
    boxes = np.zeros((B, T, K, 4), np.float32)
    valid = np.zeros((B, T, K), bool)
    for b in range(B):
        for t in range(T):
            n = rng.integers(0, K + 1)
            boxes[b, t, :n] = rng.uniform(0.3, 0.6, size=(n, 4))
            valid[b, t, :n] = True

    res = match_per_frame_rect(logits, pred, boxes, valid, queries_per_frame=QF,
                               cost_class=2.0, cost_bbox=5.0, cost_giou=1.0)
    got = set()
    for b in range(B):
        for t in range(T):
            for q in range(QF):
                if res.matched[b, t, q]:
                    got.add((b, t, q, int(res.tgt_index[b, t, q])))

    # reference: scipy rectangular LSAP per frame, queries x valid targets
    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    exp = set()
    prob = softmax(logits)
    for b in range(B):
        for t in range(T):
            n = valid[b, t].sum()
            if n == 0:
                continue
            p = pred[b, t * QF : (t + 1) * QF]
            g = boxes[b, t, :n]
            C = (
                5.0 * np.abs(p[:, None] - g[None]).sum(-1)
                + 1.0 * -np_giou(cxcywh_to_xyxy(p), cxcywh_to_xyxy(g))
                + 2.0 * -prob[b, t * QF : (t + 1) * QF, 0:1].repeat(n, 1)
            )
            r, c = linear_sum_assignment(C)
            exp |= {(b, t, int(i), int(j)) for i, j in zip(r, c)}
    assert got == exp


def make_inputs(rng, B=2):
    return dict(
        src_sketch=jnp.asarray(rng.uniform(size=(B, 1, IMG, IMG, 3)), jnp.float32),
        src_video=jnp.asarray(rng.uniform(size=(B, T, IMG, IMG, 3)), jnp.float32),
        src_sketch_mask=jnp.ones((B, 1), jnp.float32),
        src_video_mask=jnp.ones((B, T), jnp.float32),
    )


def make_cfg(head, **model_kw):
    return SvolConfig(
        data=DataConfig(num_frames=T, max_boxes_per_frame=K, image_size=IMG),
        model=ModelConfig(
            sketch_head=head, backbone="resnet", hidden_dim=HID, nheads=4,
            num_layers=2, num_queries=T * K, num_queries_per_frame=K,
            enc_layers=1, dec_layers=2, dim_feedforward=64,
            cmt_dim_feedforward=64, sketch_detr_num_queries=QF,
            compute_dtype="float32", **model_kw,
        ),
    )


def test_sketch_detr_forward_and_loss(rng):
    cfg = make_cfg("sketch_detr")
    model = build_model(cfg)
    crit = build_criterion(cfg)
    inputs = make_inputs(rng)
    variables = model.init(jax.random.PRNGKey(0), **inputs)
    out = model.apply(variables, **inputs)
    assert out["pred_logits"].shape == (2, T * QF, 2)
    assert out["pred_boxes"].shape == (2, T * QF, 4)
    assert out["queries_per_frame"] == QF

    boxes = np.zeros((2, T, K, 4), np.float32)
    valid = np.zeros((2, T, K), bool)
    boxes[:, :, 0] = [0.5, 0.5, 0.2, 0.2]
    valid[:, :, 0] = True
    losses = crit(out, {"boxes": jnp.asarray(boxes), "box_valid": jnp.asarray(valid)})
    assert np.isfinite(float(losses["loss_overall"]))
    # exactly one match per frame -> matched count = B*T
    assert float(losses["loss_bbox"]) > 0


@pytest.mark.parametrize("mode", ["concat_to_seq", "append_to_seq", "concat_to_qry"])
def test_svanet_variants_forward(rng, mode):
    cfg = make_cfg("svanet_variant", variant_mode=mode)
    model = build_model(cfg)
    inputs = make_inputs(rng)
    variables = model.init(jax.random.PRNGKey(0), **inputs)
    out = model.apply(variables, **inputs)
    assert out["pred_logits"].shape == (2, T * K, 2)
    assert out["pred_boxes"].shape == (2, T * K, 4)
    b = np.asarray(out["pred_boxes"])
    assert (b >= 0).all() and (b <= 1).all()

    crit = build_criterion(cfg)
    boxes = np.zeros((2, T, K, 4), np.float32)
    valid = np.zeros((2, T, K), bool)
    boxes[:, :, 0] = [0.4, 0.4, 0.2, 0.3]
    valid[:, :, 0] = True
    losses = crit(out, {"boxes": jnp.asarray(boxes), "box_valid": jnp.asarray(valid)})
    assert np.isfinite(float(losses["loss_overall"]))


@pytest.mark.parametrize("head", ["sketch_detr", "svanet_variant"])
def test_flash_attention_equivalence_in_detr_heads(rng, head):
    """The DETR-transformer heads take the flash kernel on their unmasked
    self-attention blocks (--use_flash_attention); at f32 the fused path must
    reproduce the XLA formulation."""
    inputs = make_inputs(rng)
    model_x = build_model(make_cfg(head, use_flash_attention=False))
    model_f = build_model(make_cfg(head, use_flash_attention=True))
    variables = model_x.init(jax.random.PRNGKey(0), **inputs)
    out_x = model_x.apply(variables, **inputs)
    out_f = model_f.apply(variables, **inputs)
    for k in ("pred_logits", "pred_boxes"):
        np.testing.assert_allclose(np.asarray(out_f[k]), np.asarray(out_x[k]),
                                   atol=2e-5, rtol=2e-5)
