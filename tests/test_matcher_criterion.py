"""Matcher/criterion golden tests vs reference semantics.

The reference path (lib/modeling/matcher.py + loss.py) works on ragged
list-of-dict targets with scipy LSAP per frame. Here we rebuild that exact
computation in numpy/scipy on ragged data, then check our dense static-shape
versions produce identical matches and loss values.
"""
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from svol_tpu.config import DataConfig, LossConfig, ModelConfig, SvolConfig, TrainConfig
from svol_tpu.losses.criterion import SetCriterion
from svol_tpu.losses.matcher import match_per_frame

B, T, K = 2, 4, 5  # batch, frames, queries-per-frame
Q = T * K
COST_CLASS, COST_BBOX, COST_GIOU = 2.0, 5.0, 1.0
EOS = 0.1


def softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def cxcywh_to_xyxy(b):
    cx, cy, w, h = np.moveaxis(b, -1, 0)
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def np_giou(b1, b2):
    """Reference generalized_box_iou (box_utils.py:40-61)."""
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = a1[:, None] + a2[None, :] - inter
    iou = inter / union
    lt2 = np.minimum(b1[:, None, :2], b2[None, :, :2])
    rb2 = np.maximum(b1[:, None, 2:], b2[None, :, 2:])
    wh2 = np.clip(rb2 - lt2, 0, None)
    area = wh2[..., 0] * wh2[..., 1]
    return iou - (area - union) / area


def random_problem(rng, empty_frames=True):
    logits = rng.normal(size=(B, Q, 2)).astype(np.float32)
    pred = rng.uniform(0.2, 0.8, size=(B, Q, 4)).astype(np.float32)
    pred[..., 2:] = rng.uniform(0.05, 0.2, size=(B, Q, 2))

    n_boxes = rng.integers(0 if empty_frames else 1, K + 1, size=(B, T))
    if empty_frames:
        n_boxes[0, 1] = 0  # force an empty frame
    boxes = np.zeros((B, T, K, 4), np.float32)
    valid = np.zeros((B, T, K), bool)
    for b in range(B):
        for t in range(T):
            n = n_boxes[b, t]
            cxy = rng.uniform(0.3, 0.7, size=(n, 2))
            wh = rng.uniform(0.05, 0.3, size=(n, 2))
            boxes[b, t, :n] = np.concatenate([cxy, wh], -1)
            valid[b, t, :n] = True
    return logits, pred, boxes, valid


def reference_match(logits, pred, boxes, valid):
    """Per-frame scipy matching exactly as matcher.py:59-96 (foreground=0)."""
    pairs = set()
    prob = softmax(logits)
    for b in range(B):
        for t in range(T):
            n = valid[b, t].sum()
            if n == 0:
                continue
            p = pred[b, t * K : (t + 1) * K]
            g = boxes[b, t, :n]
            c_class = -prob[b, t * K : (t + 1) * K, 0:1].repeat(n, 1)
            c_bbox = np.abs(p[:, None] - g[None]).sum(-1)
            c_giou = -np_giou(cxcywh_to_xyxy(p), cxcywh_to_xyxy(g))
            C = COST_BBOX * c_bbox + COST_GIOU * c_giou + COST_CLASS * c_class
            r, c = linear_sum_assignment(C)
            for i, j in zip(r, c):
                pairs.add((b, t, int(i), int(j)))
    return pairs


def test_match_per_frame_equals_scipy(rng):
    logits, pred, boxes, valid = random_problem(rng)
    res = match_per_frame(logits, pred, boxes, valid,
                          cost_class=COST_CLASS, cost_bbox=COST_BBOX,
                          cost_giou=COST_GIOU)
    got = set()
    assign = np.asarray(res.tgt_index)
    matched = np.asarray(res.matched)
    for b in range(B):
        for t in range(T):
            for i in range(K):
                if matched[b, t, i]:
                    got.add((b, t, i, int(assign[b, t, i])))
    assert got == reference_match(logits, pred, boxes, valid)


def reference_losses(logits, pred, boxes, valid, pairs):
    """loss.py:39-103 semantics on the ragged matching."""
    # labels
    tgt_cls = np.ones((B, Q), np.int64)  # background
    for b, t, i, j in pairs:
        tgt_cls[b, t * K + i] = 0
    logp = np.log(softmax(logits))
    nll = -np.take_along_axis(logp, tgt_cls[..., None], -1)[..., 0]
    w = np.where(tgt_cls == 0, 1.0, EOS)
    loss_label = (w * nll).mean()

    # boxes
    src, tgt = [], []
    for b, t, i, j in sorted(pairs):
        src.append(pred[b, t * K + i])
        tgt.append(boxes[b, t, j])
    src, tgt = np.array(src), np.array(tgt)
    loss_bbox = np.abs(src - tgt).mean()
    giou_diag = np.diag(np_giou(cxcywh_to_xyxy(src), cxcywh_to_xyxy(tgt)))
    loss_giou = (1 - giou_diag).mean()
    return loss_label, loss_bbox, loss_giou


def make_criterion():
    cfg = SvolConfig(
        data=DataConfig(num_frames=T, max_boxes_per_frame=K),
        model=ModelConfig(num_queries=Q, num_queries_per_frame=K, num_layers=2),
        loss=LossConfig(set_cost_class=COST_CLASS, set_cost_bbox=COST_BBOX,
                        set_cost_giou=COST_GIOU, eos_coef=EOS),
    )
    return SetCriterion(cfg)


def test_criterion_matches_reference_losses(rng):
    logits, pred, boxes, valid = random_problem(rng)
    crit = make_criterion()
    out = {"pred_logits": logits, "pred_boxes": pred}
    tgt = {"boxes": boxes, "box_valid": valid}
    losses = {k: float(v) for k, v in crit(out, tgt).items()}

    pairs = reference_match(logits, pred, boxes, valid)
    exp_label, exp_bbox, exp_giou = reference_losses(logits, pred, boxes, valid, pairs)
    np.testing.assert_allclose(losses["loss_label"], exp_label, rtol=1e-4)
    np.testing.assert_allclose(losses["loss_bbox"], exp_bbox, rtol=1e-4)
    np.testing.assert_allclose(losses["loss_giou"], exp_giou, rtol=1e-4)
    expected_overall = (
        COST_CLASS * exp_label + COST_BBOX * exp_bbox + COST_GIOU * exp_giou
    )
    np.testing.assert_allclose(losses["loss_overall"], expected_overall, rtol=1e-4)


def test_criterion_with_aux_outputs(rng):
    logits, pred, boxes, valid = random_problem(rng)
    a_logits = rng.normal(size=(1, B, Q, 2)).astype(np.float32)
    a_pred = rng.uniform(0.2, 0.6, size=(1, B, Q, 4)).astype(np.float32)
    crit = make_criterion()
    out = {
        "pred_logits": logits, "pred_boxes": pred,
        "aux_logits": a_logits, "aux_boxes": a_pred,
    }
    losses = crit(out, {"boxes": boxes, "box_valid": valid})
    assert "loss_bbox_0" in losses and "loss_label_0" in losses
    # overall includes aux terms with the same weights (loss.py:195-202)
    manual = sum(
        float(losses[k]) * w for k, w in crit.weight_dict.items() if k in losses
    )
    np.testing.assert_allclose(float(losses["loss_overall"]), manual, rtol=1e-5)


def test_merged_matcher_identical_losses(rng):
    """--merged_matcher (one stacked LSAP for final+aux) must reproduce the
    per-layer matching path's loss dict exactly — same assignments, one
    solver call (PERFORMANCE.md merged-solve experiment, now behind a flag)."""
    logits, pred, boxes, valid = random_problem(rng)
    a_logits = rng.normal(size=(2, B, Q, 2)).astype(np.float32)
    a_pred = rng.uniform(0.2, 0.6, size=(2, B, Q, 4)).astype(np.float32)
    out = {
        "pred_logits": logits, "pred_boxes": pred,
        "aux_logits": a_logits, "aux_boxes": a_pred,
    }
    tgt = {"boxes": boxes, "box_valid": valid}

    base = make_criterion()
    merged = make_criterion()
    merged.merged_matcher = True
    l0 = {k: float(v) for k, v in base(out, tgt).items()}
    l1 = {k: float(v) for k, v in merged(out, tgt).items()}
    assert l0.keys() == l1.keys()
    for k in l0:
        np.testing.assert_allclose(l1[k], l0[k], rtol=1e-6, err_msg=k)


def test_cardinality_and_class_error(rng):
    logits, pred, boxes, valid = random_problem(rng)
    crit = make_criterion()
    losses = crit({"pred_logits": logits, "pred_boxes": pred},
                  {"boxes": boxes, "box_valid": valid})
    card_pred = (np.argmax(logits, -1) != 1).sum(-1)
    n_tgt = valid.reshape(B, -1).sum(-1)
    np.testing.assert_allclose(
        float(losses["cardinality_error"]),
        np.abs(card_pred - n_tgt).mean(), rtol=1e-5,
    )
    assert 0.0 <= float(losses["class_error"]) <= 100.0


def test_jit_grad_through_criterion(rng):
    """The whole criterion must be differentiable under jit (the reference
    can't do this — its matcher leaves the device)."""
    import jax
    import jax.numpy as jnp

    logits, pred, boxes, valid = random_problem(rng, empty_frames=False)
    crit = make_criterion()

    @jax.jit
    def loss_fn(logits, pred):
        return crit({"pred_logits": logits, "pred_boxes": pred},
                    {"boxes": boxes, "box_valid": valid})["loss_overall"]

    g_logits, g_pred = jax.grad(loss_fn, argnums=(0, 1))(
        jnp.asarray(logits), jnp.asarray(pred)
    )
    assert np.isfinite(np.asarray(g_logits)).all()
    assert np.isfinite(np.asarray(g_pred)).all()
    assert float(jnp.abs(g_pred).sum()) > 0
