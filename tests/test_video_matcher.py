"""Video-level matcher ('video_matcher', matcher.py:122-159): one LSAP per
video across all its boxes — parity with scipy on the same cost."""
import numpy as np
from scipy.optimize import linear_sum_assignment

from svol_tpu.losses.matcher import match_per_video

B, T, K = 2, 3, 4
Q = T * K
CC, CB, CG = 2.0, 5.0, 1.0


def softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def cxcywh_to_xyxy(b):
    cx, cy, w, h = np.moveaxis(b, -1, 0)
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


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


def test_video_matcher_matches_scipy(rng):
    logits = rng.normal(size=(B, Q, 2)).astype(np.float32)
    pred = rng.uniform(0.2, 0.7, size=(B, Q, 4)).astype(np.float32)
    boxes = np.zeros((B, T, K, 4), np.float32)
    valid = np.zeros((B, T, K), bool)
    for b in range(B):
        for t in range(T):
            n = rng.integers(0, K + 1)
            boxes[b, t, :n, :2] = rng.uniform(0.3, 0.6, size=(n, 2))
            boxes[b, t, :n, 2:] = rng.uniform(0.05, 0.3, size=(n, 2))
            valid[b, t, :n] = True
    valid[0].sum() or None  # ensure at least some boxes exist
    valid[0, 0, 0] = True
    boxes[0, 0, 0] = [0.5, 0.5, 0.2, 0.2]

    res = match_per_video(logits, pred, boxes, valid,
                          cost_class=CC, cost_bbox=CB, cost_giou=CG)

    got = set()
    for b in range(B):
        for q in range(Q):
            if res.matched[b, q]:
                got.add((b, q, int(res.tgt_index[b, q])))

    # scipy reference: per video, queries x its valid (flattened) boxes
    prob = softmax(logits)
    exp = set()
    for b in range(B):
        flat_idx = np.where(valid[b].reshape(-1))[0]
        g = boxes[b].reshape(-1, 4)[flat_idx]
        if len(g) == 0:
            continue
        p = pred[b]
        C = (
            CB * np.abs(p[:, None] - g[None]).sum(-1)
            + CG * -np_giou(cxcywh_to_xyxy(p), cxcywh_to_xyxy(g))
            + CC * -prob[b, :, 0:1].repeat(len(g), 1)
        )
        r, c = linear_sum_assignment(C)
        exp |= {(b, int(i), int(flat_idx[j])) for i, j in zip(r, c)}
    assert got == exp
