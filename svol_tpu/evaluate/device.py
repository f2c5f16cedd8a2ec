"""On-device Recall@k / mIoU — the training-time fast evaluation path.

The parity metrics (evaluate/metrics.py) consume host-side JSONL rows and
include the host-only AP computation. During training validation, what
drives checkpoint selection is ``SVOL-full-mIoU@R1`` (train.py:297) — a pure
max-IoU reduction that vmaps trivially. This module computes Recall@k and
mIoU entirely inside jit from the same dense tensors the eval step already
produces, so a quick validation pass needs no host round-trip per batch.

Semantics match compute_recall_at_k (eval.py:73-99) with the *corrected*
cross-IoU orientation (the host path reproduces the reference's reshape
quirk for k>1; on-device we compute the true per-GT max over the top-k
preds, which is identical at k=1 — the selection metric).
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from svol_tpu.ops.boxes import box_cxcywh_to_xyxy, iou_paired

IOU_THDS = tuple(round(0.1 * i, 2) for i in range(1, 10))


@functools.partial(jax.jit, static_argnames=("k", "queries_per_frame"))
def recall_miou_batch(
    scores: Array,  # (B, Q) foreground scores
    boxes_xyxy: Array,  # (B, Q, 4) clamped
    tgt_boxes: Array,  # (B, T, K, 4) cxcywh
    tgt_valid: Array,  # (B, T, K)
    k: int = 1,
    queries_per_frame: int = 10,
) -> Tuple[Array, Array, Array]:
    """Per-batch accumulators: (sum of per-GT max IoU, per-threshold hit
    counts (9,), number of GTs). Aggregate across batches then divide."""
    B, Q = scores.shape
    T = Q // queries_per_frame
    Kq = queries_per_frame

    s = scores.reshape(B, T, Kq)
    p = boxes_xyxy.reshape(B, T, Kq, 4)
    # top-k predictions per frame by score
    _, top_idx = jax.lax.top_k(s, k)  # (B, T, k)
    top_boxes = jnp.take_along_axis(p, top_idx[..., None], axis=2)  # (B, T, k, 4)

    gt_xyxy = box_cxcywh_to_xyxy(tgt_boxes)  # (B, T, K, 4)
    # IoU of every top-k pred against every GT slot: (B, T, k, K)
    iou = iou_paired(top_boxes[:, :, :, None, :], gt_xyxy[:, :, None, :, :])
    max_iou = iou.max(axis=2)  # (B, T, K) per-GT max over top-k preds

    valid = tgt_valid.astype(jnp.float32)
    n_gts = valid.sum()
    miou_sum = (max_iou * valid).sum()
    thds = jnp.asarray(IOU_THDS)[:, None, None, None]
    hits = ((max_iou[None] >= thds) * valid[None]).sum(axis=(1, 2, 3))  # (9,)
    return miou_sum, hits, n_gts


def finalize(miou_sum: float, hits, n_gts: float) -> Dict[str, float]:
    n = max(float(n_gts), 1.0)
    out = {f"R@{thd}": 100.0 * float(h) / n for thd, h in zip(IOU_THDS, hits)}
    out["mIoU"] = 100.0 * float(miou_sum) / n
    return out
