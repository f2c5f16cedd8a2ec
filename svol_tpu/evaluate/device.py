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


def fast_validation(
    state, eval_step, loader, queries_per_frame: int, plan=None
) -> Dict[str, float]:
    """Training-time fast validation: on-device mIoU@R1 / R1@thd.

    Drives checkpoint selection / early stopping each ``val_interval``
    (``--fast_val``) without the host path's JSONL assembly and AP worker
    pool (evaluate/metrics.py) — only three accumulator scalars cross the
    device boundary per batch. ``SVOL-full-mIoU@R1`` — the selection metric,
    train.py:297 — is semantically identical to the host evaluator at k=1
    (tests/test_device_metrics.py); the host value can differ by <1e-2 from
    the JSONL rows' 4-decimal box rounding, which the fast path skips.

    Returns a dict using the host brief's key names for the k=1 entries.
    """
    import numpy as np

    total_miou, total_gts = 0.0, 0.0
    total_hits = np.zeros(len(IOU_THDS))
    for batch, extra in loader:
        device_batch = dict(batch)
        device_batch.update(extra["targets"])
        if plan is not None:
            # data-parallel validation (cli/infer.get_results has the
            # same contract: eval_bs divisible by the 'data' axis)
            device_batch = plan.shard_batch(device_batch)
        _losses, scores, boxes = eval_step(state, device_batch)
        # pad rows (pipeline.pad_to_batch replicates the last real example):
        # zero their GT validity so they contribute no GTs/hits
        tgt_valid = np.asarray(extra["targets"]["box_valid"]).copy()
        n_real = extra.get("n_real", tgt_valid.shape[0])
        tgt_valid[n_real:] = False
        miou_sum, hits, n_gts = recall_miou_batch(
            scores, boxes, extra["targets"]["boxes"], tgt_valid,
            k=1, queries_per_frame=queries_per_frame,
        )
        total_miou += float(miou_sum)
        total_hits += np.asarray(hits)
        total_gts += float(n_gts)
    out = finalize(total_miou, total_hits, total_gts)
    brief = {f"SVOL-full-R1@{thd}": out[f"R@{thd}"]
             for thd in ("0.1", "0.3", "0.5", "0.7")}
    brief["SVOL-full-mIoU@R1"] = out["mIoU"]
    return brief
