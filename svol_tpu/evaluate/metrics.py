"""SVOL evaluation metrics: detection mAP, Recall@k, mIoU.

Semantics-exact port of lib/evaluate/eval.py + lib/evaluate/utils.py
(themselves adapted from MMAction2's eval_detection). The metric consumes the
per-frame JSONL result rows produced by inference:

    {"video": str, "sketch": str, "shape": [w, h], "frame": int,
     "gt_boxes":  [{"track_id": int, "bbox": [x1, y1, x2, y2]}, ...],
     "pred_boxes": [[x1, y1, x2, y2, score], ...]  # sorted by score desc}

AP stays on the host: the greedy GT-locking procedure
(evaluate/utils.py:149-191) is order-dependent and data-dependent, exactly
the kind of control flow that doesn't belong in XLA. Recall/mIoU are simple
batched max-IoU reductions; a vmapped on-device variant lives in
svol_tpu/evaluate/device.py for the training-time fast path.
"""
from __future__ import annotations

import multiprocessing as mp
import os
import time
from collections import OrderedDict, defaultdict
from functools import partial
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

IOU_THDS_AP = np.linspace(0.5, 0.95, 10)
IOU_THDS_RECALL = np.linspace(0.1, 0.9, 9)


def _iou_cross_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """All-pairs IoU, (N,4)x(M,4) xyxy -> (N,M); evaluate/utils.py:35-96
    semantics (unclamped intersection + validity mask)."""
    a = a[:, None, :]
    b = b[None, :, :]
    xmin = np.maximum(a[..., 0], b[..., 0])
    ymin = np.maximum(a[..., 1], b[..., 1])
    xmax = np.minimum(a[..., 2], b[..., 2])
    ymax = np.minimum(a[..., 3], b[..., 3])
    inter = (xmax - xmin) * (ymax - ymin)
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    union = area_a + area_b - inter
    valid = (xmin <= xmax) & (ymin <= ymax)
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(valid, inter / union, 0.0)
    return iou


def _iou_cross_ref_order(box1: np.ndarray, box2: np.ndarray) -> np.ndarray:
    """Bug-for-bug port of compute_iou_batch_cross (evaluate/utils.py:74-96).

    The reference tiles box1 and repeats box2 — producing pairs in (M, N)
    order — but reshapes the flat IoU vector to (N, M). For N != M this
    scrambles the matrix (for N == M it transposes it). Recall@k with k > 1
    inherits the scramble, so we must reproduce it exactly to report numbers
    comparable to the reference / paper. Recall@1 (N == 1) is unaffected,
    which is why the model-selection metric mIoU@R1 is sound.
    """
    n, m = box1.shape[0], box2.shape[0]
    b1 = np.tile(box1, (m, 1))
    b2 = np.repeat(box2, n, axis=0)
    xmin = np.maximum(b1[:, 0], b2[:, 0])
    ymin = np.maximum(b1[:, 1], b2[:, 1])
    xmax = np.minimum(b1[:, 2], b2[:, 2])
    ymax = np.minimum(b1[:, 3], b2[:, 3])
    inter = (xmax - xmin) * (ymax - ymin)
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    union = a1 + a2 - inter
    valid = (xmin <= xmax) & (ymin <= ymax)
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(valid, inter / union, 0.0)
    return iou.reshape(n, m)


def interpolated_precision_recall(precision: np.ndarray, recall: np.ndarray) -> float:
    """VOC-2011 interpolated AP (evaluate/utils.py:99-115)."""
    mprec = np.concatenate([[0.0], precision, [0.0]])
    mrec = np.concatenate([[0.0], recall, [1.0]])
    # precision envelope
    mprec = np.maximum.accumulate(mprec[::-1])[::-1]
    idx = np.where(mrec[1:] != mrec[:-1])[0] + 1
    return float(np.sum((mrec[idx] - mrec[idx - 1]) * mprec[idx]))


def average_precision_detection(
    ground_truth: List[Dict[str, Any]],
    prediction: List[Dict[str, Any]],
    iou_thresholds: Sequence[float] = IOU_THDS_AP,
) -> np.ndarray:
    """Detection AP with greedy GT locking (evaluate/utils.py:118-202).

    Each gt/pred dict carries frame id and corner coordinates (and 'score'
    for predictions). For every prediction in descending score order, IoUs
    against the same-frame GTs are visited best-first; the first unlocked GT
    above the threshold claims the prediction as a true positive.
    """
    n_thds = len(iou_thresholds)
    n_gts = len(ground_truth)
    ap = np.zeros(n_thds)
    if not prediction:
        return ap

    preds = sorted(prediction, key=lambda x: -x["score"])
    tp = np.zeros((n_thds, len(preds)))
    fp = np.zeros((n_thds, len(preds)))
    lock = np.full((n_thds, n_gts), -1)

    gts_by_frame: Dict[Any, List[Tuple[int, Dict[str, Any]]]] = defaultdict(list)
    for gt_index, gt in enumerate(ground_truth):
        gts_by_frame[gt["frame"]].append((gt_index, gt))

    def corners(d):
        return [d["top-left-x"], d["top-left-y"], d["bot-right-x"], d["bot-right-y"]]

    for p_idx, pred in enumerate(preds):
        frame_gts = gts_by_frame.get(pred["frame"])
        if not frame_gts:
            fp[:, p_idx] = 1
            continue
        ious = _iou_cross_np(
            np.array([corners(pred)], dtype=float),
            np.array([corners(g) for _, g in frame_gts], dtype=float),
        ).reshape(-1)
        order = ious.argsort()[::-1]
        for t_idx, thd in enumerate(iou_thresholds):
            assigned = False
            for j in order:
                if ious[j] < thd:
                    fp[t_idx, p_idx] = 1
                    assigned = True
                    break
                gt_index = frame_gts[j][0]
                if lock[t_idx, gt_index] >= 0:
                    continue
                tp[t_idx, p_idx] = 1
                lock[t_idx, gt_index] = p_idx
                assigned = True
                break
            if not assigned:
                fp[t_idx, p_idx] = 1

    tp_cum = tp.cumsum(axis=1)
    fp_cum = fp.cumsum(axis=1)
    recall = tp_cum / float(n_gts)
    precision = tp_cum / (tp_cum + fp_cum)
    for t_idx in range(n_thds):
        ap[t_idx] = interpolated_precision_recall(precision[t_idx], recall[t_idx])
    return ap


def _ap_worker(triple, iou_thresholds):
    group, gts, preds = triple
    return group, average_precision_detection(gts, preds, iou_thresholds)


def compute_ap(
    results: List[Dict[str, Any]],
    iou_thds: Sequence[float] = IOU_THDS_AP,
    num_workers: int = 0,
    chunksize: int = 50,
) -> Dict[str, float]:
    """mAP over (video, sketch) groups (eval.py:20-70): group the per-frame
    rows, AP per group, mean over groups, then per-threshold dict keyed by
    the 2-decimal threshold string plus an 'average' entry, x100 rounded."""
    iou_thds = [float(f"{t:.2f}") for t in iou_thds]
    preds = defaultdict(list)
    gts = defaultdict(list)
    for row in results:
        group = row["video"] + row["sketch"]
        frame = row["frame"]
        for pb in row["pred_boxes"]:
            preds[group].append({
                "frame": frame,
                "top-left-x": pb[0], "top-left-y": pb[1],
                "bot-right-x": pb[2], "bot-right-y": pb[3],
                "score": pb[4],
            })
        for gb in row["gt_boxes"]:
            bbox = gb["bbox"] if isinstance(gb, dict) else gb
            gts[group].append({
                "frame": frame,
                "top-left-x": bbox[0], "top-left-y": bbox[1],
                "bot-right-x": bbox[2], "bot-right-y": bbox[3],
            })

    triples = [(g, gts[g], preds[g]) for g in preds]
    worker = partial(_ap_worker, iou_thresholds=iou_thds)
    group2ap: Dict[str, np.ndarray] = {}
    # Cap the pool at the visible cores: each *spawn* worker pays a full
    # interpreter + package import (fork deadlocks under JAX's threads), so
    # on a 1-core host the reference's Pool(8) (eval.py:55-62) is a net
    # loss; the serial path computes identical values.
    num_workers = min(num_workers, os.cpu_count() or 1)
    if num_workers > 1:
        # spawn (not fork): JAX runtimes are multithreaded and fork deadlocks
        with mp.get_context("spawn").Pool(num_workers) as pool:
            for g, scores in pool.imap_unordered(worker, triples, chunksize=chunksize):
                group2ap[g] = scores
    else:
        for triple in triples:
            g, scores = worker(triple)
            group2ap[g] = scores

    ap_per_thd = np.array(list(group2ap.values())).mean(axis=0)
    out = dict(zip([str(t) for t in iou_thds], ap_per_thd))
    out["average"] = float(np.mean(ap_per_thd))
    return {k: float(f"{100 * v:.2f}") for k, v in out.items()}


def compute_recall_at_k(
    results: List[Dict[str, Any]],
    iou_thds: Sequence[float] = IOU_THDS_RECALL,
    k: int = 1,
) -> Tuple[Dict[str, float], float]:
    """Recall@k + mIoU from per-GT max IoU over the top-k predictions
    (eval.py:73-99). Rows without GT boxes are skipped. Uses the
    reference-order cross IoU (see _iou_cross_ref_order) for number-for-number
    comparability."""
    max_ious: List[float] = []
    for row in results:
        gt_list = [g["bbox"] if isinstance(g, dict) else g for g in row["gt_boxes"]]
        if not gt_list:
            continue
        preds = np.array(row["pred_boxes"][:k], dtype=float)[:, :4]
        iou = _iou_cross_ref_order(preds, np.array(gt_list, dtype=float))
        max_ious.extend(iou.max(axis=0).tolist())

    arr = np.asarray(max_ious)
    recalls = {
        str(float(f"{t:.2f}")): float(f"{np.mean(arr >= float(f'{t:.2f}')) * 100:.2f}")
        for t in iou_thds
    }
    miou = float(f"{arr.mean() * 100:.2f}")
    return recalls, miou


def eval_svol(results, verbose: bool = True, logger=None,
              ap_workers: int = 8, ap_chunksize: int = 50) -> Dict[str, Any]:
    """Full metric suite (eval.py:102-117)."""
    t0 = time.time()
    ap = compute_ap(results, num_workers=ap_workers, chunksize=ap_chunksize)
    r1, miou1 = compute_recall_at_k(results, k=1)
    r5, miou5 = compute_recall_at_k(results, k=5)
    metrics = {
        "SVOL-mAP": ap,
        "SVOL-R1": r1,
        "SVOL-R5": r5,
        "mIoU@R1": miou1,
        "mIoU@R5": miou5,
    }
    if verbose and logger is not None:
        logger.info(f"[eval_svol] {time.time() - t0:.2f} seconds")
    return metrics


def eval_results(results, verbose: bool = True, logger=None,
                 ap_workers: int = 8, ap_chunksize: int = 50) -> "OrderedDict[str, Any]":
    """Assemble the nested metrics dict with the 'brief' summary, key-for-key
    with the reference (eval.py:120-173) so downstream consumers can switch
    frameworks without changing parsers."""
    scores = eval_svol(results, verbose=verbose, logger=logger,
                       ap_workers=ap_workers, ap_chunksize=ap_chunksize)
    brief = {
        "SVOL-full-mAP": scores["SVOL-mAP"]["average"],
        "SVOL-full-R1@0.1": scores["SVOL-R1"]["0.1"],
        "SVOL-full-R1@0.3": scores["SVOL-R1"]["0.3"],
        "SVOL-full-R1@0.5": scores["SVOL-R1"]["0.5"],
        "SVOL-full-R1@0.7": scores["SVOL-R1"]["0.7"],
        "SVOL-full-R5@0.1": scores["SVOL-R5"]["0.1"],
        "SVOL-full-R5@0.3": scores["SVOL-R5"]["0.3"],
        "SVOL-full-R5@0.5": scores["SVOL-R5"]["0.5"],
        "SVOL-full-R5@0.7": scores["SVOL-R5"]["0.7"],
        "SVOL-full-mIoU@R1": scores["mIoU@R1"],
        "SVOL-full-mIoU@R5": scores["mIoU@R5"],
    }
    final: "OrderedDict[str, Any]" = OrderedDict()
    final["brief"] = OrderedDict(sorted(brief.items(), key=lambda kv: kv[0]))
    final.update(sorted(scores.items(), key=lambda kv: kv[0]))
    return final
