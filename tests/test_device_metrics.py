"""On-device mIoU/R@k vs the host evaluator at k=1 (identical semantics)."""
import numpy as np

from svol_tpu.evaluate.device import finalize, recall_miou_batch
from svol_tpu.evaluate.metrics import compute_recall_at_k
from svol_tpu.ops.boxes import box_cxcywh_to_xyxy

B, T, K = 2, 4, 5
Q = T * K


def test_device_metrics_match_host_k1(rng):
    scores = rng.uniform(size=(B, Q)).astype(np.float32)
    boxes = rng.uniform(0.2, 0.5, size=(B, Q, 4)).astype(np.float32)
    boxes_xyxy = np.clip(np.asarray(box_cxcywh_to_xyxy(boxes)), 0, 1)

    tgt = np.zeros((B, T, K, 4), np.float32)
    valid = np.zeros((B, T, K), bool)
    for b in range(B):
        for t in range(T):
            n = rng.integers(1, K + 1)
            c = rng.uniform(0.3, 0.6, size=(n, 2))
            wh = rng.uniform(0.1, 0.3, size=(n, 2))
            tgt[b, t, :n] = np.concatenate([c, wh], -1)
            valid[b, t, :n] = True

    miou_sum, hits, n_gts = recall_miou_batch(
        scores, boxes_xyxy, tgt, valid, k=1, queries_per_frame=K
    )
    device = finalize(float(miou_sum), np.asarray(hits), float(n_gts))

    # host rows
    gt_xyxy = np.asarray(box_cxcywh_to_xyxy(tgt))
    rows = []
    for b in range(B):
        for t in range(T):
            order = np.argsort(-scores[b, t * K : (t + 1) * K], kind="stable")
            preds = [
                list(boxes_xyxy[b, t * K + i]) + [float(scores[b, t * K + i])]
                for i in order
            ]
            gts = [
                {"track_id": 0, "bbox": list(gt_xyxy[b, t, j])}
                for j in range(K) if valid[b, t, j]
            ]
            rows.append({
                "video": f"v{b}", "sketch": "s", "shape": [1, 1], "frame": t,
                "gt_boxes": gts, "pred_boxes": preds,
            })
    recalls, miou = compute_recall_at_k(rows, k=1)
    np.testing.assert_allclose(device["mIoU"], miou, atol=0.02)
    for thd in ("0.1", "0.5", "0.9"):
        np.testing.assert_allclose(device[f"R@{thd}"], recalls[thd], atol=0.02)
