"""Metric parity: run our evaluator and the reference evaluator (imported
read-only from /root/reference, which is torch-free for this subpath) on the
same synthetic results and require identical metric dicts."""
import copy
import sys

import numpy as np
import pytest

from svol_tpu.evaluate import eval_results

sys.path.insert(0, "/root/reference")
try:
    from lib.evaluate.eval import eval_results as ref_eval_results

    HAS_REF = True
except Exception:  # pragma: no cover
    HAS_REF = False


def make_results(rng, n_groups=4, n_frames=6, n_preds=10, max_gts=3, perfect=False):
    results = []
    for g in range(n_groups):
        for f in range(n_frames):
            n_gt = int(rng.integers(0, max_gts + 1))
            gts = []
            for _ in range(n_gt):
                xy = rng.uniform(0.1, 0.6, 2)
                wh = rng.uniform(0.1, 0.3, 2)
                gts.append({
                    "track_id": 0,
                    "bbox": [float(xy[0]), float(xy[1]),
                             float(xy[0] + wh[0]), float(xy[1] + wh[1])],
                })
            preds = []
            for p in range(n_preds):
                if perfect and p < n_gt:
                    box = gts[p]["bbox"]
                else:
                    xy = rng.uniform(0, 0.7, 2)
                    wh = rng.uniform(0.05, 0.3, 2)
                    box = [float(xy[0]), float(xy[1]),
                           float(min(xy[0] + wh[0], 1.0)), float(min(xy[1] + wh[1], 1.0))]
                score = 1.0 - p * 0.05 if perfect else float(rng.uniform(0.1, 1.0))
                preds.append([round(v, 4) for v in box] + [round(score, 4)])
            preds.sort(key=lambda r: -r[4])
            results.append({
                "video": f"vid{g}",
                "sketch": f"sk{g}",
                "shape": [640, 360],
                "frame": f,
                "gt_boxes": gts,
                "pred_boxes": preds,
            })
    # every group needs at least one GT overall (dataset guarantees this,
    # svol_dataset.py:272)
    for g in range(n_groups):
        rows = [r for r in results if r["video"] == f"vid{g}"]
        if not any(r["gt_boxes"] for r in rows):
            rows[0]["gt_boxes"].append({"track_id": 0, "bbox": [0.1, 0.1, 0.3, 0.3]})
    return results


@pytest.mark.skipif(not HAS_REF, reason="reference eval not importable")
@pytest.mark.parametrize("perfect", [False, True])
def test_metrics_match_reference(rng, perfect):
    results = make_results(rng, perfect=perfect)
    ours = eval_results(copy.deepcopy(results), verbose=False, ap_workers=0)
    theirs = ref_eval_results(copy.deepcopy(results), verbose=False)
    assert dict(ours["brief"]) == dict(theirs["brief"])
    assert ours["SVOL-mAP"] == theirs["SVOL-mAP"]
    assert ours["SVOL-R1"] == theirs["SVOL-R1"]
    assert ours["SVOL-R5"] == theirs["SVOL-R5"]


def test_perfect_predictions_score_100(rng):
    # max_gts=1 so the single top-1 prediction can cover every GT
    results = make_results(rng, perfect=True, max_gts=1)
    m = eval_results(results, verbose=False, ap_workers=0)
    assert m["brief"]["SVOL-full-mIoU@R1"] >= 99.0
    assert m["SVOL-R1"]["0.9"] >= 99.0


def test_ap_gt_locking():
    """Two high-score predictions on one GT: the second must count as FP
    (evaluate/utils.py:183-187)."""
    from svol_tpu.evaluate import average_precision_detection

    gt = [{"frame": 0, "top-left-x": 0.1, "top-left-y": 0.1,
           "bot-right-x": 0.5, "bot-right-y": 0.5}]
    dup = {"frame": 0, "top-left-x": 0.1, "top-left-y": 0.1,
           "bot-right-x": 0.5, "bot-right-y": 0.5}
    preds = [dict(dup, score=0.9), dict(dup, score=0.8)]
    ap = average_precision_detection(gt, preds, iou_thresholds=[0.5])
    # precision halves after the duplicate: AP stays 1.0 because recall is
    # reached by the first prediction
    assert ap[0] == pytest.approx(1.0)

    # with the duplicate scoring higher than a miss on a second GT,
    # AP reflects the lock
    gt2 = gt + [{"frame": 1, "top-left-x": 0.1, "top-left-y": 0.1,
                 "bot-right-x": 0.5, "bot-right-y": 0.5}]
    ap2 = average_precision_detection(gt2, preds, iou_thresholds=[0.5])
    assert ap2[0] == pytest.approx(0.5)


def test_empty_predictions_zero_ap():
    from svol_tpu.evaluate import average_precision_detection

    gt = [{"frame": 0, "top-left-x": 0.0, "top-left-y": 0.0,
           "bot-right-x": 1.0, "bot-right-y": 1.0}]
    assert average_precision_detection(gt, []).sum() == 0.0
