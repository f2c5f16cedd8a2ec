from svol_tpu.evaluate.metrics import (
    average_precision_detection,
    compute_ap,
    compute_recall_at_k,
    eval_results,
    eval_svol,
)

__all__ = [
    "average_precision_detection",
    "compute_ap",
    "compute_recall_at_k",
    "eval_results",
    "eval_svol",
]
