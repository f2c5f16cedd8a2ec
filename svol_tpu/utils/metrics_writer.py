"""Experiment metric logging.

The reference optionally streams train/val losses and metrics to Neptune
(train.py:376-391 — with a hard-coded API token). The local-first equivalent
here appends one JSON line per event to ``<log_dir>/metrics.jsonl``
({"step", "phase", **scalars}) — trivially greppable, plottable, and safe.
TensorBoard users can point ``tensorboardX``/``tf.summary`` at the same
stream if installed; nothing here requires network access.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricsWriter:
    def __init__(self, log_dir: str, filename: str = "metrics.jsonl"):
        os.makedirs(log_dir, exist_ok=True)
        self._path = os.path.join(log_dir, filename)
        self._f = open(self._path, "a", buffering=1)

    @property
    def path(self) -> str:
        return self._path

    def log(self, step: int, phase: str, scalars: Dict[str, float]) -> None:
        row = {"time": time.time(), "step": int(step), "phase": phase}
        row.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(row) + "\n")

    def close(self) -> None:
        self._f.close()
