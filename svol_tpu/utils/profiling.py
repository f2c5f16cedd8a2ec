"""Profiling / tracing helpers.

The reference's only tracing is wall-clock phase meters in the train loop
(train.py:191,213-235). Here the same meters exist (cli/train.py) plus real
XLA-level tracing via ``jax.profiler`` — traces open in TensorBoard or
Perfetto and show per-op device time, HBM usage, and fusion boundaries.

Usage:
    with maybe_trace("/tmp/svol_trace", enabled=args.profile):
        for step in ...: train_step(...)

    with phase_timer(meters, "model_step_time"):
        train_step(...)
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator

from svol_tpu.utils.logging import AverageMeter


@contextlib.contextmanager
def maybe_trace(log_dir: str, enabled: bool = False) -> Iterator[None]:
    """jax.profiler.trace wrapper; no-op when disabled."""
    if not enabled:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def phase_timer(meters: Dict[str, AverageMeter], name: str) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
        yield
    finally:
        meters[name].update(time.perf_counter() - t0)


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region visible in profiler traces (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
