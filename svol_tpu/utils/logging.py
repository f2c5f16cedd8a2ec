"""Logging + meters (port of lib/utils/logger.py and misc.AverageMeter).

Same pattern as the reference: a named logger writing to stdout and a file,
silenced on non-zero processes (logger.py:7-26); running averages for
per-phase timing and loss meters (misc.py:132-157) so log lines stay
format-compatible with the reference's (train.py:246-257).
"""
from __future__ import annotations

import logging
import os
import sys
from typing import Optional


def setup_logger(
    name: str,
    save_dir: Optional[str] = None,
    distributed_rank: int = 0,
    filename: str = "log.txt",
) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if distributed_rank > 0:
        return logger
    if logger.handlers:
        return logger

    fmt = logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
    sh = logging.StreamHandler(stream=sys.stdout)
    sh.setLevel(logging.DEBUG)
    sh.setFormatter(fmt)
    logger.addHandler(sh)

    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(save_dir, filename))
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class AverageMeter:
    """Running average of a scalar (misc.py:132-157)."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1) -> None:
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / self.count if self.count else 0.0
