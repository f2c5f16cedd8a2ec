"""Preemption-safe training: SIGTERM -> checkpoint at the step boundary.

Production TPU fleets preempt workers with a SIGTERM + grace period
(maintenance events, priority eviction, autoscaling). The reference has no
story for this at all — a preempted run loses everything since its last
periodic save (/root/reference/train.py:267-284 saves only on
save_every_epoch boundaries, and its sampler restarts the data stream on
resume anyway).

Here the train loop installs a :class:`PreemptionGuard`; on the first
SIGTERM it sets a flag, the loop finishes the in-flight step, saves a
``preempt_*`` checkpoint WITH the grain ``.loader_state`` sidecar (so
``--resume_all`` continues the exact batch stream — data/pipeline.py), and
exits with :data:`EXIT_PREEMPTED`. A second SIGTERM escalates to the
previous disposition (normally: terminate), so a save stuck on a dead
filesystem can still be killed.

Composition: ``cli/supervise.py`` restarts any non-zero exit from the
newest checkpoint with ``--resume_all`` — so supervise + preemption =
eviction-transparent training: kill -TERM the trainer at any point and the
relaunched process reproduces the uninterrupted run (bit-identical params
on the threads backend; tests/test_preemption.py).
"""
from __future__ import annotations

import signal
import threading
from typing import Optional

# EX_TEMPFAIL: "try again later" — distinct from success (supervise would
# stop) and from crash codes, so schedulers/wrappers can tell a graceful
# preemption from a failure.
EXIT_PREEMPTED = 75


class PreemptionGuard:
    """Installable SIGTERM latch for graceful-checkpoint shutdown.

    ``install()`` is a no-op off the main thread (CPython only allows
    signal handlers there) — in-process callers of train_val from worker
    threads (tests) simply run without preemption handling rather than
    crashing.
    """

    def __init__(self, signals=(signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._event = threading.Event()
        self._prev: dict = {}
        self.active = False

    @property
    def requested(self) -> bool:
        return self._event.is_set()

    def install(self) -> "PreemptionGuard":
        try:
            for sig in self._signals:
                self._prev[sig] = signal.signal(sig, self._handler)
        except ValueError:  # not the main interpreter thread
            for sig, prev in self._prev.items():
                signal.signal(sig, prev)  # unreachable off-main, defensive
            self._prev.clear()
            self.active = False
            return self
        self.active = True
        return self

    def uninstall(self) -> None:
        for sig, prev in self._prev.items():
            try:
                # a handler installed from C makes signal.signal() return
                # None — not a valid disposition to re-install; fall back to
                # the default action rather than raising TypeError here
                signal.signal(sig, prev if prev is not None else signal.SIG_DFL)
            except ValueError:
                pass
        self._prev.clear()
        self.active = False

    def _handler(self, signum, frame) -> None:
        if self._event.is_set():
            # second signal: stop shielding — restore the previous
            # disposition and let the default action proceed. A None prev
            # (C-installed handler, unrepresentable in Python) degrades to
            # SIG_DFL: escalation must terminate, never raise.
            prev = self._prev.get(signum, signal.SIG_DFL)
            if prev is None:
                prev = signal.SIG_DFL
            signal.signal(signum, prev)
            signal.raise_signal(signum)
            return
        self._event.set()


def preempt_checkpoint_name(config, step: int) -> str:
    """``preempt_<step>_model_<run_tag>`` — sorts next to the periodic
    ``<step>_model_*`` scheme (train/checkpoints.py) and is discovered by
    ``find_latest_checkpoint`` like any other save."""
    return f"preempt_{step:04d}_model_{config.run_tag()}"
