"""Elastic training supervisor: restart-on-failure with checkpoint resume.

The reference has no failure handling at all (SURVEY.md §5 — no torchelastic,
no watchdog). On real fleets, TPU workers *do* crash (observed repeatedly in
this environment's runtime, see PERFORMANCE.md); a crashed worker invalidates
every live device buffer, so in-process recovery is impossible — the correct
unit of restart is the training process.

This supervisor launches ``svol_tpu.cli.train`` as a subprocess; whenever it
exits non-zero, the supervisor finds the newest checkpoint and relaunches
with ``--resume <ckpt> --resume_all`` (full optimizer/step state, so the LR
schedule continues exactly — checkpoints.py). Combine with
``--save_interval`` so a checkpoint is never far behind.

Preemption composition (train/preemption.py): schedulers deliver eviction
SIGTERMs to the *supervisor* (the process they launched), so the default
runner forwards SIGTERM/SIGINT to the training child, waits for its
graceful boundary checkpoint, and if the supervisor itself was signalled,
exits with the child's code instead of relaunching — the scheduler's next
incarnation of the supervisor resumes from that checkpoint. A child-side
EXIT_PREEMPTED *without* a supervisor signal (e.g. an operator kill -TERM
of just the trainer) relaunches immediately, skipping the crash backoff.

Run:  python -m svol_tpu.cli.supervise --max_restarts 5 -- <train flags...>
"""
from __future__ import annotations

import argparse
import signal
import subprocess
import sys
import time
from typing import Callable, List, Optional

from svol_tpu.train.checkpoints import find_latest_checkpoint
from svol_tpu.train.preemption import EXIT_PREEMPTED


class ForwardingRunner:
    """Run a child, forwarding the supervisor's SIGTERM/SIGINT to it.

    Without this, a scheduler evicting the supervisor would kill it and
    orphan the trainer mid-step — the trainer's own graceful-checkpoint
    handler (train/preemption.py) never fires because the signal never
    reaches it. A second supervisor-side signal escalates to SIGKILL on
    the child (mirroring the trainer's own two-signal contract).
    ``signalled`` records whether a forward happened, so the restart loop
    can tell "the scheduler wants us gone" from "the child was preempted
    independently".
    """

    def __init__(self, grace_timeout: float = 600.0):
        self.signalled = False
        self._grace_timeout = grace_timeout

    def __call__(self, cmd: List[str]) -> int:
        proc = subprocess.Popen(cmd)
        pending = 0

        def forward(signum, frame):
            nonlocal pending
            pending += 1
            self.signalled = True
            if proc.poll() is None:
                proc.send_signal(
                    signal.SIGKILL if pending > 1 else signal.SIGTERM)

        prev = {s: signal.signal(s, forward)
                for s in (signal.SIGTERM, signal.SIGINT)}
        t_signal = [0.0]
        try:
            while True:
                try:
                    return proc.wait(timeout=0.5)
                except subprocess.TimeoutExpired:
                    if pending and not t_signal[0]:
                        t_signal[0] = time.monotonic()
                    if (t_signal[0] and
                            time.monotonic() - t_signal[0] > self._grace_timeout):
                        proc.kill()  # grace period exhausted
                        return proc.wait()
        finally:
            for s, h in prev.items():
                signal.signal(s, h)


def run_with_restarts(
    build_cmd: Callable[[Optional[str]], List[str]],
    checkpoint_dir: str,
    max_restarts: int = 5,
    backoff_seconds: float = 30.0,
    runner=None,
    log=print,
) -> int:
    """Run ``build_cmd(resume_path)`` until it exits 0 or restarts run out.

    ``build_cmd`` receives the latest checkpoint path (None on first launch)
    and returns the argv to execute. Returns the final exit code.
    """
    if runner is None:
        runner = ForwardingRunner()
    attempt = 0
    launches = 0
    while True:
        # EVERY launch (including the first) resumes from the newest
        # checkpoint in the dir when one exists: a supervisor relaunched by
        # its scheduler after a graceful eviction must continue from the
        # preempt_* checkpoint its previous incarnation saved, not restart
        # training from scratch (ADVICE r4 medium).
        resume = find_latest_checkpoint(checkpoint_dir)
        if resume and launches == 0:
            log(f"[supervise] found existing checkpoint {resume}; "
                f"continuing a previous run")
        cmd = build_cmd(resume)
        log(f"[supervise] attempt {attempt}: {' '.join(cmd)}")
        launches += 1
        code = runner(cmd)
        if code == 0:
            log("[supervise] training finished cleanly")
            return 0
        if getattr(runner, "signalled", False):
            # the SUPERVISOR was told to stop (scheduler eviction) and
            # forwarded it; the child checkpointed and exited — propagate
            # its code instead of relaunching against the scheduler
            log(f"[supervise] stop requested; child exited {code} after "
                f"checkpointing — not relaunching")
            return code
        if code == EXIT_PREEMPTED:
            # graceful preemption (train/preemption.py): the trainer already
            # checkpointed at a step boundary and exited clean — the backoff
            # exists to ride out crash loops, not to delay a planned resume.
            # Deliberately NOT counted toward max_restarts: a periodically
            # preempted but otherwise healthy run must never exhaust its
            # crash budget on planned evictions (ADVICE r4 low).
            log(f"[supervise] graceful preemption; resuming immediately from "
                f"{find_latest_checkpoint(checkpoint_dir) or 'scratch'}")
            continue
        attempt += 1
        if attempt > max_restarts:
            log(f"[supervise] giving up after {max_restarts} restarts (exit {code})")
            return code
        log(f"[supervise] training exited {code}; restarting from "
            f"{find_latest_checkpoint(checkpoint_dir) or 'scratch'} "
            f"in {backoff_seconds:.0f}s")
        time.sleep(backoff_seconds)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        description="restart-on-failure wrapper around svol_tpu.cli.train"
    )
    p.add_argument("--max_restarts", type=int, default=5)
    p.add_argument("--backoff_seconds", type=float, default=30.0)
    p.add_argument("train_args", nargs=argparse.REMAINDER,
                   help="flags forwarded to svol_tpu.cli.train (prefix with --)")
    args = p.parse_args(argv)
    train_args = [a for a in args.train_args if a != "--"]

    # find the checkpoint dir from the forwarded flags (default ./save)
    ckpt_dir = "./save"
    if "--checkpoint" in train_args:
        ckpt_dir = train_args[train_args.index("--checkpoint") + 1]

    def build_cmd(resume: Optional[str]) -> List[str]:
        cmd = [sys.executable, "-m", "svol_tpu.cli.train"] + list(train_args)
        if resume:
            cmd += ["--resume", resume, "--resume_all"]
        return cmd

    code = run_with_restarts(
        build_cmd, ckpt_dir,
        max_restarts=args.max_restarts,
        backoff_seconds=args.backoff_seconds,
    )
    sys.exit(code)


if __name__ == "__main__":
    main()
