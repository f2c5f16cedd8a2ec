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

Run:  python -m svol_tpu.cli.supervise --max_restarts 5 -- <train flags...>
"""
from __future__ import annotations

import argparse
import subprocess
import sys
import time
from typing import Callable, List, Optional

from svol_tpu.train.checkpoints import find_latest_checkpoint


def run_with_restarts(
    build_cmd: Callable[[Optional[str]], List[str]],
    checkpoint_dir: str,
    max_restarts: int = 5,
    backoff_seconds: float = 30.0,
    runner=subprocess.call,
    log=print,
) -> int:
    """Run ``build_cmd(resume_path)`` until it exits 0 or restarts run out.

    ``build_cmd`` receives the latest checkpoint path (None on first launch)
    and returns the argv to execute. Returns the final exit code.
    """
    attempt = 0
    while True:
        resume = find_latest_checkpoint(checkpoint_dir) if attempt else None
        cmd = build_cmd(resume)
        log(f"[supervise] attempt {attempt}: {' '.join(cmd)}")
        code = runner(cmd)
        if code == 0:
            log("[supervise] training finished cleanly")
            return 0
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
