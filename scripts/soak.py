"""Unattended soak at recipe shape (VERDICT r4 Next #6): >= N optimizer
steps on the real chip through ``cli/supervise``, with an injected SIGTERM
kill mid-run, composing the round-4 features that had only run in
isolation: --async_checkpoint, --steps_per_dispatch, exact --resume_all
data-stream resume, graceful preemption, and supervisor relaunch.

Protocol (two runs, identical seed/flags):
  A. baseline: uninterrupted supervise run to --num_iters.
  B. killed:   same run; at ~40% progress the SUPERVISOR gets SIGTERM
     (the scheduler-eviction path: it forwards to the trainer, which saves
     a preempt_* checkpoint + .loader_state sidecar and exits 75; the
     supervisor propagates 75). The script then RELAUNCHES the supervisor,
     which must resume from the preempt checkpoint on its FIRST attempt
     (the round-5 supervise fix) and finish the remaining iterations.

Pass criteria: B's final checkpoint params == A's bit-for-bit (threads
loader backend is deterministic under exact data-stream resume,
tests/test_resume_data.py — this validates it END TO END at recipe shape),
plus a sustained wall-clock frames/s (including input) report.

Usage:  python scripts/soak.py [--iters 2000] [--bs 16] [--out soak_report.json]
On this tunneled 1-core environment the wall-clock number is input/dispatch
bound (PERFORMANCE.md "Input-inclusive throughput") — the soak's value here
is the correctness composition; the throughput column is honest about what
it measures.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def train_flags(root, tmp, iters, bs, spd):
    return [
        "--root", root, "--anno_root", os.path.join(root, "annos"),
        "--sketch_dataset", "sketchy",
        "--bs", str(bs), "--eval_bs", "4",
        "--num_workers", "1", "--loader_backend", "threads",
        "--num_iters", str(iters),
        "--steps_per_dispatch", str(spd),
        "--val_interval", str(iters * 2),  # no mid-run validation
        "--log_interval", str(spd * 5),
        "--save_interval", str(max(spd * 25, 100)),
        "--async_checkpoint",
        "--early_stop_patience", "-1",
        "--log_dir", os.path.join(tmp, "logs"),
        "--results_dir", os.path.join(tmp, "results"),
        "--checkpoint", os.path.join(tmp, "save"),
    ]


def run_supervised(root, tmp, iters, bs, spd, kill_after_frac=None,
                   timeout_s=7200):
    """One supervise invocation; optionally SIGTERM it at ~frac progress
    (detected by checkpoint appearance, fallback to a time heuristic).
    Returns (exit_code, wall_seconds)."""
    cmd = [sys.executable, "-m", "svol_tpu.cli.supervise",
           "--max_restarts", "3", "--backoff_seconds", "5", "--"]
    cmd += train_flags(root, tmp, iters, bs, spd)
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/svol_tpu_cache")
    t0 = time.time()
    proc = subprocess.Popen(cmd, env=env, cwd=REPO)
    if kill_after_frac is not None:
        # wait for the first periodic checkpoint (training is really
        # under way), then one more progress interval, then SIGTERM
        save_dir = os.path.join(tmp, "save")
        deadline = time.time() + timeout_s
        while time.time() < deadline and proc.poll() is None:
            ckpts = [d for d in (os.listdir(save_dir)
                                 if os.path.isdir(save_dir) else [])
                     if os.path.isdir(os.path.join(save_dir, d))]
            if ckpts:
                break
            time.sleep(5)
        time.sleep(30)  # let it get past the checkpoint boundary
        if proc.poll() is None:
            print(f"[soak] sending SIGTERM to supervisor pid {proc.pid}",
                  flush=True)
            proc.send_signal(signal.SIGTERM)
    code = proc.wait(timeout=timeout_s)
    return code, time.time() - t0


def final_params(tmp):
    from svol_tpu.train.checkpoints import find_latest_checkpoint
    import orbax.checkpoint as ocp

    path = find_latest_checkpoint(os.path.join(tmp, "save"))
    assert path, f"no checkpoint under {tmp}/save"
    restored = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    return path, restored["params"] if "params" in restored else restored


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--steps_per_dispatch", type=int, default=8)
    ap.add_argument("--frames_per_video", type=int, default=40)
    ap.add_argument("--out", default="soak_report.json")
    ap.add_argument("--keep", action="store_true",
                    help="keep the work dirs for inspection")
    args = ap.parse_args()

    from svol_tpu.data.synthetic import generate_synthetic_dataset

    work = tempfile.mkdtemp(prefix="svol_soak_")
    root = os.path.join(work, "fixture")
    print(f"[soak] fixture at {root}", flush=True)
    generate_synthetic_dataset(root, frames_per_video=args.frames_per_video)

    report = {"iters": args.iters, "bs": args.bs,
              "steps_per_dispatch": args.steps_per_dispatch}

    tmp_a = os.path.join(work, "run_a")
    os.makedirs(tmp_a)
    print("[soak] run A (uninterrupted)", flush=True)
    code_a, wall_a = run_supervised(root, tmp_a, args.iters, args.bs,
                                    args.steps_per_dispatch)
    assert code_a == 0, f"baseline run exited {code_a}"
    report["run_a"] = {"exit": code_a, "wall_s": round(wall_a, 1),
                      "frames_per_s_incl_input": round(
                          args.iters * args.bs * 32 / wall_a, 1)}

    tmp_b = os.path.join(work, "run_b")
    os.makedirs(tmp_b)
    print("[soak] run B (SIGTERM mid-run, then supervisor relaunch)",
          flush=True)
    code_b1, wall_b1 = run_supervised(root, tmp_b, args.iters, args.bs,
                                      args.steps_per_dispatch,
                                      kill_after_frac=0.4)
    from svol_tpu.train.preemption import EXIT_PREEMPTED

    assert code_b1 == EXIT_PREEMPTED, (
        f"expected graceful preemption exit {EXIT_PREEMPTED}, got {code_b1}")
    print("[soak] relaunching supervisor (scheduler's next incarnation)",
          flush=True)
    code_b2, wall_b2 = run_supervised(root, tmp_b, args.iters, args.bs,
                                      args.steps_per_dispatch)
    assert code_b2 == 0, f"relaunched run exited {code_b2}"
    report["run_b"] = {"exit_first": code_b1, "exit_second": code_b2,
                      "wall_s": round(wall_b1 + wall_b2, 1)}

    import numpy as np
    import jax

    path_a, params_a = final_params(tmp_a)
    path_b, params_b = final_params(tmp_b)
    leaves_a = jax.tree.leaves(params_a)
    leaves_b = jax.tree.leaves(params_b)
    assert len(leaves_a) == len(leaves_b)
    max_delta = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                    for a, b in zip(leaves_a, leaves_b))
    report["final_params_max_abs_delta"] = max_delta
    report["bit_identical"] = max_delta == 0.0
    report["checkpoints"] = {"a": path_a, "b": path_b}
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)
    assert report["bit_identical"], (
        f"kill-and-resume diverged from the uninterrupted run: {max_delta}")
    print("[soak] OK")


if __name__ == "__main__":
    main()
