"""Preemption-safe training: SIGTERM -> step-boundary checkpoint ->
EXIT_PREEMPTED -> relaunch-and-resume.

The reference loses everything since its last periodic save when the
scheduler evicts it (/root/reference/train.py:267-284, and its sampler
restarts the data stream on resume regardless). Here the first SIGTERM
latches a flag (train/preemption.py), the loop finishes the in-flight
step, saves a ``preempt_*`` checkpoint with the data-stream position, and
exits 75 (EX_TEMPFAIL) — which cli/supervise.py treats like any non-zero
exit: relaunch from the newest checkpoint with --resume_all.
"""
import os
import signal
import subprocess
import sys
import threading
import time

import pytest

from svol_tpu.data.synthetic import generate_synthetic_dataset
from svol_tpu.train.preemption import (
    EXIT_PREEMPTED,
    PreemptionGuard,
    preempt_checkpoint_name,
)

T, K, IMG = 2, 2, 48


# ---------------------------------------------------------------- unit --


def test_guard_latches_sigterm_and_restores_on_uninstall():
    prev = signal.getsignal(signal.SIGTERM)
    guard = PreemptionGuard().install()
    try:
        assert guard.active and not guard.requested
        os.kill(os.getpid(), signal.SIGTERM)  # handled, must not kill us
        assert guard.requested
    finally:
        guard.uninstall()
    assert signal.getsignal(signal.SIGTERM) is prev
    assert not guard.active


def test_guard_is_noop_off_main_thread():
    out = {}

    def target():
        g = PreemptionGuard().install()
        out["active"] = g.active
        g.uninstall()  # must not raise off-main either

    t = threading.Thread(target=target)
    t.start()
    t.join()
    assert out["active"] is False


def test_preempt_checkpoint_name_matches_periodic_scheme():
    from svol_tpu.config import SvolConfig

    cfg = SvolConfig()
    name = preempt_checkpoint_name(cfg, 42)
    assert name.startswith("preempt_0042_model_")
    assert cfg.run_tag() in name


# --------------------------------------------------------- end-to-end --


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("svol_preempt_fixture"))
    generate_synthetic_dataset(root, frames_per_video=6)
    return root


def _train_cmd(root, tmp, extra):
    return [sys.executable, "-m", "svol_tpu.cli.train",
            "--root", root, "--anno_root", os.path.join(root, "annos"),
            "--sketch_dataset", "sketchy",
            "--num_frames", str(T), "--num_queries", str(T * K),
            "--num_queries_per_frame", str(K), "--image_size", str(IMG),
            "--bs", "8", "--eval_bs", "4", "--num_workers", "1",
            "--loader_backend", "threads",
            "--hidden_dim", "32", "--nheads", "4", "--num_layers", "2",
            "--cmt_dim_feedforward", "64", "--dim_feedforward", "64",
            "--log_dir", os.path.join(tmp, "logs"),
            "--results_dir", os.path.join(tmp, "results"),
            "--checkpoint", os.path.join(tmp, "save"),
            "--log_interval", "1", "--early_stop_patience", "-1",
            ] + extra


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/svol_xla_cache"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


def test_sigterm_saves_boundary_checkpoint_and_resumes(fixture_root, tmp_path):
    tmp = str(tmp_path)
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    log_path = os.path.join(tmp, "stdout.txt")
    # long run so the SIGTERM always lands mid-training, high val_interval
    # so validation never runs (compile budget)
    cmd = _train_cmd(fixture_root, tmp,
                     ["--num_iters", "500", "--val_interval", "1000"])
    with open(log_path, "w") as log_f:
        proc = subprocess.Popen(cmd, stdout=log_f, stderr=subprocess.STDOUT,
                                env=_env(), cwd=cwd)
        try:
            # wait until at least one optimizer step has logged (the step is
            # compiled and the loop is live), then deliver the eviction
            deadline = time.time() + 540
            while time.time() < deadline:
                if proc.poll() is not None:
                    break
                with open(log_path) as f:
                    if "Training Logs" in f.read():
                        break
                time.sleep(0.5)
            else:
                pytest.fail("train loop never logged a step")
            assert proc.poll() is None, open(log_path).read()[-2000:]
            proc.send_signal(signal.SIGTERM)
            rc = proc.wait(timeout=300)
        finally:
            if proc.poll() is None:
                proc.kill()
                proc.wait()
    log = open(log_path).read()
    assert rc == EXIT_PREEMPTED, f"rc={rc}\n{log[-3000:]}"
    assert "preemption: SIGTERM at iter" in log

    save_dir = os.path.join(tmp, "save")
    preempts = [d for d in os.listdir(save_dir) if d.startswith("preempt_")
                and os.path.isdir(os.path.join(save_dir, d))]
    assert len(preempts) == 1, os.listdir(save_dir)
    ckpt = os.path.join(save_dir, preempts[0])
    assert os.path.exists(ckpt + ".config.json")
    step = int(preempts[0].split("_")[1])
    assert step >= 1

    # relaunch-and-resume (what cli/supervise.py does on exit!=0): restores
    # the full optimizer/step state and runs to completion
    resume_cmd = _train_cmd(
        fixture_root, tmp,
        ["--num_iters", str(step + 2), "--val_interval", "1000",
         "--resume", ckpt, "--resume_all"])
    r = subprocess.run(resume_cmd, capture_output=True, text=True,
                       timeout=560, env=_env(), cwd=cwd)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert f"resumed from {ckpt} at step {step}" in r.stdout
