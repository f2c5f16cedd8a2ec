"""CLI entry points run end-to-end as subprocesses on the fixture dataset
(CPU backend). Protects the user-facing surface: flag parsing, logging,
results/checkpoint writing."""
import json
import os
import subprocess

import numpy as np
import sys

import pytest

from svol_tpu.data.synthetic import generate_synthetic_dataset

T, K, IMG = 2, 2, 48


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("svol_cli_fixture"))
    generate_synthetic_dataset(root, frames_per_video=6)
    return root


def run_cli(module, args, tmp, timeout=560):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/svol_xla_cache"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return subprocess.run(
        [sys.executable, "-m", module] + args,
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )


COMMON = lambda root, tmp: [
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
]


def test_infer_cli_random_init(fixture_root, tmp_path):
    r = run_cli("svol_tpu.cli.infer",
                COMMON(fixture_root, str(tmp_path)) + ["--debug"], str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "SVOL-full-mIoU@R1" in r.stdout
    results = [f for f in os.listdir(tmp_path / "results") if f.endswith(".jsonl")]
    assert results
    with open(tmp_path / "results" / results[0]) as f:
        row = json.loads(f.readline())
    assert set(row) == {"video", "sketch", "shape", "frame", "gt_boxes", "pred_boxes"}


def test_train_cli_debug_mode(fixture_root, tmp_path):
    r = run_cli(
        "svol_tpu.cli.train",
        COMMON(fixture_root, str(tmp_path)) + [
            "--debug", "--num_iters", "2", "--val_interval", "1",
            "--log_interval", "1", "--early_stop_patience", "-1",
            # fast-val wiring (evaluate/device.py): selection via on-device
            # mIoU@R1; full host suite still runs on new-best + at the end
            "--fast_val",
        ],
        str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics_path = tmp_path / "logs" / "metrics.jsonl"
    assert metrics_path.exists()
    phases = {json.loads(l)["phase"] for l in open(metrics_path)}
    assert "train" in phases and "val" in phases
    # best checkpoint saved under the reference naming scheme
    saves = os.listdir(tmp_path / "save")
    assert any(s.startswith("best_model_imagenet_vid_sketchy_svanet") for s in saves)


def test_train_cli_steps_per_dispatch(fixture_root, tmp_path):
    """--steps_per_dispatch 2: two scanned 2-step dispatch groups cover
    num_iters=4; logging/validation/checkpointing land at group boundaries
    and per-sub-step loss meters drain from the stacked metrics."""
    r = run_cli(
        "svol_tpu.cli.train",
        COMMON(fixture_root, str(tmp_path)) + [
            "--num_iters", "4", "--steps_per_dispatch", "2",
            "--val_interval", "2", "--log_interval", "2",
            "--early_stop_patience", "-1", "--fast_val",
        ],
        str(tmp_path),
        timeout=900,  # compiles the scan-of-2 program cold on 1 CPU core
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics_path = tmp_path / "logs" / "metrics.jsonl"
    assert metrics_path.exists()
    rows = [json.loads(l) for l in open(metrics_path)]
    phases = {row["phase"] for row in rows}
    assert "train" in phases and "val" in phases
    # groups end at iters 1 and 3 -> validation fires twice (interval 2)
    assert sum(1 for row in rows if row["phase"] == "val") == 2
    saves = os.listdir(tmp_path / "save")
    assert any(s.startswith("best_model_imagenet_vid_sketchy_svanet") for s in saves)


def test_infer_cli_from_export(fixture_root, tmp_path):
    """Serving loop closed at the CLI surface: export a (seed-deterministic)
    model, then evaluate THROUGH the frozen artifact with
    `infer --from_export` — no checkpoint or model code on the eval side.
    Row/metric parity vs the live path is proven in-process
    (tests/test_export.py::test_exported_eval_step_row_parity)."""
    export_dir = os.path.join(str(tmp_path), "artifact")
    r = run_cli(
        "svol_tpu.cli.export",
        COMMON(fixture_root, str(tmp_path)) + [
            "--export_dir", export_dir, "--export_bs", "4",
            "--export_pixels", "uint8",
        ],
        str(tmp_path),
        timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(export_dir, "exported.stablehlo"))

    r = run_cli(
        "svol_tpu.cli.infer",
        COMMON(fixture_root, str(tmp_path)) + [
            "--from_export", export_dir, "--debug",
        ],
        str(tmp_path),
        timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    results = os.listdir(tmp_path / "results")
    metrics_files = [f for f in results if f.endswith("_metrics.json")]
    assert metrics_files, results
    with open(tmp_path / "results" / metrics_files[0]) as f:
        metrics = json.load(f)
    assert "SVOL-full-mIoU@R1" in metrics["brief"]


def test_train_cli_accum_steps(fixture_root, tmp_path):
    """--accum_steps 2: each iteration takes one optimizer step from two
    stacked micro-batches (effective batch 2x --bs)."""
    r = run_cli(
        "svol_tpu.cli.train",
        COMMON(fixture_root, str(tmp_path)) + [
            "--debug", "--num_iters", "2", "--val_interval", "1",
            "--log_interval", "1", "--early_stop_patience", "-1",
            "--fast_val", "--accum_steps", "2",
        ],
        str(tmp_path),
        timeout=900,  # compiles the accumulation scan cold on 1 CPU core
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics_path = tmp_path / "logs" / "metrics.jsonl"
    assert metrics_path.exists()
    rows = [json.loads(l) for l in open(metrics_path)]
    train_rows = [row for row in rows if row["phase"] == "train"]
    assert train_rows and np.isfinite(train_rows[0]["loss_overall"])
