"""Batching inference server (svol_tpu/cli/serve.py) over a frozen export.

The server is the online-serving counterpart of the reference's offline
test.py loop; these tests prove the full request path — npz parse, dynamic
batching, padded dispatch through the StableHLO artifact, JSONL-schema
response — returns exactly what the live predict path computes, and that
concurrent requests really coalesce into shared device dispatches.
"""
import io
import json
import os
import threading
import urllib.request
import urllib.error

import jax
import numpy as np
import pytest

from svol_tpu.config import DataConfig, ModelConfig, SvolConfig, TrainConfig
from svol_tpu.models import build_model
from svol_tpu.serving import export_model
from svol_tpu.train import create_train_state
from svol_tpu.train.steps import make_predict_fn

T, K, IMG, BS = 4, 3, 48, 4


def tiny_cfg(tmp):
    return SvolConfig(
        data=DataConfig(num_frames=T, max_boxes_per_frame=K, image_size=IMG),
        model=ModelConfig(
            hidden_dim=32, nheads=4, num_layers=2, num_queries=T * K,
            num_queries_per_frame=K, cmt_dim_feedforward=64,
            compute_dtype="float32", use_flash_attention=False,
            use_pallas_attention=False,
        ),
        train=TrainConfig(
            results_dir=os.path.join(tmp, "results"),
            checkpoint=os.path.join(tmp, "save"),
            log_dir=os.path.join(tmp, "logs"),
        ),
    )


def _clip(seed):
    rng = np.random.default_rng(seed)
    return {
        "src_video": rng.integers(0, 256, (T, IMG, IMG, 3), dtype=np.uint8),
        "src_sketch": rng.integers(0, 256, (1, IMG, IMG, 3), dtype=np.uint8),
    }


def _npz_bytes(arrays):
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def _post(port, body, path="/predict"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=30) as r:
        return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """Export a tiny model and run the server on an ephemeral port."""
    from svol_tpu.cli.serve import start_server

    tmp = str(tmp_path_factory.mktemp("serve"))
    cfg = tiny_cfg(tmp)
    model = build_model(cfg)
    batch = {
        "src_sketch": np.zeros((BS, 1, IMG, IMG, 3), np.uint8),
        "src_video": np.zeros((BS, T, IMG, IMG, 3), np.uint8),
        "src_sketch_mask": np.ones((BS, 1), np.float32),
        "src_video_mask": np.ones((BS, T), np.float32),
    }
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
    export_dir = export_model(cfg, state, os.path.join(tmp, "export"),
                              batch_size=BS, pixel_dtype="uint8")

    server, batcher, stats, port = start_server(
        export_dir, port=0, batch_timeout_ms=200.0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()

    variables = {"params": state.params}
    if state.batch_stats is not None and len(state.batch_stats) > 0:
        variables["batch_stats"] = state.batch_stats
    predict_live = make_predict_fn(state.apply_fn)

    yield {"port": port, "stats": stats, "variables": variables,
           "predict": predict_live}

    server.shutdown()
    server.server_close()
    batcher.stop()


def test_single_request_matches_live_predict(served):
    clip = _clip(seed=1)
    status, resp = _post(served["port"], _npz_bytes(clip))
    assert status == 200

    live_batch = {
        "src_video": np.broadcast_to(clip["src_video"], (BS, T, IMG, IMG, 3)),
        "src_sketch": np.broadcast_to(clip["src_sketch"], (BS, 1, IMG, IMG, 3)),
        "src_video_mask": np.ones((BS, T), np.float32),
        "src_sketch_mask": np.ones((BS, 1), np.float32),
    }
    live_scores, live_boxes = served["predict"](served["variables"], live_batch)
    np.testing.assert_allclose(
        np.asarray(resp["scores"]), np.asarray(live_scores)[0],
        rtol=0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(resp["boxes_xyxy"]), np.asarray(live_boxes)[0],
        rtol=0, atol=1e-5)

    # frames view: T groups of K, score-descending, 4-decimal rounding,
    # [x1, y1, x2, y2, score] rows — the reference's pred_boxes schema
    frames = resp["frames"]
    assert len(frames) == T and all(len(f) == K for f in frames)
    for f in frames:
        scores = [row[4] for row in f]
        assert scores == sorted(scores, reverse=True)
        for row in f:
            assert len(row) == 5
            assert all(v == float(f"{v:.4f}") for v in row)
    assert resp["latency_ms"] > 0


def test_sketch_rank_flexibility_and_mask_defaults(served):
    """(S, S, 3) sketches are accepted for single-sketch artifacts and
    explicit all-ones masks change nothing."""
    clip = _clip(seed=2)
    flat = dict(clip)
    flat["src_sketch"] = clip["src_sketch"][0]
    _, r_flat = _post(served["port"], _npz_bytes(flat))

    full = dict(clip)
    full["src_video_mask"] = np.ones((T,), np.float32)
    full["src_sketch_mask"] = np.ones((1,), np.float32)
    _, r_full = _post(served["port"], _npz_bytes(full))
    assert r_flat["scores"] == r_full["scores"]
    assert r_flat["boxes_xyxy"] == r_full["boxes_xyxy"]


def test_concurrent_requests_coalesce(served):
    """N parallel clients ride shared dispatches and each gets ITS OWN
    result (not a pad row or a neighbor's)."""
    stats = served["stats"]
    batches_before = stats.total_batches

    n = BS  # one full batch's worth of distinct clips
    clips = [_clip(seed=100 + i) for i in range(n)]
    responses = [None] * n
    errors = []

    def call(i):
        try:
            responses[i] = _post(served["port"], _npz_bytes(clips[i]))[1]
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors

    # every client got the answer for its own clip
    for i in range(n):
        solo = _post(served["port"], _npz_bytes(clips[i]))[1]
        np.testing.assert_allclose(
            np.asarray(responses[i]["scores"]), np.asarray(solo["scores"]),
            rtol=0, atol=1e-5)

    # and the batcher really coalesced: at least one dispatch served
    # multiple requests (the 200 ms batch window dwarfs enqueue skew)
    assert stats.total_batches > batches_before
    assert max(stats.batch_occupancy) > 1


def test_health_and_metrics_endpoints(served):
    status, health = _get(served["port"], "/healthz")
    assert status == 200
    assert health["status"] == "ok"
    assert health["batch_size"] == BS
    assert health["num_frames"] == T
    assert health["pixel_dtype"] == "uint8"

    status, metrics = _get(served["port"], "/metrics")
    assert status == 200
    assert metrics["total_requests"] >= 1
    assert metrics["latency_ms_p50"] > 0
    assert metrics["latency_ms_p99"] >= metrics["latency_ms_p50"]
    assert sum(metrics["batch_occupancy"].values()) == metrics["total_batches"]


def test_bad_requests_get_400(served):
    port = served["port"]

    def expect_code(body, code, needle):
        try:
            _post(port, body)
        except urllib.error.HTTPError as e:
            assert e.code == code
            assert needle in json.loads(e.read())["error"]
        else:
            raise AssertionError(f"expected HTTP {code}")

    expect_code(b"not an npz", 400, "npz")

    wrong_shape = _clip(seed=3)
    wrong_shape["src_video"] = wrong_shape["src_video"][:2]
    expect_code(_npz_bytes(wrong_shape), 400, "src_video")

    missing = {"src_sketch": _clip(seed=4)["src_sketch"]}
    expect_code(_npz_bytes(missing), 400, "src_video")

    wrong_dtype = _clip(seed=5)
    wrong_dtype["src_video"] = wrong_dtype["src_video"].astype(np.float64)
    expect_code(_npz_bytes(wrong_dtype), 400, "dtype")

    # unknown paths
    try:
        _get(port, "/nope")
    except urllib.error.HTTPError as e:
        assert e.code == 404
    else:
        raise AssertionError("expected HTTP 404")


def test_serve_cli_subprocess(tmp_path):
    """The real entry point (`python -m svol_tpu.cli.serve`) binds, prints
    its port, serves a prediction, and dies cleanly on SIGINT."""
    import re
    import signal
    import subprocess
    import sys
    import time

    cfg = tiny_cfg(str(tmp_path))
    model = build_model(cfg)
    batch = {
        "src_sketch": np.zeros((BS, 1, IMG, IMG, 3), np.uint8),
        "src_video": np.zeros((BS, T, IMG, IMG, 3), np.uint8),
        "src_sketch_mask": np.ones((BS, 1), np.float32),
        "src_video_mask": np.ones((BS, T), np.float32),
    }
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
    export_dir = export_model(cfg, state, str(tmp_path / "export"),
                              batch_size=BS, pixel_dtype="uint8")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/svol_xla_cache"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.Popen(
        [sys.executable, "-m", "svol_tpu.cli.serve",
         "--from_export", export_dir, "--port", "0"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    try:
        line = ""
        deadline = time.time() + 300
        while time.time() < deadline:
            line = proc.stdout.readline()
            if "serving on http" in line:
                break
        m = re.search(r":(\d+) ", line)
        assert m, f"no port in banner: {line!r}"
        port = int(m.group(1))

        status, health = _get(port, "/healthz")
        assert status == 200 and health["status"] == "ok"
        status, resp = _post(port, _npz_bytes(_clip(seed=9)))
        assert status == 200 and len(resp["frames"]) == T
    finally:
        proc.send_signal(signal.SIGINT)
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
    assert proc.returncode == 0
