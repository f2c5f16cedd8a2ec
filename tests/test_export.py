"""Serving export roundtrip: export_model -> load_exported must reproduce
the live predict path exactly, with the weights baked into the artifact
(svol_tpu/serving.py). Runs the pure-XLA path (no Pallas) so the artifact is
platform-portable under the CPU test backend."""
import json
import os

import jax
import numpy as np
import pytest

from svol_tpu.config import DataConfig, ModelConfig, SvolConfig, TrainConfig
from svol_tpu.models import build_model
from svol_tpu.serving import export_model, load_exported
from svol_tpu.train import create_train_state
from svol_tpu.train.steps import make_predict_fn

T, K, IMG = 4, 3, 48


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


def sample_batch(cfg, bs, dtype=np.uint8):
    rng = np.random.default_rng(0)
    S = cfg.data.image_size
    pix = lambda shape: (
        rng.integers(0, 256, shape, dtype=np.uint8) if dtype == np.uint8
        else rng.random(shape, dtype=np.float32)
    )
    return {
        "src_sketch": pix((bs, 1, S, S, 3)),
        "src_video": pix((bs, T, S, S, 3)),
        "src_sketch_mask": np.ones((bs, 1), np.float32),
        "src_video_mask": np.ones((bs, T), np.float32),
    }


@pytest.mark.parametrize("pixel_dtype", ["uint8", "float32"])
def test_export_roundtrip(tmp_path, pixel_dtype):
    cfg = tiny_cfg(str(tmp_path))
    model = build_model(cfg)
    bs = 2
    np_dtype = np.uint8 if pixel_dtype == "uint8" else np.float32
    batch = sample_batch(cfg, bs, np_dtype)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)

    out_dir = export_model(cfg, state, str(tmp_path / "export"),
                           batch_size=bs, pixel_dtype=pixel_dtype)

    # live predict path (same function the export freezes)
    variables = {"params": state.params}
    if state.batch_stats is not None and len(state.batch_stats) > 0:
        variables["batch_stats"] = state.batch_stats
    live_scores, live_boxes = make_predict_fn(state.apply_fn)(variables, batch)

    predict, meta = load_exported(out_dir)
    scores, boxes = predict(batch)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(live_scores),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(live_boxes),
                               rtol=0, atol=1e-6)
    assert scores.shape == (bs, T * K)
    assert boxes.shape == (bs, T * K, 4)

    # meta describes the signature a serving host needs
    assert meta["inputs"]["src_video"]["shape"] == [bs, T, IMG, IMG, 3]
    assert meta["inputs"]["src_video"]["dtype"] == pixel_dtype
    assert meta["num_queries_per_frame"] == K

    # artifact is self-contained: fresh meta.json on disk matches
    with open(os.path.join(out_dir, "meta.json")) as f:
        assert json.load(f) == meta


def test_export_int8_calibrated(tmp_path):
    """The calibrated static-int8 serving config exports too: the `quant`
    scales ride in extra_variables and are baked into the artifact — the
    exported program reproduces the live static-int8 predict path exactly
    (the headline serving configuration, PERFORMANCE.md)."""
    from svol_tpu.ops.quant import calibrate_scales

    cfg = tiny_cfg(str(tmp_path))
    cfg.model.quantize = "int8"
    model = build_model(cfg)
    bs = 2
    batch = sample_batch(cfg, bs, np.float32)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)

    variables = {"params": state.params}
    if state.batch_stats is not None and len(state.batch_stats) > 0:
        variables["batch_stats"] = state.batch_stats
    quant = calibrate_scales(model, variables, [batch], max_batches=1)
    assert jax.tree_util.tree_leaves(quant), "calibration collected no scales"

    out_dir = export_model(cfg, state, str(tmp_path / "export"),
                           batch_size=bs, pixel_dtype="float32",
                           extra_variables={"quant": quant})
    # Compare against the *jitted* live path — the exact program the export
    # froze. (Un-jitted eager int8 differs by whole quant steps: any
    # ulp-level fusion difference upstream of a round() flips int8 levels
    # and cascades — measured 4.6e-4 eager-vs-jit on this fixture, while
    # the serialize/deserialize roundtrip itself is bit-exact.)
    allvars = {**variables, "quant": quant}
    live_fn = make_predict_fn(state.apply_fn)
    live = jax.jit(lambda b: live_fn(allvars, b))(batch)

    predict, meta = load_exported(out_dir)
    got = predict(batch)
    for g, l in zip(got, live):
        np.testing.assert_allclose(np.asarray(g), np.asarray(l),
                                   rtol=0, atol=0)
    assert meta["quantize"] == "int8"


def test_export_rejects_wrong_shape(tmp_path):
    cfg = tiny_cfg(str(tmp_path))
    model = build_model(cfg)
    batch = sample_batch(cfg, 2)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
    out_dir = export_model(cfg, state, str(tmp_path / "export"), batch_size=2)
    predict, _ = load_exported(out_dir)
    bad = sample_batch(cfg, 3)  # exported at bs=2: static shapes must reject
    with pytest.raises(Exception):
        jax.block_until_ready(predict(bad))


def test_exported_eval_step_row_parity(tmp_path):
    """The full JSONL assembly through make_exported_eval_step produces the
    same rows as the live eval path on the same weights: the serving
    artifact is metric-equivalent, not just tensor-equivalent. Also covers
    the uint8-loader -> float32-artifact pixel conversion (exact /255)."""
    from svol_tpu.cli.infer import get_results
    from svol_tpu.losses.criterion import build_criterion
    from svol_tpu.serving import make_exported_eval_step
    from svol_tpu.train.steps import make_eval_step

    cfg = tiny_cfg(str(tmp_path))
    bs = 2
    cfg.data.eval_bs = bs
    model = build_model(cfg)
    criterion = build_criterion(cfg)
    batch = sample_batch(cfg, bs, np.uint8)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)

    rng = np.random.default_rng(1)
    targets = {
        "boxes": np.clip(rng.random((bs, T, K, 4), np.float32), 0.1, 0.4),
        "box_valid": rng.random((bs, T, K)) > 0.5,
    }
    meta = [
        {"video": f"v{b}", "sketch": "sk", "size": [64, 64],
         "frame_keys": list(range(T)), "track_ids": [[0] * K] * T}
        for b in range(bs)
    ]
    loader = [(batch, {"targets": targets, "meta": meta, "n_real": bs})]

    live_rows, live_meters = get_results(
        state, make_eval_step(cfg, criterion), loader, T)

    # float32 artifact + uint8 loader exercises the /255 conversion path
    out_dir = export_model(cfg, state, str(tmp_path / "export"),
                           batch_size=bs, pixel_dtype="float32")
    exported_rows, meters = get_results(
        None, make_exported_eval_step(str(tmp_path / "export"), cfg), loader, T)

    assert not meters  # predict-only artifact: no loss meters
    assert live_meters  # the live path does produce them
    assert len(exported_rows) == len(live_rows) > 0
    for er, lr in zip(exported_rows, live_rows):
        assert er["video"] == lr["video"] and er["frame"] == lr["frame"]
        assert er["gt_boxes"] == lr["gt_boxes"]
        np.testing.assert_allclose(
            np.asarray(er["pred_boxes"]), np.asarray(lr["pred_boxes"]),
            atol=2e-4,  # 4-decimal rounding granularity + compile noise
        )


def test_exported_eval_step_rejects_mismatch(tmp_path):
    from svol_tpu.serving import make_exported_eval_step

    cfg = tiny_cfg(str(tmp_path))
    model = build_model(cfg)
    bs = 2
    batch = sample_batch(cfg, bs, np.uint8)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
    out_dir = export_model(cfg, state, str(tmp_path / "export"), batch_size=bs)

    cfg.data.eval_bs = bs + 1
    with pytest.raises(ValueError, match="eval_bs"):
        make_exported_eval_step(out_dir, cfg)
