"""LR schedules: steplr / multisteplr values and reducelronplateau plumbing."""
import jax
import numpy as np

from svol_tpu.config import DataConfig, ModelConfig, SvolConfig, TrainConfig
from svol_tpu.models import build_model
from svol_tpu.train.state import (
    PlateauTracker,
    create_train_state,
    current_lr,
    make_lr_schedule,
    reduce_lr_on_plateau,
)

T, K, IMG = 2, 2, 48


def cfg_with(**train_kw):
    return SvolConfig(
        data=DataConfig(num_frames=T, max_boxes_per_frame=K, image_size=IMG),
        model=ModelConfig(hidden_dim=32, nheads=4, num_layers=2,
                          num_queries=T * K, num_queries_per_frame=K,
                          cmt_dim_feedforward=32, compute_dtype="float32"),
        train=TrainConfig(lr=1e-3, lr_drop_step=100, **train_kw),
    )


def test_steplr_recurring_decay():
    # torch StepLR multiplies by gamma every step_size iterations (train.py:131)
    sched = make_lr_schedule(cfg_with(scheduler="steplr"))
    np.testing.assert_allclose(float(sched(0)), 1e-3)
    np.testing.assert_allclose(float(sched(99)), 1e-3)
    np.testing.assert_allclose(float(sched(100)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(250)), 1e-5, rtol=1e-5)


def test_multisteplr_single_drop():
    sched = make_lr_schedule(cfg_with(scheduler="multisteplr"))
    np.testing.assert_allclose(float(sched(99)), 1e-3)
    np.testing.assert_allclose(float(sched(100)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(10_000)), 1e-4, rtol=1e-5)


def test_plateau_tracker_matches_torch():
    """Drive PlateauTracker and torch's ReduceLROnPlateau with identical
    metric traces; the LR-drop steps must coincide exactly (the reference
    builds it with mode=max, factor=0.1, patience=1, threshold=0.5,
    threshold_mode=rel — train.py:134-143)."""
    import torch

    rng = np.random.default_rng(7)
    for trial in range(50):
        # short traces keep torch's lr well above its eps=1e-8 update floor,
        # so every _reduce_lr is observable as a param_group lr change
        trace = rng.uniform(0.0, 50.0, size=12)
        param = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([param], lr=1.0)
        sch = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, mode="max", factor=0.1, patience=1, threshold=0.5,
            threshold_mode="rel",
        )
        tracker = PlateauTracker(factor=0.1, patience=1, threshold=0.5)
        torch_drops, our_drops = [], []
        prev_lr = opt.param_groups[0]["lr"]
        for i, m in enumerate(trace):
            sch.step(float(m))
            lr = opt.param_groups[0]["lr"]
            if lr < prev_lr:
                torch_drops.append(i)
            prev_lr = lr
            if tracker.step(float(m)):
                our_drops.append(i)
            assert tracker.best == sch.best, (trial, i)
        assert torch_drops == our_drops, (trial, trace)


def test_reduce_lr_on_plateau_state():
    cfg = cfg_with(scheduler="reducelronplateau")
    model = build_model(cfg)
    sample = {
        "src_sketch": np.zeros((1, 1, IMG, IMG, 3), np.float32),
        "src_video": np.zeros((1, T, IMG, IMG, 3), np.float32),
        "src_sketch_mask": np.ones((1, 1), np.float32),
        "src_video_mask": np.ones((1, T), np.float32),
    }
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), sample)
    np.testing.assert_allclose(current_lr(state), 1e-3, rtol=1e-6)
    state = reduce_lr_on_plateau(state, 0.1)
    np.testing.assert_allclose(current_lr(state), 1e-4, rtol=1e-6)


def test_grad_clip_norm_sgd_exact():
    """--grad_clip_norm with sgd: update = -lr * g * min(1, clip/||g||) —
    verified against the closed form (sgd has no moment state to obscure
    the scaling). 0.0 must be the identity (the reference never clips)."""
    from svol_tpu.train.state import make_optimizer

    params = {"w": np.ones((4,), np.float32)}
    grads = {"w": np.full((4,), 3.0, np.float32)}  # ||g|| = 6
    lr, clip = 1e-2, 1.5

    def first_update(c):
        cfg = cfg_with(optimizer="sgd", scheduler="steplr", wd=0.0,
                       grad_clip_norm=c)
        cfg.train.lr = lr
        tx = make_optimizer(cfg)
        st = tx.init(params)
        upd, _ = tx.update(
            jax.tree.map(jax.numpy.asarray, grads), st, params)
        return np.asarray(upd["w"])

    unclipped = first_update(0.0)
    np.testing.assert_allclose(unclipped, -lr * 3.0, rtol=1e-6)
    clipped = first_update(clip)
    np.testing.assert_allclose(clipped, -lr * 3.0 * (clip / 6.0), rtol=1e-6)


def test_grad_clip_norm_plateau_lr_still_mutable():
    """The clip chain must stay INSIDE InjectHyperparamsState so the
    plateau scheduler's host-driven LR decay keeps working."""
    cfg = cfg_with(scheduler="reducelronplateau", grad_clip_norm=0.1)
    model = build_model(cfg)
    sample = {
        "src_sketch": np.zeros((1, 1, IMG, IMG, 3), np.float32),
        "src_video": np.zeros((1, T, IMG, IMG, 3), np.float32),
        "src_sketch_mask": np.ones((1, 1), np.float32),
        "src_video_mask": np.ones((1, T), np.float32),
    }
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), sample)
    np.testing.assert_allclose(current_lr(state), 1e-3, rtol=1e-6)
    state = reduce_lr_on_plateau(state, 0.1)
    np.testing.assert_allclose(current_lr(state), 1e-4, rtol=1e-6)
