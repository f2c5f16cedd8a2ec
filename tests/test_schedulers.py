"""LR schedules: steplr / multisteplr values and reducelronplateau plumbing."""
import jax
import numpy as np

from svol_tpu.config import DataConfig, ModelConfig, SvolConfig, TrainConfig
from svol_tpu.models import build_model
from svol_tpu.train.state import (
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
