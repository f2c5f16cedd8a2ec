"""Sequence-parallel (frame-axis) sharding: numerical equivalence of the
full train step between a pure-DP mesh and a (data, seq) mesh."""
import jax
import numpy as np
import pytest

from svol_tpu.config import DataConfig, ModelConfig, SvolConfig
from svol_tpu.losses.criterion import build_criterion
from svol_tpu.models import build_model
from svol_tpu.parallel import make_mesh_plan
from svol_tpu.train import create_train_state, make_train_step

T, K, IMG = 4, 2, 64
Q = T * K


def make_cfg():
    return SvolConfig(
        data=DataConfig(num_frames=T, max_boxes_per_frame=K, image_size=IMG),
        model=ModelConfig(
            hidden_dim=32, nheads=4, num_layers=2, num_queries=Q,
            num_queries_per_frame=K, cmt_dim_feedforward=64,
            compute_dtype="float32",
        ),
    )


def make_batch(rng, B=8):
    boxes = np.zeros((B, T, K, 4), np.float32)
    valid = np.zeros((B, T, K), bool)
    boxes[:, :, 0] = [0.5, 0.5, 0.2, 0.2]
    valid[:, :, 0] = True
    return {
        "src_sketch": rng.uniform(size=(B, 1, IMG, IMG, 3)).astype(np.float32),
        "src_video": rng.uniform(size=(B, T, IMG, IMG, 3)).astype(np.float32),
        "src_sketch_mask": np.ones((B, 1), np.float32),
        "src_video_mask": np.ones((B, T), np.float32),
        "boxes": boxes,
        "box_valid": valid,
    }


def run_one_step(plan, cfg, batch):
    model = build_model(cfg)
    criterion = build_criterion(cfg)
    state = create_train_state(
        cfg, model, jax.random.PRNGKey(0),
        {k: batch[k] for k in
         ("src_sketch", "src_video", "src_sketch_mask", "src_video_mask")},
    )
    state = plan.replicate(state)
    step = make_train_step(cfg, criterion, donate=False)
    db = plan.shard_batch(batch)
    with plan.activate():  # enable in-model seq-parallel constraints
        state, metrics = step(state, db, jax.random.PRNGKey(1))
    return {k: float(v) for k, v in metrics.items()}


def test_seq_parallel_matches_dp(rng):
    cfg = make_cfg()
    batch = make_batch(rng)

    dp = make_mesh_plan(seq_axis=1)  # 8 x 1
    sp = make_mesh_plan(seq_axis=2)  # 4 x 2: frames sharded 2-way
    # verify the video tensor really is frame-sharded
    db = sp.shard_batch(dict(batch))
    assert len(db["src_video"].sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in db["src_video"].addressable_shards}
    assert shard_shapes == {(2, T // 2, IMG, IMG, 3)}

    m_dp = run_one_step(dp, cfg, batch)
    m_sp = run_one_step(sp, cfg, batch)
    for k in ("loss_overall", "loss_bbox", "loss_giou", "loss_label"):
        np.testing.assert_allclose(m_dp[k], m_sp[k], rtol=2e-4, atol=2e-5)


def test_seq_parallel_long_clip_attention(rng):
    """T=64 long-clip check: with the in-model shard_video_tokens
    constraints, the video self-attention itself partitions over 'seq'
    (sharded queries, gathered keys) — losses must match pure DP, and a
    4-way seq mesh must execute (it would OOM-scale as L^2 on one device
    for truly long clips)."""
    T64 = 64
    img = 32  # 1 token/frame through the resnet trunk -> L = 64
    cfg = SvolConfig(
        data=DataConfig(num_frames=T64, max_boxes_per_frame=K, image_size=img),
        model=ModelConfig(
            hidden_dim=32, nheads=4, num_layers=2, num_queries=T64 * K,
            num_queries_per_frame=K, cmt_dim_feedforward=64,
            compute_dtype="float32",
        ),
    )
    rng_np = np.random.default_rng(11)
    B = 2
    boxes = np.zeros((B, T64, K, 4), np.float32)
    valid = np.zeros((B, T64, K), bool)
    boxes[:, :, 0] = [0.5, 0.5, 0.2, 0.2]
    valid[:, :, 0] = True
    batch = {
        "src_sketch": rng_np.uniform(size=(B, 1, img, img, 3)).astype(np.float32),
        "src_video": rng_np.uniform(size=(B, T64, img, img, 3)).astype(np.float32),
        "src_sketch_mask": np.ones((B, 1), np.float32),
        "src_video_mask": np.ones((B, T64), np.float32),
        "boxes": boxes,
        "box_valid": valid,
    }
    dp = make_mesh_plan(num_devices=2, seq_axis=1)  # 2 x 1
    sp = make_mesh_plan(num_devices=8, seq_axis=4)  # 2 x 4: frames 4-way
    db = sp.shard_batch(dict(batch))
    shard_shapes = {s.data.shape for s in db["src_video"].addressable_shards}
    assert shard_shapes == {(1, T64 // 4, img, img, 3)}

    m_dp = run_one_step(dp, cfg, batch)
    m_sp = run_one_step(sp, cfg, batch)
    for k in ("loss_overall", "loss_bbox", "loss_giou", "loss_label"):
        np.testing.assert_allclose(m_dp[k], m_sp[k], rtol=5e-4, atol=5e-5)
