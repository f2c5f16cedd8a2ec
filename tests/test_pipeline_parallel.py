"""Pipeline (GPipe) parallelism: the cross-modal transformer's layers shard
stage-wise over the mesh's 'pipe' axis and microbatches rotate through them
(svol_tpu/parallel/pipeline.py). A capability beyond the reference, which is
data-parallel only (SURVEY §2 parallelism checklist) — together with 'seq'
and 'model' this completes the dp x sp x tp x pp portfolio.

Correctness bar: microbatching only re-orders a batched computation whose
examples never interact inside the transformer, so the pipelined model must
reproduce the sequential model's numbers — forward outputs exactly, and the
full train step's losses within cross-compilation tolerance.
"""
import dataclasses

import jax
import numpy as np
import pytest

from svol_tpu.models import build_model
from svol_tpu.parallel import make_mesh_plan
from svol_tpu.parallel.pipeline import (
    microbatch_merge,
    microbatch_split,
    stack_transformer_layers,
    unstack_transformer_layers,
)
from svol_tpu.train import create_train_state, make_train_step

from test_seq_parallel import make_batch, make_cfg


def make_pp_cfg(microbatches=2, pp=2):
    cfg = make_cfg()
    cfg.train.pp_devices = pp
    cfg.train.pp_microbatches = microbatches
    cfg.validate()
    return cfg


def test_microbatch_split_merge_roundtrip(rng):
    x = rng.normal(size=(8, 3, 5)).astype(np.float32)
    for m in (1, 2, 4, 8):
        mbs = microbatch_split(jax.numpy.asarray(x), m)
        assert mbs.shape == (m, 8 // m, 3, 5)
        # microbatch m holds rows m::M (strided — keeps each microbatch
        # spread over a data-sharded batch axis)
        np.testing.assert_array_equal(np.asarray(mbs[0]), x[0::m])
        np.testing.assert_array_equal(
            np.asarray(microbatch_merge(mbs)), x)
    with pytest.raises(ValueError):
        microbatch_split(jax.numpy.asarray(x), 3)


def _init_pair(rng, microbatches=2):
    """Sequential + pipelined models with IDENTICAL weights (converted)."""
    cfg_seq = make_cfg()
    cfg_pp = make_pp_cfg(microbatches=microbatches)
    batch = make_batch(rng)
    inputs = {k: batch[k] for k in
              ("src_sketch", "src_video", "src_sketch_mask", "src_video_mask")}

    model_seq = build_model(cfg_seq)
    model_pp = build_model(cfg_pp)
    state_seq = create_train_state(cfg_seq, model_seq, jax.random.PRNGKey(0),
                                   inputs)
    state_pp = create_train_state(cfg_pp, model_pp, jax.random.PRNGKey(0),
                                  inputs)
    # same weights on both sides: convert the sequential layout
    stacked = stack_transformer_layers(state_seq.params)
    state_pp = state_pp.replace(params=stacked,
                                batch_stats=state_seq.batch_stats)
    return cfg_seq, cfg_pp, model_seq, model_pp, state_seq, state_pp, batch


def test_stack_unstack_roundtrip(rng):
    _, _, _, _, state_seq, state_pp, _ = _init_pair(rng)
    back = unstack_transformer_layers(stack_transformer_layers(
        state_seq.params))
    jax.tree.map(np.testing.assert_array_equal, back, state_seq.params)
    # converted tree matches the pipelined model's native init structure
    assert (jax.tree_util.tree_structure(stack_transformer_layers(
        state_seq.params)) == jax.tree_util.tree_structure(state_pp.params))


@pytest.mark.parametrize("microbatches", [1, 2, 4])
def test_pipelined_forward_matches_sequential(rng, microbatches):
    """Single-device forward: the GPipe schedule is a re-ordering, so
    outputs must match the sequential stack exactly (f32)."""
    (cfg_seq, cfg_pp, model_seq, model_pp,
     state_seq, state_pp, batch) = _init_pair(rng, microbatches)
    inputs = {k: batch[k] for k in
              ("src_sketch", "src_video", "src_sketch_mask", "src_video_mask")}

    def fwd(model, state):
        variables = {"params": state.params}
        if state.batch_stats is not None and len(state.batch_stats):
            variables["batch_stats"] = state.batch_stats
        return model.apply(variables, **inputs, train=False)

    out_seq = jax.jit(lambda s: fwd(model_seq, s))(state_seq)
    out_pp = jax.jit(lambda s: fwd(model_pp, s))(state_pp)
    for k in ("pred_logits", "pred_boxes", "aux_logits", "aux_boxes"):
        np.testing.assert_allclose(
            np.asarray(out_seq[k]), np.asarray(out_pp[k]),
            rtol=1e-5, atol=1e-6, err_msg=k)


def test_pipeline_parallel_matches_dp(rng):
    """Full train step on the mesh: (pipe=2, data=4) must reproduce the
    pure-DP losses, with the stacked stage axis REALLY sharded over 'pipe'."""
    (cfg_seq, cfg_pp, model_seq, model_pp,
     state_seq, state_pp, batch) = _init_pair(rng)

    dp = make_mesh_plan()                # 1 x 8 x 1 x 1
    pp = make_mesh_plan(pipe_axis=2)     # 2 x 4 x 1 x 1

    placed = pp.replicate(state_pp)
    layers = placed.params["head"]["transformer"]["layers"]
    leaf = jax.tree.leaves(layers)[0]
    shard_shapes = {s.data.shape for s in leaf.addressable_shards}
    # stage axis (num_layers=2) split 2-way over 'pipe'
    assert shard_shapes == {(1,) + leaf.shape[1:]}, shard_shapes
    # optimizer state mirrors the param shardings
    mu_leaf = jax.tree.leaves(
        placed.opt_state[0].mu["head"]["transformer"]["layers"])[0]
    assert {s.data.shape for s in mu_leaf.addressable_shards} == {
        (1,) + mu_leaf.shape[1:]}

    from svol_tpu.losses.criterion import build_criterion

    def run(plan, cfg, state):
        criterion = build_criterion(cfg)
        state = plan.replicate(state)
        step = make_train_step(cfg, criterion, donate=False)
        db = plan.shard_batch(dict(batch))
        with plan.activate():
            state, metrics = step(state, db, jax.random.PRNGKey(1))
        return {k: float(v) for k, v in metrics.items()}

    m_dp = run(dp, cfg_seq, state_seq)
    m_pp = run(pp, cfg_pp, state_pp)
    for k in ("loss_overall", "loss_bbox", "loss_giou", "loss_label"):
        np.testing.assert_allclose(m_dp[k], m_pp[k], rtol=5e-4, atol=5e-5)


def test_cross_layout_resume(rng, tmp_path):
    """A sequential checkpoint --resumes into a pipelined run (and back):
    restore_checkpoint converts the transformer layout on layout mismatch
    (train/checkpoints.py::_restore_converted)."""
    from svol_tpu.train.checkpoints import (
        restore_checkpoint,
        save_checkpoint,
    )

    (cfg_seq, cfg_pp, _, _, state_seq, state_pp, _) = _init_pair(rng)
    path = save_checkpoint(str(tmp_path), "seq_ckpt", state_seq, cfg_seq)

    fresh_pp = state_pp.replace(
        params=jax.tree.map(lambda x: x * 0, state_pp.params))
    restored = restore_checkpoint(path, fresh_pp)
    jax.tree.map(np.testing.assert_array_equal,
                 restored.params, state_pp.params)

    # the reverse direction: a pipelined checkpoint into a sequential run
    pp_path = save_checkpoint(str(tmp_path), "pp_ckpt", state_pp, cfg_pp)
    fresh_seq = state_seq.replace(
        params=jax.tree.map(lambda x: x * 0, state_seq.params))
    restored_seq = restore_checkpoint(pp_path, fresh_seq)
    jax.tree.map(np.testing.assert_array_equal,
                 restored_seq.params, state_seq.params)

    # full-state resume across layouts is explicitly unsupported
    with pytest.raises(ValueError, match="resume_all across pipeline"):
        restore_checkpoint(path, fresh_pp, restore_all=True)


def test_pp_config_validation():
    cfg = make_cfg()
    cfg.train.pp_devices = 2
    cfg.train.tp_devices = 2
    with pytest.raises(ValueError, match="sp_devices == tp_devices == 1"):
        cfg.validate()
    cfg = make_cfg()
    cfg.train.pp_devices = 3  # num_layers=2
    with pytest.raises(ValueError, match="divide num_layers"):
        cfg.validate()
    cfg = make_cfg()
    cfg.train.pp_devices = 2
    cfg.train.pp_microbatches = 3  # bs=16 not divisible
    with pytest.raises(ValueError, match="divisible by"):
        cfg.validate()
