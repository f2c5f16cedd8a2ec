"""Activation rematerialization (--remat none|backbone|transformer|full).

The standard TPU FLOPs-for-HBM trade (jax.checkpoint via nn.remat): block /
layer activations recompute in the backward pass instead of living in HBM
across the whole backward. Capability beyond the reference (torch would need
torch.utils.checkpoint wiring it never has — /root/reference/lib/modeling/).

Correctness bar: remat must be INVISIBLE except for memory/FLOPs —
  * identical parameter tree (checkpoints oblivious to the flag),
  * an identical train step: same losses, same updated parameters,
  * compiled-artifact evidence the recompute really happens (HLO flops up,
    temp buffer bytes down with remat),
  * composition with the GPipe pipeline branch (the vmapped stage tick
    remats as a unit).
"""
import dataclasses

import jax
import numpy as np
import pytest

from svol_tpu.config import SvolConfig
from svol_tpu.losses.criterion import build_criterion
from svol_tpu.models import build_model
from svol_tpu.parallel import make_mesh_plan
from svol_tpu.train import create_train_state, make_train_step

from test_seq_parallel import make_batch, make_cfg


def _cfg(remat: str) -> SvolConfig:
    cfg = make_cfg()
    cfg.model.remat = remat
    cfg.validate()
    return cfg


def _one_step(cfg, batch, donate=False):
    """(metrics, updated params) for one full train step on 1 device."""
    model = build_model(cfg)
    inputs = {k: batch[k] for k in
              ("src_sketch", "src_video", "src_sketch_mask", "src_video_mask")}
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), inputs)
    plan = make_mesh_plan(num_devices=1)
    state = plan.replicate(state)
    step = make_train_step(cfg, build_criterion(cfg), donate=donate)
    db = plan.shard_batch(dict(batch))
    with plan.activate():
        state, metrics = step(state, db, jax.random.PRNGKey(1))
    return {k: float(v) for k, v in metrics.items()}, state.params


def _loss_and_grads(cfg, batch):
    """(loss scalar, grad tree) for the model under cfg — same init RNG, so
    remat=none/full evaluate at IDENTICAL parameters."""
    model = build_model(cfg)
    criterion = build_criterion(cfg)
    inputs = {k: batch[k] for k in
              ("src_sketch", "src_video", "src_sketch_mask", "src_video_mask")}
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), inputs)

    def loss_fn(params):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        outputs, _ = state.apply_fn(
            variables, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"], **inputs)
        losses = criterion(
            outputs, {"boxes": batch["boxes"], "box_valid": batch["box_valid"]})
        return losses["loss_overall"]

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(state.params)
    return float(loss), grads, state.params


def test_remat_is_invisible(rng):
    """Same init (param tree AND values), same loss, same gradients for
    remat=none vs remat=full — remat changes scheduling, never math. (The
    comparison is on raw gradients: Adam's rsqrt normalization would amplify
    last-ulp fusion-order noise in near-zero gradients into visible
    parameter deltas, which says nothing about remat.)"""
    batch = make_batch(rng, B=4)
    l0, g0, p0 = _loss_and_grads(_cfg("none"), batch)
    l1, g1, p1 = _loss_and_grads(_cfg("full"), batch)

    # identical init: the remat wrapper must not perturb param paths or RNG
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    for path, a in jax.tree_util.tree_leaves_with_path(g0):
        b = g1
        for key in path:
            b = b[key.key]
        # recompute changes XLA fusion boundaries, i.e. f32 summation order
        # in the conv wgrads — last-ulp noise, not a semantic difference
        # (the loss above matches to 1e-6)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-4,
            err_msg=jax.tree_util.keystr(path))


def test_remat_recomputes_in_backward(rng):
    """Compiled-artifact evidence: remat=full must RAISE the train step's
    flops — the forward really re-runs inside the backward. (Temp-buffer
    bytes are NOT asserted: at this test's toy shapes the saved activations
    are smaller than the recompute scratch, so the memory win only
    materializes at real batch/resolution — the flop delta is the
    shape-independent proof that rematerialization happens.)"""
    batch = make_batch(rng, B=4)

    def lowered(cfg):
        model = build_model(cfg)
        inputs = {k: batch[k] for k in
                  ("src_sketch", "src_video", "src_sketch_mask",
                   "src_video_mask")}
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), inputs)
        step = make_train_step(cfg, build_criterion(cfg), donate=False)
        return step.lower(state, batch, jax.random.PRNGKey(1)).compile()

    c_none = lowered(_cfg("none"))
    c_full = lowered(_cfg("full"))

    def flops(c):
        ca = c.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return ca.get("flops") if ca else None

    f0, f1 = flops(c_none), flops(c_full)
    if not (f0 and f1):
        pytest.skip("backend exposes no cost analysis")
    assert f1 > f0 * 1.05, (f0, f1)


def test_remat_composes_with_pipeline(rng):
    """remat + GPipe: the pipelined+rematted step must still reproduce the
    plain sequential step's losses (pipe=2, data=4 mesh vs 1 device)."""
    from svol_tpu.parallel.pipeline import stack_transformer_layers

    batch = make_batch(rng)
    cfg_seq = _cfg("none")
    m_seq, _ = _one_step(cfg_seq, batch)

    cfg_pp = make_cfg()
    cfg_pp.train.pp_devices = 2
    cfg_pp.train.pp_microbatches = 2
    cfg_pp.model.remat = "full"
    cfg_pp.validate()

    inputs = {k: batch[k] for k in
              ("src_sketch", "src_video", "src_sketch_mask", "src_video_mask")}
    model_seq = build_model(cfg_seq)
    state_seq = create_train_state(cfg_seq, model_seq, jax.random.PRNGKey(0),
                                   inputs)
    model_pp = build_model(cfg_pp)
    state_pp = create_train_state(cfg_pp, model_pp, jax.random.PRNGKey(0),
                                  inputs)
    state_pp = state_pp.replace(
        params=stack_transformer_layers(state_seq.params),
        batch_stats=state_seq.batch_stats)

    plan = make_mesh_plan(num_devices=8, pipe_axis=2)
    state_pp = plan.replicate(state_pp)
    step = make_train_step(cfg_pp, build_criterion(cfg_pp), donate=False)
    db = plan.shard_batch(dict(batch))
    with plan.activate():
        _, metrics = step(state_pp, db, jax.random.PRNGKey(1))

    for k in ("loss_overall", "loss_bbox", "loss_giou", "loss_label"):
        np.testing.assert_allclose(m_seq[k], float(metrics[k]), rtol=2e-4,
                                   atol=2e-5, err_msg=k)


def test_remat_config_validation():
    cfg = make_cfg()
    cfg.model.remat = "blocks"
    with pytest.raises(ValueError, match="remat"):
        cfg.validate()

    cfg = make_cfg()
    cfg.model.remat = "transformer"
    cfg.model.sketch_head = "sketch_detr"
    with pytest.raises(ValueError, match="svanet"):
        cfg.validate()

    # backbone remat is head-agnostic
    cfg = make_cfg()
    cfg.model.remat = "backbone"
    cfg.model.sketch_head = "sketch_detr"
    cfg.validate()


def test_remat_cli_flag():
    from svol_tpu.config import config_from_args

    cfg = config_from_args(["--remat", "full"])
    assert cfg.model.remat == "full"
    assert config_from_args([]).model.remat == "none"
