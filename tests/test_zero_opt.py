"""ZeRO stage-1 optimizer-state sharding (--zero_opt).

The adam moments shard over the 'data' mesh axis (each data-parallel rank
holds a disjoint 1/dp slice — parallel/mesh.py::zero_partition_spec) while
parameters stay replicated, so the train step must remain math-identical to
pure DP and its output state must keep the sharded layout (the fixed point
pinned by constrain_zero_state in train/steps.py). The reference cannot
express this: its DDP replicates the torch optimizer state on every rank
(/root/reference/train.py:94-99).
"""
import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from svol_tpu.losses.criterion import build_criterion
from svol_tpu.models import build_model
from svol_tpu.parallel import make_mesh_plan
from svol_tpu.parallel.mesh import zero_partition_spec
from svol_tpu.train import create_train_state, make_train_step

from test_seq_parallel import make_batch, make_cfg


def test_zero_partition_rules():
    """Moments shard their largest free dim over 'data'; params and
    non-moment optimizer leaves never match; tp rules compose."""
    mu = ("opt_state", "0", "mu")
    cases = [
        # conv kernel moment: largest divisible dim (64 at dim 2, first of
        # the ties) gets 'data'
        (mu + ("backbone", "conv1", "kernel"), (3, 3, 64, 64),
         P(None, None, "data", None)),
        # bias moment: the single dim
        (mu + ("head", "out_proj", "bias"), (32,), P("data")),
        # scalar adam count: no dim -> replicated
        (("opt_state", "0", "count"), (), P()),
        # parameter (not under opt_state): zero adds nothing — only the
        # Megatron rule applies (fc1 bias is column-sharded under tp)
        (("params", "head", "fc1", "bias"), (64,), P("model")),
        # a hypothetical model param named 'mu' must NOT match
        (("params", "head", "mu", "kernel"), (32, 32), P()),
        # indivisible dims stay replicated
        (mu + ("head", "norm", "scale"), (3,), P()),
        # composes with the Megatron rule: fc1 kernel is P(None, 'model'),
        # the moment adds 'data' on the remaining (larger) dim 0
        (mu + ("head", "fc1", "kernel"), (32, 64), P("data", "model")),
    ]
    for path, shape, want in cases:
        assert zero_partition_spec(path, shape, 4) == want, (path, shape)


def test_zero_opt_matches_dp(rng, tmp_path):
    cfg = make_cfg()
    batch = make_batch(rng)

    dp = make_mesh_plan()                    # 8-way data, replicated state
    zp = make_mesh_plan(zero_opt=True)       # 8-way data, sharded moments

    model = build_model(cfg)
    criterion = build_criterion(cfg)
    init = {k: batch[k] for k in
            ("src_sketch", "src_video", "src_sketch_mask", "src_video_mask")}

    def run(plan, steps=2):
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), init)
        state = plan.replicate(state)
        step = make_train_step(cfg, criterion, donate=False)
        db = plan.shard_batch(batch)
        with plan.activate():
            for _ in range(steps):
                state, metrics = step(state, db, jax.random.PRNGKey(1))
        return state, {k: float(v) for k, v in metrics.items()}

    zstate, zmetrics = run(zp)

    # the moments really are partitioned: every addressable shard of a mu
    # kernel holds 1/8 of the elements
    mu = zstate.opt_state[0].mu
    leaves = [x for x in jax.tree.leaves(mu) if x.size >= 64]
    assert leaves, "no shardable mu leaves found"
    sharded = [x for x in leaves
               if any(e == "data" for e in tuple(x.sharding.spec))]
    assert sharded, "no mu leaf carries a 'data' sharding"
    for x in sharded:
        shard_elems = {int(np.prod(s.data.shape)) for s in x.addressable_shards}
        assert shard_elems == {x.size // 8}, (x.shape, shard_elems)
    # ... while the params stayed replicated
    p = jax.tree.leaves(zstate.params)[0]
    assert all(s.data.shape == p.shape for s in p.addressable_shards)
    # the output layout is a fixed point: step 2 consumed step 1's state
    # without resharding (constrain_zero_state), and moments came back
    # sharded — asserted above on the post-step state.

    dstate, dmetrics = run(dp)
    for k in ("loss_overall", "loss_bbox", "loss_giou", "loss_label"):
        np.testing.assert_allclose(dmetrics[k], zmetrics[k],
                                   rtol=2e-4, atol=2e-5)
    # Parameters after 2 optimizer steps track pure DP within adam quanta.
    # The math is identical but the layouts are not: f32 grads differ at
    # ~1e-6 relative between the fusions XLA picks per layout, and adam's
    # normalization (mu_hat / (sqrt(nu_hat)+eps)) maps ANY gradient to a
    # ±lr-scale step — so for elements whose gradient is itself ~0, layout
    # noise can flip the update's sign entirely. The honest element-wise
    # bound is therefore a couple of lr (=1e-4) quanta over the 2 steps;
    # the tight grad-level agreement is asserted via the losses above.
    for zl, dl in zip(jax.tree.leaves(zstate.params),
                      jax.tree.leaves(dstate.params)):
        np.testing.assert_allclose(np.asarray(zl), np.asarray(dl),
                                   rtol=0, atol=5e-4)

    # --resume_all roundtrip: orbax saves the 'data'-sharded moments and
    # restores them back into the sharded template losslessly
    from svol_tpu.train.checkpoints import restore_checkpoint, save_checkpoint

    save_checkpoint(str(tmp_path), "zero_ckpt", zstate, cfg)
    fresh = create_train_state(cfg, model, jax.random.PRNGKey(7), init)
    fresh = zp.replicate(fresh)
    restored = restore_checkpoint(
        str(tmp_path / "zero_ckpt"), fresh, restore_all=True)
    for rl, zl in zip(jax.tree.leaves(restored.opt_state),
                      jax.tree.leaves(zstate.opt_state)):
        np.testing.assert_array_equal(np.asarray(rl), np.asarray(zl))
    rmu = [x for x in jax.tree.leaves(restored.opt_state[0].mu)
           if hasattr(x, "sharding") and x.size >= 64
           and any(e == "data" for e in tuple(x.sharding.spec))]
    assert rmu, "restored moments lost their 'data' sharding"
