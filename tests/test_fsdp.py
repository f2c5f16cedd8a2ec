"""FSDP / ZeRO stage-3 state sharding (--fsdp).

Parameters AND optimizer moments shard over the 'data' mesh axis
(parallel/mesh.py::fsdp_partition_spec) — each data-parallel rank holds a
disjoint 1/dp slice of all training state. GSPMD inserts the per-layer
weight all-gathers in forward/backward and reduce-scatters the gradients,
so the step must stay math-identical to pure DP while no replicated copy of
the sharded leaves exists anywhere. The reference cannot express this: apex
DDP replicates params and optimizer state on every rank
(/root/reference/train.py:94-99).
"""
import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from svol_tpu.losses.criterion import build_criterion
from svol_tpu.models import build_model
from svol_tpu.parallel import make_mesh_plan
from svol_tpu.parallel.mesh import fsdp_partition_spec
from svol_tpu.train import create_train_state, make_train_step

from test_seq_parallel import make_batch, make_cfg


def test_fsdp_partition_rules():
    """Params and moments shard their largest free dim over 'data';
    batch_stats and non-moment optimizer leaves stay replicated; the
    Megatron tp rules compose."""
    mu = ("opt_state", "0", "mu")
    cases = [
        # conv kernel: largest divisible dim gets 'data'
        (("params", "backbone", "conv1", "kernel"), (3, 3, 64, 64),
         P(None, None, "data", None)),
        # the mirrored moment shards identically -> adam update is local
        (mu + ("backbone", "conv1", "kernel"), (3, 3, 64, 64),
         P(None, None, "data", None)),
        # bias: the single dim
        (("params", "head", "out_proj", "bias"), (32,), P("data")),
        # batch_stats leaf: replicated (not under params/opt_state moments)
        (("batch_stats", "backbone", "bn1", "mean"), (64,), P()),
        # scalar adam count: replicated
        (("opt_state", "0", "count"), (), P()),
        # indivisible dims stay replicated
        (("params", "head", "norm", "scale"), (3,), P()),
        # composes with the Megatron rule: fc1 kernel P(None,'model') plus
        # 'data' on the remaining dim
        (("params", "head", "fc1", "kernel"), (32, 64), P("data", "model")),
    ]
    for path, shape, want in cases:
        assert fsdp_partition_spec(path, shape, 4) == want, (path, shape)


def test_fsdp_matches_dp(rng):
    cfg = make_cfg()
    batch = make_batch(rng)

    fp = make_mesh_plan(fsdp=True)  # 8-way data, fully sharded state
    dp = make_mesh_plan()           # 8-way data, replicated state

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

    fstate, fmetrics = run(fp)

    # every shardable PARAM really is partitioned 8 ways
    def sharded_leaves(tree, min_size=64):
        out = []
        for x in jax.tree.leaves(tree):
            if getattr(x, "size", 0) >= min_size and any(
                    e == "data" for e in tuple(x.sharding.spec)):
                out.append(x)
        return out

    sp = sharded_leaves(fstate.params)
    assert sp, "no param leaf carries a 'data' sharding"
    for x in sp:
        shard_elems = {int(np.prod(s.data.shape)) for s in x.addressable_shards}
        assert shard_elems == {x.size // 8}, (x.shape, shard_elems)
    # ... and so are the mirrored moments (full ZeRO-3, not just stage 1)
    assert sharded_leaves(fstate.opt_state[0].mu), "moments not sharded"
    # the big conv kernels specifically must be sharded (the HBM that
    # matters), not just some bias
    big = [x for x in jax.tree.leaves(fstate.params) if x.ndim == 4
           and x.size >= 3 * 3 * 64 * 64]
    assert big and all(
        any(e == "data" for e in tuple(x.sharding.spec)) for x in big)

    dstate, dmetrics = run(dp)
    for k in ("loss_overall", "loss_bbox", "loss_giou", "loss_label"):
        np.testing.assert_allclose(dmetrics[k], fmetrics[k],
                                   rtol=2e-4, atol=2e-5)
    # Params after 2 steps track pure DP within adam quanta (same bound and
    # rationale as tests/test_zero_opt.py: layout-dependent f32 fusion noise
    # through adam's normalizer is worth a couple of lr=1e-4 quanta).
    for fl, dl in zip(jax.tree.leaves(fstate.params),
                      jax.tree.leaves(dstate.params)):
        np.testing.assert_allclose(np.asarray(fl), np.asarray(dl),
                                   rtol=0, atol=5e-4)
