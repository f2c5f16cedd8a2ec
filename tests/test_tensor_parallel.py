"""Tensor (model) parallelism: numerical equivalence of the full train step
between a pure-DP mesh and meshes with a non-trivial 'model' axis.

The 'model' axis shards the transformer head's attention projections
(q/k/v out-dim, out_proj in-dim) and MLP kernels (fc1 out-dim, fc2 in-dim)
— the Megatron layout: the per-head attention math partitions cleanly over
heads, and XLA inserts exactly one psum per block (after out_proj / fc2)
where the contraction dimension is sharded. A capability beyond the
reference, which is DP-only (SURVEY §2 parallelism checklist).
"""
import jax
import numpy as np
import pytest

from svol_tpu.parallel import make_mesh_plan
from svol_tpu.parallel.mesh import param_partition_spec
from jax.sharding import PartitionSpec as P

from test_seq_parallel import make_batch, make_cfg, run_one_step


def test_param_partition_rules():
    """The path->spec rules: attention/MLP kernels split column/row-wise."""
    cases = {
        ("head", "encoder", "self_attn", "q_proj", "kernel"): P(None, "model"),
        ("head", "encoder", "self_attn", "k_proj", "bias"): P("model"),
        ("head", "encoder", "self_attn", "out_proj", "kernel"): P("model", None),
        ("head", "encoder", "self_attn", "out_proj", "bias"): P(),
        ("head", "layer0", "mlp", "fc1", "kernel"): P(None, "model"),
        ("head", "layer0", "mlp", "fc1", "bias"): P("model"),
        ("head", "layer0", "mlp", "fc2", "kernel"): P("model", None),
        ("head", "layer0", "mlp", "fc2", "bias"): P(),
        ("backbone", "conv1", "kernel"): P(),
        ("head", "query_embed", "embedding"): P(),
    }
    for path, want in cases.items():
        assert param_partition_spec(path) == want, path


def test_tensor_parallel_matches_dp(rng):
    cfg = make_cfg()
    batch = make_batch(rng)

    dp = make_mesh_plan()                 # 8 x 1 x 1
    tp = make_mesh_plan(model_axis=2)     # 4 x 1 x 2: heads/ffn 2-way

    # the head's attention kernels must really be sharded on the mesh
    from svol_tpu.losses.criterion import build_criterion
    from svol_tpu.models import build_model
    from svol_tpu.train import create_train_state

    model = build_model(cfg)
    state = create_train_state(
        cfg, model, jax.random.PRNGKey(0),
        {k: batch[k] for k in
         ("src_sketch", "src_video", "src_sketch_mask", "src_video_mask")},
    )
    placed = tp.replicate(state)

    def find(tree, *names):
        out = []
        def rec(node, path):
            if isinstance(node, dict):
                for k, v in node.items():
                    rec(v, path + (k,))
            else:
                if path[-2:] == names:
                    out.append((path, node))
        rec(tree, ())
        return out

    qs = find(placed.params, "q_proj", "kernel")
    assert qs, "no q_proj kernels found"
    for path, leaf in qs:
        shapes = {s.data.shape for s in leaf.addressable_shards}
        # (D, D) kernel sharded 2-way on the output dim
        assert shapes == {(leaf.shape[0], leaf.shape[1] // 2)}, (path, shapes)
    # optimizer state (adam mu/nu) must mirror the param shardings
    mu_qs = find(placed.opt_state[0].mu, "q_proj", "kernel")
    assert mu_qs
    for path, leaf in mu_qs:
        shapes = {s.data.shape for s in leaf.addressable_shards}
        assert shapes == {(leaf.shape[0], leaf.shape[1] // 2)}, (path, shapes)

    m_dp = run_one_step(dp, cfg, batch)
    m_tp = run_one_step(tp, cfg, batch)
    for k in ("loss_overall", "loss_bbox", "loss_giou", "loss_label"):
        np.testing.assert_allclose(m_dp[k], m_tp[k], rtol=2e-4, atol=2e-5)


def test_dp_sp_tp_combined(rng):
    """All three axes at once: (data=2, seq=2, model=2) on the 8-device
    virtual mesh — the full sharding program the dryrun exercises."""
    cfg = make_cfg()
    batch = make_batch(rng)

    dp = make_mesh_plan(num_devices=2)  # 2 x 1 x 1 baseline
    combo = make_mesh_plan(seq_axis=2, model_axis=2)  # 2 x 2 x 2

    db = combo.shard_batch(dict(batch))
    shard_shapes = {s.data.shape for s in db["src_video"].addressable_shards}
    # batch 8 over data=2, frames T=4 over seq=2, replicated over model=2
    assert shard_shapes == {(4, 2, 64, 64, 3)}

    m_dp = run_one_step(dp, cfg, batch)
    m_combo = run_one_step(combo, cfg, batch)
    for k in ("loss_overall", "loss_bbox", "loss_giou", "loss_label"):
        np.testing.assert_allclose(m_dp[k], m_combo[k], rtol=5e-4, atol=5e-5)


def test_flash_kernel_runs_under_tp(rng, monkeypatch):
    """VERDICT r4 Next #7: tp>1 must NOT force attention off the fused flash
    kernel. The kernel is a custom call GSPMD cannot partition, so under TP
    it runs per-shard via shard_map over the 'model' axis
    (parallel/mesh.py::shard_map_attention_heads) — this asserts the fused
    path is really taken on a tp=2 mesh AND that its numbers match the
    einsum formulation."""
    import dataclasses

    import svol_tpu.ops.pallas.flash_attention as fa
    from svol_tpu.models import build_model
    from svol_tpu.train import create_train_state
    from svol_tpu.train.steps import make_predict_fn

    cfg = make_cfg()
    batch = make_batch(rng)
    inputs = {k: batch[k] for k in
              ("src_sketch", "src_video", "src_sketch_mask", "src_video_mask")}

    calls = {"n": 0}
    orig = fa.flash_self_attention

    def counting(q, k, v, scale):
        calls["n"] += 1
        return orig(q, k, v, scale)

    monkeypatch.setattr(fa, "flash_self_attention", counting)

    tp = make_mesh_plan(model_axis=2)  # 4 x 1 x 2

    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), inputs)
    state = tp.replicate(state)
    predict = jax.jit(make_predict_fn(model.apply))
    db = tp.shard_batch({k: batch[k] for k in inputs})
    with tp.activate():
        scores_flash, boxes_flash = predict(
            {"params": state.params, "batch_stats": state.batch_stats}, db)
        scores_flash, boxes_flash = map(np.asarray, (scores_flash, boxes_flash))
    assert calls["n"] > 0, "fused flash kernel was not traced under tp=2"

    # numerics: same weights through the einsum formulation (flash off)
    cfg_ein = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, use_flash_attention=False))
    model_ein = build_model(cfg_ein)
    predict_ein = jax.jit(make_predict_fn(model_ein.apply))
    with tp.activate():
        scores_ein, boxes_ein = predict_ein(
            {"params": state.params, "batch_stats": state.batch_stats}, db)
        scores_ein, boxes_ein = map(np.asarray, (scores_ein, boxes_ein))
    np.testing.assert_allclose(scores_flash, scores_ein, atol=2e-5)
    np.testing.assert_allclose(boxes_flash, boxes_ein, atol=2e-5)
