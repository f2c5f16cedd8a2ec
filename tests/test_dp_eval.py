"""Data-parallel evaluation: get_results over a mesh must reproduce the
single-device JSONL rows and (exact, pad-masked) loss meters.

The eval batch shards over the mesh's 'data' axis (cli/infer.get_results);
pad_to_batch keeps the executable shape fixed so the only contract is
divisibility. The reference evaluates on one GPU only (test.py:60)."""
import jax
import numpy as np

from svol_tpu.cli.infer import get_results
from svol_tpu.config import DataConfig, ModelConfig, SvolConfig
from svol_tpu.losses.criterion import build_criterion
from svol_tpu.models import build_model
from svol_tpu.parallel import make_mesh_plan
from svol_tpu.train import create_train_state
from svol_tpu.train.steps import make_eval_step

T, K, IMG, BS = 4, 2, 48, 8


def tiny_cfg():
    return SvolConfig(
        data=DataConfig(num_frames=T, max_boxes_per_frame=K, image_size=IMG,
                        eval_bs=BS),
        model=ModelConfig(
            hidden_dim=32, nheads=4, num_layers=2, num_queries=T * K,
            num_queries_per_frame=K, cmt_dim_feedforward=64,
            compute_dtype="float32",
        ),
    )


def make_loader(rng, n_batches=2, n_real_last=5):
    """In-memory loader matching data/pipeline's (batch, extra) contract,
    with a padded tail batch (last n_real_last rows real, rest replicated)."""
    out = []
    for i in range(n_batches):
        pix = lambda shape: rng.uniform(size=shape).astype(np.float32)
        batch = {
            "src_sketch": pix((BS, 1, IMG, IMG, 3)),
            "src_video": pix((BS, T, IMG, IMG, 3)),
            "src_sketch_mask": np.ones((BS, 1), np.float32),
            "src_video_mask": np.ones((BS, T), np.float32),
        }
        boxes = rng.uniform(0.3, 0.6, size=(BS, T, K, 4)).astype(np.float32)
        valid = np.zeros((BS, T, K), bool)
        valid[:, :, 0] = True
        n_real = n_real_last if i == n_batches - 1 else BS
        if n_real < BS:  # pad rows replicate the last real example
            for arr in (*batch.values(), boxes, valid):
                arr[n_real:] = arr[n_real - 1]
        meta = [{
            "video": f"vid{i}_{b}", "sketch": "sk", "size": [64, 64],
            "frame_keys": list(range(T)),
            "track_ids": [[0] * K] * T,
        } for b in range(n_real)]
        extra = {"targets": {"boxes": boxes, "box_valid": valid},
                 "meta": meta, "n_real": n_real}
        out.append((batch, extra))
    return out


def _flat_preds(rows):
    return np.array([p for r in rows for pred in r["pred_boxes"] for p in pred])


def test_dp_eval_matches_single_device(rng):
    cfg = tiny_cfg()
    model = build_model(cfg)
    criterion = build_criterion(cfg)
    batches = make_loader(rng)
    state = create_train_state(
        cfg, model, jax.random.PRNGKey(0),
        {k: batches[0][0][k] for k in
         ("src_sketch", "src_video", "src_sketch_mask", "src_video_mask")},
    )
    eval_step = make_eval_step(cfg, criterion)

    rows_one, meters_one = get_results(
        state, eval_step, list(batches), T, plan=None)

    plan = make_mesh_plan()  # 8-way data axis; BS=8 divides
    assert BS % plan.data_axis_size == 0
    state_dp = plan.replicate(state)
    eval_step_dp = make_eval_step(cfg, criterion)
    with plan.activate():
        rows_dp, meters_dp = get_results(
            state_dp, eval_step_dp, list(batches), T, plan=plan)

    # identical row structure and near-identical numbers (the sharded
    # program reorders float reductions; JSONL values are 4-decimal rounded)
    assert len(rows_dp) == len(rows_one)
    for a, b in zip(rows_one, rows_dp):
        assert a["video"] == b["video"] and a["frame"] == b["frame"]
        assert a["gt_boxes"] == b["gt_boxes"]
    np.testing.assert_allclose(
        _flat_preds(rows_one), _flat_preds(rows_dp), rtol=0, atol=2e-3)
    for k, m in meters_one.items():
        np.testing.assert_allclose(
            m.avg, meters_dp[k].avg, rtol=2e-4, atol=2e-5)
        assert m.count == meters_dp[k].count  # pad rows dropped identically
