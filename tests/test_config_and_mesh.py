"""Config CLI bridge + mesh plan sharding."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svol_tpu.config import SvolConfig, config_from_args, config_to_markdown
from svol_tpu.parallel import make_mesh_plan


def test_cli_flags_mirror_reference():
    cfg = config_from_args([
        "--root", "/data", "--sketch_dataset", "quickdraw",
        "--num_iters", "100000", "--lr_drop_step", "30000",
        "--bs", "16", "--lr", "1e-4",
        "--num_layers", "2", "--num_frames", "32",
        "--num_queries", "320", "--num_queries_per_frame", "10",
        "--set_cost_bbox", "5", "--set_cost_giou", "1", "--set_cost_class", "2",
        "--sketch_head", "svanet", "--backbone", "resnet",
        "--matcher", "per_frame_matcher",
    ])
    assert cfg.data.sketch_dataset == "quickdraw"
    assert cfg.train.num_iters == 100000
    assert cfg.model.num_queries == 320
    assert cfg.loss.set_cost_bbox == 5.0
    # run tag matches the reference checkpoint naming (train.py:280-282)
    assert cfg.run_tag() == "imagenet_vid_quickdraw_svanet_resnet_2l_32f_320q_5_1_2"


def test_no_aux_loss_flag():
    cfg = config_from_args(["--no_aux_loss"])
    assert cfg.loss.aux_loss is False and cfg.model.aux_loss is False


def test_invalid_query_grid_rejected():
    with pytest.raises(ValueError):
        config_from_args(["--num_queries", "100"])  # 100 != 32*10


def test_config_roundtrip_and_markdown():
    cfg = SvolConfig()
    again = SvolConfig.from_dict(cfg.to_dict())
    assert again.to_dict() == cfg.to_dict()
    md = config_to_markdown(cfg)
    assert "| model.hidden_dim | 256 |" in md


def test_mesh_plan_shards_batch():
    plan = make_mesh_plan()
    assert plan.data_axis_size == 8
    x = np.zeros((16, 4), np.float32)
    sharded = plan.shard_batch({"x": x})["x"]
    # batch axis split across the 8 devices
    assert len(sharded.sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in sharded.addressable_shards}
    assert shard_shapes == {(2, 4)}

    p = plan.replicate(jnp.ones((3, 3)))
    assert {s.data.shape for s in p.addressable_shards} == {(3, 3)}


def test_mesh_plan_seq_axis():
    plan = make_mesh_plan(seq_axis=2)
    assert dict(plan.mesh.shape) == {
        "pipe": 1, "data": 4, "expert": 1, "seq": 2, "model": 1}
