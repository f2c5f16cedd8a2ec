"""Reverse port (utils/torch_port.py export_*): our Flax trees -> reference
torch state dicts, making migration BIDIRECTIONAL.

The gold checks:
  * the exported head state dict loads into the REAL reference SVANet
    (imported live from /root/reference) with load_state_dict(strict=True) —
    every key and shape the upstream torch stack expects is present;
  * export -> convert_reference_model roundtrips every live leaf exactly
    (the two directions are inverse bijections on the live-parameter set);
  * the space-to-depth stem kernel transform inverts losslessly.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from test_reference_port import HAS_REF, make_cfg  # noqa: E402 (shims torchvision)

pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference repo not importable")

from svol_tpu.models import build_model
from svol_tpu.train.state import create_train_state
from svol_tpu.models.resnet import conv7_to_s2d_kernel
from svol_tpu.utils.torch_port import (
    convert_reference_model,
    export_reference_state_dict,
    export_svanet_state_dict,
    s2d_to_conv7_kernel,
)

T, IMG = 2, 64


def _our_variables(cfg, seed=3):
    sample = {
        "src_sketch": np.zeros((1, 1, IMG, IMG, 3), np.float32),
        "src_video": np.zeros((1, T, IMG, IMG, 3), np.float32),
        "src_sketch_mask": np.ones((1, 1), np.float32),
        "src_video_mask": np.ones((1, T), np.float32),
    }
    state = create_train_state(cfg, build_model(cfg), jax.random.PRNGKey(seed),
                               sample)
    return {"params": state.params, "batch_stats": state.batch_stats}


def test_exported_head_strict_loads_into_reference():
    """Every key/shape of the real upstream SVANet must be satisfied."""
    from argparse import Namespace

    from lib.modeling.svanet import build_svanet as ref_build_svanet

    cfg = make_cfg()
    variables = _our_variables(cfg)
    sd = export_svanet_state_dict(
        variables["params"]["head"], d_model=cfg.model.hidden_dim,
        num_layers=cfg.model.num_layers,
        n_input_proj=cfg.model.n_input_proj,
        num_classes=cfg.model.num_classes)

    head = ref_build_svanet(Namespace(
        hidden_dim=cfg.model.hidden_dim, nheads=cfg.model.nheads,
        num_layers=cfg.model.num_layers, input_vid_dim=512,
        input_skch_dim=512, num_queries=cfg.model.num_queries,
        input_dropout=0.1, aux_loss=True, use_sketch_pos=True,
        n_input_proj=2, vis_mode=None,
        sketch_position_embedding="sine", video_position_embedding="sine"))
    head.load_state_dict({k: torch.from_numpy(np.array(v, copy=True))
                          for k, v in sd.items()}, strict=True)
    # spot-check a live tensor landed where the reference reads it
    np.testing.assert_array_equal(
        head.state_dict()["query_embed.weight"].numpy(),
        np.asarray(variables["params"]["head"]["query_embed"], np.float32))


def test_export_roundtrips_through_convert():
    """export_reference_state_dict and convert_reference_model are inverse
    on every live leaf (params AND BN running stats, both backbones + head)."""
    cfg = make_cfg()
    variables = _our_variables(cfg)
    sd = export_reference_state_dict(variables, cfg)
    back = convert_reference_model(sd, cfg)

    def compare(ported, original, path=""):
        if isinstance(ported, dict):
            for k, v in ported.items():
                assert k in original, f"{path}/{k} missing in original"
                compare(v, original[k], f"{path}/{k}")
            return
        np.testing.assert_array_equal(
            np.asarray(ported, np.float32),
            np.asarray(original, np.float32), err_msg=path)

    compare(back["params"], variables["params"], "params")
    compare(back["batch_stats"], variables["batch_stats"], "batch_stats")


def test_s2d_kernel_transform_inverts():
    rng = np.random.default_rng(0)
    k7 = rng.normal(size=(7, 7, 3, 64)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(s2d_to_conv7_kernel(np.asarray(conv7_to_s2d_kernel(k7)))),
        k7)


def test_export_reference_rejects_non_reference_arch():
    cfg = make_cfg()
    cfg.model.backbone = "vit"
    with pytest.raises(NotImplementedError, match="resnet"):
        export_reference_state_dict({"params": {}, "batch_stats": {}}, cfg)
