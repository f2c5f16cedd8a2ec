"""Porting a reference-trained FULL SVOL checkpoint (backbone + head) into a
--resume-able checkpoint (torch_port.build_reference_checkpoint) — the
migration path for users switching from the reference with a trained model.

The reference stores its backbones as nn.Sequential(*resnet.children())
(lib/modeling/backbone.py:137-141), so keys look like
``backbone.video_backbone.4.0.conv1.weight``; the head is the real reference
SVANet module (imported from /root/reference, torchvision-free). torchvision
itself is not installed, so the resnet halves are synthesized with
torchvision-shaped random tensors.
"""
import sys
from argparse import Namespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

sys.path.insert(0, "/root/reference")
try:
    from lib.modeling.svanet import build_svanet as ref_build_svanet

    HAS_REF = True
except Exception:  # pragma: no cover
    HAS_REF = False

pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference repo not importable")

from svol_tpu.config import DataConfig, ModelConfig, SvolConfig
from svol_tpu.utils.torch_port import (
    build_reference_checkpoint,
    convert_reference_model,
    split_reference_state_dict,
)

T, K, IMG, HID = 2, 2, 64, 32

# torchvision name -> reference Sequential(*children()) index
_TV_TO_SEQ = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
              "layer3": "6", "layer4": "7"}


def fake_backbone_sd(rng, stage_sizes, prefix):
    """Random torchvision-BasicBlock-resnet tensors under the reference's
    ``backbone.<which>.<seq_idx>.`` key scheme."""
    sd = {}

    def put(tv_name, arr):
        head, _, tail = tv_name.partition(".")
        sd[f"{prefix}.{_TV_TO_SEQ[head]}.{tail}" if tail
           else f"{prefix}.{_TV_TO_SEQ[head]}"] = arr

    def conv(name, cout, cin, k):
        # small scale: unnormalized gaussians explode to inf/nan through 30+
        # stacked convs; the port itself is value-exact regardless
        w = rng.normal(size=(cout, cin, k, k)) * (0.5 / np.sqrt(cin * k * k))
        put(name + ".weight", w.astype(np.float32))

    def bn(name, c):
        for suffix, val in (
            (".weight", rng.normal(size=(c,))),
            (".bias", rng.normal(size=(c,))),
            (".running_mean", rng.normal(size=(c,))),
            (".running_var", rng.uniform(0.5, 1.5, size=(c,))),
        ):
            put(name + suffix, val.astype(np.float32))

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    cin = 64
    for stage, (blocks, cout) in enumerate(
        zip(stage_sizes, (64, 128, 256, 512)), start=1
    ):
        for b in range(blocks):
            pre = f"layer{stage}.{b}"
            conv(pre + ".conv1", cout, cin if b == 0 else cout, 3)
            bn(pre + ".bn1", cout)
            conv(pre + ".conv2", cout, cout, 3)
            bn(pre + ".bn2", cout)
            if b == 0 and cin != cout:
                conv(pre + ".downsample.0", cout, cin, 1)
                bn(pre + ".downsample.1", cout)
        cin = cout
    return sd


def make_reference_checkpoint_dict(seed=0):
    rng = np.random.default_rng(seed)
    torch.manual_seed(seed)
    head = ref_build_svanet(Namespace(
        hidden_dim=HID, nheads=4, num_layers=2, input_vid_dim=512,
        input_skch_dim=512, num_queries=T * K, input_dropout=0.1,
        aux_loss=True, use_sketch_pos=True, n_input_proj=2, vis_mode=None,
        sketch_position_embedding="sine", video_position_embedding="sine",
    ))
    sd = {f"head.{k}": v.numpy() for k, v in head.state_dict().items()}
    sd.update(fake_backbone_sd(rng, (3, 4, 6, 3), "backbone.video_backbone"))
    sd.update(fake_backbone_sd(rng, (2, 2, 2, 2), "backbone.sketch_backbone"))
    return sd


def make_cfg():
    return SvolConfig(
        data=DataConfig(num_frames=T, max_boxes_per_frame=K, image_size=IMG),
        model=ModelConfig(hidden_dim=HID, nheads=4, num_layers=2,
                          num_queries=T * K, num_queries_per_frame=K,
                          cmt_dim_feedforward=2048,  # ref hard-codes 2048
                          compute_dtype="float32"),
    )


def test_split_reference_state_dict():
    sd = make_reference_checkpoint_dict()
    vid, skt, head = split_reference_state_dict(sd)
    assert "conv1.weight" in vid and "layer4.2.conv2.weight" in vid
    assert "layer4.1.bn2.running_var" in skt
    assert "query_embed.weight" in head
    with pytest.raises(ValueError, match="not a reference SVOL checkpoint"):
        split_reference_state_dict({"foo.bar": np.zeros(1)})


def test_convert_reference_model_grafts_values():
    sd = make_reference_checkpoint_dict()
    cfg = make_cfg()
    ported = convert_reference_model(sd, cfg)
    np.testing.assert_array_equal(
        ported["params"]["backbone"]["video_backbone"]["conv1"]["kernel"],
        np.transpose(sd["backbone.video_backbone.0.weight"], (2, 3, 1, 0)),
    )
    np.testing.assert_array_equal(
        ported["params"]["head"]["query_embed"], sd["head.query_embed.weight"])
    np.testing.assert_array_equal(
        ported["batch_stats"]["backbone"]["sketch_backbone"]["bn1"]["mean"],
        sd["backbone.sketch_backbone.1.running_mean"],
    )
    # wrong architecture refused
    cfg_vit = make_cfg()
    cfg_vit.model.backbone = "vit"
    with pytest.raises(NotImplementedError):
        convert_reference_model(sd, cfg_vit)


def test_build_reference_checkpoint_resumable(tmp_path):
    sd = make_reference_checkpoint_dict()
    cfg = make_cfg()
    path = build_reference_checkpoint(cfg, sd, str(tmp_path))
    from svol_tpu.models import build_model
    from svol_tpu.train.checkpoints import restore_checkpoint
    from svol_tpu.train.state import create_train_state

    model = build_model(cfg)
    sample = {
        "src_sketch": np.zeros((1, 1, IMG, IMG, 3), np.float32),
        "src_video": np.zeros((1, 1, IMG, IMG, 3), np.float32),
        "src_sketch_mask": np.ones((1, 1), np.float32),
        "src_video_mask": np.ones((1, 1), np.float32),
    }
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), sample)
    state = restore_checkpoint(path, state)
    np.testing.assert_array_equal(
        np.asarray(state.params["head"]["query_embed"]),
        sd["head.query_embed.weight"],
    )
    # the restored model must run end-to-end
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        src_sketch=np.random.default_rng(0).uniform(
            size=(1, 1, IMG, IMG, 3)).astype(np.float32),
        src_video=np.random.default_rng(1).uniform(
            size=(1, T, IMG, IMG, 3)).astype(np.float32),
        src_sketch_mask=np.ones((1, 1), np.float32),
        src_video_mask=np.ones((1, T), np.float32),
    )
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
