"""Torch-reference harness: run the REAL upstream SVOL stack side by side.

Builds the reference's actual modeling/inference code (lib/modeling/*,
test.py:113-175) on CPU torch so its outputs can be compared row-for-row
against this repo's — the machinery behind the one-command parity report
(``python -m svol_tpu.utils.parity_report``) and the e2e parity tests
(tests/test_e2e_jsonl_parity.py).

What it provides:
  * import shims for apex/torchvision (the reference imports both
    unconditionally — test.py:22, backbone.py:6 — but neither is installed
    in this image, and torchvision could not download weights anyway);
    a REAL torchvision is used untouched when importable.
  * ``load_reference_test(argv)`` — import the reference's test.py under a
    non-clashing module name with a chosen flag set (lib/configs.py:179
    parses sys.argv at import time).
  * torchvision-STRUCTURE BasicBlock resnets whose state-dict keys match
    torchvision's exactly, so real ImageNet ``.pth`` files load into them
    (``TorchvisionResNet``) and the reference's Sequential truncation
    (backbone.py:135-141) applies unchanged.
  * ``reference_argv_from_config`` — map our dataclass config onto the
    reference's CLI flags so both sides build the same architecture.

This module imports torch at module level: import it only from host-side
tooling (CLI/tests), never from device code paths.
"""
from __future__ import annotations

import importlib.machinery
import importlib.util
import sys
import types
from typing import Dict, List, Optional, Sequence

import numpy as np
import torch
from torch import nn

DEFAULT_REFERENCE = "/root/reference"


def shim_module(name: str) -> types.ModuleType:
    """A fake module with a REAL ModuleSpec: transformers probes
    importlib.util.find_spec('apex'), which raises on spec-less modules."""
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return m


def install_shims() -> List[str]:
    """apex + torchvision stand-ins so the reference imports on this image.

    apex raises ImportError at test.py:22 otherwise; torchvision provides
    transforms for svol_dataset, box_area for box_utils, and the resnet
    constructor NAMES for backbone.py:6 — the names are never called here
    (the harness builds its own torchvision-structure resnets). A really
    installed torchvision/apex is left untouched. Returns the module names
    created, for the caller to remove (``remove_shims``)."""
    created = []
    if "apex" not in sys.modules and importlib.util.find_spec("apex") is None:
        apex = shim_module("apex")
        apex_parallel = shim_module("apex.parallel")
        apex_parallel.DistributedDataParallel = object
        apex_amp = shim_module("apex.amp")
        apex.parallel = apex_parallel
        apex.amp = apex_amp
        for n, m in (("apex", apex), ("apex.parallel", apex_parallel),
                     ("apex.amp", apex_amp)):
            sys.modules[n] = m
            created.append(n)
    have_tv = ("torchvision" in sys.modules
               or importlib.util.find_spec("torchvision") is not None)
    if not have_tv:
        def _box_area(boxes):
            return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

        def _unavailable(*a, **k):  # pragma: no cover
            raise RuntimeError("torchvision is not installed in this image")

        tv = shim_module("torchvision")
        tv_tf = shim_module("torchvision.transforms")
        tv_models = shim_module("torchvision.models")
        for nm in ("resnet18", "resnet34", "resnet50"):
            setattr(tv_models, nm, _unavailable)
        for nm in ("ResNet18_Weights", "ResNet34_Weights", "ResNet50_Weights"):
            setattr(tv_models, nm, types.SimpleNamespace(IMAGENET1K_V1=None,
                                                         IMAGENET1K_V2=None))
        tv_ops = shim_module("torchvision.ops")
        tv_boxes = shim_module("torchvision.ops.boxes")
        tv_boxes.box_area = _box_area
        tv_ops.boxes = tv_boxes
        tv.transforms = tv_tf
        tv.models = tv_models
        tv.ops = tv_ops
        for n, m in (("torchvision", tv), ("torchvision.transforms", tv_tf),
                     ("torchvision.models", tv_models),
                     ("torchvision.ops", tv_ops),
                     ("torchvision.ops.boxes", tv_boxes)):
            sys.modules[n] = m
            created.append(n)
    return created


def remove_shims(created: Sequence[str]) -> None:
    """The shims must not linger: a spec-less fake torchvision breaks
    transformers' find_spec probe in unrelated code."""
    for n in created:
        sys.modules.pop(n, None)


def load_reference_test(argv: Sequence[str],
                        ref_path: str = DEFAULT_REFERENCE):
    """Import ``<ref_path>/test.py`` under module name ``svol_ref_test``
    with ``argv`` as its flag set (lib/configs.py:179 runs argparse on
    import, so the flags must be staged in sys.argv for the import)."""
    if ref_path not in sys.path:
        sys.path.insert(0, ref_path)
    created = install_shims()
    argv_save = sys.argv
    sys.argv = ["test.py"] + list(argv)
    try:
        spec = importlib.util.spec_from_file_location(
            "svol_ref_test", f"{ref_path}/test.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules["svol_ref_test"] = mod
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.argv = argv_save
        remove_shims(created)


def reference_argv_from_config(cfg) -> List[str]:
    """Our dataclass config -> the reference CLI flags that build the same
    architecture (lib/configs.py names; model-relevant subset)."""
    m, d = cfg.model, cfg.data
    argv = [
        "--num_frames", str(d.num_frames),
        "--num_queries", str(m.num_queries),
        "--num_queries_per_frame", str(m.num_queries_per_frame),
        "--hidden_dim", str(m.hidden_dim),
        "--nheads", str(m.nheads),
        "--num_layers", str(m.num_layers),
        "--backbone", m.backbone,
        "--sketch_head", m.sketch_head,
        "--input_dropout", str(m.input_dropout),
        "--n_input_proj", str(m.n_input_proj),
        "--dropout", str(m.dropout),
        "--dim_feedforward", str(m.dim_feedforward),
        "--sketch_position_embedding", m.sketch_position_embedding,
        "--video_position_embedding", m.video_position_embedding,
        "--matcher", cfg.loss.matcher,
        "--set_cost_bbox", str(int(cfg.loss.set_cost_bbox)),
        "--set_cost_giou", str(int(cfg.loss.set_cost_giou)),
        "--set_cost_class", str(int(cfg.loss.set_cost_class)),
        "--eos_coef", str(cfg.loss.eos_coef),
    ]
    if m.pre_norm:
        argv.append("--pre_norm")
    if not m.aux_loss:
        argv.append("--no_aux_loss")
    return argv


# ---------------------------------------------------------------------------
# torchvision-structure BasicBlock resnets. State-dict keys match
# torchvision's exactly (conv1.weight, layer1.0.conv1.weight, ...), so real
# ImageNet .pth files load with strict=True, and the reference's Sequential
# truncation (backbone.py:135-141) + our torch_port converters both apply.
# ---------------------------------------------------------------------------


class BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchvisionResNet(nn.Module):
    """BasicBlock resnet with torchvision's attribute names AND child order
    (conv1, bn1, relu, maxpool, layer1..4, avgpool, fc), so
    ``nn.Sequential(*list(model.children())[:-2])`` reproduces the
    reference's backbone wrapping exactly and torchvision ``.pth`` state
    dicts load with strict=True."""

    STAGES = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3)}

    def __init__(self, stage_sizes: Sequence[int], num_classes: int = 1000):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        for i, (blocks, cout, stride) in enumerate(
                zip(stage_sizes, (64, 128, 256, 512), (1, 2, 2, 2)), start=1):
            layer = []
            for b in range(blocks):
                layer.append(BasicBlock(cin if b == 0 else cout, cout,
                                        stride if b == 0 else 1))
            setattr(self, f"layer{i}", nn.Sequential(*layer))
            cin = cout
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(512, num_classes)


def randomize_bn_stats(module: nn.Module, rng: np.random.Generator) -> None:
    """Non-trivial running stats: identity stats would hide mean/var-porting
    bugs (convert_resnet* must carry them verbatim)."""
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            c = m.num_features
            m.running_mean.copy_(torch.from_numpy(
                rng.normal(scale=0.1, size=(c,)).astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(
                rng.uniform(0.7, 1.3, size=(c,)).astype(np.float32)))
            m.weight.data.copy_(torch.from_numpy(
                rng.uniform(0.8, 1.2, size=(c,)).astype(np.float32)))
            m.bias.data.copy_(torch.from_numpy(
                rng.normal(scale=0.05, size=(c,)).astype(np.float32)))


def synth_resnet_state_dict(arch: str, seed: int = 0) -> Dict[str, torch.Tensor]:
    """A torchvision-format state dict with random weights + non-trivial BN
    stats — stands in for a real ImageNet ``.pth`` in no-egress smoke tests
    of the parity pipeline (same keys, same shapes)."""
    torch.manual_seed(seed)
    model = TorchvisionResNet(TorchvisionResNet.STAGES[arch])
    with torch.no_grad():
        randomize_bn_stats(model, np.random.default_rng(seed))
    return model.state_dict()


# torchvision attribute name -> index in the reference's Sequential
# wrapping (inverse of torch_port._SEQ_TO_TORCHVISION; children order
# conv1,bn1,relu,maxpool,layer1..4 — backbone.py:137-141)
_TV_TO_SEQ = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
              "layer3": "6", "layer4": "7"}


def _resnet_children(stage_sizes: Sequence[int]):
    """conv1,bn1,relu,maxpool,layer1..4 — torchvision child order WITHOUT
    avgpool/fc, so module construction consumes the torch RNG exactly like
    the e2e fixture always has (adding an fc here would shift every
    downstream seeded draw and silently re-roll the golden weights)."""
    mods = [
        nn.Conv2d(3, 64, 7, 2, 3, bias=False),
        nn.BatchNorm2d(64),
        nn.ReLU(inplace=True),
        nn.MaxPool2d(3, 2, 1),
    ]
    cin = 64
    for blocks, cout, stride in zip(stage_sizes, (64, 128, 256, 512),
                                    (1, 2, 2, 2)):
        layer = []
        for b in range(blocks):
            layer.append(BasicBlock(cin if b == 0 else cout, cout,
                                    stride if b == 0 else 1))
        mods.append(nn.Sequential(*layer))
        cin = cout
    return mods


def _load_torchvision_sd(seq: nn.Sequential, sd: Dict, arch: str) -> None:
    """Load a torchvision-format state dict (conv1.weight, layer1.0....)
    into the reference's Sequential wrapping (index-keyed). fc/avgpool keys
    are dropped (the truncation removed those modules)."""
    translated = {}
    for k, v in sd.items():
        head, _, tail = k.partition(".")
        idx = _TV_TO_SEQ.get(head)
        if idx is not None:
            translated[f"{idx}.{tail}"] = torch.as_tensor(np.asarray(v))
    missing, unexpected = seq.load_state_dict(translated, strict=False)
    missing = [k for k in missing if not k.endswith("num_batches_tracked")]
    if missing or unexpected:
        raise ValueError(
            f"state dict does not match torchvision {arch}: "
            f"missing {missing[:5]}, unexpected {unexpected[:5]}")


def build_reference_backbones(
    video_sd: Optional[Dict] = None,
    sketch_sd: Optional[Dict] = None,
    seed: int = 0,
):
    """(video_backbone, sketch_backbone) Sequentials exactly as the
    reference wraps them: resnet34 children [:-2] for video (keeps the 7x7
    feature map), resnet18 children [:-1] for sketch (keeps avgpool) —
    backbone.py:135-141. State dicts are torchvision-format; None leaves
    seeded random weights with randomized BN stats (construction/draw order
    is part of the golden-weight contract — see _resnet_children)."""
    torch.manual_seed(seed)
    rng = np.random.default_rng(seed)
    video_mods = _resnet_children((3, 4, 6, 3))
    sketch_mods = _resnet_children((2, 2, 2, 2))
    video_backbone = nn.Sequential(*video_mods)
    sketch_backbone = nn.Sequential(*sketch_mods, nn.AdaptiveAvgPool2d(1))
    with torch.no_grad():
        randomize_bn_stats(video_backbone, rng)
        randomize_bn_stats(sketch_backbone, rng)
        if video_sd is not None:
            _load_torchvision_sd(video_backbone, video_sd, "resnet34")
        if sketch_sd is not None:
            _load_torchvision_sd(sketch_backbone, sketch_sd, "resnet18")
    return video_backbone, sketch_backbone
