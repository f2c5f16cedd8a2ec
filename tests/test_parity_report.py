"""Smoke test of the one-command parity-report CLI
(``python -m svol_tpu.utils.parity_report`` — VERDICT r4 Next #2).

Real torchvision/HF weights cannot be downloaded in this environment, so
the CLI runs here against SYNTHESIZED torchvision-format state dicts
(``ref_harness.synth_resnet_state_dict``: same keys, same shapes,
non-trivial BN stats) — exactly the artifacts a user with network access
would pass (resnet34-b627a593.pth / resnet18-f37072fd.pth). The report it
emits must say PARITY OK, because the weights on the two sides really are
identical; any converter/export/row-composition drift would flip it.

Module listed in conftest._TORCH_MODULES so it runs after the sharded-mesh
tests (torch wedges the XLA:CPU pool otherwise).
"""
import json
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

T, K, IMG, HID = 2, 2, 48, 32

REF = "/root/reference"


@pytest.fixture(scope="module")
def weight_files(tmp_path_factory):
    from svol_tpu.utils.ref_harness import synth_resnet_state_dict

    base = tmp_path_factory.mktemp("parity_weights")
    r34 = base / "resnet34-b627a593.pth"
    r18 = base / "resnet18-f37072fd.pth"
    torch.save(synth_resnet_state_dict("resnet34", seed=0), str(r34))
    torch.save(synth_resnet_state_dict("resnet18", seed=1), str(r18))
    return str(r34), str(r18)


def _tiny_argv(r34, r18, out):
    return [
        "--resnet34", r34, "--resnet18", r18,
        "--reference", REF, "--out", out,
        "--num_frames", str(T), "--num_queries_per_frame", str(K),
        "--image_size", str(IMG), "--hidden_dim", str(HID),
        "--nheads", "4", "--num_layers", "2", "--batch-size", "2",
    ]


def test_parity_report_cli_passes_on_identical_weights(weight_files, tmp_path):
    from svol_tpu.utils import parity_report

    r34, r18 = weight_files
    out = str(tmp_path / "report.json")
    rc = parity_report.main(_tiny_argv(r34, r18, out))
    assert rc == 0

    with open(out) as f:
        report = json.load(f)
    assert report["parity"] is True
    assert report["rows"]["rows_match"] is True
    assert report["rows"]["n_rows_reference"] == report["rows"]["n_rows_ours"]
    # forward parity in f32 is ~1e-5; the report must record the actual gap
    assert report["rows"]["pred_max_abs_delta"] <= 1.01e-4
    assert report["pass"]["miou_within_0.5"] is True
    # metric dicts carry the reference's exact brief keys
    assert "SVOL-full-mIoU@R1" in report["metrics"]["reference"]
    assert "SVOL-full-mIoU@R1" in report["metrics"]["ours"]
    # documented artifact names round-trip into the report
    assert report["config"]["weights"]["resnet34"].endswith(
        "resnet34-b627a593.pth")


def test_parity_report_detects_weight_divergence(weight_files, tmp_path):
    """Perturbing one VIDEO-backbone tensor on one side must flip the
    verdict — the report is evidence, not a rubber stamp. (The video trunk
    drives the box predictions directly; a sketch-side perturbation can
    hide below 4-decimal rounding at fresh-head weights.)"""
    from svol_tpu.utils import parity_report
    from svol_tpu.utils.ref_harness import synth_resnet_state_dict

    _, r18 = weight_files
    bad34 = synth_resnet_state_dict("resnet34", seed=0)
    with torch.no_grad():
        bad34["layer3.0.conv1.weight"] += 0.05
    # our side gets the perturbed file; torch side gets the original via a
    # patched loader — simulate a user passing mismatched artifacts
    bad_path = str(tmp_path / "resnet34_bad.pth")
    torch.save(bad34, bad_path)

    out = str(tmp_path / "report_bad.json")
    argv = _tiny_argv(bad_path, r18, out)

    from svol_tpu.utils import ref_harness

    orig_build = ref_harness.build_reference_backbones

    def diverging(video_sd=None, sketch_sd=None, seed=0):
        return orig_build(video_sd=synth_resnet_state_dict("resnet34", seed=0),
                          sketch_sd=sketch_sd, seed=seed)

    ref_harness.build_reference_backbones = diverging
    try:
        rc = parity_report.main(argv)
    finally:
        ref_harness.build_reference_backbones = orig_build
    assert rc == 2
    with open(out) as f:
        report = json.load(f)
    assert report["parity"] is False


def test_synth_state_dict_matches_torchvision_schema():
    """The synthesized state dicts use torchvision's exact key names — the
    contract that makes the smoke test representative of real .pth files."""
    from svol_tpu.utils.ref_harness import synth_resnet_state_dict

    sd = synth_resnet_state_dict("resnet34")
    assert "conv1.weight" in sd and sd["conv1.weight"].shape == (64, 3, 7, 7)
    assert "layer1.0.conv1.weight" in sd
    assert "layer4.2.bn2.running_var" in sd
    assert "fc.weight" in sd and sd["fc.weight"].shape == (1000, 512)
    # resnet34 layer counts: 3,4,6,3
    assert "layer2.3.conv2.weight" in sd and "layer2.4.conv1.weight" not in sd
