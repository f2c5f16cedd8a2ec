"""One-command pretrained-weight parity report (torch reference vs this repo).

This environment has zero egress, so the torchvision/HF pretrained weights
the reference's recipes assume (backbone.py:135-141) cannot be downloaded
here — but a user WITH the weight files can prove end-to-end parity in one
command:

    python -m svol_tpu.utils.parity_report \
        --resnet34 resnet34-b627a593.pth --resnet18 resnet18-f37072fd.pth \
        --out report.json

or, for a reference-TRAINED checkpoint (migration parity):

    python -m svol_tpu.utils.parity_report \
        --reference_ckpt best_model.ckpt --out report.json

What runs: the provided weights load DIRECTLY into the reference's real
torch stack (lib/modeling/model.py + test.py:113-175, imported from
--reference) and, through ``utils/torch_port.py``, into this repo's Flax
model; head weights (when only backbone files are given) are initialized
here and reverse-ported so both sides carry bit-identical parameters. Both
sides then run their own full inference path on the same fixture batch and
their own evaluator (lib/evaluate/eval.py vs svol_tpu/evaluate) — the
report records row-for-row JSONL agreement and the metric-dict deltas
against the BASELINE.md bar (mIoU within 0.5 pts).

Smoke-tested without real weights via synthesized torchvision-format state
dicts (tests/test_parity_report.py).
"""
from __future__ import annotations

import json
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

MIOU_BAR = 0.5  # BASELINE.md: mIoU parity within 0.5 points


def make_parity_batch(batch_size: int, num_frames: int, max_boxes: int,
                      image_size: int, seed: int = 0):
    """One eval batch in BOTH repos' native formats from one random sample
    (uniform pixels, 1..K boxes per frame with one deliberately empty
    frame): ((torch_inputs, ref_targets), (our_batch, our_extra))."""
    import torch

    B, T, K, IMG = batch_size, num_frames, max_boxes, image_size
    rng = np.random.default_rng(seed)
    video = rng.uniform(size=(B, T, IMG, IMG, 3)).astype(np.float32)
    sketch = rng.uniform(size=(B, 1, IMG, IMG, 3)).astype(np.float32)

    counts = rng.integers(1, K + 1, size=(B, T))
    counts[0, min(1, T - 1)] = 0  # an annotated-but-empty frame
    dense_boxes = np.zeros((B, T, K, 4), np.float32)
    dense_valid = np.zeros((B, T, K), bool)
    ref_targets = []
    metas = []
    for b in range(B):
        bboxes = {}
        track_ids = []
        for t in range(T):
            frame = []
            ids = []
            for k in range(int(counts[b, t])):
                cx, cy = rng.uniform(0.25, 0.75, 2)
                w, h = rng.uniform(0.1, 0.3, 2)
                box = np.array([cx, cy, w, h], np.float32)
                dense_boxes[b, t, k] = box
                dense_valid[b, t, k] = True
                frame.append({"track_id": 100 + 10 * b + k,
                              "bbox": torch.from_numpy(box)})
                ids.append(100 + 10 * b + k)
            bboxes[t] = frame
            track_ids.append(ids)
        ref_targets.append({
            "video": f"vid_{b}",
            "sketch": f"sketch_{b}.png",
            "size": [128, 160],
            "bboxes": bboxes,
            "num_boxes_per_frame": [int(c) for c in counts[b]],
        })
        metas.append({
            "video": f"vid_{b}",
            "sketch": f"sketch_{b}.png",
            "size": [128, 160],
            "frame_keys": list(range(T)),
            "track_ids": track_ids,
        })

    t_inputs = {
        "input_sketch": (torch.from_numpy(sketch.transpose(0, 1, 4, 2, 3)),
                         torch.ones(B, 1)),
        "input_video": (torch.from_numpy(video.transpose(0, 1, 4, 2, 3)),
                        torch.ones(B, T)),
    }
    our_batch = {
        "src_sketch": sketch,
        "src_video": video,
        "src_sketch_mask": np.ones((B, 1), np.float32),
        "src_video_mask": np.ones((B, T), np.float32),
    }
    our_extra = {
        "targets": {"boxes": dense_boxes, "box_valid": dense_valid},
        "meta": metas,
        "n_real": B,
    }
    return (t_inputs, ref_targets), (our_batch, our_extra)


def _json_rows(rows) -> List[Dict[str, Any]]:
    """Through JSON exactly as save_jsonl would write them."""
    return [json.loads(json.dumps(r)) for r in rows]


def compare_rows(ref_rows, our_rows) -> Dict[str, Any]:
    """Row-for-row comparison of the two sides' JSONL outputs
    (test.py:162-170 schema: identity fields, GT boxes, K x 5 sorted
    predictions at 4-decimal rounding)."""
    ref_rows, our_rows = _json_rows(ref_rows), _json_rows(our_rows)
    out: Dict[str, Any] = {
        "n_rows_reference": len(ref_rows),
        "n_rows_ours": len(our_rows),
    }
    if len(ref_rows) != len(our_rows):
        out.update(rows_match=False, reason="row count mismatch")
        return out
    identity_ok = True
    gt_max_delta = 0.0
    pred_max_delta = 0.0
    mismatched_after_rounding = 0
    total_values = 0
    for r, o in zip(ref_rows, our_rows):
        if list(r) != list(o):
            identity_ok = False
            continue
        for key in ("video", "sketch", "shape", "frame"):
            identity_ok &= r[key] == o[key]
        identity_ok &= ([g["track_id"] for g in r["gt_boxes"]]
                        == [g["track_id"] for g in o["gt_boxes"]])
        for rg, og in zip(r["gt_boxes"], o["gt_boxes"]):
            gt_max_delta = max(gt_max_delta, float(np.max(np.abs(
                np.array(rg["bbox"]) - np.array(og["bbox"])), initial=0.0)))
        rp, op = np.array(r["pred_boxes"]), np.array(o["pred_boxes"])
        if rp.shape != op.shape:
            identity_ok = False
            continue
        pred_max_delta = max(pred_max_delta,
                             float(np.max(np.abs(rp - op), initial=0.0)))
        mismatched_after_rounding += int((rp != op).sum())
        total_values += rp.size
    # forward parity is ~1e-5 in f32; 4-decimal rounding makes rows
    # byte-identical except for values within float noise of a .00005
    # boundary — allow a vanishing budget for those (same tolerance as
    # tests/test_e2e_jsonl_parity.py)
    out.update(
        identity_fields_equal=bool(identity_ok),
        gt_max_abs_delta=gt_max_delta,
        pred_max_abs_delta=pred_max_delta,
        values_mismatched_after_rounding=int(mismatched_after_rounding),
        total_pred_values=int(total_values),
        rows_match=bool(
            identity_ok
            and gt_max_delta <= 1e-6
            and pred_max_delta <= 1.01e-4
            and mismatched_after_rounding <= max(1, total_values // 20)
        ),
    )
    return out


def build_config(args):
    from svol_tpu.config import DataConfig, ModelConfig, SvolConfig

    T = args.num_frames
    K = args.num_queries_per_frame
    return SvolConfig(
        data=DataConfig(num_frames=T, max_boxes_per_frame=K,
                        image_size=args.image_size),
        model=ModelConfig(
            backbone=args.backbone,
            hidden_dim=args.hidden_dim, nheads=args.nheads,
            num_layers=args.num_layers,
            num_queries=T * K, num_queries_per_frame=K,
            # the reference's CrossModalTransformer hard-codes its MLP width
            # to 2048 (cross_modal_transformer.py:201)
            cmt_dim_feedforward=2048,
            input_dropout=args.input_dropout,
            # parity is a float32 statement; bf16 would fold its own noise in
            compute_dtype="float32",
        ),
    )


def build_our_state(cfg, args):
    """Our model with the provided weights grafted in; returns
    (TrainState, variables_dict)."""
    import jax

    from svol_tpu.models import build_model
    from svol_tpu.train.state import create_train_state, init_sample_batch
    from svol_tpu.utils import torch_port

    model = build_model(cfg)
    state = create_train_state(
        cfg, model, jax.random.PRNGKey(args.seed), init_sample_batch(cfg))
    variables = {"params": dict(state.params),
                 "batch_stats": dict(state.batch_stats)}
    if args.reference_ckpt:
        ported = torch_port.convert_reference_model(args.reference_ckpt, cfg)
        variables["params"] = ported["params"]
        variables["batch_stats"] = ported["batch_stats"]
    else:
        variables = torch_port.load_backbone_weights(
            variables, cfg.model.backbone,
            video_ckpt=args.resnet34, sketch_ckpt=args.resnet18,
            stem=cfg.model.resnet_stem,
        )
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])
    return state, variables


def build_reference_model(cfg, variables, args):
    """The reference's real torch model carrying the same weights.

    Backbone weights load DIRECTLY from the user's files (no round-trip
    through our converters — a converter bug must surface as a mismatch,
    not cancel out); only the head travels through the reverse port, since
    it was initialized on our side.  With --reference_ckpt the whole state
    dict loads directly and nothing is reverse-ported."""
    import torch

    from svol_tpu.utils import ref_harness, torch_port

    ref_test = ref_harness.load_reference_test(
        ref_harness.reference_argv_from_config(cfg), ref_path=args.reference)

    from lib.modeling.backbone import ResNetBackbone
    from lib.modeling.loss import build_loss as ref_build_loss
    from lib.modeling.model import SketchLocalizationModel as RefModel
    from lib.modeling.svanet import build_svanet as ref_build_svanet

    rargs = ref_test.args
    rargs.input_vid_dim = 512
    rargs.input_skch_dim = 512
    rargs.vis_mode = None

    if args.reference_ckpt:
        video_bb, sketch_bb = ref_harness.build_reference_backbones()
        tmodel = RefModel(ResNetBackbone(video_bb, sketch_bb),
                          ref_build_svanet(rargs))
        sd = torch_port.load_state_dict(args.reference_ckpt)
        tmodel.load_state_dict(
            {k: torch.as_tensor(v) for k, v in sd.items()}, strict=True)
    else:
        video_bb, sketch_bb = ref_harness.build_reference_backbones(
            video_sd=torch_port.load_state_dict(args.resnet34),
            sketch_sd=torch_port.load_state_dict(args.resnet18),
        )
        head = ref_build_svanet(rargs)
        head_sd = torch_port.export_svanet_state_dict(
            variables["params"]["head"], d_model=cfg.model.hidden_dim,
            num_layers=cfg.model.num_layers,
            n_input_proj=cfg.model.n_input_proj)
        head.load_state_dict(
            {k: torch.as_tensor(v) for k, v in head_sd.items()}, strict=True)
        tmodel = RefModel(ResNetBackbone(video_bb, sketch_bb), head)
    tmodel.eval()
    criterion = ref_build_loss(rargs)
    criterion.eval()
    return ref_test, tmodel, criterion


def run_report(args) -> Dict[str, Any]:
    import torch

    import jax

    if args.platform:
        # Bit-parity is a fixed-precision statement: the torch side runs f32
        # on the CPU, so the JAX side must too — accelerator backends round
        # conv/matmul inputs (TPU: bf16-ish default precision; measured here
        # as a uniform ~2e-3 prediction shift through the tunneled chip).
        # Must be set via jax.config AFTER import: the axon TPU plugin
        # ignores the JAX_PLATFORMS env var (CLAUDE.md).
        jax.config.update("jax_platforms", args.platform)

    from svol_tpu.cli.infer import get_results as our_get_results
    from svol_tpu.evaluate import eval_results as our_eval_results
    from svol_tpu.losses.criterion import build_criterion
    from svol_tpu.train.steps import make_eval_step

    cfg = build_config(args)
    state, variables = build_our_state(cfg, args)
    ref_test, tmodel, ref_criterion = build_reference_model(
        cfg, variables, args)

    report: Dict[str, Any] = {
        "config": {
            "backbone": cfg.model.backbone,
            "num_frames": cfg.data.num_frames,
            "image_size": cfg.data.image_size,
            "num_queries": cfg.model.num_queries,
            "hidden_dim": cfg.model.hidden_dim,
            "batch_size": args.batch_size,
            "batches": args.batches,
            "seed": args.seed,
            "weights": ({"reference_ckpt": args.reference_ckpt}
                        if args.reference_ckpt else
                        {"resnet34": args.resnet34,
                         "resnet18": args.resnet18}),
        },
    }

    ref_rows_all, our_rows_all = [], []
    ref_loss = our_loss = 0.0
    components: Dict[str, Dict[str, float]] = {}
    eval_step = make_eval_step(cfg, build_criterion(cfg))
    for i in range(args.batches):
        (t_inputs, ref_targets), (our_batch, our_extra) = make_parity_batch(
            args.batch_size, cfg.data.num_frames,
            cfg.data.max_boxes_per_frame, cfg.data.image_size,
            seed=args.seed + i)
        with torch.no_grad():
            ref_rows, ref_meters = ref_test.get_results(
                tmodel, [(t_inputs, ref_targets)], ref_criterion, "cpu")
        our_rows, our_meters = our_get_results(
            state, eval_step, [(our_batch, our_extra)],
            num_frames=cfg.data.num_frames)
        ref_rows_all += ref_rows
        our_rows_all += our_rows
        ref_loss += ref_meters["loss_overall"].avg / args.batches
        our_loss += our_meters["loss_overall"].avg / args.batches
        for k, m in ref_meters.items():
            if k in our_meters:
                c = components.setdefault(k, {"reference": 0.0, "ours": 0.0})
                c["reference"] += m.avg / args.batches
                c["ours"] += our_meters[k].avg / args.batches

    report["rows"] = compare_rows(ref_rows_all, our_rows_all)
    for c in components.values():
        c["abs_delta"] = abs(c["reference"] - c["ours"])
    # loss parity is ASSIGNMENT-sensitive: with near-degenerate predictions
    # (e.g. a fresh head) the per-frame LSAPs have equal-cost ties that the
    # two implementations break differently — the matched PAIRS then differ
    # while predictions and the total matcher cost agree, shifting the
    # bbox/giou decomposition. The gate is therefore relative, not a bitwise
    # bar like the rows (which compare the actual model outputs).
    report["loss"] = {
        "reference": float(ref_loss),
        "ours": float(our_loss),
        "abs_delta": float(abs(ref_loss - our_loss)),
        "rel_delta": float(abs(ref_loss - our_loss) / max(1e-9, abs(ref_loss))),
        "components": components,
    }

    from lib.evaluate.eval import eval_results as ref_eval_results

    ref_metrics = ref_eval_results(_json_rows(ref_rows_all), verbose=False)
    our_metrics = our_eval_results(_json_rows(our_rows_all), verbose=False)
    briefs = {
        "reference": {k: float(v) for k, v in ref_metrics["brief"].items()},
        "ours": {k: float(v) for k, v in our_metrics["brief"].items()},
    }
    deltas = {k: abs(briefs["ours"][k] - briefs["reference"][k])
              for k in briefs["reference"] if k in briefs["ours"]}
    briefs["abs_delta"] = deltas
    report["metrics"] = briefs

    miou_keys = [k for k in deltas if "mIoU" in k]
    report["pass"] = {
        "rows_match": report["rows"].get("rows_match", False),
        "metric_keys_equal": set(briefs["reference"]) == set(briefs["ours"]),
        f"miou_within_{MIOU_BAR}": bool(
            miou_keys and all(deltas[k] <= MIOU_BAR for k in miou_keys)),
        "loss_close": report["loss"]["rel_delta"] < 1e-2,
    }
    report["parity"] = all(report["pass"].values())
    report["versions"] = {
        "torch": torch.__version__,
        "jax": jax.__version__,
        "jax_backend": jax.default_backend(),
    }
    return report


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        description="End-to-end torch-reference vs svol_tpu parity report "
        "from user-provided pretrained weight files (no egress needed "
        "beyond obtaining the files). Expected artifacts: torchvision "
        "resnet34-b627a593.pth + resnet18-f37072fd.pth, or a reference-"
        "trained SVOL checkpoint.")
    p.add_argument("--resnet34", default="",
                   help="torchvision resnet34 .pth (video backbone)")
    p.add_argument("--resnet18", default="",
                   help="torchvision resnet18 .pth (sketch backbone)")
    p.add_argument("--reference_ckpt", default="",
                   help="reference-trained SVOL checkpoint ('model' state "
                        "dict) — checks migration parity instead of "
                        "pretrained-backbone parity")
    p.add_argument("--reference", default="/root/reference",
                   help="path to the reference SVOL repo checkout")
    p.add_argument("--out", default="parity_report.json")
    p.add_argument("--backbone", default="resnet", choices=["resnet"],
                   help="vit parity needs the reference's broken ViT path "
                        "patched (backbone.py:32,50 undefined 'device'); "
                        "see tests/test_e2e_jsonl_parity.py for the "
                        "unit-level ViT parity evidence")
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--batches", type=int, default=1)
    p.add_argument("--num_frames", type=int, default=32)
    p.add_argument("--num_queries_per_frame", type=int, default=10)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--nheads", type=int, default=8)
    p.add_argument("--num_layers", type=int, default=2)
    p.add_argument("--input_dropout", type=float, default=0.4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default="cpu",
                   help="JAX platform for our side (default cpu: parity is "
                        "an f32 statement and the torch side is CPU; "
                        "accelerator backends use reduced conv/matmul input "
                        "precision). Pass '' to keep the default backend.")
    args = p.parse_args(argv)

    if not args.reference_ckpt and not (args.resnet34 and args.resnet18):
        p.error("provide --resnet34 AND --resnet18, or --reference_ckpt")

    report = run_report(args)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2, sort_keys=False)
    verdict = "PARITY OK" if report["parity"] else "PARITY FAILED"
    print(f"{verdict}: rows_match={report['pass']['rows_match']} "
          f"pred_max_abs_delta={report['rows'].get('pred_max_abs_delta')} "
          f"miou_deltas="
          f"{ {k: round(v, 4) for k, v in report['metrics']['abs_delta'].items() if 'mIoU' in k} }")
    print(f"report written to {args.out}")
    return 0 if report["parity"] else 2


if __name__ == "__main__":
    import sys

    sys.exit(main())
