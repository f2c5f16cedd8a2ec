"""END-TO-END torch-vs-JAX parity: the reference's real ``get_results``
(test.py:113-175) vs our ``cli/infer.py`` inference path, on identical
inputs through identical (ported) weights — the strongest accuracy statement
this no-dataset environment allows (VERDICT r3, Missing #3 / Next #3).

The full reference inference stack runs for real on CPU torch:
``SketchLocalizationModel`` (lib/modeling/model.py) wrapping a real
``ResNetBackbone`` (built from locally-synthesized torchvision-structure
BasicBlock resnets — torchvision itself is not installed and can't download
weights) + the real SVANet head, the real ``SetCriterion``, and the real
row-composition loop (softmax -> cxcywh->xyxy clamp -> per-frame chunk ->
score sort -> 4-decimal rounding, test.py:133-170). Our side runs the
actual ``svol_tpu.cli.infer.get_results`` on the ported weights. Rows must
agree, and the final metric dicts (through each repo's own evaluator) must
agree.

Module import order matters: this file is in conftest._TORCH_MODULES so it
runs after all sharded-mesh tests (torch wedges the XLA:CPU pool otherwise).
"""
import json
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

T, K, IMG, HID = 2, 2, 64, 32
Q = T * K
B = 2

_REF_ARGV = [
    "test.py",
    "--num_frames", str(T), "--num_queries", str(Q),
    "--num_queries_per_frame", str(K),
    "--hidden_dim", str(HID), "--nheads", "4", "--num_layers", "2",
    "--backbone", "resnet", "--sketch_head", "svanet",
    "--input_dropout", "0.1",
]


def _load_ref_test():
    """Import /root/reference/test.py with our tiny flag set (shims + argv
    staging live in svol_tpu.utils.ref_harness — shared with the
    parity-report CLI)."""
    from svol_tpu.utils.ref_harness import load_reference_test

    return load_reference_test(_REF_ARGV[1:], ref_path=REF)


try:
    ref_test = _load_ref_test()
    HAS_REF = True
except Exception as e:  # pragma: no cover
    HAS_REF = False
    _IMPORT_ERROR = e

pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference test.py not importable")


@pytest.fixture(scope="module")
def paired_models():
    """(reference torch full model, criterion, our state, our cfg)."""

    from lib.modeling.backbone import ResNetBackbone
    from lib.modeling.loss import build_loss as ref_build_loss
    from lib.modeling.model import SketchLocalizationModel as RefModel
    from lib.modeling.svanet import build_svanet as ref_build_svanet

    from svol_tpu.utils.ref_harness import build_reference_backbones

    # torchvision-structure resnets with seeded weights + randomized BN
    # stats (identity stats would hide mean/var-porting bugs)
    video_bb, sketch_bb = build_reference_backbones(seed=0)

    args = ref_test.args  # the module-level parsed tiny argv
    args.input_vid_dim = 512
    args.input_skch_dim = 512
    args.vis_mode = None
    head = ref_build_svanet(args)
    tmodel = RefModel(ResNetBackbone(video_bb, sketch_bb), head)
    tmodel.eval()

    criterion_ref = ref_build_loss(args)
    criterion_ref.eval()

    # ---- port every weight into our model ----
    from svol_tpu.config import DataConfig, ModelConfig, SvolConfig
    from svol_tpu.losses.criterion import build_criterion
    from svol_tpu.models import build_model
    from svol_tpu.train.state import create_train_state
    from svol_tpu.utils.torch_port import convert_reference_model

    cfg = SvolConfig(
        data=DataConfig(num_frames=T, max_boxes_per_frame=K, image_size=IMG),
        model=ModelConfig(hidden_dim=HID, nheads=4, num_layers=2,
                          num_queries=Q, num_queries_per_frame=K,
                          cmt_dim_feedforward=2048,  # ref hard-codes 2048
                          input_dropout=0.1,
                          compute_dtype="float32"),
    )
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    ported = convert_reference_model(sd, cfg)

    model = build_model(cfg)
    sample = {
        "src_sketch": np.zeros((1, 1, IMG, IMG, 3), np.float32),
        "src_video": np.zeros((1, 1, IMG, IMG, 3), np.float32),
        "src_sketch_mask": np.ones((1, 1), np.float32),
        "src_video_mask": np.ones((1, 1), np.float32),
    }
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), sample)
    state = state.replace(params=ported["params"],
                          batch_stats=ported["batch_stats"])
    return tmodel, criterion_ref, state, cfg, build_criterion(cfg)


def make_batch(seed=0):
    """One eval batch in BOTH repos' native formats from one sample."""
    rng = np.random.default_rng(seed)
    video = rng.uniform(size=(B, T, IMG, IMG, 3)).astype(np.float32)
    sketch = rng.uniform(size=(B, 1, IMG, IMG, 3)).astype(np.float32)

    counts = rng.integers(1, K + 1, size=(B, T))
    counts[0, 1] = 0  # an annotated-but-empty frame
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

    # torch side: NCHW, ((tensor, mask), ...) as collate_fn emits
    t_inputs = {
        "input_sketch": (torch.from_numpy(sketch.transpose(0, 1, 4, 2, 3)),
                         torch.ones(B, 1)),
        "input_video": (torch.from_numpy(video.transpose(0, 1, 4, 2, 3)),
                        torch.ones(B, T)),
    }

    ours_batch = {
        "src_sketch": sketch,
        "src_video": video,
        "src_sketch_mask": np.ones((B, 1), np.float32),
        "src_video_mask": np.ones((B, T), np.float32),
    }
    ours_extra = {
        "targets": {"boxes": dense_boxes, "box_valid": dense_valid},
        "meta": metas,
        "n_real": B,
    }
    return (t_inputs, ref_targets), (ours_batch, ours_extra)


def _norm(rows):
    """Through JSON exactly as save_jsonl writes them."""
    return [json.loads(json.dumps(r)) for r in rows]


def test_jsonl_rows_match_reference_end_to_end(paired_models):
    """The reference's get_results vs cli/infer.py's get_results, identical
    batch, ported weights: row-for-row JSONL equality (rounding, sorting and
    schema included)."""
    tmodel, criterion_ref, state, cfg, criterion = paired_models
    (t_inputs, ref_targets), (ours_batch, ours_extra) = make_batch()

    with torch.no_grad():
        ref_rows, ref_meters = ref_test.get_results(
            tmodel, [(t_inputs, ref_targets)], criterion_ref, "cpu")

    from svol_tpu.cli.infer import get_results as our_get_results
    from svol_tpu.train.steps import make_eval_step

    eval_step = make_eval_step(cfg, criterion)
    our_rows, our_meters = our_get_results(
        state, eval_step, [(ours_batch, ours_extra)], num_frames=T)

    ref_rows = _norm(ref_rows)
    our_rows = _norm(our_rows)
    assert len(ref_rows) == len(our_rows) == B * T

    mismatched_values = 0
    total_values = 0
    for i, (r, o) in enumerate(zip(ref_rows, our_rows)):
        # schema + identity fields byte-identical
        assert list(r) == list(o) == ["video", "sketch", "shape", "frame",
                                      "gt_boxes", "pred_boxes"], i
        for key in ("video", "sketch", "shape", "frame"):
            assert r[key] == o[key], (i, key)
        assert [g["track_id"] for g in r["gt_boxes"]] == \
               [g["track_id"] for g in o["gt_boxes"]], i
        for rg, og in zip(r["gt_boxes"], o["gt_boxes"]):
            np.testing.assert_allclose(rg["bbox"], og["bbox"], atol=1e-6)
        # prediction rows: same count, same K x 5 structure; values agree to
        # one 4th-decimal rounding ulp (forward parity is ~1e-5; exact-string
        # equality would be flaky only when a value sits within float noise
        # of a .00005 boundary, so allow a vanishing mismatch budget)
        rp, op = np.array(r["pred_boxes"]), np.array(o["pred_boxes"])
        assert rp.shape == op.shape == (K, 5), i
        np.testing.assert_allclose(rp, op, atol=1.01e-4, err_msg=f"row {i}")
        mismatched_values += int((rp != op).sum())
        total_values += rp.size
    # the overwhelming majority must round identically — this catches any
    # systematic drift while tolerating isolated boundary-straddling values
    assert mismatched_values <= max(1, total_values // 20), (
        mismatched_values, total_values)

    # loss meters: the reference logs weighted losses (test.py:127-130)
    assert abs(ref_meters["loss_overall"].avg -
               our_meters["loss_overall"].avg) < 1e-3


def test_metric_dicts_match_reference_end_to_end(paired_models):
    """Both repos' FULL pipelines — model forward through each side's own
    evaluator — produce the identical metrics dict."""
    tmodel, criterion_ref, state, cfg, criterion = paired_models
    (t_inputs, ref_targets), (ours_batch, ours_extra) = make_batch(seed=7)

    with torch.no_grad():
        ref_rows, _ = ref_test.get_results(
            tmodel, [(t_inputs, ref_targets)], criterion_ref, "cpu")

    from svol_tpu.cli.infer import get_results as our_get_results
    from svol_tpu.evaluate import eval_results as our_eval_results
    from svol_tpu.train.steps import make_eval_step

    eval_step = make_eval_step(cfg, criterion)
    our_rows, _ = our_get_results(
        state, eval_step, [(ours_batch, ours_extra)], num_frames=T)

    from lib.evaluate.eval import eval_results as ref_eval_results

    ref_metrics = ref_eval_results(_norm(ref_rows), verbose=False)
    our_metrics = our_eval_results(_norm(our_rows), verbose=False,
                                   ap_workers=1)

    assert set(ref_metrics["brief"]) == set(our_metrics["brief"])
    for k in ref_metrics["brief"]:
        np.testing.assert_allclose(
            float(our_metrics["brief"][k]), float(ref_metrics["brief"][k]),
            atol=2e-2, err_msg=k)  # metrics are 2-decimal percentages


def test_loss_meters_match_video_matcher(paired_models):
    """VERDICT r4 Next #5: the VIDEO matcher (one LSAP per video,
    matcher.py:122-159) through both sides' full inference paths. Rows are
    matcher-independent; the matched-pair-dependent loss meters are the
    parity surface, compared per component in the reference's weighted
    logging convention (test.py:131)."""
    import dataclasses

    tmodel, _, state, cfg, _ = paired_models
    (t_inputs, ref_targets), (ours_batch, ours_extra) = make_batch(seed=3)

    from lib.modeling.loss import build_loss as ref_build_loss

    args = ref_test.args
    old = args.matcher
    args.matcher = "video_matcher"
    try:
        criterion_ref = ref_build_loss(args)
    finally:
        args.matcher = old
    criterion_ref.eval()

    with torch.no_grad():
        _, ref_meters = ref_test.get_results(
            tmodel, [(t_inputs, ref_targets)], criterion_ref, "cpu")

    from svol_tpu.cli.infer import get_results as our_get_results
    from svol_tpu.losses.criterion import build_criterion
    from svol_tpu.train.steps import make_eval_step

    cfg_vm = dataclasses.replace(
        cfg, loss=dataclasses.replace(cfg.loss, matcher="video_matcher"))
    eval_step = make_eval_step(cfg_vm, build_criterion(cfg_vm))
    _, our_meters = our_get_results(
        state, eval_step, [(ours_batch, ours_extra)], num_frames=T)

    for k in ("loss_label", "loss_bbox", "loss_giou",
              "loss_label_0", "loss_bbox_0", "loss_giou_0", "loss_overall"):
        assert k in ref_meters and k in our_meters, k
        np.testing.assert_allclose(
            our_meters[k].avg, ref_meters[k].avg, atol=2e-3, err_msg=k)


def test_jsonl_rows_match_eval_bs4_with_padded_tail(paired_models):
    """VERDICT r4 Next #5: eval_bs > 1 with a padded tail. Our executable
    keeps a fixed batch shape by replicating the last real example
    (cli/infer pad-drop contract); the reference sees only the real
    examples — the emitted rows must agree row-for-row and the pad row must
    leave no trace."""
    tmodel, criterion_ref, state, cfg, criterion = paired_models

    from svol_tpu.utils.parity_report import make_parity_batch

    (t_inputs, ref_targets), (ours_batch, ours_extra) = make_parity_batch(
        3, T, K, IMG, seed=11)
    # pad OUR side to B=4 by replicating the last example; n_real=3
    ours_batch = {k: np.concatenate([v, v[-1:]], axis=0)
                  for k, v in ours_batch.items()}
    ours_extra["targets"] = {k: np.concatenate([v, v[-1:]], axis=0)
                             for k, v in ours_extra["targets"].items()}
    ours_extra["n_real"] = 3  # meta stays length 3

    # The reference's eval protocol is eval_bs=1 (test.sh:13) and its
    # criterion normalizes over the BATCH (label CE over B*Q, box losses by
    # batch-wide matched count) — so the per-example ground truth is three
    # B=1 batches (per_example_criterion docstring). But the reference's
    # ResNetBackbone CRASHES at N=1: `.squeeze()` collapses the batch dim
    # (backbone.py:77), making its own shipped test.sh recipe un-runnable —
    # a previously undocumented upstream defect. The harness sidesteps it
    # bit-exactly by duplicating the example to N=2 and slicing the
    # features back (every module is per-example independent in eval mode).
    class _B1SafeBackbone(torch.nn.Module):
        def __init__(self, inner):
            super().__init__()
            self.inner = inner

        def forward(self, sketch_batch, video_batch):
            if sketch_batch.shape[0] == 1:
                s, v = self.inner(sketch_batch.repeat(2, 1, 1, 1, 1),
                                  video_batch.repeat(2, 1, 1, 1, 1))
                return s[:1], v[:1]
            return self.inner(sketch_batch, video_batch)

    from lib.modeling.model import SketchLocalizationModel as RefModel

    tmodel_b1 = RefModel(_B1SafeBackbone(tmodel.backbone), tmodel.head)
    tmodel_b1.eval()
    ref_batches = []
    for b in range(3):
        one_inputs = {
            k: (t[b:b + 1], m[b:b + 1]) for k, (t, m) in t_inputs.items()
        }
        ref_batches.append((one_inputs, [ref_targets[b]]))
    with torch.no_grad():
        ref_rows, ref_meters = ref_test.get_results(
            tmodel_b1, ref_batches, criterion_ref, "cpu")

    from svol_tpu.cli.infer import get_results as our_get_results
    from svol_tpu.train.steps import make_eval_step

    eval_step = make_eval_step(cfg, criterion)
    our_rows, our_meters = our_get_results(
        state, eval_step, [(ours_batch, ours_extra)], num_frames=T)

    ref_rows, our_rows = _norm(ref_rows), _norm(our_rows)
    assert len(ref_rows) == len(our_rows) == 3 * T  # pad row emitted nothing
    for i, (r, o) in enumerate(zip(ref_rows, our_rows)):
        assert r["video"] == o["video"] and r["frame"] == o["frame"], i
        np.testing.assert_allclose(
            np.array(r["pred_boxes"]), np.array(o["pred_boxes"]),
            atol=1.01e-4, err_msg=f"row {i}")
    # loss meters weighted per the reference convention; pad row dropped
    assert abs(ref_meters["loss_overall"].avg
               - our_meters["loss_overall"].avg) < 1e-3


def test_reference_resnet_backbone_crashes_at_eval_bs1(paired_models):
    """Documents the upstream defect the padded-tail test works around: the
    reference's shipped eval recipe (test.sh:13, eval_bs=1) cannot run —
    ResNetBackbone's `.squeeze()` (backbone.py:77) collapses the N=1 batch
    dim, so the sketch features reach the head as (512, 1) and its first
    LayerNorm(512) raises. Our loader/eval path handles any eval_bs
    (pad-drop contract)."""
    tmodel, criterion_ref, *_ = paired_models
    (t_inputs, ref_targets), _ = make_batch(seed=5)
    one = {k: (t[:1], m[:1]) for k, (t, m) in t_inputs.items()}
    with pytest.raises(RuntimeError, match="normalized_shape"):
        with torch.no_grad():
            ref_test.get_results(tmodel, [(one, ref_targets[:1])],
                                 criterion_ref, "cpu")


def test_vit_backbone_e2e_rows_match_intended_reference(tmp_path):
    """VERDICT r4 Next #5: the ViT backbone, end to end through the
    reference's real ``get_results``. The reference's OWN ViT plumbing is
    doubly un-runnable (undefined `device` at backbone.py:32,50 AND the
    video features returned as an unstacked python list that model.py:21
    immediately `.shape`s — SURVEY §2 defects), so the torch side here
    implements the INTENDED semantics of backbone.py:11-62 directly: per
    image, (x-0.5)/0.5 normalize (the ViTFeatureExtractor transform), HF
    ViTModel, CLS token of the final LayerNorm'ed hidden state — then the
    real reference SVANet head and the real row-composition loop. Both
    sides carry identical weights (HF ViTModel state dict ported via
    convert_hf_vit; our head exported via export_svanet_state_dict)."""
    from transformers import ViTConfig, ViTModel

    from svol_tpu.config import DataConfig, ModelConfig, SvolConfig
    from svol_tpu.models import build_model
    from svol_tpu.train.state import create_train_state
    from svol_tpu.utils.parity_report import make_parity_batch
    from svol_tpu.utils.torch_port import (
        convert_hf_vit,
        export_svanet_state_dict,
    )

    IMGV = 64  # 4x4 patches + CLS = 17 tokens; ViT-B widths, tiny runtime
    cfg = SvolConfig(
        data=DataConfig(num_frames=T, max_boxes_per_frame=K, image_size=IMGV),
        model=ModelConfig(backbone="vit", hidden_dim=HID, nheads=4,
                          num_layers=2, num_queries=Q,
                          num_queries_per_frame=K,
                          cmt_dim_feedforward=2048, input_dropout=0.1,
                          compute_dtype="float32"),
    )

    torch.manual_seed(3)
    vit_t = ViTModel(ViTConfig(image_size=IMGV), add_pooling_layer=False)
    vit_t.eval()

    # our side: one ported ViT serves video AND sketch (the reference
    # builds both from the same pretrained name, backbone.py:118-122)
    model = build_model(cfg)
    import jax

    init = {
        "src_sketch": np.zeros((1, 1, IMGV, IMGV, 3), np.float32),
        "src_video": np.zeros((1, 1, IMGV, IMGV, 3), np.float32),
        "src_sketch_mask": np.ones((1, 1), np.float32),
        "src_video_mask": np.ones((1, 1), np.float32),
    }
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), init)
    ported = convert_hf_vit({k: v.numpy() for k, v in
                             vit_t.state_dict().items()}, image_size=IMGV)
    params = dict(state.params)
    bb = dict(params["backbone"])
    bb["video_backbone"] = ported["params"]
    bb["sketch_backbone"] = ported["params"]
    params["backbone"] = bb
    state = state.replace(params=params)

    # torch side: intended backbone semantics + the REAL reference head
    # carrying our exported head weights
    from lib.modeling.svanet import build_svanet as ref_build_svanet

    rargs = ref_test.args
    rargs.input_vid_dim = 768
    rargs.input_skch_dim = 768
    rargs.vis_mode = None
    head = ref_build_svanet(rargs)
    head_sd = export_svanet_state_dict(
        params["head"], d_model=HID, num_layers=2, n_input_proj=2)
    head.load_state_dict({k: torch.as_tensor(np.asarray(v))
                          for k, v in head_sd.items()}, strict=True)
    # restore resnet dims for any later test using the shared module args
    rargs.input_vid_dim = 512
    rargs.input_skch_dim = 512

    class IntendedViTModel(torch.nn.Module):
        def __init__(self, vit, head):
            super().__init__()
            self.vit = vit
            self.head = head

        def forward(self, src_sketch, src_video, src_sketch_mask=None,
                    src_video_mask=None):
            B_, T_ = src_video.shape[:2]
            norm = lambda x: (x - 0.5) / 0.5
            s = self.vit(pixel_values=norm(src_sketch[:, 0]))
            s_feat = s.last_hidden_state[:, :1]  # (B, 1, D) CLS
            v = self.vit(pixel_values=norm(src_video.flatten(0, 1)))
            v_feat = v.last_hidden_state[:, 0].reshape(B_, T_, -1)
            return self.head(s_feat, src_sketch_mask, v_feat, src_video_mask)

    tmodel = IntendedViTModel(vit_t, head)
    tmodel.eval()

    (t_inputs, ref_targets), (ours_batch, ours_extra) = make_parity_batch(
        B, T, K, IMGV, seed=13)
    from lib.modeling.loss import build_loss as ref_build_loss

    criterion_ref = ref_build_loss(rargs)
    criterion_ref.eval()
    with torch.no_grad():
        ref_rows, _ = ref_test.get_results(
            tmodel, [(t_inputs, ref_targets)], criterion_ref, "cpu")

    from svol_tpu.cli.infer import get_results as our_get_results
    from svol_tpu.losses.criterion import build_criterion
    from svol_tpu.train.steps import make_eval_step

    eval_step = make_eval_step(cfg, build_criterion(cfg))
    our_rows, _ = our_get_results(
        state, eval_step, [(ours_batch, ours_extra)], num_frames=T)

    ref_rows, our_rows = _norm(ref_rows), _norm(our_rows)
    assert len(ref_rows) == len(our_rows) == B * T
    for i, (r, o) in enumerate(zip(ref_rows, our_rows)):
        assert r["video"] == o["video"] and r["frame"] == o["frame"], i
        np.testing.assert_allclose(
            np.array(r["pred_boxes"]), np.array(o["pred_boxes"]),
            atol=1.01e-4, err_msg=f"row {i}")
