"""Evaluation / inference entry (functional equivalent of test.py).

Pipeline: jit'd eval step on device (forward + loss + score/box
post-processing) -> host-side JSONL row assembly matching the reference
schema byte-for-byte (test.py:145-170: cxcywh->xyxy clamp, per-frame
chunking of the Q = T*K queries, score-descending sort, 4-decimal rounding)
-> metric computation (svol_tpu.evaluate).

Run as a module:  python -m svol_tpu.cli.infer --resume <ckpt> ...
"""
from __future__ import annotations

import os
import pprint
from collections import defaultdict
from typing import Any, Dict, List, Tuple

import jax
import numpy as np

from svol_tpu.config import SvolConfig, config_from_args
from svol_tpu.data.pipeline import build_loader
from svol_tpu.evaluate import eval_results
from svol_tpu.losses.criterion import build_criterion
from svol_tpu.models import build_model
from svol_tpu.ops.boxes import box_cxcywh_to_xyxy
from svol_tpu.train.checkpoints import restore_checkpoint
from svol_tpu.train.state import TrainState, create_train_state
from svol_tpu.train.steps import make_eval_step
from svol_tpu.utils import AverageMeter, cur_time, save_json, save_jsonl, setup_logger


def _round4(x: float) -> float:
    return float(f"{x:.4f}")


def assemble_results(
    scores: np.ndarray,  # (B, Q)
    boxes_xyxy: np.ndarray,  # (B, Q, 4)
    targets: Dict[str, np.ndarray],
    meta: List[Dict[str, Any]],
    num_frames: int,
    sort_results: bool = True,
) -> List[Dict[str, Any]]:
    """Compose per-frame JSONL rows (test.py:137-170).

    Prediction queries chunk into ``num_frames`` groups of K; rows are
    emitted only for annotated sampled frames (zip with frame_keys stops at
    the shorter list, matching test.py:154)."""
    rows: List[Dict[str, Any]] = []
    B, Q = scores.shape
    K = Q // num_frames
    gt_boxes_cxcywh = targets["boxes"]  # (B, T, K, 4)
    gt_valid = targets["box_valid"]  # (B, T, K)

    gt_xyxy = np.asarray(box_cxcywh_to_xyxy(gt_boxes_cxcywh))

    for b, m in enumerate(meta):
        frame_keys = m["frame_keys"]
        track_ids = m.get("track_ids", [[]] * len(frame_keys))
        for t, fidx in enumerate(frame_keys[:num_frames]):
            s = scores[b, t * K : (t + 1) * K]
            bx = boxes_xyxy[b, t * K : (t + 1) * K]
            order = np.argsort(-s, kind="stable") if sort_results else np.arange(K)
            preds = [
                [_round4(v) for v in (*bx[i], s[i])] for i in order
            ]
            gts = []
            for k in range(gt_valid.shape[2]):
                if gt_valid[b, t, k]:
                    tid = track_ids[t][k] if t < len(track_ids) and k < len(track_ids[t]) else 0
                    gts.append({
                        "track_id": tid,
                        "bbox": [float(v) for v in gt_xyxy[b, t, k]],
                    })
            rows.append({
                "video": m["video"],
                "sketch": m["sketch"],
                "shape": m["size"],
                "frame": int(fidx),
                "gt_boxes": gts,
                "pred_boxes": preds,
            })
    return rows


def get_results(
    state: TrainState,
    eval_step,
    loader,
    num_frames: int,
    sort_results: bool = True,
    debug: bool = False,
    plan=None,
) -> Tuple[List[Dict[str, Any]], Dict[str, AverageMeter]]:
    """Device loop + host assembly (test.py:113-175).

    ``plan`` (a parallel.MeshPlan) makes evaluation data-parallel: each
    padded batch shards over the mesh's 'data' axis (pad_to_batch keeps the
    executable shape fixed, so eval_bs must divide by the data axis — the
    caller checks). The reference evaluates on one GPU only (test.py:60).
    """
    loss_meters: Dict[str, AverageMeter] = defaultdict(AverageMeter)
    results: List[Dict[str, Any]] = []
    for batch, extra in loader:
        device_batch = dict(batch)
        device_batch.update(extra["targets"])
        if plan is not None:
            device_batch = plan.shard_batch(device_batch)
        losses, scores, boxes = eval_step(state, device_batch)
        # losses are per-example (B,) — a padded tail batch (pad_to_batch
        # replicates the last real example) keeps the executable shape fixed;
        # drop the pad rows here so epoch meters are exact at any eval_bs
        n_real = max(1, extra.get("n_real", len(extra["meta"])))
        for k, v in losses.items():
            vals = np.asarray(v)[:n_real]
            loss_meters[k].update(float(vals.mean()), n=n_real)
        results.extend(
            assemble_results(
                np.asarray(scores), np.asarray(boxes), extra["targets"],
                extra["meta"], num_frames, sort_results,
            )
        )
        if debug:
            break
    return results, loss_meters


def inference(
    config: SvolConfig,
    state: TrainState,
    eval_step,
    loader,
    results_filename: str,
    logger=None,
    plan=None,
):
    """Run eval, persist JSONL + metrics JSON (test.py:178-191).

    Multi-host note: every process evaluates the full (unsharded) val set so
    that early-stop/best-checkpoint decisions are identical everywhere
    without cross-host communication — the same strategy the reference falls
    into with its distributed=False loaders (train.py:172,180), but here on
    purpose and with file writes gated to process 0.
    """
    results, loss_meters = get_results(
        state, eval_step, loader, config.data.num_frames,
        sort_results=not config.eval.no_sort_results,
        debug=config.train.debug,
        plan=plan,
    )
    if config.eval.no_sort_results:
        results_filename = results_filename.replace(".jsonl", "_unsorted.jsonl")
    results_path = os.path.join(config.train.results_dir, results_filename)
    if jax.process_index() == 0:
        os.makedirs(config.train.results_dir, exist_ok=True)
        save_jsonl(results, results_path)

    metrics = eval_results(
        results, verbose=config.train.debug, logger=logger,
        ap_workers=config.eval.ap_num_workers, ap_chunksize=config.eval.ap_chunksize,
    )
    if jax.process_index() == 0:
        save_json(metrics, results_path.replace(".jsonl", "_metrics.json"),
                  save_pretty=True, sort_keys=False)
    return metrics, loss_meters, [results_path]


def eval_setup(config: SvolConfig, sample_batch=None):
    """Build model + criterion + state, restore checkpoint (test.py:46-93)."""
    model = build_model(config)
    criterion = build_criterion(config)
    if sample_batch is None:
        B = 1
        T, S = config.data.num_frames, config.data.image_size
        sample_batch = {
            "src_sketch": np.zeros((B, 1, S, S, 3), np.float32),
            "src_video": np.zeros((B, T, S, S, 3), np.float32),
            "src_sketch_mask": np.ones((B, 1), np.float32),
            "src_video_mask": np.ones((B, T), np.float32),
        }
    state = create_train_state(
        config, model, jax.random.PRNGKey(config.train.seed), sample_batch
    )
    if config.train.resume:
        state = restore_checkpoint(config.train.resume, state, restore_all=False)
    # --ema_decay at eval/export time: evaluate the EMA shadow the
    # checkpoint carries, not the raw last-step params
    from svol_tpu.train.state import ema_eval_view

    return model, criterion, ema_eval_view(state)


def main(argv=None) -> None:
    # multi-host bootstrap before any device use (test.py:215-218 equivalent)
    import argparse

    from svol_tpu.parallel.distributed import initialize_multihost
    from svol_tpu.utils.compile_cache import enable_compile_cache

    initialize_multihost()
    enable_compile_cache()
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument(
        "--from_export", default=None,
        help="serving-artifact directory (cli/export.py): evaluate through "
        "the frozen StableHLO program — no checkpoint or model code involved")
    own, rest = ap.parse_known_args(argv)
    config = config_from_args(rest)
    logger = setup_logger("SVOL_eval", config.train.log_dir,
                          filename=cur_time() + "_eval.txt")
    n_dev = len(jax.devices())
    logger.info(f"devices: {jax.devices()} ({n_dev})")

    if own.from_export:
        # serving-parity path: the artifact carries the weights; losses are
        # not computed (predict-only program). JSONL/metrics are identical
        # to the live path on the same checkpoint (tests/test_export.py).
        from svol_tpu.serving import make_exported_eval_step

        logger.info(f"evaluating frozen serving artifact {own.from_export}")
        eval_step = make_exported_eval_step(own.from_export, config)
        loader = build_loader(config, "test")
        results_filename = f"{cur_time()}_{config.run_tag('test_export')}.jsonl"
        metrics, _loss_meters, _paths = inference(
            config, None, eval_step, loader, results_filename, logger=logger
        )
        logger.info(f"metrics {pprint.pformat(metrics['brief'], indent=4)}")
        return

    if not config.train.resume:
        logger.warning("no --resume checkpoint given; evaluating random init")

    model, criterion, state = eval_setup(config)
    extra_variables = None
    if config.model.quantize and config.eval.calibration_batches > 0:
        # static-scale int8: collect per-conv activation stats on the first
        # N eval batches (exact float forward), then evaluate with them
        from svol_tpu.ops.quant import calibrate_scales

        logger.info(
            f"calibrating int8 scales on {config.eval.calibration_batches} batches")
        variables = {"params": state.params}
        if state.batch_stats is not None and len(state.batch_stats) > 0:
            variables["batch_stats"] = state.batch_stats
        # close the calibration loader when done — its producer thread,
        # worker pool and prefetched batches must not outlive calibration
        calib_batches = (b for b, _meta in build_loader(config, "test"))
        try:
            quant = calibrate_scales(model, variables, calib_batches,
                                     max_batches=config.eval.calibration_batches)
        finally:
            calib_batches.close()
        extra_variables = {"quant": quant}

    # data-parallel evaluation: shard each padded batch over the mesh's
    # 'data' axis (pad_to_batch keeps shapes fixed, so the only requirement
    # is divisibility). One device -> a trivial mesh, same program as before.
    # The reference evaluates on a single GPU only (test.py:60).
    from svol_tpu.parallel import make_mesh_plan

    plan = make_mesh_plan(
        config.train.dp_devices,
        seq_axis=config.train.sp_devices,
        model_axis=config.train.tp_devices,
        pipe_axis=config.train.pp_devices,
        expert_axis=config.train.ep_devices,
    )
    if config.data.eval_bs % plan.data_axis_size == 0:
        state = plan.replicate(state)
        plan.set_active()  # in-model seq/tensor constraints target this mesh
        logger.info(
            f"eval mesh: data={plan.data_axis_size}, "
            f"seq={plan.seq_axis_size}, model={plan.model_axis_size}"
        )
    else:
        logger.info(
            f"eval_bs {config.data.eval_bs} not divisible by the "
            f"{plan.data_axis_size}-way data axis; evaluating single-device"
        )
        plan = None

    eval_step = make_eval_step(config, criterion, extra_variables=extra_variables)
    loader = build_loader(config, "test")
    results_filename = f"{cur_time()}_{config.run_tag('test')}.jsonl"
    logger.info("Start inference...")
    metrics, loss_meters, paths = inference(
        config, state, eval_step, loader, results_filename, logger=logger,
        plan=plan,
    )
    logger.info(f"metrics {pprint.pformat(metrics['brief'], indent=4)}")
    for k, v in loss_meters.items():
        logger.info(f"eval loss {k}: {v.avg:.4f}")


if __name__ == "__main__":
    main()
