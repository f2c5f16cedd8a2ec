"""Serving export: freeze a trained SVOL model into ONE portable artifact.

`export_model` bakes the checkpoint's weights (and any calibrated int8
scales) as constants into a single serialized StableHLO module via
``jax.export`` — the deployable unit is one directory:

    exported.stablehlo   the compiled-IR module, weights embedded
    meta.json            input signature + provenance

`load_exported` restores it to a plain callable — no model code, config, or
checkpoint needed at serving time; any JAX runtime for the exported platform
can execute it (a serving host needs only jaxlib + this file). The exported
program is the production predict path — uint8 pixels normalized on device,
softmax foreground scores, cxcywh->xyxy clamped boxes
(svol_tpu/train/steps.py::make_predict_fn) — with static shapes, so the
serving binary never retraces or recompiles.

The reference has no serving story beyond re-running test.py with torch
checkpoints (test.py:46-93); this is a new capability, idiomatic to XLA's
ahead-of-time compilation model.
"""
from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

ARTIFACT_FILE = "exported.stablehlo"
META_FILE = "meta.json"


def _batch_specs(config, batch_size: int, pixel_dtype: str) -> Dict[str, jax.ShapeDtypeStruct]:
    T, S = config.data.num_frames, config.data.image_size
    n_sk = getattr(config.data, "num_input_sketches", 1)
    pdt = jnp.uint8 if pixel_dtype == "uint8" else jnp.float32
    return {
        "src_sketch": jax.ShapeDtypeStruct((batch_size, n_sk, S, S, 3), pdt),
        "src_video": jax.ShapeDtypeStruct((batch_size, T, S, S, 3), pdt),
        "src_sketch_mask": jax.ShapeDtypeStruct((batch_size, n_sk), jnp.float32),
        "src_video_mask": jax.ShapeDtypeStruct((batch_size, T), jnp.float32),
    }


def export_model(
    config,
    state,
    out_dir: str,
    batch_size: int = 8,
    pixel_dtype: str = "uint8",
    extra_variables: Dict | None = None,
    platforms=None,
) -> str:
    """Serialize ``predict(batch) -> (scores, boxes_xyxy)`` with the weights
    embedded. ``extra_variables`` merges extra collections (e.g. calibrated
    ``quant`` scales for the static int8 serving path). ``platforms``
    defaults to the current backend; pass e.g. ``["tpu", "cpu"]`` for a
    multi-platform artifact."""
    from svol_tpu.train.steps import make_predict_fn

    variables = {"params": state.params}
    if state.batch_stats is not None and len(state.batch_stats) > 0:
        variables["batch_stats"] = state.batch_stats
    if extra_variables:
        variables.update(extra_variables)
    predict = make_predict_fn(state.apply_fn)
    fn = jax.jit(lambda batch: predict(variables, batch))

    specs = _batch_specs(config, batch_size, pixel_dtype)
    # the Pallas flash/gate kernels lower to the Mosaic custom call; it is
    # stable across jaxlib versions on the same platform, so allowlist it
    disabled = [jax_export.DisabledSafetyCheck.custom_call("tpu_custom_call")]
    exported = jax_export.export(
        fn, platforms=platforms, disabled_checks=disabled
    )(specs)
    blob = exported.serialize()

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, ARTIFACT_FILE), "wb") as f:
        f.write(blob)
    meta = {
        "inputs": {
            k: {"shape": list(v.shape), "dtype": np.dtype(v.dtype).name}
            for k, v in specs.items()
        },
        "outputs": ["scores (B, Q) f32", "boxes_xyxy (B, Q, 4) f32 in [0, 1]"],
        "batch_size": batch_size,
        "num_frames": config.data.num_frames,
        "num_queries_per_frame": config.model.num_queries_per_frame,
        "image_size": config.data.image_size,
        "pixel_dtype": pixel_dtype,
        "platforms": list(exported.platforms),
        "quantize": config.model.quantize,
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, META_FILE), "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


def load_exported(path: str) -> Tuple[Callable[[Dict[str, Any]], Tuple], Dict]:
    """(predict, meta) from an `export_model` directory. ``predict`` takes
    the batch dict described by ``meta["inputs"]`` and returns
    ``(scores, boxes_xyxy)`` — self-contained, weights included."""
    with open(os.path.join(path, ARTIFACT_FILE), "rb") as f:
        exported = jax_export.deserialize(f.read())
    with open(os.path.join(path, META_FILE)) as f:
        meta = json.load(f)
    return jax.jit(exported.call), meta


def make_exported_eval_step(path: str, config) -> Callable:
    """eval_step(state, batch) -> ({}, scores, boxes) over a frozen artifact.

    Adapter so `cli/infer.get_results`'s device loop (and therefore the whole
    JSONL/metrics pipeline) runs unchanged against an exported StableHLO
    module: ``state`` is ignored (the weights live inside the artifact) and
    the loss dict is empty (the artifact is predict-only — losses need the
    criterion, which is a training/eval-path concern, not a serving one).

    The artifact has a static signature; the loader config must match it:
    ``eval_bs == batch_size`` (eval loaders pad the tail batch to exactly
    this — data/pipeline.pad_to_batch), same num_frames/image_size. uint8
    loader pixels are accepted by a float32-traced artifact via an exact
    host-side x/255 (the same normalization the uint8-traced program applies
    on device, models/model.py:117-123); any other dtype mismatch raises.
    """
    predict, meta = load_exported(path)
    for name, got, want in (
        ("eval_bs", config.data.eval_bs, meta["batch_size"]),
        ("num_frames", config.data.num_frames, meta["num_frames"]),
        ("image_size", config.data.image_size, meta["image_size"]),
        ("num_queries_per_frame", config.model.num_queries_per_frame,
         meta["num_queries_per_frame"]),
    ):
        if got != want:
            raise ValueError(
                f"exported artifact expects {name}={want}, config has {got} "
                f"(artifact signature is static: {meta['inputs']})"
            )
    specs = {k: np.dtype(v["dtype"]) for k, v in meta["inputs"].items()}

    def eval_step(_state, batch: Dict[str, Any]):
        inputs = {}
        for k, want_dt in specs.items():
            arr = np.asarray(batch[k])
            if arr.dtype != want_dt:
                if arr.dtype == np.uint8 and want_dt == np.float32:
                    arr = arr.astype(np.float32) / np.float32(255.0)
                else:
                    raise ValueError(
                        f"{k}: loader yields {arr.dtype}, artifact traced "
                        f"with {want_dt} (lossy conversion refused)"
                    )
            inputs[k] = arr
        scores, boxes = predict(inputs)
        return {}, scores, boxes

    return eval_step
