"""End-to-end inference throughput benchmark (driver contract).

Measures frames/sec/chip of the flagship model (ResNet-34/18 backbone +
SVANet head, 224^2 inputs, T=32 frames, 320 queries): backbone + cross-modal
transformer + score/box post-processing.

Methodology: N inference steps are chained *inside one jit program* via a
data dependency (each step's input is perturbed by the previous step's
output), and the final scalar is fetched to the host. This is robust against
async-dispatch artifacts — on this environment's tunneled TPU backend,
``block_until_ready`` can return before execution finishes, which makes naive
dispatch-loop timings meaningless. One program dispatch amortizes the
host<->device round trip across all N steps.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}; baseline is
the 4,000 frames/sec/chip target from BASELINE.md.

Default configuration: calibrated static-scale int8 (`--quantize int8
--calibrated`) — the fastest configuration that meets BASELINE.md's accuracy
bar (every mIoU delta vs float is within 0.13 pts, far inside the 0.5-pt
parity bar — PERFORMANCE.md "Measured accuracy cost"). ``--bf16`` measures
the exact-bf16 reference path instead (the bit-accuracy baseline).

``--with-input`` measures the input-inclusive companion number instead: each
timed step ships a fresh uint8 batch host->device (the transport the training
pipeline uses), normalizes on device, runs the forward, and fetches the
outputs — so the host<->device boundary that dominates the reference's
dataloading meter (train.py:213) is inside the measurement. JPEG decode stays
outside (host-CPU-bound; see PERFORMANCE.md "Input pipeline" for its cost).
"""
from __future__ import annotations

import json
import time

BASELINE_FPS = 4000.0  # BASELINE.md rebuild target (frames/sec/chip)


def chained_steps(predict, variables, batch, n_iters: int):
    """jit program running n_iters sequentially-dependent inference steps."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(variables, batch):
        def body(_, carry):
            b = dict(batch)
            # data dependency ON THE PIXELS keeps every step's full compute
            # (incl. the conv trunk) inside the loop — perturbing anything
            # the trunk doesn't read lets XLA hoist the trunk out as
            # loop-invariant (measured: a bogus 3x). The epsilon is cast to
            # the video dtype: a negligible float for f32 input, a
            # runtime-zero (unfoldable) integer for the uint8 transport.
            eps = (carry * 1e-12).astype(batch["src_video"].dtype)
            b["src_video"] = batch["src_video"] + eps
            scores, boxes = predict(variables, b)
            return scores.mean() + boxes.mean()

        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

    return run


def with_input_fps(predict, variables, cfg, batch_size: int, n_iters: int) -> float:
    """Input-inclusive steps: uint8 batch host->device + on-device normalize
    + forward, outputs fetched per step — the fetch is the completion barrier
    (block_until_ready is unreliable on this backend, CLAUDE.md)."""
    import numpy as np

    import jax

    T, S = cfg.data.num_frames, cfg.data.image_size
    rng = np.random.default_rng(0)
    host_batches = []
    for i in range(2):  # alternate two host batches so no caching can hide
        host_batches.append({
            "src_sketch": rng.integers(0, 256, (batch_size, 1, S, S, 3), np.uint8),
            "src_video": rng.integers(0, 256, (batch_size, T, S, S, 3), np.uint8),
            "src_sketch_mask": np.ones((batch_size, 1), np.float32),
            "src_video_mask": np.ones((batch_size, T), np.float32),
        })
    device = jax.devices()[0]

    @jax.jit
    def scalar_step(variables, dev_batch):
        scores, boxes = predict(variables, dev_batch)
        return scores.sum() + boxes.sum()  # data-dependent on every input

    def step(host_batch):
        dev = jax.device_put(host_batch, device)
        # one tiny fetch = the completion barrier for transfer + compute
        return float(scalar_step(variables, dev))

    step(host_batches[0])  # warmup / compile
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n_iters):
            step(host_batches[i % 2])
        best_dt = min(best_dt, (time.perf_counter() - t0) / n_iters)
    return batch_size * T / best_dt


def _measure(args) -> dict:
    import jax

    from __graft_entry__ import (
        _enable_compile_cache,
        _flagship_config,
        _sample_batch,
        init_variables,
    )

    if args.cpu:
        # Test/smoke mode: force the host platform. Must happen after
        # `import jax` — the axon TPU plugin registers via sitecustomize and
        # ignores the JAX_PLATFORMS env var (CLAUDE.md).
        jax.config.update("jax_platforms", "cpu")
    _enable_compile_cache()
    from svol_tpu.models import build_model
    from svol_tpu.train.steps import make_predict_fn

    cfg = _flagship_config(tiny=args.tiny)
    cfg.model.backbone = args.backbone
    if "vit" in args.backbone:
        # int8 covers the ResNet conv trunk only (ops/quant.py); the ViT
        # path benches bf16 (±flash attention via --no-flash)
        args.quantize = None
        args.calibrated = False
        args.quantize_attention = False
    cfg.model.use_flash_attention = args.flash
    cfg.model.quantize = args.quantize
    cfg.model.quantize_attention = args.quantize_attention
    batch_size = args.batch_size
    n_iters = args.iters
    model = build_model(cfg)
    variables = init_variables(model, cfg)
    if args.calibrated and args.quantize:
        from svol_tpu.ops.quant import calibrate_scales

        calib = _sample_batch(cfg, batch_size=batch_size, uint8_pixels=True)
        quant = calibrate_scales(model, variables, [calib], max_batches=1)
        variables = {**variables, "quant": quant}
    predict = make_predict_fn(model.apply)

    device = jax.devices()[0]
    variables = jax.device_put(variables, device)

    if args.with_input:
        fps = with_input_fps(predict, variables, cfg, batch_size, n_iters)
        metric = "inference_throughput_e2e_input"
    else:
        # uint8 pixels = the production transport (data pipeline ships uint8,
        # model normalizes on device) — and ~4x less HBM read than f32
        batch = jax.device_put(
            _sample_batch(cfg, batch_size=batch_size, uint8_pixels=True), device)
        run = chained_steps(predict, variables, batch, n_iters)
        float(run(variables, batch))  # warmup / compile (fetch forces completion)
        best_dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(variables, batch))  # host fetch = true completion barrier
            best_dt = min(best_dt, (time.perf_counter() - t0) / n_iters)
        fps = batch_size * cfg.data.num_frames / best_dt
        metric = "inference_throughput"

    return {
        "metric": metric,
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }


def main(argv=None) -> None:
    import argparse
    import sys

    ap = argparse.ArgumentParser()
    ap.add_argument("--with-input", action="store_true",
                    help="include uint8 host->device transfer + normalize in "
                         "the timed loop (end-to-end companion number)")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--backbone", default="resnet", choices=["resnet", "vit"],
                    help="vit = the reference's ViT-B/16 CLS-token path "
                         "(backbone.py:11-62), benched at bf16 "
                         "(int8 covers the conv trunk only)")
    ap.add_argument("--flash", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="fused VMEM-softmax attention (head blocks always; "
                         "ViT encoder layers when --backbone vit)")
    ap.add_argument("--quantize", default="int8", choices=["int8", "none"],
                    help="int8 = the serving path (ops/quant.py); none = the "
                         "exact bf16 path. Default int8 (accuracy measured at "
                         "parity — PERFORMANCE.md)")
    ap.add_argument("--calibrated", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="with int8: static activation scales from a "
                         "calibration pass (fastest serving configuration); "
                         "--no-calibrated uses dynamic per-tensor scales")
    ap.add_argument("--bf16", action="store_true",
                    help="shorthand for --quantize none (the bit-accuracy "
                         "reference path)")
    ap.add_argument("--quantize_attention", action="store_true",
                    help="with int8: also run the flash QK/PV matmuls on the "
                         "int8 MXU units (static calibrated q/k/v scales when "
                         "--calibrated)")
    ap.add_argument("--attempts", type=int, default=3,
                    help="retries on failure: this environment's TPU worker "
                         "can crash transiently and recover (CLAUDE.md)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model/shapes (smoke/test mode — the number is "
                         "meaningless, only the contract is exercised)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the host CPU platform (smoke/test mode)")
    ap.add_argument("--retry-wait", type=float, default=60.0,
                    help="seconds between retry attempts")
    args = ap.parse_args(argv)
    if args.bf16 or args.quantize == "none":
        args.quantize = None
        args.calibrated = False
        args.quantize_attention = False

    # The tunneled TPU worker can crash mid-program and recover a minute
    # later (PERFORMANCE.md, CLAUDE.md); one JSON line on stdout either way,
    # diagnostics on stderr. Deterministic Python bugs must NOT retry — they
    # are fatal on attempt 1 and retrying burns driver budget (round 3
    # shipped a NameError that slept through 3x60 s before failing).
    _FATAL = (NameError, TypeError, AttributeError, SyntaxError, ImportError,
              KeyError, IndexError, AssertionError)
    last = None
    for attempt in range(max(1, args.attempts)):
        try:
            out = _measure(args)
            break
        except _FATAL:
            raise
        except Exception as e:  # noqa: BLE001 — backend faults retry
            last = e
            print(f"bench attempt {attempt + 1} failed: {e!r}; retrying in "
                  f"{args.retry_wait:.0f} s (transient TPU worker crashes "
                  "recover on retry)", file=sys.stderr, flush=True)
            time.sleep(args.retry_wait)
    else:
        raise last
    print(json.dumps(out))


if __name__ == "__main__":
    main()
