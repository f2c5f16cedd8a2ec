"""Single-clip latency: bs=1, T=32, 224², including the host round-trip.

Per-clip: ship a fresh uint8 clip host->device, run predict, fetch a scalar
(the completion barrier — block_until_ready is unreliable here, CLAUDE.md).
Reports p50/p90/min over N clips. The BASELINE.md tracked-latency metric.

Usage: python scripts/bench_latency.py [n_clips] [quantize]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    quantize = sys.argv[2] if len(sys.argv) > 2 else None

    from __graft_entry__ import (
        _enable_compile_cache,
        _flagship_config,
        _sample_batch,
        init_variables,
    )

    _enable_compile_cache()
    import jax
    import numpy as np

    from svol_tpu.models import build_model
    from svol_tpu.train.steps import make_predict_fn

    cfg = _flagship_config()
    cfg.model.quantize = quantize
    model = build_model(cfg)
    device = jax.devices()[0]
    variables = jax.device_put(init_variables(model, cfg), device)
    predict = make_predict_fn(model.apply)

    @jax.jit
    def step(variables, batch):
        scores, boxes = predict(variables, batch)
        return scores.sum() + boxes.sum()

    rng = np.random.default_rng(0)
    T, S = cfg.data.num_frames, cfg.data.image_size
    clips = []
    for i in range(4):  # rotate host buffers so no transfer caching helps
        clips.append(_sample_batch(cfg, batch_size=1, uint8_pixels=True))
        clips[-1]["src_video"] = rng.integers(0, 256, (1, T, S, S, 3), np.uint8)

    float(step(variables, jax.device_put(clips[0], device)))  # compile

    def run(label, get_batch):
        lat = []
        for i in range(n):
            t0 = time.perf_counter()
            float(step(variables, get_batch(i)))
            lat.append(time.perf_counter() - t0)
        lat.sort()
        p = lambda q: lat[min(len(lat) - 1, int(q * len(lat)))] * 1e3
        print(f"{label} clips={n} quantize={quantize}: p50 {p(0.5):.1f} ms, "
              f"p90 {p(0.9):.1f} ms, min {lat[0]*1e3:.1f} ms", flush=True)

    # fresh-input: ships the uint8 clip host->device inside the measurement
    # (tunnel-bound on this environment; ~2 ms PCIe on attached hosts)
    run("fresh-input", lambda i: jax.device_put(clips[i % 4], device))
    # resident: clip already on device — dispatch + compute + scalar fetch
    # (the round-1 methodology; isolates the serving-side compute latency)
    dev_clips = [jax.device_put(c, device) for c in clips]
    run("resident", lambda i: dev_clips[i % 4])


if __name__ == "__main__":
    main()
