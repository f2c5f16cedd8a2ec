"""End-to-end inference throughput benchmark (driver contract).

Measures frames/sec/chip of the flagship model (ResNet-34/18 backbone +
SVANet head, 224^2 inputs, T=32 frames, 320 queries) on the available
accelerator: jit'd predict step (backbone + cross-modal transformer +
score/box post-processing), steady-state, compile excluded.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
baseline is the 4,000 frames/sec/chip target from BASELINE.md.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_FPS = 4000.0  # BASELINE.md rebuild target (frames/sec/chip)


def main() -> None:
    import jax

    from __graft_entry__ import _flagship_config, _sample_batch
    from svol_tpu.models import build_model
    from svol_tpu.train.steps import make_predict_step

    cfg = _flagship_config()
    batch_size = 8
    model = build_model(cfg)
    batch = _sample_batch(cfg, batch_size=batch_size)
    init_keys = ("src_sketch", "src_video", "src_sketch_mask", "src_video_mask")
    variables = model.init(
        jax.random.PRNGKey(0), **{k: batch[k] for k in init_keys}
    )
    predict = make_predict_step(model.apply)

    device = jax.devices()[0]
    variables = jax.device_put(variables, device)
    batch = jax.device_put(batch, device)

    # warmup / compile
    jax.block_until_ready(predict(variables, batch))

    # NB: keep every output and block on all of them — under the axon tunnel,
    # blocking only on the last dispatch does not serialize the queue.
    n_iters = 20
    t0 = time.perf_counter()
    outs = [predict(variables, batch) for _ in range(n_iters)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / n_iters

    frames_per_step = batch_size * cfg.data.num_frames
    fps = frames_per_step / dt
    print(json.dumps({
        "metric": "inference_throughput",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
