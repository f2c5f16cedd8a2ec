"""Compare ResNet stems (conv7 vs space_to_depth) on the real chip using the
chained-steps methodology from bench.py. Experiment harness, not the driver
benchmark — prints one line per configuration.

    python scripts/bench_stem.py [conv7|space_to_depth|both] [batch_size]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(stem: str, batch_size: int = 8, n_iters: int = 20) -> float:
    import jax

    from __graft_entry__ import (
        _enable_compile_cache,
        _flagship_config,
        _sample_batch,
        init_variables,
    )
    from bench import chained_steps

    _enable_compile_cache()
    from svol_tpu.models import build_model
    from svol_tpu.train.steps import make_predict_fn

    cfg = _flagship_config()
    cfg.model.resnet_stem = stem
    model = build_model(cfg)
    batch = _sample_batch(cfg, batch_size=batch_size)
    variables = init_variables(model, cfg)
    predict = make_predict_fn(model.apply)

    device = jax.devices()[0]
    variables = jax.device_put(variables, device)
    batch = jax.device_put(batch, device)

    run = chained_steps(predict, variables, batch, n_iters)
    float(run(variables, batch))  # warmup/compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(variables, batch))
        best = min(best, (time.perf_counter() - t0) / n_iters)
    fps = batch_size * cfg.data.num_frames / best
    print(f"stem={stem} bs={batch_size}: {best*1e3:.2f} ms/step, "
          f"{fps:.0f} frames/s/chip")
    return fps


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    stems = ["conv7", "space_to_depth"] if which == "both" else [which]
    for s in stems:
        measure(s, bs)
