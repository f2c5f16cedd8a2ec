"""Measure inference throughput for arbitrary ModelConfig overrides using the
chained-steps methodology from bench.py. Experiment harness.

    python scripts/bench_flags.py use_flash_attention=True [bs=8]
    python scripts/bench_flags.py ""  # plain flagship baseline
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(overrides: dict, batch_size: int = 8, n_iters: int = 20) -> float:
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
    calibrate = bool(overrides.pop("calibrate", False))
    for k, v in overrides.items():
        assert hasattr(cfg.model, k), k
        setattr(cfg.model, k, v)
    model = build_model(cfg)
    batch = _sample_batch(cfg, batch_size=batch_size, uint8_pixels=True)
    variables = init_variables(model, cfg)
    if calibrate:  # static-scale int8 (ops/quant.py)
        from svol_tpu.ops.quant import calibrate_scales

        quant = calibrate_scales(model, variables, [batch], max_batches=1)
        variables = {**variables, "quant": quant}
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
    print(f"{overrides} bs={batch_size}: {best*1e3:.2f} ms/step, "
          f"{fps:.0f} frames/s/chip", flush=True)
    return fps


def parse(s: str):
    if s in ("True", "False"):
        return s == "True"
    try:
        return int(s)
    except ValueError:
        return s


if __name__ == "__main__":
    overrides = {}
    bs = 8
    for arg in sys.argv[1:]:
        if not arg:
            continue
        k, v = arg.split("=")
        if k == "bs":
            bs = int(v)
        else:
            overrides[k] = parse(v)
    measure(overrides, bs)
