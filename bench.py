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
            # data dependency: negligible perturbation keeps steps sequential
            b["src_video"] = batch["src_video"] + carry * 1e-12
            scores, boxes = predict(variables, b)
            return scores.mean() + boxes.mean()

        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

    return run


def main() -> None:
    import jax

    from __graft_entry__ import (
        _enable_compile_cache,
        _flagship_config,
        _sample_batch,
        init_variables,
    )

    _enable_compile_cache()
    from svol_tpu.models import build_model
    from svol_tpu.train.steps import make_predict_fn

    cfg = _flagship_config()
    batch_size = 8
    n_iters = 20
    model = build_model(cfg)
    batch = _sample_batch(cfg, batch_size=batch_size)
    variables = init_variables(model, cfg)
    predict = make_predict_fn(model.apply)

    device = jax.devices()[0]
    variables = jax.device_put(variables, device)
    batch = jax.device_put(batch, device)

    run = chained_steps(predict, variables, batch, n_iters)
    float(run(variables, batch))  # warmup / compile (fetch forces completion)

    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(variables, batch))  # host fetch = true completion barrier
        best_dt = min(best_dt, (time.perf_counter() - t0) / n_iters)

    frames_per_step = batch_size * cfg.data.num_frames
    fps = frames_per_step / best_dt
    print(json.dumps({
        "metric": "inference_throughput",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
