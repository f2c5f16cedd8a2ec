"""Decompose flagship inference step time into components.

Times each piece with the chained-steps methodology from bench.py (N
sequentially-dependent iterations in one jit program, one scalar fetched):

  video   — ResNet-34 trunk over the B*T frame batch (the dominant FLOPs)
  sketch  — ResNet-18 pooled trunk over the B sketches
  full    — the production predict step (reference total)

head time ~= full - video - sketch (the SVANet input projection + cross-modal
transformer + score/box heads; XLA cross-component fusion makes a standalone
head number slightly unfair, the subtraction is the honest estimate).

Usage: python scripts/bench_parts.py [bs] [part ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(run, n_iters: int, label: str, work_frames: int) -> float:
    float(run())  # warmup / compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run())
        best = min(best, (time.perf_counter() - t0) / n_iters)
    print(f"{label}: {best * 1e3:.2f} ms/iter "
          f"({work_frames / best:.0f} frames/s)", flush=True)
    return best


def main() -> None:
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    parts = sys.argv[2:] or ["video", "sketch", "full"]
    n_iters = 20

    from __graft_entry__ import (
        _enable_compile_cache,
        _flagship_config,
        _sample_batch,
        init_variables,
    )

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from svol_tpu.models import build_model
    from svol_tpu.models.resnet import resnet18, resnet34
    from svol_tpu.train.steps import make_predict_fn

    cfg = _flagship_config()
    T, S = cfg.data.num_frames, cfg.data.image_size
    device = jax.devices()[0]
    rng = np.random.default_rng(0)
    times = {}

    def chained_trunk(net, x0, variables):
        @jax.jit
        def run():
            def body(_, carry):
                y = net.apply(variables, x0 + carry * 1e-12, train=False)
                return jnp.float32(jnp.mean(y.astype(jnp.float32)))

            return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

        return run

    if "video" in parts:
        net = resnet34(include_pool=False, dtype=jnp.bfloat16)
        variables = jax.device_put(
            net.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3))), device)
        x = jax.device_put(
            jnp.asarray(rng.uniform(size=(bs * T, S, S, 3)), jnp.float32), device)
        times["video"] = timeit(chained_trunk(net, x, variables), n_iters,
                                f"video rn34 trunk ({bs * T} frames)", bs * T)

    if "sketch" in parts:
        net = resnet18(include_pool=True, dtype=jnp.bfloat16)
        variables = jax.device_put(
            net.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3))), device)
        x = jax.device_put(
            jnp.asarray(rng.uniform(size=(bs, S, S, 3)), jnp.float32), device)
        times["sketch"] = timeit(chained_trunk(net, x, variables), n_iters,
                                 f"sketch rn18 pooled ({bs} sketches)", bs)

    if "full" in parts:
        from bench import chained_steps

        model = build_model(cfg)
        variables = jax.device_put(init_variables(model, cfg), device)
        batch = jax.device_put(_sample_batch(cfg, batch_size=bs), device)
        predict = make_predict_fn(model.apply)
        run = chained_steps(predict, variables, batch, n_iters)
        times["full"] = timeit(lambda: run(variables, batch), n_iters,
                               f"full predict (bs={bs})", bs * T)

    if {"video", "sketch", "full"} <= set(times):
        head = times["full"] - times["video"] - times["sketch"]
        print(f"head (by subtraction): {head * 1e3:.2f} ms "
              f"({head / times['full'] * 100:.0f}% of step)")


if __name__ == "__main__":
    main()
