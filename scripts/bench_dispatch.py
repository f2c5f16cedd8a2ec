"""A/B the train loop's dispatch granularity on the real chip.

bench_train.py measures pure step compute (chained steps over one resident
batch — no per-step dispatch). The train CLI pays, per iteration, one jit
dispatch through the runtime plus the arrival of a fresh batch. This script
measures how much of the CLI's per-iteration wall cost is dispatch
serialization by comparing, over the SAME K distinct resident device batches
(transfers happen before the timed region in both modes):

  A. K single train_step dispatches (the CLI pattern with a perfect
     prefetcher), vs
  B. ONE make_multi_train_step dispatch — lax.scan over the K batches
     stacked on a leading axis (--steps_per_dispatch K in the train CLI).

Both end with the same host fetch of a params-dependent scalar (the reliable
completion barrier on this backend — CLAUDE.md). Math-identical by
tests/test_train_loop.py::test_multi_step_dispatch_matches_single_steps.

    python scripts/bench_dispatch.py [bs=16] [k=4] [reps=3]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(batch_size: int = 16, k: int = 4, reps: int = 3):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import (
        _enable_compile_cache,
        _flagship_config,
        _sample_batch,
    )

    _enable_compile_cache()

    from svol_tpu.losses.criterion import build_criterion
    from svol_tpu.models import build_model
    from svol_tpu.train import create_train_state
    from svol_tpu.train.steps import make_multi_train_step, make_train_step

    cfg = _flagship_config()
    model = build_model(cfg)
    criterion = build_criterion(cfg)

    device = jax.devices()[0]
    host_batches = [
        _sample_batch(cfg, batch_size=batch_size, with_targets=True,
                      uint8_pixels=True, seed=i)
        for i in range(k)
    ]
    state0 = create_train_state(
        cfg, model, jax.random.PRNGKey(0),
        {kk: host_batches[0][kk] for kk in
         ("src_sketch", "src_video", "src_sketch_mask", "src_video_mask")},
    )
    state0 = jax.device_put(state0, device)
    rng = jax.random.PRNGKey(1)

    def barrier(state):
        # params-dependent scalar fetch = queue drained (block_until_ready
        # is unreliable here)
        leaf = jax.tree.leaves(state.params)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    # --- mode A: K single-step dispatches over distinct batches ---------
    single = make_train_step(cfg, criterion, donate=False)
    dev_batches = [jax.device_put(b, device) for b in host_batches]

    def run_single():
        st = state0
        for b in dev_batches:
            st, _ = single(st, b, rng)
        return barrier(st)

    run_single()  # compile + warm
    best_a = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run_single()
        best_a = min(best_a, (time.perf_counter() - t0) / k)

    # --- mode B: one scanned K-step dispatch over the stacked batches ---
    multi = make_multi_train_step(cfg, criterion, donate=False)
    stacked = jax.device_put(
        {kk: np.stack([b[kk] for b in host_batches]) for kk in host_batches[0]},
        device,
    )

    def run_multi():
        st, _ = multi(state0, stacked, rng)
        return barrier(st)

    run_multi()  # compile + warm
    best_b = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run_multi()
        best_b = min(best_b, (time.perf_counter() - t0) / k)

    fps = lambda s: batch_size * cfg.data.num_frames / s
    print(f"dispatch A/B bs={batch_size} k={k}: "
          f"single {best_a*1e3:.1f} ms/step ({fps(best_a):.0f} f/s) | "
          f"scanned {best_b*1e3:.1f} ms/step ({fps(best_b):.0f} f/s) | "
          f"saving {(best_a-best_b)*1e3:.1f} ms/step", flush=True)
    return best_a, best_b


if __name__ == "__main__":
    kwargs = {}
    for arg in sys.argv[1:]:
        if not arg:
            continue
        kk, v = arg.split("=")
        kwargs[{"bs": "batch_size"}.get(kk, kk)] = int(v)
    measure(**kwargs)
