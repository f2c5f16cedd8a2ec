"""Capture a jax.profiler device trace of the flagship TRAIN step and dump
the top ops by device self-time (same tooling as profile_step.py, which
profiles the inference step).

Usage: python scripts/profile_train.py [bs] [trace_dir]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_step import report  # noqa: E402


def capture(bs: int, trace_dir: str) -> None:
    from __graft_entry__ import (
        _enable_compile_cache,
        _flagship_config,
        _sample_batch,
    )

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from svol_tpu.losses.criterion import build_criterion
    from svol_tpu.models import build_model
    from svol_tpu.train import create_train_state, make_train_step

    cfg = _flagship_config()
    model = build_model(cfg)
    criterion = build_criterion(cfg)
    batch = _sample_batch(cfg, batch_size=bs, with_targets=True,
                          uint8_pixels=True)
    device = jax.devices()[0]
    state = create_train_state(
        cfg, model, jax.random.PRNGKey(0),
        {k: batch[k] for k in
         ("src_sketch", "src_video", "src_sketch_mask", "src_video_mask")},
    )
    state = jax.device_put(state, device)
    batch = jax.device_put(batch, device)
    step = make_train_step(cfg, criterion, donate=False)

    @jax.jit
    def run(state, batch, rng):
        def body(i, st):
            st2, _metrics = step(st, batch, jax.random.fold_in(rng, i))
            return st2

        final = jax.lax.fori_loop(0, 3, body, state)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree.leaves(final.params))

    rng = jax.random.PRNGKey(1)
    float(run(state, batch, rng))  # compile + warm
    with jax.profiler.trace(trace_dir):
        float(run(state, batch, rng))
    print("trace captured to", trace_dir)


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    trace_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/svol_train_profile"
    os.makedirs(trace_dir, exist_ok=True)
    capture(bs, trace_dir)
    report(trace_dir)
