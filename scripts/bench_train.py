"""Measure TRAIN-step time with the chained-steps methodology from bench.py.

N full training steps (forward + on-device Hungarian matching + loss +
backward + optimizer) run inside one jit program; the state carried between
steps is the data dependency (params change every step, so nothing can be
hoisted), and a final scalar pulled from the params is the completion
barrier — `block_until_ready` is unreliable on this tunneled backend
(CLAUDE.md).

    python scripts/bench_train.py [bs=16] [iters=10] [fused_backward=True]

`fused_backward=False` disables the fused Pallas attention backward (forces
the XLA-rematerialization fallback in ops/pallas/flash_attention._bwd) for a
clean A/B of VERDICT r2 Weak #2 on the chip.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(batch_size: int = 16, n_iters: int = 10,
            fused_backward: bool = True, overrides: dict | None = None) -> float:
    import jax

    from __graft_entry__ import (
        _enable_compile_cache,
        _flagship_config,
        _sample_batch,
    )

    _enable_compile_cache()

    if not fused_backward:
        import svol_tpu.ops.pallas.flash_attention as fa

        fa._MAX_LOGITS_TILE_BYTES = 0  # force the XLA fallback in _bwd

    from svol_tpu.losses.criterion import build_criterion
    from svol_tpu.models import build_model
    from svol_tpu.train import create_train_state, make_train_step

    cfg = _flagship_config()
    for k, v in (overrides or {}).items():
        section = next(s for s in (cfg.model, cfg.loss, cfg.data, cfg.train)
                       if hasattr(s, k))
        setattr(section, k, v)
    model = build_model(cfg)
    criterion = build_criterion(cfg)
    batch = _sample_batch(cfg, batch_size=batch_size, with_targets=True,
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
        final = jax.lax.fori_loop(0, n_iters, body, state)
        # scalar data-dependent on the final params = completion barrier
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree.leaves(final.params))

    import jax.numpy as jnp

    rng = jax.random.PRNGKey(1)
    float(run(state, batch, rng))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(state, batch, rng))
        best = min(best, (time.perf_counter() - t0) / n_iters)
    fps = batch_size * cfg.data.num_frames / best
    print(f"train bs={batch_size} fused_backward={fused_backward} "
          f"{overrides or {}}: {best*1e3:.1f} ms/step, "
          f"{fps:.0f} frames/s training", flush=True)
    return fps


def parse(s: str):
    if s in ("True", "False"):
        return s == "True"
    try:
        return int(s)
    except ValueError:
        return s


if __name__ == "__main__":
    kwargs = {"batch_size": 16, "n_iters": 10, "fused_backward": True}
    overrides = {}
    for arg in sys.argv[1:]:
        if not arg:
            continue
        k, v = arg.split("=")
        if k in ("bs", "batch_size"):
            kwargs["batch_size"] = int(v)
        elif k == "iters":
            kwargs["n_iters"] = int(v)
        elif k == "fused_backward":
            kwargs["fused_backward"] = v == "True"
        else:
            overrides[k] = parse(v)
    measure(overrides=overrides, **kwargs)
