"""Capture a jax.profiler device trace of the flagship predict step and dump
the top ops by device self-time.

Usage: python scripts/profile_step.py [bs] [trace_dir]
"""
from __future__ import annotations

import glob
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(bs: int, trace_dir: str) -> None:
    from __graft_entry__ import (
        _enable_compile_cache,
        _flagship_config,
        _sample_batch,
        init_variables,
    )

    _enable_compile_cache()
    import jax

    from bench import chained_steps
    from svol_tpu.models import build_model
    from svol_tpu.train.steps import make_predict_fn

    cfg = _flagship_config()
    model = build_model(cfg)
    device = jax.devices()[0]
    variables = jax.device_put(init_variables(model, cfg), device)
    batch = jax.device_put(_sample_batch(cfg, batch_size=bs), device)
    predict = make_predict_fn(model.apply)
    run = chained_steps(predict, variables, batch, 5)
    float(run(variables, batch))  # compile + warm
    with jax.profiler.trace(trace_dir):
        float(run(variables, batch))
    print("trace captured to", trace_dir)


def report(trace_dir: str, top: int = 40) -> None:
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([path], "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    # tool data is gviz JSON-ish; fall back to the simpler trace if needed
    out = os.path.join(trace_dir, "op_stats.json")
    with open(out, "w") as f:
        f.write(data)
    print("op stats written to", out, f"({len(data)} bytes)")


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    trace_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/svol_profile"
    os.makedirs(trace_dir, exist_ok=True)
    capture(bs, trace_dir)
    report(trace_dir)
