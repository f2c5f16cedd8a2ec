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


def capture(bs: int, trace_dir: str, backbone: str = "resnet",
            flash: bool = True) -> None:
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
    cfg.model.backbone = backbone
    cfg.model.use_flash_attention = flash
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
    # the tensorboard_plugin_profile shim in this image is version-skewed
    # against its TF (xspace_to_tools_data missing); the xprof package it
    # wraps converts fine (round 4)
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:  # older images
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([path], "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    # tool data is gviz JSON-ish; fall back to the simpler trace if needed
    out = os.path.join(trace_dir, "op_stats.json")
    with open(out, "w") as f:
        f.write(data)
    print("op stats written to", out, f"({len(data)} bytes)")
    _print_top(out, top)


def _print_top(op_stats_json: str, top: int = 40) -> None:
    """Human summary: top device ops by self-time, plus per-type totals."""
    import collections
    import json

    data = json.loads(open(op_stats_json).read())
    if isinstance(data, list):
        data = data[0]
    rows = [[c["v"] for c in r["c"]] for r in data["rows"]]
    dev = [r for r in rows if r[1] == "Device"]
    total = sum(r[7] for r in dev)
    agg = collections.Counter()
    for r in dev:
        agg[r[2]] += r[7]
    print(f"device self-time total {total / 1e3:.2f} ms")
    print("== by op type ==")
    for t, us in agg.most_common(12):
        print(f"  {t:28s} {us / 1e3:8.2f} ms {100 * us / total:5.1f}%")
    print(f"== top {top} ops ==")
    dev.sort(key=lambda r: -r[7])
    for r in dev[:top]:
        print(f"  {r[7] / 1e3:8.3f} ms {r[14] / 1e3:7.1f} TF/s "
              f"{r[15]:5.0f} GB/s {str(r[17]):8s} {r[3][-90:]}")


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    trace_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/svol_profile"
    backbone = sys.argv[3] if len(sys.argv) > 3 else "resnet"
    flash = (sys.argv[4] != "0") if len(sys.argv) > 4 else True
    os.makedirs(trace_dir, exist_ok=True)
    capture(bs, trace_dir, backbone=backbone, flash=flash)
    report(trace_dir)
