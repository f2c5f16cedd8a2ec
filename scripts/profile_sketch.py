"""Trace the sketch ResNet-18 pooled trunk alone (batch 8) — it measures
~1.95 ms standalone (= 4% MFU), far above its FLOP cost. Find out why.

Usage: python scripts/profile_sketch.py [bs] [trace_dir]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    trace_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/svol_sketch_profile"

    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from svol_tpu.models.resnet import resnet18

    net = resnet18(include_pool=True, dtype=jnp.bfloat16)
    S = 224
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(bs, S, S, 3)), jnp.float32)
    device = jax.devices()[0]
    variables, x = jax.device_put((variables, x), device)

    @jax.jit
    def run(variables, x):
        def body(_, carry):
            y = net.apply(variables, x + carry * 1e-12, train=False)
            return jnp.float32(jnp.mean(y.astype(jnp.float32)))

        return jax.lax.fori_loop(0, 5, body, jnp.float32(0.0))

    float(run(variables, x))
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        float(run(variables, x))
    print("trace captured to", trace_dir)


if __name__ == "__main__":
    main()
