"""Kernel-level A/B of the flash-attention variants on SVOL's shape
(BH=64, L=1568, d=32): exact bf16 vs int8-dynamic vs int8-static-scales.

Step-level A/Bs through the tunnel carry ±2% run-to-run noise — bigger than
the attention share of the step — so the decision number comes from here
(chained 50-call loops, scalar fetch as the completion barrier).

    python scripts/bench_flash_int8.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/svol_tpu_cache")


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from svol_tpu.ops.pallas.flash_attention import (
        flash_attention,
        flash_attention_int8,
        flash_self_attention_int8,
    )

    BH, L, d = 64, 1568, 32
    B, H = 8, 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(BH, L, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(BH, L, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(BH, L, d)), jnp.bfloat16)
    amax = tuple(jnp.max(jnp.abs(t.astype(jnp.float32))) for t in (q, k, v))
    scale = d ** -0.5

    variants = {
        "bf16_exact": lambda a, b, c: flash_attention(a, b, c, scale, False),
        "int8_dynamic": lambda a, b, c: flash_attention_int8(
            a, b, c, scale, False),
        "int8_static": lambda a, b, c: flash_self_attention_int8(
            a.reshape(B, H, L, d), b.reshape(B, H, L, d),
            c.reshape(B, H, L, d), scale, static_amax=amax,
        ).reshape(BH, L, d),
    }

    for name, fn in variants.items():
        @jax.jit
        def run(q, k, v, fn=fn):
            def body(_, carry):
                o = fn(q + carry.astype(q.dtype) * 1e-12, k, v)
                return jnp.float32(jnp.mean(o.astype(jnp.float32)))

            return jax.lax.fori_loop(0, 50, body, jnp.float32(0.0))

        float(run(q, k, v))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(q, k, v))
            best = min(best, (time.perf_counter() - t0) / 50)
        print(f"{name}: {best * 1e6:.0f} us/call", flush=True)


if __name__ == "__main__":
    main()
