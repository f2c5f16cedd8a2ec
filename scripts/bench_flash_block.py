"""Sweep the flash-attention q-block size on SVOL's shape (BH=64, L=1568,
d=32). Larger blocks re-read K/V fewer times and amortize grid overhead;
the (bq, L) f32 logits tile must stay within VMEM.

Usage: python scripts/bench_flash_block.py [bq ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/svol_tpu_cache")


def main() -> None:
    blocks = [int(a) for a in sys.argv[1:]] or [112, 224, 392, 784, 1568]

    import jax
    import jax.numpy as jnp
    import numpy as np

    BH, L, d = 64, 1568, 32
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(BH, L, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(BH, L, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(BH, L, d)), jnp.bfloat16)

    for bq in blocks:
        os.environ["SVOL_FLASH_BLOCK_Q"] = str(bq)
        # fresh trace per block size (the env is read at trace time)
        from svol_tpu.ops.pallas.flash_attention import flash_attention

        @jax.jit
        def run(q, k, v):
            def body(_, carry):
                o = flash_attention(q + carry.astype(q.dtype) * 1e-12, k, v,
                                    d ** -0.5, False)
                return jnp.float32(jnp.mean(o.astype(jnp.float32)))

            return jax.lax.fori_loop(0, 50, body, jnp.float32(0.0))

        float(run(q, k, v))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(q, k, v))
            best = min(best, (time.perf_counter() - t0) / 50)
        print(f"bq={bq}: {best * 1e6:.0f} us/call", flush=True)


if __name__ == "__main__":
    main()
