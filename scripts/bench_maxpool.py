"""A/B the 3x3/s2 maxpool BACKWARD formulations on the chip.

XLA lowers the gradient of ``reduce_window_max`` to ``select_and_scatter``
— the single most expensive op in the round-4 train-step trace (3.5 ms/step
at bs=16, HBM-bound: scripts/profile_train.py). The alternative formulates
the same pool as an elementwise max over the 9 strided window shifts;
its autodiff is a chain of fusable compare/select/pad ops with no
select_and_scatter.

Gradient-semantics note: on tied window maxima select_and_scatter routes
the cotangent to ONE element (torch semantics) while the shifted-max chain
splits it among tying shifts — identical forward, subgradient-equivalent
backward (ties occur at ReLU-clamped zeros).

    python scripts/bench_maxpool.py [iters=30]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_iters: int = 30) -> None:
    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from svol_tpu.models.resnet import max_pool_3x3_s2

    B, H, W, C = 512, 112, 112, 64  # conv1 output at bs=16, T=32
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, H, W, C)), jnp.bfloat16)

    def pool_rw(x):
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    def pool_shift(x):
        return max_pool_3x3_s2(x, impl="shifted_max")

    # forward equivalence (bitwise: both compute max over the same windows)
    np.testing.assert_array_equal(np.asarray(pool_rw(x), np.float32),
                                  np.asarray(pool_shift(x), np.float32))

    results = {}
    for name, pool in (("reduce_window", pool_rw), ("shifted_max", pool_shift)):
        def vjp_step(x):
            y, pull = jax.vjp(pool, x)
            (dx,) = pull(y)  # some cotangent with the output's shape
            return dx

        @jax.jit
        def run(x):
            # chained loop: dx (x-shaped) feeds the next iteration's input
            def body(_, carry):
                dx = vjp_step(carry)
                return dx + carry * jnp.bfloat16(1e-6)
            out = jax.lax.fori_loop(0, n_iters, body, x)
            return jnp.sum(out.astype(jnp.float32))

        float(run(x))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x))
            best = min(best, (time.perf_counter() - t0) / n_iters)
        results[name] = best * 1e3
        print(f"{name:16s} fwd+bwd {best * 1e3:7.3f} ms/call", flush=True)
    print(f"speedup {results['reduce_window'] / results['shifted_max']:.2f}x")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
