"""A/B the stage-1 conv: XLA conv vs the W-pair-packed Pallas matmul.

The flagship step's stage-1 3x3 convs (56^2, 64->64) run at ~60% MFU under
XLA (output channels fill half the MXU lanes); packed_conv3x3 reshapes them
into a 75%-dense 128-lane matmul (ops/pallas/packed_conv.py). This measures
both on the real chip with the chained-dependency methodology (CLAUDE.md:
block_until_ready is unreliable on this backend).

    python scripts/bench_conv_stage1.py [frames=256] [iters=30]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(frames: int = 256, n_iters: int = 30) -> None:
    from svol_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from svol_tpu.ops.pallas.packed_conv import (
        packed_conv3x3,
        packed_conv3x3_xla,
    )

    H = W = 56
    C = F = 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((frames, H, W, C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, C, F)) * 0.05, jnp.bfloat16)
    gflop = 2 * frames * H * W * C * F * 9 / 1e9

    def xla_conv(x, w):
        dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=dn,
        )

    def chained(conv):
        @jax.jit
        def run(x, w):
            def body(_, carry):
                y = conv(carry, w)
                # renormalize so the chain doesn't overflow bf16
                return (y * jnp.bfloat16(0.05)).astype(jnp.bfloat16)

            out = lax.fori_loop(0, n_iters, body, x)
            return out.astype(jnp.float32).sum()

        return run

    impls = (
        ("xla", xla_conv),
        ("packed_xla", packed_conv3x3_xla),
        ("packed_pallas", packed_conv3x3),  # does not lower on this Mosaic
    )
    for name, conv in impls:
        run = chained(conv)
        try:
            float(run(x, w))  # compile + warm
        except Exception as e:  # the Pallas variant: Mosaic lowering gap
            print(f"{name}: FAILED to compile "
                  f"({type(e).__name__}: {str(e).splitlines()[0][:100]})",
                  flush=True)
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x, w))
            best = min(best, (time.perf_counter() - t0) / n_iters)
        print(f"{name}: {best * 1e6:.0f} us/conv, "
              f"{gflop / best / 1e3:.1f} TFLOP/s "
              f"({gflop / best / 1e3 / 197 * 100:.0f}% of v5e bf16 peak)",
              flush=True)


if __name__ == "__main__":
    kw = {}
    for arg in sys.argv[1:]:
        k, v = arg.split("=")
        kw[{"frames": "frames", "iters": "n_iters"}[k]] = int(v)
    main(**kw)
