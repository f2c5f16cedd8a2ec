"""Micro-benchmark: is an int8 conv actually ~2x bf16 on this TPU/XLA?

Representative shape: ResNet-34 layer3 (28x28x256 maps, 3x3 conv, 256
frames in flight = bs8 x T32). Chained-dependency methodology (CLAUDE.md):
N convs fused in one jit program with data dependencies, one scalar fetched.

Usage: python scripts/bench_int8.py [chain_len]
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/svol_tpu_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                ("NHWC", "HWIO", "NHWC"))


def conv(x, k, **kw):
    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME", dimension_numbers=DN,
        **kw)


def run(name, fn, x, n_iter=5):
    y = fn(x)
    jax.block_until_ready(y)
    _ = np.asarray(y).ravel()[0]  # real completion barrier
    best = float("inf")
    for _ in range(n_iter):
        t0 = time.perf_counter()
        v = float(np.asarray(fn(x)).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best * 1e3:.2f} ms (chk {v:.3f})")
    return best


def main():
    chain = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    B, H, W, C = 256, 28, 28, 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)
    k_bf16 = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.05, jnp.bfloat16)
    k_int8 = jnp.asarray(rng.integers(-127, 128, size=(3, 3, C, C)), jnp.int8)
    kscale = jnp.float32(0.05 / 127.0)

    gflop = 2 * B * H * W * C * C * 9 * chain / 1e9
    print(f"chain={chain}, {gflop:.0f} GFLOP per call")

    @jax.jit
    def f_bf16(x):
        y = x
        for _ in range(chain):
            y = jnp.maximum(conv(y, k_bf16), 0).astype(jnp.bfloat16)
            y = y * jnp.bfloat16(0.1)  # keep magnitudes bounded
        return y.astype(jnp.float32).mean()[None]

    @jax.jit
    def f_int8_dyn(x):
        y = x
        for _ in range(chain):
            # dynamic per-tensor activation quant (the serving-path recipe)
            amax = jnp.maximum(jnp.max(jnp.abs(y.astype(jnp.float32))), 1e-6)
            xs = amax / 127.0
            q = jnp.clip(jnp.round(y.astype(jnp.float32) / xs), -127,
                         127).astype(jnp.int8)
            acc = conv(q, k_int8, preferred_element_type=jnp.int32)
            y = jnp.maximum(acc.astype(jnp.float32) * (xs * kscale),
                            0).astype(jnp.bfloat16)
            y = y * jnp.bfloat16(0.1)
        return y.astype(jnp.float32).mean()[None]

    @jax.jit
    def f_int8_static(x):
        # calibrated scales: quantize is pure elementwise, fusable into the
        # previous conv's epilogue
        xs = jnp.float32(4.0 / 127.0)
        y = x
        for _ in range(chain):
            q = jnp.clip(jnp.round(y.astype(jnp.float32) * (1.0 / xs)), -127,
                         127).astype(jnp.int8)
            acc = conv(q, k_int8, preferred_element_type=jnp.int32)
            y = jnp.maximum(acc.astype(jnp.float32) * (xs * kscale),
                            0).astype(jnp.bfloat16)
            y = y * jnp.bfloat16(0.1)
        return y.astype(jnp.float32).mean()[None]

    t_bf = run("bf16 conv chain", f_bf16, x)
    t_dyn = run("int8 dynamic-quant chain", f_int8_dyn, x)
    t_st = run("int8 static-quant chain", f_int8_static, x)
    print(f"dyn speedup: {t_bf / t_dyn:.2f}x; static speedup: "
          f"{t_bf / t_st:.2f}x; bf16 TFLOP/s {gflop / t_bf / 1e3:.1f}, "
          f"int8-static eff-TFLOP/s {gflop / t_st / 1e3:.1f}")


if __name__ == "__main__":
    main()
