"""A/B the batched LSAP solver implementations on the production shape.

The flagship train step solves 2 x (bs16 x T32) = 512-wide batches of 10x10
assignment problems per step (final + aux matcher). Implementations
(ops/hungarian.py):

  * vmap   — scalar JV solver under vmap (per-lane gathers/scatters);
             SVOL_LSAP_LOOP additionally selects its loop combinator.
  * dense  — explicitly-batched one-hot formulation, plain XLA ops.
  * pallas — the dense formulation as ONE fused kernel, state + loops in
             VMEM, single dispatch.

Chained in-program iterations; scalar fetch as the completion barrier
(block_until_ready is unreliable on this backend — CLAUDE.md).

    python scripts/bench_lsap.py [width=512] [iters=20] [only=dense_xla]

``only=`` restricts to one impl (comma-separable). Needed to probe widths
beyond 512: the vmapped JV while-loop at width 1024 reproducibly crashes
this environment's TPU worker (PERFORMANCE.md merged-matcher root cause),
so the dense formulation must be measured there on its own.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/svol_tpu_cache")


def main(width: int = 512, n_iters: int = 20, only: str = "") -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import importlib

    # svol_tpu.ops re-exports the `hungarian` FUNCTION, shadowing the
    # submodule name on attribute import
    H = importlib.import_module("svol_tpu.ops.hungarian")

    rng = np.random.default_rng(0)
    cost = jnp.asarray(rng.uniform(size=(width, 10, 10)), jnp.float32)

    impls = {
        "vmap_while": lambda c: jax.vmap(H._solve_square)(c),
        "dense_xla": H._solve_dense,
        "pallas": lambda c: H._solve_dense_pallas(c),
    }
    if only:
        keep = set(only.split(","))
        impls = {k: v for k, v in impls.items() if k in keep}
        assert impls, f"only={only!r} matched nothing"

    outs = {}
    for name, solve in impls.items():
        @jax.jit
        def run(cost, solve=solve):
            def body(_, carry):
                c = cost + carry * 1e-12
                a = solve(c)
                return jnp.float32(a.sum())

            return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

        float(run(cost))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(cost))
            best = min(best, (time.perf_counter() - t0) / n_iters)
        print(f"{name}: {best * 1e6:.0f} us / {width}-wide solve", flush=True)
        outs[name] = np.asarray(jax.jit(solve)(cost))

    ref_name = next(iter(outs))
    ref = outs[ref_name]
    for name, out in outs.items():
        assert (out == ref).all(), f"{name} diverges from {ref_name}"
    if len(outs) > 1:
        print("all impls assignment-identical")


if __name__ == "__main__":
    kw = {}
    for arg in sys.argv[1:]:
        k, v = arg.split("=")
        if k == "only":
            kw["only"] = v
        else:
            kw[{"width": "width", "iters": "n_iters"}[k]] = int(v)
    main(**kw)
