"""Exact Hungarian assignment (LSAP) on device, batched with vmap.

The reference moves its cost matrix to the CPU every training step and calls
``scipy.optimize.linear_sum_assignment`` once per frame
(``lib/modeling/matcher.py:86-93``) — a device->host sync in the hot loop.
Here the same shortest-augmenting-path algorithm (Jonker-Volgenant, the one
scipy implements) runs inside jit on square ``n x n`` matrices with static
shapes, so a whole batch of per-frame problems solves as one vmapped kernel
and the train step never leaves the device.

SVOL's per-frame problems are 10x10 (``num_queries_per_frame``), so the
sequential O(n^3) inner loops are trivial; vmap turns the scalar work into
(B*T)-wide vector ops on the VPU.

Rectangular problems (fewer targets than queries) are handled by padding the
cost matrix with a constant column cost just above the max valid cost: dummy
columns all cost the same, so the optimum restricted to real columns equals
the rectangular-LSAP optimum that scipy would return. The pad must stay on
the same scale as the real costs — the dual potentials absorb it, and a huge
pad (e.g. 1e6) would erase ~1e-3 cost differences in float32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

_BIG = jnp.float32(1e30)  # finite "infinity": avoids inf-inf -> nan inside jit


def _run_loop(body, init, length: int, cond):
    """Run a lane-masked loop body with the combinator selected by
    SVOL_LSAP_LOOP. The body has scan signature ``carry, _ -> (carry, None)``
    and freezes converged lanes itself, which makes every combinator produce
    identical final states:

      * 'while' (default): data-dependent ``lax.while_loop`` — exits as soon
        as every vmap lane converges. Measured fastest on the flagship train
        step (140.0 ms/step).
      * 'fori' / 'scan': fixed ``length`` trips, no convergence check.
      * 'unroll': fixed trips unrolled at trace time — measured SLOWER
        (157.6 ms/step): the unrolled scatter/gather bodies cost more than
        the while_loop's per-trip convergence check saves.
    """
    import os

    impl = os.environ.get("SVOL_LSAP_LOOP", "while")
    if impl == "unroll":
        carry = init
        for _ in range(length):
            carry, _ = body(carry, None)
        return carry
    if impl == "scan":
        carry, _ = jax.lax.scan(body, init, None, length=length)
        return carry
    if impl == "fori":
        return jax.lax.fori_loop(0, length, lambda _, c: body(c, None)[0], init)
    return jax.lax.while_loop(cond, lambda c: body(c, None)[0], init)


def masked_cost_matrix_rows(cost: Array, row_valid: Array) -> Array:
    """Row-wise analogue of :func:`masked_cost_matrix` for rectangular
    problems whose *rows* are (possibly invalid) target slots: invalid rows
    get a constant cost just above the max valid entry, so they absorb
    arbitrary spare columns without affecting the real rows' optimum."""
    valid = row_valid[..., :, None]
    masked = jnp.where(valid, cost, -jnp.inf)
    big = jnp.max(masked, axis=(-2, -1), keepdims=True)
    big = jnp.where(jnp.isfinite(big), big, 0.0) + 1.0
    return jnp.where(valid, cost, big)


def masked_cost_matrix(cost: Array, col_valid: Array) -> Array:
    """Pad invalid target columns for square solving.

    cost: (..., n, n); col_valid: (..., n) bool. Invalid columns are set to a
    per-problem constant strictly greater than every valid entry, so they act
    as "unmatched" slots without destroying fp32 precision.
    """
    valid = col_valid[..., None, :]
    masked = jnp.where(valid, cost, -jnp.inf)
    big = jnp.max(masked, axis=(-2, -1), keepdims=True)
    big = jnp.where(jnp.isfinite(big), big, 0.0) + 1.0
    return jnp.where(valid, cost, big)


def _solve_square(cost: Array) -> Array:
    """Solve one LSAP with rows <= cols. cost: (R, C) float32 ->
    col4row: (R,) int32.

    col4row[i] is the column assigned to row i (every row gets a column when
    R <= C). Shortest-augmenting-path with dual potentials, the same
    algorithm as scipy's linear_sum_assignment.
    """
    n_rows, n = cost.shape  # n = number of columns
    assert n_rows <= n, (n_rows, n)
    dtype = jnp.float32
    cost = cost.astype(dtype)

    def outer(cur_row, state):
        u, v, row4col, col4row = state

        shortest = jnp.full((n,), _BIG, dtype)
        path = jnp.full((n,), -1, jnp.int32)
        visited_col = jnp.zeros((n,), bool)
        visited_row = jnp.zeros((n_rows,), bool)

        # Dijkstra visits one new column per trip, so the sink is found
        # within n trips — the loop may run fixed-trip (lane-masked) or as
        # a data-dependent while_loop; lanes that found their sink freeze
        # every state component, so the final state — and the assignment —
        # is bit-identical under every combinator (test_hungarian.py asserts
        # scipy-identity). See _run_loop for the SVOL_LSAP_LOOP switch and
        # the measured verdict.
        def dij_body(carry, _):
            i, min_val, shortest, path, visited_col, visited_row, sink = carry
            active = sink < 0
            visited_row = jnp.where(
                active, visited_row.at[i].set(True), visited_row)
            reduced = min_val + cost[i] - u[i] - v  # (n,)
            better = (reduced < shortest) & ~visited_col & active
            shortest = jnp.where(better, reduced, shortest)
            path = jnp.where(better, i, path)

            masked = jnp.where(visited_col, _BIG, shortest)
            j = jnp.argmin(masked).astype(jnp.int32)
            min_val = jnp.where(active, masked[j], min_val)
            visited_col = jnp.where(
                active, visited_col.at[j].set(True), visited_col)

            unassigned = row4col[j] < 0
            sink = jnp.where(active & unassigned, j, sink)
            i = jnp.where(active, jnp.where(unassigned, i, row4col[j]), i)
            return (i, min_val, shortest, path, visited_col, visited_row,
                    sink), None

        init = (
            jnp.int32(cur_row),
            dtype(0.0),
            shortest,
            path,
            visited_col,
            visited_row,
            jnp.int32(-1),
        )
        (_, min_val, shortest, path, visited_col, visited_row, sink) = (
            _run_loop(dij_body, init, n, lambda c: c[-1] < 0)
        )

        # Dual updates (scipy rectangular_lsap.cpp dual-update step).
        u = u.at[cur_row].add(min_val)
        idx = jnp.arange(n_rows)
        other_rows = visited_row & (idx != cur_row)
        # visited rows (except cur_row) are assigned, so col4row is valid there
        u = jnp.where(other_rows, u + (min_val - shortest[col4row]), u)
        v = jnp.where(visited_col, v - (min_val - shortest), v)

        # Augment along the alternating path back to cur_row. The path
        # alternates col -> row -> col without revisiting, so it ends within
        # n trips; done lanes freeze (same fixed-trip rationale as above).
        def aug_body(carry, _):
            j, row4col, col4row, done = carry
            i = path[j]
            row4col = jnp.where(done, row4col, row4col.at[j].set(i))
            nxt = col4row[i]
            col4row = jnp.where(done, col4row, col4row.at[i].set(j))
            j = jnp.where(done, j, nxt)
            return (j, row4col, col4row, done | (i == cur_row)), None

        (_, row4col, col4row, _) = _run_loop(
            aug_body, (sink, row4col, col4row, False), n_rows,
            lambda c: ~c[-1],
        )
        return u, v, row4col, col4row

    u = jnp.zeros((n_rows,), dtype)
    v = jnp.zeros((n,), dtype)
    row4col = jnp.full((n,), -1, jnp.int32)
    col4row = jnp.full((n_rows,), -1, jnp.int32)
    _, _, _, col4row = jax.lax.fori_loop(0, n_rows, outer, (u, v, row4col, col4row))
    return col4row


def _solve_dense(cost: Array) -> Array:
    """Explicitly-batched JV solver: (W, R, C) -> (W, R) col4row.

    Same shortest-augmenting-path algorithm as :func:`_solve_square`, but
    written WITHOUT per-lane gathers/scatters: every per-problem index
    operation is dense one-hot arithmetic over the whole batch, so a trip is
    a handful of wide fused VPU ops instead of ~10 per-problem
    scatter/gather micro-ops. This is the body for both the 'dense' XLA
    path and the fused Pallas kernel (SVOL_LSAP_IMPL=pallas), where the
    entire solve — state, loops and all — lives in VMEM and dispatches as
    ONE op. The vmapped scalar formulation measured 11.2 ms per 512-wide
    solve on the flagship shape, dominated by per-micro-op dispatch
    (scripts/bench_lsap.py); assignments are bit-identical
    (test_hungarian.py asserts scipy-identity for every impl).

    Layout notes (shaped by Mosaic's rules, also good for plain XLA):
      * the batch W rides the LANE (minor) dim — state arrays are (R, W) /
        (C, W), per-problem "scalars" are (1, W) lane vectors whose
        sublane broadcast is a native replicated layout;
      * stored/broadcast masks are int32 0/1 — i1 tensors appear only as a
        full-shape comparison feeding jnp.where directly (storing or
        broadcasting i1 trips Mosaic's mask relayout);
      * 1e30 literals, not the module-level _BIG jnp scalar — a captured
        traced constant is rejected inside a pallas_call kernel.
    """
    W = cost.shape[0]
    cost_t = jnp.transpose(cost.astype(jnp.float32), (1, 2, 0))  # (R, C, W)
    col4row_t = _solve_dense_t(cost_t)  # (R, W)
    return jnp.transpose(col4row_t, (1, 0))


def _solve_dense_t(cost_t: Array) -> Array:
    """Core of :func:`_solve_dense` in batch-on-lanes layout:
    (R, C, W) costs -> (R, W) col4row."""
    n_rows, n, W = cost_t.shape
    assert n_rows <= n, (n_rows, n)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (n, W), 0)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (n_rows, W), 0)

    def outer(cur_row, state):
        u, v, row4col, col4row = state
        # u (R, W) f32; v (C, W) f32; row4col (C, W) / col4row (R, W) int32

        # every init is iota-derived, NOT a constant splat: Mosaic infers
        # replicated layouts for splat constants, and the while-loop carry
        # then demands a concrete->replicated relayout of the body's updated
        # value ("not implemented: sublane broadcast"). iota-derived values
        # carry concrete layouts from the start.
        zc = col_iota * 0  # (C, W) int32 zeros, concrete layout
        zr = row_iota * 0  # (R, W)
        shortest = zc.astype(jnp.float32) + jnp.float32(1e30)
        path = zc - 1
        visited_col = zc
        visited_row = zr

        def dij_cond(carry):
            sink = carry[-1]
            return jnp.min(sink) < 0

        def dij_body(carry):
            i, min_val, shortest, path, visited_col, visited_row, sink = carry
            active = jnp.where(sink < 0, 1, 0)  # (1, W) int32
            rowsel = jnp.where(row_iota == i, 1, 0)  # (R, W) one-hot
            visited_row = jnp.maximum(visited_row, rowsel * active)
            # cost[i] / u[i]: one-hot row selection, unrolled over the
            # static R rows as 2-D ops (no 3-D contraction in the kernel)
            rowself = rowsel.astype(jnp.float32)
            cost_i = sum(
                rowself[r:r + 1] * cost_t[r] for r in range(n_rows)
            )  # (C, W)
            u_i = jnp.sum(rowself * u, axis=0, keepdims=True)  # (1, W)
            reduced = min_val + cost_i - u_i - v
            better = (jnp.where(reduced < shortest, 1, 0)
                      * (1 - visited_col) * active)  # (C, W) int32
            shortest = jnp.where(better > 0, reduced, shortest)
            # arithmetic blend, not select: Mosaic has no sublane-broadcast
            # select_n, so the (1, W) scalar must not appear in a where
            # whose other operands are (C, W)
            path = better * i + (1 - better) * path

            masked = jnp.where(visited_col > 0, jnp.float32(1e30), shortest)
            j = jnp.argmin(masked, axis=0, keepdims=True).astype(jnp.int32)
            jsel = jnp.where(col_iota == j, 1, 0)  # (C, W) one-hot
            new_min = jnp.min(masked, axis=0, keepdims=True)
            # (1, W) updates as arithmetic blends too: reduction outputs
            # (argmin/min/sum) carry replicated layouts that Mosaic's
            # select_n cannot relayout ("not implemented: sublane
            # broadcast"); multiplies handle them fine
            activef = active.astype(jnp.float32)
            min_val = activef * new_min + (1.0 - activef) * min_val
            visited_col = jnp.maximum(visited_col, jsel * active)

            r4c_j = jnp.sum(jsel * row4col, axis=0, keepdims=True)  # (1, W)
            unassigned = jnp.where(r4c_j < 0, 1, 0)
            ms = active * unassigned
            sink = ms * j + (1 - ms) * sink
            cand = unassigned * i + (1 - unassigned) * r4c_j
            i = active * cand + (1 - active) * i
            return i, min_val, shortest, path, visited_col, visited_row, sink

        init = (
            zc[:1] + cur_row,
            zc[:1].astype(jnp.float32),
            shortest,
            path,
            visited_col,
            visited_row,
            zc[:1] - 1,
        )
        (_, min_val, shortest, path, visited_col, visited_row, sink) = (
            jax.lax.while_loop(dij_cond, dij_body, init)
        )

        # dual updates (scipy rectangular_lsap.cpp): shortest[col4row] is a
        # per-row column lookup -> dense one-hot contraction
        cur = jnp.where(row_iota == cur_row, 1, 0)  # (R, W)
        u = jnp.where(cur > 0, u + min_val, u)
        other_rows = visited_row * (1 - cur)
        sh_c4r = jnp.concatenate(
            [jnp.sum(jnp.where(col_iota == col4row[r:r + 1], shortest, 0.0),
                     axis=0, keepdims=True)
             for r in range(n_rows)], axis=0,
        )  # (R, W): shortest[col4row[r]] per row, dense one-hot lookups
        u = jnp.where(other_rows > 0, u + (min_val - sh_c4r), u)
        v = jnp.where(visited_col > 0, v - (min_val - shortest), v)

        def aug_cond(carry):
            done = carry[-1]
            return jnp.min(done) < 1

        def aug_body(carry):
            j, row4col, col4row, done = carry
            act = 1 - done  # (1, W) int32
            jsel = jnp.where(col_iota == j, 1, 0)  # (C, W)
            i = jnp.sum(jsel * path, axis=0, keepdims=True)  # path[j]
            # arithmetic blends (see dij_body): no sublane-broadcast select
            mj = jsel * act
            row4col = mj * i + (1 - mj) * row4col
            isel = jnp.where(row_iota == i, 1, 0)
            nxt = jnp.sum(isel * col4row, axis=0, keepdims=True)  # col4row[i]
            mi = isel * act
            col4row = mi * j + (1 - mi) * col4row
            j = act * nxt + (1 - act) * j
            done = jnp.maximum(done, jnp.where(i == cur_row, 1, 0))
            return j, row4col, col4row, done

        (_, row4col, col4row, _) = jax.lax.while_loop(
            aug_cond, aug_body,
            (sink, row4col, col4row, zc[:1]),
        )
        return u, v, row4col, col4row

    # iota-derived inits for the outer fori carry too (see comment above)
    u = (jax.lax.broadcasted_iota(jnp.int32, (n_rows, W), 0) * 0
         ).astype(jnp.float32)
    v = (jax.lax.broadcasted_iota(jnp.int32, (n, W), 0) * 0
         ).astype(jnp.float32)
    row4col = jax.lax.broadcasted_iota(jnp.int32, (n, W), 0) * 0 - 1
    col4row = jax.lax.broadcasted_iota(jnp.int32, (n_rows, W), 0) * 0 - 1
    _, _, _, col4row = jax.lax.fori_loop(
        0, n_rows, outer, (u, v, row4col, col4row))
    return col4row


def _solve_dense_pallas(cost: Array, interpret: bool | None = None) -> Array:
    """The whole batched JV solve as ONE Pallas kernel: cost block, state,
    and both while loops live in VMEM; nothing dispatches per trip. The
    lane-major transposes sit OUTSIDE the kernel (XLA fuses them)."""
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    W, r, c = cost.shape
    cost_t = jnp.transpose(cost.astype(jnp.float32), (1, 2, 0))  # (R, C, W)

    def kernel(cost_ref, out_ref):
        out_ref[...] = _solve_dense_t(cost_ref[...])

    out_t = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r, W), jnp.int32),
        interpret=interpret,
    )(cost_t)
    return jnp.transpose(out_t, (1, 0))


@functools.partial(jax.jit, static_argnames=())
def hungarian(cost: Array) -> Array:
    """Batched exact LSAP. cost: (..., R, C) with R <= C ->
    col4row: (..., R) int32. Each row is assigned exactly one column.

    Implementation (SVOL_LSAP_IMPL), all assignment-identical
    (scripts/bench_lsap.py measures; 512-wide 10x10 on v5e):

      * 'dense' (default): explicitly-batched one-hot formulation as plain
        XLA ops — **1.59 ms**, 6.7x faster than 'vmap': a trip is a few
        wide fused VPU ops instead of ~10 per-problem scatter/gather
        micro-ops whose dispatch overhead dominated.
      * 'vmap': scalar JV solver under vmap — 10.6 ms.
      * 'pallas': the dense formulation as ONE fused kernel (everything in
        VMEM, single dispatch). Correct in interpret mode and the fastest
        design on paper, but this jaxlib's Mosaic cannot lower it yet
        (while-carry layout unification demands replicated relayouts —
        "Not implemented: Sublane broadcast"); kept for newer toolchains.
    """
    import os

    batch_shape = cost.shape[:-2]
    r, c = cost.shape[-2:]
    flat = cost.reshape((-1, r, c))
    impl = os.environ.get("SVOL_LSAP_IMPL", "dense")
    if impl == "pallas":
        out = _solve_dense_pallas(flat)
    elif impl == "dense":
        out = _solve_dense(flat)
    else:
        out = jax.vmap(_solve_square)(flat)
    return out.reshape(batch_shape + (r,))


def hungarian_cost(cost: Array, assignment: Array) -> Array:
    """Total cost of an assignment: (..., n, n), (..., n) -> (...,)."""
    return jnp.take_along_axis(cost, assignment[..., None], axis=-1)[..., 0].sum(-1)


def hungarian_scipy_callback(cost: Array) -> Array:
    """Host fallback via jax.pure_callback + scipy, same interface as
    :func:`hungarian`. Used to cross-check the on-device solver and as an
    escape hatch (``LossConfig.hungarian_impl='callback'``).

    CPU/GPU-only: ``jax.pure_callback`` is unsupported on the axon TPU
    backend (CLAUDE.md) — nothing in a device path may call back to the
    host there. On that backend this is a cross-check tool for CPU runs,
    not a runtime fallback; the default on-device JV solver is the only
    TPU path."""
    from scipy.optimize import linear_sum_assignment

    def _host(c: np.ndarray) -> np.ndarray:
        flat = c.reshape((-1,) + c.shape[-2:])
        out = np.empty(flat.shape[:2], dtype=np.int32)
        for b in range(flat.shape[0]):
            rows, cols = linear_sum_assignment(flat[b])
            out[b, rows] = cols
        return out.reshape(c.shape[:-1])

    result_shape = jax.ShapeDtypeStruct(cost.shape[:-1], jnp.int32)
    return jax.pure_callback(_host, result_shape, cost, vmap_method="sequential")
