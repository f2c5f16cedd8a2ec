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

        def dij_cond(carry):
            _, _, _, _, _, _, sink = carry
            return sink < 0

        def dij_body(carry):
            i, min_val, shortest, path, visited_col, visited_row, sink = carry
            visited_row = visited_row.at[i].set(True)
            reduced = min_val + cost[i] - u[i] - v  # (n,)
            better = (reduced < shortest) & ~visited_col
            shortest = jnp.where(better, reduced, shortest)
            path = jnp.where(better, i, path)

            masked = jnp.where(visited_col, _BIG, shortest)
            j = jnp.argmin(masked).astype(jnp.int32)
            min_val = masked[j]
            visited_col = visited_col.at[j].set(True)

            unassigned = row4col[j] < 0
            sink = jnp.where(unassigned, j, sink)
            i = jnp.where(unassigned, i, row4col[j])
            return i, min_val, shortest, path, visited_col, visited_row, sink

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
            jax.lax.while_loop(dij_cond, dij_body, init)
        )

        # Dual updates (scipy rectangular_lsap.cpp dual-update step).
        u = u.at[cur_row].add(min_val)
        idx = jnp.arange(n_rows)
        other_rows = visited_row & (idx != cur_row)
        # visited rows (except cur_row) are assigned, so col4row is valid there
        u = jnp.where(other_rows, u + (min_val - shortest[col4row]), u)
        v = jnp.where(visited_col, v - (min_val - shortest), v)

        # Augment along the alternating path back to cur_row.
        def aug_cond(carry):
            _, _, _, done = carry
            return ~done

        def aug_body(carry):
            j, row4col, col4row, _ = carry
            i = path[j]
            row4col = row4col.at[j].set(i)
            nxt = col4row[i]
            col4row = col4row.at[i].set(j)
            return nxt, row4col, col4row, i == cur_row

        _, row4col, col4row, _ = jax.lax.while_loop(
            aug_cond, aug_body, (sink, row4col, col4row, False)
        )
        return u, v, row4col, col4row

    u = jnp.zeros((n_rows,), dtype)
    v = jnp.zeros((n,), dtype)
    row4col = jnp.full((n,), -1, jnp.int32)
    col4row = jnp.full((n_rows,), -1, jnp.int32)
    _, _, _, col4row = jax.lax.fori_loop(0, n_rows, outer, (u, v, row4col, col4row))
    return col4row


@functools.partial(jax.jit, static_argnames=())
def hungarian(cost: Array) -> Array:
    """Batched exact LSAP. cost: (..., R, C) with R <= C ->
    col4row: (..., R) int32. Each row is assigned exactly one column."""
    batch_shape = cost.shape[:-2]
    r, c = cost.shape[-2:]
    flat = cost.reshape((-1, r, c))
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
