"""On-device Hungarian vs scipy.optimize.linear_sum_assignment."""
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from svol_tpu.ops.hungarian import (
    hungarian,
    hungarian_cost,
    hungarian_scipy_callback,
    masked_cost_matrix,
)


def scipy_cost(c):
    r, col = linear_sum_assignment(c)
    return c[r, col].sum()


@pytest.mark.parametrize("n", [1, 2, 4, 10, 16])
def test_optimal_cost_matches_scipy(rng, n):
    for _ in range(20):
        c = rng.normal(size=(n, n)).astype(np.float32)
        assign = np.asarray(hungarian(c))
        # valid permutation
        assert sorted(assign.tolist()) == list(range(n))
        got = c[np.arange(n), assign].sum()
        np.testing.assert_allclose(got, scipy_cost(c), rtol=1e-5, atol=1e-5)


def test_batched(rng):
    c = rng.normal(size=(6, 7, 10, 10)).astype(np.float32)
    assign = np.asarray(hungarian(c))
    assert assign.shape == (6, 7, 10)
    total = np.asarray(hungarian_cost(c, assign))
    for i in range(6):
        for j in range(7):
            np.testing.assert_allclose(total[i, j], scipy_cost(c[i, j]), rtol=1e-5, atol=1e-5)


def test_unique_optimum_assignment_identical(rng):
    """With random continuous costs the optimum is a.s. unique, so the actual
    assignment (not just its cost) must equal scipy's."""
    for _ in range(10):
        c = rng.uniform(size=(10, 10)).astype(np.float32)
        assign = np.asarray(hungarian(c))
        _, scipy_col = linear_sum_assignment(c)
        np.testing.assert_array_equal(assign, scipy_col)


def test_rectangular_via_padding_matches_scipy(rng):
    """SVOL case: 10 queries vs n_t < 10 targets. Masked column padding must
    reproduce scipy's rectangular solution on the real columns
    (lib/modeling/matcher.py:93 semantics)."""
    n, k = 10, 4
    col_valid = np.arange(n) < k
    for _ in range(20):
        real = rng.uniform(size=(n, k)).astype(np.float32)
        full = np.zeros((n, n), np.float32)
        full[:, :k] = real
        padded = masked_cost_matrix(full, col_valid)
        assign = np.asarray(hungarian(padded))
        got_pairs = {(i, j) for i, j in enumerate(assign) if j < k}
        rows, cols = linear_sum_assignment(real)
        exp_pairs = set(zip(rows.tolist(), cols.tolist()))
        # cost equality always holds; pair equality holds when optimum unique
        got_cost = sum(real[i, j] for i, j in got_pairs)
        exp_cost = real[rows, cols].sum()
        np.testing.assert_allclose(got_cost, exp_cost, rtol=1e-5, atol=1e-5)
        assert got_pairs == exp_pairs


def test_callback_fallback_matches(rng):
    import jax

    if jax.default_backend() not in ("cpu",):
        pytest.skip("pure_callback unsupported on the axon TPU backend")
    c = rng.normal(size=(3, 8, 8)).astype(np.float32)
    a = np.asarray(hungarian(c))
    b = np.asarray(hungarian_scipy_callback(c))
    got = np.take_along_axis(c, a[..., None], -1).sum((-2, -1))
    exp = np.take_along_axis(c, b[..., None], -1).sum((-2, -1))
    np.testing.assert_allclose(got, exp, rtol=1e-5)
