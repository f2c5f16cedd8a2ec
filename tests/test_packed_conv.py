"""packed_conv3x3 (W-pair output packing) must reproduce the XLA conv
exactly — it issues the same 576 MACs per output element, just through a
75%-dense packed matmul (ops/pallas/packed_conv.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from svol_tpu.ops.pallas.packed_conv import (
    build_packed_kernel,
    pack_w_pairs,
    packed_conv3x3,
    packed_conv3x3_xla,
    unpack_w_pairs,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def xla_conv(x, w):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=dn,
    )


def test_pack_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 16)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(unpack_w_pairs(pack_w_pairs(x))),
                                  np.asarray(x))


@pytest.mark.parametrize("impl", [packed_conv3x3, packed_conv3x3_xla])
@pytest.mark.parametrize("shape", [
    (2, 8, 8, 16, 16),    # small square
    (1, 6, 12, 8, 24),    # rectangular, C != F
    (3, 14, 14, 32, 32),  # stage-2-ish
])
def test_packed_conv_matches_xla_f32(rng, shape, impl):
    N, H, W, C, F = shape
    x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, F)) * 0.1, jnp.float32)
    ref = xla_conv(x, w)
    out = impl(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_packed_conv_bf16(rng):
    N, H, W, C = 2, 8, 8, 16
    x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.bfloat16)
    ref = np.asarray(xla_conv(x, w), np.float32)
    out = np.asarray(packed_conv3x3(x, w), np.float32)
    denom = np.abs(ref).max()
    assert np.abs(out - ref).max() / denom < 0.03


def test_packed_kernel_density(rng):
    """Each output column must have exactly 3*3*C nonzero weight rows of
    the 12C stacked rows — the 75% density that motivates the packing."""
    C, F = 8, 8
    w = jnp.asarray(rng.standard_normal((3, 3, C, F)) + 10.0, jnp.float32)
    wk = np.asarray(build_packed_kernel(w))
    assert wk.shape == (12 * C, 2 * F)
    nonzero_per_col = (np.abs(wk) > 0).sum(axis=0)
    assert (nonzero_per_col == 9 * C).all()
