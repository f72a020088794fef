"""Pallas fused-halo 3x3 conv vs the XLA conv (values and gradients).

Runs the kernel in interpret mode on the CPU test mesh; the TPU lowering
is exercised by the driver bench and `scripts/bench_pallas_conv.py`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.ops import (
    pallas_conv)


@pytest.fixture(autouse=True)
def _interpret():
    old = pallas_conv._INTERPRET
    pallas_conv._INTERPRET = True
    yield
    pallas_conv._INTERPRET = old


def _xla_conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("shape,cout", [
    ((2, 16, 24, 32), 48),   # tile_h 16, one row tile
    ((1, 12, 8, 33), 32),    # tile_h 4, three row tiles, odd cin
    ((3, 2, 16, 64), 40),    # minimal height
])
def test_forward_matches_xla(shape, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, shape[-1], cout) * 0.1, jnp.float32)
    y = pallas_conv.conv3x3_halo(x, k, jnp.float32)
    np.testing.assert_allclose(y, _xla_conv(x, k), rtol=0, atol=2e-5)


def test_gradients_match_xla():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 16, 32), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 32, 36) * 0.1, jnp.float32)
    f = lambda x, k: (pallas_conv.conv3x3_halo(x, k, jnp.float32) ** 2).sum()
    g = lambda x, k: (_xla_conv(x, k) ** 2).sum()
    gx, gk = jax.grad(f, (0, 1))(x, k)
    hx, hk = jax.grad(g, (0, 1))(x, k)
    np.testing.assert_allclose(gx, hx, rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(gk, hk, rtol=2e-5, atol=2e-3)


def test_supported_gate():
    assert pallas_conv.supported((8, 256, 384, 96), 96, 192)
    assert not pallas_conv.supported((8, 256, 384, 3), 3, 96)   # narrow in
    assert not pallas_conv.supported((8, 256, 384, 96), 96, 3)  # narrow out
    assert not pallas_conv.supported((8, 256, 383, 96), 96, 96)  # ragged W
