"""Pallas fused 9/7 ladder == jnp ladder (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.ops import (
    dwt97, lifting_pallas)


def test_fused_ladder_matches_jnp():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 128, 2).astype(np.float32))
    for axis in (1, 2):
        low_ref, high_ref = dwt97.lift97_1d(x, axis=axis)
        low, high = lifting_pallas.lift97_1d_pallas(x, axis=axis,
                                                    interpret=True)
        np.testing.assert_allclose(np.asarray(low), np.asarray(low_ref),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(high), np.asarray(high_ref),
                                   atol=1e-5)


def test_fused_inverse_roundtrip():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 64, 128, 1).astype(np.float32))
    low, high = lifting_pallas.lift97_1d_pallas(x, axis=1, interpret=True)
    xr = lifting_pallas.ilift97_1d_pallas(low, high, axis=1, interpret=True)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-5)
