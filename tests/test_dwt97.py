"""CDF 9/7 DWT: perfect reconstruction + parity vs direct matrix analysis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.ops import dwt97


def test_perfect_reconstruction_multilevel():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
    for levels in (1, 2, 4):
        ll, highs = dwt97.dwt97_forward(x, levels)
        assert ll.shape == (2, 64 // 2 ** levels, 96 // 2 ** levels, 3)
        assert len(highs) == levels
        xr = dwt97.dwt97_inverse(ll, highs)
        np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-5)


def test_1d_lifting_matches_matrix_operator():
    """The JAX ladder must equal the independently-built analysis matrices."""
    n = 64
    L, H = dwt97.analysis_filters_ref()  # (n/2, n) numpy operators
    rng = np.random.RandomState(1)
    sig = rng.randn(n).astype(np.float64)
    x = jnp.asarray(sig.reshape(1, n, 1, 1))
    low, high = dwt97.lift97_1d(x, axis=1)
    np.testing.assert_allclose(np.asarray(low).ravel(), L @ sig, atol=1e-5)
    np.testing.assert_allclose(np.asarray(high).ravel(), H @ sig, atol=1e-5)


def test_analysis_operator_is_cdf97_filter_bank():
    """The matrix operator rows must be shifts of a single 9/7 filter pair."""
    L, H = dwt97.analysis_filters_ref()
    n = L.shape[1]
    # circular convolution structure: row i+1 is row i rolled by 2
    np.testing.assert_allclose(np.roll(L[0], 2), L[1], atol=1e-12)
    np.testing.assert_allclose(np.roll(H[0], 2), H[1], atol=1e-12)
    # the low filter must have 9 nonzero taps, the high filter 7
    assert (np.abs(L[0]) > 1e-12).sum() == 9
    assert (np.abs(H[0]) > 1e-12).sum() == 7
    # known bior4.4 tap ratios (independent of the gain convention):
    # center / first-neighbor of the analysis lowpass = 0.602949/0.266864
    taps = np.sort(np.abs(L[0][np.abs(L[0]) > 1e-12]))[::-1]
    np.testing.assert_allclose(taps[0] / taps[1], 0.6029490182363579 / 0.2668641184428723, rtol=1e-9)
    # DC gain of highpass must vanish; lowpass DC gain = K * nl = sqrt(2)
    # (K = 1.230174... is the 9/7 ladder's intrinsic DC gain; the iWave-style
    # nl = 1.149604 brings it to the orthonormal sqrt(2) convention)
    np.testing.assert_allclose(H[0].sum(), 0.0, atol=1e-12)
    np.testing.assert_allclose(L[0].sum(), np.sqrt(2.0), rtol=1e-6)


def test_energy_compaction_on_smooth_signal():
    """Details of a smooth image must be tiny relative to LL."""
    h = jnp.linspace(0, 1, 64)
    img = (h[None, :, None, None] + jnp.linspace(0, 1, 64)[None, None, :, None])
    ll, highs = dwt97.dwt97_forward(img, 2)
    detail_energy = sum(float(jnp.sum(xo ** 2)) for xo in highs)
    ll_energy = float(jnp.sum(ll ** 2))
    # periodic boundary creates an edge response; interior must be near zero
    interior = highs[0][:, 4:-4, 4:-4, :]
    assert float(jnp.max(jnp.abs(interior))) < 1e-4
    assert detail_energy < 0.05 * ll_energy


def test_odd_size_raises():
    x = jnp.zeros((1, 63, 64, 1))
    with pytest.raises(AssertionError):
        dwt97.dwt97_forward(x, 1)


def test_jit_and_grad():
    x = jnp.ones((1, 32, 32, 1))

    @jax.jit
    def roundtrip_loss(x):
        ll, highs = dwt97.dwt97_forward(x, 2)
        return jnp.sum(ll ** 2) + sum(jnp.sum(h ** 2) for h in highs)

    g = jax.grad(roundtrip_loss)(x)
    assert g.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(g)))
