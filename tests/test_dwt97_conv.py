"""Direct-convolution CDF97 formulation == lifting ladder; upscaler shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.ops import (
    dwt97, dwt97_conv)


def test_conv_formulation_matches_lifting():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 32, 32, 2).astype(np.float32))
    ll_a, lh_a, hl_a, hh_a = dwt97.dwt97_level(x)
    ll_b, lh_b, hl_b, hh_b = dwt97_conv.dwt97_conv_level(x)
    for a, b in ((ll_a, ll_b), (lh_a, lh_b), (hl_a, hl_b), (hh_a, hh_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_filter_taps():
    h_low, h_high, _, _ = dwt97_conv.cdf97_filters()
    assert h_low.shape[0] == 9 and h_high.shape[0] == 7
    np.testing.assert_allclose(float(jnp.sum(h_low)), np.sqrt(2), rtol=1e-6)
    np.testing.assert_allclose(float(jnp.sum(h_high)), 0.0, atol=1e-6)


def test_upscaling_modules():
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.ops.upscaling import (
        Upscale, ZeroTreePreviousLayer)
    x = jnp.zeros((1, 8, 8, 3))
    m = Upscale(3)
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (1, 16, 16, 3)
    zt = ZeroTreePreviousLayer(16, 6)
    v = zt.init(jax.random.PRNGKey(0), x)
    assert zt.apply(v, x).shape == (1, 16, 16, 6)
