"""Alternative transforms: quincunx lifting (incl. integer mode), basic
wavelet, attention wavelet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.config import Config
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.models.transforms import (
    make_transform)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.ops.quincunx import (
    quincunx_merge, quincunx_split)


def _roundtrip(model, x, **apply_kw):
    variables = model.init(jax.random.PRNGKey(0), x)
    xe, xo_list = model.apply(variables, x, method="encode", **apply_kw)
    xhat = model.apply(variables, xe, xo_list, method="decode", **apply_kw)
    return xe, xo_list, xhat


@pytest.mark.parametrize("mode", ["1p3", "2p2", "3p1", "hor", "ver"])
def test_quincunx_split_merge_inverse(mode):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    e, o = quincunx_split(x, mode)
    xr = quincunx_merge(e, o, mode)
    np.testing.assert_array_equal(np.asarray(xr), np.asarray(x))


@pytest.mark.parametrize("split_mode", ["hv", 1])
def test_quincunx_lifting_exact_inverse(split_mode):
    cfg = Config(netType="QuincunxLifting", autoencoder="none", clrch=1,
                 dwtlevels=2, num_lifting_perlayer=2, split_mode=split_mode,
                 lif_prec_bits=0)
    model = make_transform(cfg)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 16, 16, 1).astype(np.float32))
    xe, xo_list, xhat = _roundtrip(model, x)
    assert len(xo_list) == 2
    np.testing.assert_allclose(np.asarray(xhat), np.asarray(x), atol=1e-4)


def test_quincunx_integer_lifting_maps_grid_to_grid():
    """With lif_prec_bits=8 eval rounding, the transform round-trips
    bit-exactly on grid-valued inputs (integer-to-integer lifting)."""
    cfg = Config(netType="QuincunxLifting", autoencoder="none", clrch=1,
                 dwtlevels=1, num_lifting_perlayer=2, split_mode="hv",
                 lif_prec_bits=8)
    model = make_transform(cfg)
    rng = np.random.RandomState(2)
    x = jnp.asarray(
        (rng.randint(0, 256, (1, 8, 8, 1)) / 255.0).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    xe, xo_list = model.apply(variables, x, False, method="encode")
    xhat = model.apply(variables, xe, xo_list, False, method="decode")
    np.testing.assert_allclose(np.asarray(xhat), np.asarray(x), atol=1e-6)


@pytest.mark.parametrize("net", ["BasicWavelet", "AttentionWavelet",
                                 "AttentionWaveletPostProcessing"])
def test_alt_transform_shapes(net):
    cfg = Config(netType=net, autoencoder="SubbandAutoEncoder", clrch=3,
                 dwtlevels=2, linearity_flag=1)
    model = make_transform(cfg)
    x = jnp.asarray(np.random.RandomState(3).rand(1, 16, 16, 3),
                    jnp.float32)
    xe, xo_list, xhat = _roundtrip(model, x)
    assert xe.shape == (1, 4, 4, 3)
    assert xo_list[0].shape == (1, 8, 8, 9)
    assert xhat.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(xhat)))


def test_quincunx_codec_trains():
    """QuincunxLifting + factorized entropy end-to-end train step."""
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.models.codec import (
        CodecWrapper)
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.state import (
        init_state, make_optimizer, make_train_step)
    cfg = Config(netType="QuincunxLifting", entropy_layer="factorized",
                 autoencoder="none", clrch=3, dwtlevels=2, split_mode="hv",
                 num_lifting_perlayer=1, lambda_=100.0, lif_prec_bits=8)
    model = CodecWrapper(cfg)
    batch = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    state = init_state(cfg, model, batch, jax.random.PRNGKey(1))
    tx = make_optimizer(cfg)
    step = make_train_step(cfg, model, tx)
    state, out, _ = step(state, batch, jax.random.PRNGKey(2),
                         jnp.asarray(1e-4), jnp.asarray(1.0))
    assert np.isfinite(float(out.loss))
