"""Learned lifting transform: exact invertibility + 9/7 init behavior."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.config import Config
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.models.transforms import (
    CDF97Transform, LearnedLiftingTransform, make_transform)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.ops import dwt97


def _cfg(**kw):
    base = dict(netType="LiftingBasedNeuralWaveletv4", autoencoder="none",
                clrch=1, dwtlevels=3, depth_scale=2, filtersize=5,
                num_lifting_perlayer=2, block_property="same", scale=0,
                linearity_flag=1, res_connection_weight=0.1)
    base.update(kw)
    return Config(**base)


def _roundtrip(model, x, seed=0):
    variables = model.init(jax.random.PRNGKey(seed), x)
    xe, xo_list = model.apply(variables, x, method="encode")
    xhat = model.apply(variables, xe, xo_list, method="decode")
    return xe, xo_list, xhat


def test_learned_lifting_exact_inverse():
    """Random P/U weights: decode(encode(x)) must equal x exactly (no AE)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 48, 1).astype(np.float32))
    model = LearnedLiftingTransform(_cfg())
    xe, xo_list, xhat = _roundtrip(x=x, model=model)
    assert xe.shape == (2, 4, 6, 1)
    assert [t.shape for t in xo_list] == [
        (2, 16, 24, 3), (2, 8, 12, 3), (2, 4, 6, 3)]
    np.testing.assert_allclose(np.asarray(xhat), np.asarray(x), atol=2e-4)


def test_learned_lifting_exact_inverse_rgb_and_perlevel():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 16, 16, 3).astype(np.float32))
    model = LearnedLiftingTransform(
        _cfg(clrch=3, dwtlevels=2, block_property="different", scale=1))
    _, _, xhat = _roundtrip(x=x, model=model)
    np.testing.assert_allclose(np.asarray(xhat), np.asarray(x), atol=2e-4)


def test_cdf97_transform_roundtrip_with_ae_is_lossless_without_ae():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 32, 32, 1).astype(np.float32))
    model = CDF97Transform(_cfg(netType="CDF97"))
    _, _, xhat = _roundtrip(x=x, model=model)
    np.testing.assert_allclose(np.asarray(xhat), np.asarray(x), atol=1e-5)


def test_subband_ae_roundtrip_is_learned_not_exact():
    """With a scaling AE, the round trip is approximate (learned) — just
    check shapes and finiteness."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 32, 32, 1).astype(np.float32))
    model = make_transform(_cfg(autoencoder="SubbandAutoEncoderBerk"))
    xe, xo_list, xhat = _roundtrip(x=x, model=model)
    assert xhat.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(xhat)))


def test_zero_pu_blocks_reduce_to_cdf97_ladder():
    """If P/U residual CNN outputs are zeroed, the learned transform's
    subbands must match the fixed 9/7 ladder up to boundary handling
    (zero-pad vs periodic) and the gain convention (no NH/NL when scale=0)."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 64, 64, 1).astype(np.float32))
    model = LearnedLiftingTransform(_cfg(dwtlevels=1))
    variables = model.init(jax.random.PRNGKey(0), x)

    # zero every P/U conv kernel and bias -> only the fixed skip convs act
    def zero_pu(path, leaf):
        path_str = "/".join(str(p.key) for p in path)
        if "p_blocks" in path_str or "u_blocks" in path_str:
            return jnp.zeros_like(leaf)
        return leaf

    zeroed = jax.tree_util.tree_map_with_path(zero_pu, variables)
    xe, xo_list = model.apply(zeroed, x, method="encode")

    ll_ref, highs_ref = dwt97.dwt97_forward(x, 1)
    # compare interior (away from the differing boundary extension); undo the
    # NL/NH gains the fixed ladder applies but the learned one (scale=0) skips
    interior = (slice(None), slice(4, -4), slice(4, -4), slice(None))
    np.testing.assert_allclose(
        np.asarray(xe[interior]) * dwt97.NL * dwt97.NL,
        np.asarray(ll_ref[interior]), atol=1e-4)
    lh, hl, hh = dwt97.unpack_details(xo_list[0])
    lh_r, hl_r, hh_r = dwt97.unpack_details(highs_ref[0])
    # lh/hl/hh each picked up one NL and one NH (or two NH) gain factors
    np.testing.assert_allclose(
        np.asarray(hh[interior]) * dwt97.NH * dwt97.NH,
        np.asarray(hh_r[interior]), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(lh[interior]) * dwt97.NH * dwt97.NL,
        np.asarray(lh_r[interior]), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(hl[interior]) * dwt97.NL * dwt97.NH,
        np.asarray(hl_r[interior]), atol=1e-4)


def test_bf16_lifting_still_exactly_invertible():
    """bf16 P/U conv compute must not break algebraic inversion: the inverse
    subtracts the SAME deterministic values the forward added."""
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 16, 16, 1).astype(np.float32))
    model = LearnedLiftingTransform(_cfg(dwtlevels=2, dtype="bfloat16"))
    _, _, xhat = _roundtrip(x=x, model=model)
    np.testing.assert_allclose(np.asarray(xhat), np.asarray(x), atol=2e-4)
