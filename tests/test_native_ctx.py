"""Native C++ context evaluator == jax level-path evaluation."""

import jax
import jax.numpy as jnp
import numpy as np

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.config import Config
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.entropy import gaussian
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.models.codec import (
    CodecWrapper, LiftingDWTCodec)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.state import (
    init_state)


def test_native_level_centers_match_jax():
    cfg = Config(netType="CDF97", entropy_layer="conditioned2ZTsepSubbands",
                 autoencoder="SubbandAutoEncoder", clrch=1, dwtlevels=2)
    model = CodecWrapper(cfg)
    state = init_state(cfg, model, jnp.zeros((1, 32, 32, 3)),
                       jax.random.PRNGKey(0))
    plane_params = jax.device_get(state.params["codecs_0"])

    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding.native_ctx import (
        LevelContextEvaluator)
    ev = LevelContextEvaluator(plane_params, level=0, so=3)

    rng = np.random.RandomState(0)
    n = 17
    patches = rng.randn(n, 5, 5, 3).astype(np.float32)
    plc = rng.randn(n, 3 * 81).astype(np.float32)
    idx_n, mu_n = ev(patches, plc)

    plane = LiftingDWTCodec(cfg)

    def fn(m, p, q):
        sigma, mu = m.entropymodel.level_center_params(0, p, q)
        return gaussian.build_indexes(sigma), mu

    idx_j, mu_j = plane.apply({"params": state.params["codecs_0"]},
                              jnp.asarray(patches), jnp.asarray(plc),
                              method=fn)
    np.testing.assert_allclose(mu_n, np.asarray(mu_j), atol=2e-4)
    # CDF indexes must match except at exact table boundaries (float fuzz)
    mismatch = (idx_n != np.asarray(idx_j)).mean()
    assert mismatch < 0.02, f"index mismatch rate {mismatch}"


def test_native_pixelcnn_centers_match_jax():
    """C++ dependency-cone PixelCNN == jax full-patch masked stack at the
    center, for both the xe (ic=1) and coarsest-details (ic=3) stacks."""
    cfg = Config(netType="CDF97", entropy_layer="conditioned2ZTsepSubbands",
                 autoencoder="SubbandAutoEncoder", clrch=1, dwtlevels=2)
    model = CodecWrapper(cfg)
    state = init_state(cfg, model, jnp.zeros((1, 32, 32, 3)),
                       jax.random.PRNGKey(0))
    plane_params = jax.device_get(state.params["codecs_0"])

    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding.native_ctx import (
        PixelCNNEvaluator)

    plane = LiftingDWTCodec(cfg)
    rng = np.random.RandomState(1)
    for which, ic, method in (("pixelcnn_xe", 1, "xe_center_params"),
                              ("pixelcnn_xo", 3, "coarsest_center_params")):
        ev = PixelCNNEvaluator(plane_params, which, ic)
        n = 13
        patches = rng.randn(n, 11, 11, ic).astype(np.float32)
        idx_n, mu_n = ev(patches)

        def fn(m, p, _method=method):
            sigma, mu = getattr(m.entropymodel, _method)(p)
            return gaussian.build_indexes(sigma), mu

        idx_j, mu_j = plane.apply({"params": state.params["codecs_0"]},
                                  jnp.asarray(patches), method=fn)
        np.testing.assert_allclose(mu_n, np.asarray(mu_j), atol=2e-4,
                                   err_msg=which)
        mismatch = (idx_n != np.asarray(idx_j)).mean()
        assert mismatch < 0.02, f"{which} index mismatch rate {mismatch}"
