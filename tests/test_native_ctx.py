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
