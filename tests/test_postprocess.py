"""Post-processing nets: shape preservation + trainability of each variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.config import Config
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.models.postprocess import (
    make_postprocess, pixel_shuffle)


@pytest.mark.parametrize("kind", ["DnCNN", "iwave", "IRCNN", "DIDN",
                                  "DUDnCNN"])
def test_postprocess_shapes(kind):
    cfg = Config(postprocess=kind, clrch=3, resnetlevel=6)
    model = make_postprocess(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, True)
    y = model.apply(variables, x, False)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))
    # train mode with mutable BN stats must also run
    y2, _ = model.apply(variables, x, True, mutable=["batch_stats"])
    assert y2.shape == x.shape


def test_pixel_shuffle_matches_torch_convention():
    import torch
    x = np.random.RandomState(1).rand(1, 4, 3, 5).astype(np.float32)  # NCHW
    ref = torch.nn.functional.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    ours = np.asarray(pixel_shuffle(
        jnp.asarray(x.transpose(0, 2, 3, 1)), 2)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_train_postprocess_stage_runs():
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.loop import (
        LiftingDWTAgent)
    cfg = Config(netType="CDF97", entropy_layer="factorized", clrch=3,
                 dwtlevels=2, patch_size=32, batch_size=2, lambda_=100.0,
                 steps_per_epoch=2, max_epoch=1, postprocess="iwave",
                 mode="train_postprocess", resnetlevel=2)
    agent = LiftingDWTAgent(cfg)
    agent.run()
    assert hasattr(agent, "pp_variables")
