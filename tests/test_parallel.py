"""Multi-chip paths on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_dp_step_matches_single_chip_loss():
    """DP-sharded batch must give the same loss as unsharded execution."""
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.config import Config
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.models.codec import (
        CodecWrapper)
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.parallel import (
        dp, mesh as mesh_lib)
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.state import (
        init_state, make_optimizer, make_train_step)

    cfg = Config(netType="CDF97", entropy_layer="factorized", clrch=3,
                 dwtlevels=2, lambda_=100.0, batch_size=8)
    model = CodecWrapper(cfg)
    rng = jax.random.PRNGKey(0)
    batch = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3))
    state = init_state(cfg, model, batch, rng)
    tx = make_optimizer(cfg)

    single = make_train_step(cfg, model, tx)
    _, out_single, _ = single(state, batch, jax.random.PRNGKey(2),
                              jnp.asarray(1e-4), jnp.asarray(1.0))

    mesh = mesh_lib.make_mesh(8)
    dp_step, shard_state = dp.make_dp_train_step(cfg, model, tx, mesh)
    sstate = shard_state(state)
    _, out_dp, _ = dp_step(sstate, batch, jax.random.PRNGKey(2),
                           jnp.asarray(1e-4), jnp.asarray(1.0))
    np.testing.assert_allclose(float(out_single.loss), float(out_dp.loss),
                               rtol=1e-5)
