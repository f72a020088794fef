"""Tiled high-res encode + halo-exchange sharded lifting."""

import jax
import jax.numpy as jnp
import numpy as np

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.config import Config
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.models.codec import (
    CodecWrapper)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.ops import dwt97
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.parallel import (
    mesh as mesh_lib, tiling)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.state import (
    init_state)


def test_tile_untile_identity():
    rng = np.random.RandomState(0)
    x = rng.rand(1, 64, 16, 3).astype(np.float32)
    tiles, meta = tiling.tile_image(x, 4, overlap=8)
    assert tiles.shape == (4, 32, 16, 3)
    np.testing.assert_array_equal(tiling.untile_image(tiles, meta), x)


def test_halo_lift_matches_single_chip_ladder():
    """H-sharded shard_map ladder == the single-chip periodic ladder."""
    mesh = mesh_lib.make_mesh(8)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 64, 8, 2).astype(np.float32))
    low_ref, high_ref = dwt97.lift97_1d(x, axis=1)
    low_sh, high_sh = tiling.halo_lift97_rows(x, mesh)
    np.testing.assert_allclose(np.asarray(low_sh), np.asarray(low_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(high_sh), np.asarray(high_ref),
                               atol=1e-5)


def test_tiled_forward_matches_untiled_interior():
    """Tiled surrogate codec == untiled codec away from tile seams
    (CDF97 + factorized: receptive field bounded by the margin)."""
    cfg = Config(netType="CDF97", entropy_layer="factorized",
                 autoencoder="SubbandAutoEncoder", clrch=3, dwtlevels=2,
                 filtersize=5, lambda_=100.0)
    model = CodecWrapper(cfg)
    state = init_state(cfg, model, jnp.zeros((1, 32, 32, 3)),
                       jax.random.PRNGKey(0))
    rng = np.random.RandomState(2)
    x = rng.rand(1, 256, 64, 3).astype(np.float32)

    mesh = mesh_lib.make_mesh(4)
    tiled = tiling.tiled_forward(cfg, model, state.params, x, mesh)
    assert tiled.shape == x.shape

    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.state import (
        apply_color_forward)

    @jax.jit
    def full(params, batch):
        _, xhat, _, _, _ = apply_color_forward(cfg, model, params, batch,
                                               False, None)
        return jnp.clip(xhat, -0.5, 0.5) + 0.5

    ref = np.asarray(full(state.params, jnp.asarray(x)))
    # Through the quantizer, isolated rounding flips are expected (tiny
    # float differences from different tile shapes flip round() decisions),
    # so compare distributions: overwhelming pixel agreement + close MSE.
    close = np.isclose(tiled, ref, atol=2e-3).mean()
    assert close > 0.95, f"only {close:.2%} of pixels match"
    mse_t = np.mean((tiled - x) ** 2)
    mse_r = np.mean((ref - x) ** 2)
    assert mse_t < mse_r * 1.3 + 1e-6

    # pre-quantization analysis subbands must match EXACTLY in interiors
    o = tiling.reconstruction_margin(cfg)
    tiles, meta = tiling.tile_image(x, 4, o)

    @jax.jit
    def analyze(params, batch):
        fn = lambda m, v: m.codec.transform.encode(v)  # noqa: E731
        return model.apply({"params": params}, batch - 0.5, method=fn)

    xe_full, xo_full = analyze(state.params, jnp.asarray(x))
    xe_t, xo_t = analyze(state.params, jnp.asarray(tiles))
    lvl = 0  # finest detail level, stride 2
    stride = 2
    o_l = o // stride
    th_l = meta.tile_h // stride
    for t in range(4):
        interior = np.asarray(xo_t[lvl][t, o_l + 4: o_l + th_l - 4])
        ref_rows = np.asarray(
            xo_full[lvl][0, t * th_l + 4: (t + 1) * th_l - 4])
        np.testing.assert_allclose(interior, ref_rows, atol=1e-4)


def test_halo_dwt97_2d_matches_single_chip():
    """Full multi-level H-sharded transform == ops.dwt97 exactly, plus
    exact inverse through the sharded synthesis."""
    mesh = mesh_lib.make_mesh(8)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 128, 32, 3).astype(np.float32))
    levels = 3

    ll_ref, highs_ref = dwt97.dwt97_forward(x, levels)
    ll_sh, highs_sh = tiling.halo_dwt97_2d(x, mesh, levels)
    np.testing.assert_allclose(np.asarray(ll_sh), np.asarray(ll_ref),
                               atol=1e-4)
    for a, b in zip(highs_sh, highs_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    back = tiling.halo_idwt97_2d(ll_sh, highs_sh, mesh)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_tiled_bitstream_roundtrip_2k():
    """2048x2048 image encodes/decodes bit-exactly through per-tile
    streams (BASELINE config 4 / VERDICT item 7)."""
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding.tiled_coder import (
        TiledCodecCoder)

    cfg = Config(netType="CDF97", entropy_layer="factorized",
                 autoencoder="SubbandAutoEncoder", clrch=3, dwtlevels=3,
                 filtersize=5, lambda_=100.0)
    model = CodecWrapper(cfg)
    state = init_state(cfg, model, jnp.zeros((1, 32, 32, 3)),
                       jax.random.PRNGKey(0))
    rng = np.random.RandomState(4)
    # smooth-ish content so symbol magnitudes stay realistic
    base = rng.rand(1, 64, 64, 3).astype(np.float32)
    x = np.asarray(jax.image.resize(jnp.asarray(base), (1, 2048, 2048, 3),
                                    "linear"), np.float32)

    tc = TiledCodecCoder(cfg, model, state.params, n_tiles=8)
    ts, enc_xhat = tc.compress(x)
    assert len(ts.tiles) == 8
    dec_xhat = tc.decompress(ts)
    np.testing.assert_array_equal(dec_xhat, enc_xhat)  # bit-exact

    res = tc.compress_decompress(x)
    assert res.xhat.shape == x.shape
    assert res.bpp > 0 and np.isfinite(res.psnr)


def test_halo_eval_step_matches_single_device():
    """make_halo_eval_step (exact sharded CDF97 surrogate eval) returns the
    same RD metrics as the unsharded eval step, for both color policies."""
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.state import (
        make_eval_step)

    for clrch in (3, 1):
        cfg = Config(netType="CDF97", entropy_layer="factorized",
                     autoencoder="SubbandAutoEncoder", clrch=clrch,
                     dwtlevels=2, filtersize=5, lambda_=100.0)
        model = CodecWrapper(cfg)
        state = init_state(cfg, model, jnp.zeros((1, 32, 32, 3)),
                           jax.random.PRNGKey(0))
        rng = np.random.RandomState(5)
        x = rng.rand(1, 64, 32, 3).astype(np.float32)  # 64 % (8*2^2) == 0

        mesh = mesh_lib.make_mesh(8)
        halo_step = tiling.make_halo_eval_step(cfg, model, mesh)
        ref_step = make_eval_step(cfg, model)

        got = halo_step(state.params, x)
        want = ref_step(state.params, jnp.asarray(x))
        np.testing.assert_allclose(float(got.mse), float(want.mse),
                                   rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(float(got.rate1), float(want.rate1),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(got.rate2), float(want.rate2),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(got.loss), float(want.loss),
                                   rtol=1e-4)


def test_halo_eval_step_rejects_bad_height():
    import pytest as _pytest

    cfg = Config(netType="CDF97", entropy_layer="factorized",
                 autoencoder="SubbandAutoEncoder", clrch=3, dwtlevels=2,
                 filtersize=5)
    model = CodecWrapper(cfg)
    state = init_state(cfg, model, jnp.zeros((1, 32, 32, 3)),
                       jax.random.PRNGKey(0))
    mesh = mesh_lib.make_mesh(8)
    step = tiling.make_halo_eval_step(cfg, model, mesh)
    with _pytest.raises(ValueError, match="divide"):
        step(state.params, np.zeros((1, 48, 32, 3), np.float32))


def _lift_cfg(clrch, filtersize=3):
    return Config(netType="LiftingBasedNeuralWaveletv4",
                  entropy_layer="factorized",
                  autoencoder="SubbandAutoEncoder", clrch=clrch,
                  dwtlevels=2, num_lifting_perlayer=1,
                  filtersize=filtersize, depth_scale=1,
                  block_property="same", scale=1, linearity_flag=1,
                  res_connection_weight=0.1, dtype="float32",
                  lambda_=100.0)


def test_halo_lift2d_matches_unsharded_transform():
    """Sharded learned-lifting analysis == the unsharded ladder (<=1e-5),
    and the sharded inverse reconstructs the input exactly (VERDICT r3
    item 5: halo-exchange for the paper's main transform,
    reference wavelet_forward_v2.py:58-81)."""
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.models.transforms import (
        make_transform)
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.ops.lifting import (
        lift_level_forward)

    cfg = _lift_cfg(clrch=3)
    model = CodecWrapper(cfg)
    state = init_state(cfg, model, jnp.zeros((1, 32, 32, 3)),
                       jax.random.PRNGKey(0))
    tparams = state.params["codec"]["transform"]
    transform = make_transform(cfg)
    rng = np.random.RandomState(6)
    # filtersize 3 -> halo R = 5; local split rows at level 2 =
    # 192/(8*4) = 6 >= 5
    x = jnp.asarray(rng.rand(1, 192, 32, 3).astype(np.float32) - 0.5)

    def raw_fwd(mdl, xb):
        ll, highs = xb, []
        for lvl in range(cfg.dwtlevels):
            ll, lh, hl, hh = lift_level_forward(mdl._stage(lvl), ll)
            highs.append(dwt97.pack_details(lh, hl, hh))
        return (ll, *highs)

    want = transform.apply({"params": tparams}, x, method=raw_fwd)

    mesh = mesh_lib.make_mesh(8)
    ll, highs = tiling.halo_lift2d_forward(cfg, transform, [tparams], x,
                                           mesh)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(want[0]),
                               atol=1e-5)
    for lv in range(cfg.dwtlevels):
        np.testing.assert_allclose(np.asarray(highs[lv]),
                                   np.asarray(want[1 + lv]), atol=1e-5)

    # sharded inverse of the sharded forward == identity
    xr = tiling.halo_lift2d_inverse(cfg, transform, [tparams], ll, highs,
                                    mesh)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-5)


def test_halo_eval_step_learned_lifting_matches_single_device():
    """make_halo_eval_step with the learned lifting transform returns the
    same RD metrics as the unsharded eval step, for both color policies."""
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.state import (
        make_eval_step)

    for clrch in (3, 1):
        cfg = _lift_cfg(clrch)
        model = CodecWrapper(cfg)
        state = init_state(cfg, model, jnp.zeros((1, 32, 32, 3)),
                           jax.random.PRNGKey(0))
        rng = np.random.RandomState(7)
        x = rng.rand(1, 192, 32, 3).astype(np.float32)

        mesh = mesh_lib.make_mesh(8)
        halo_step = tiling.make_halo_eval_step(cfg, model, mesh)
        ref_step = make_eval_step(cfg, model)

        got = halo_step(state.params, x)
        want = ref_step(state.params, jnp.asarray(x))
        np.testing.assert_allclose(float(got.mse), float(want.mse),
                                   rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(float(got.rate1), float(want.rate1),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(got.rate2), float(want.rate2),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(got.loss), float(want.loss),
                                   rtol=1e-4)
