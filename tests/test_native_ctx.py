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


def test_native_pixelcnn_walk_matches_jax_whole_plane():
    """The C++ incremental wavefront walk reproduces the jax whole-plane
    masked stack at EVERY pixel (validating both the per-layer causal
    scheduling and the numerics), for the xe (ic=1) and coarsest-details
    (ic=3) stacks."""
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding.native_ctx import (
        PixelCNNWalker)
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding.wavefront import (
        diagonal_order)

    cfg = Config(netType="CDF97", entropy_layer="conditioned2ZTsepSubbands",
                 autoencoder="SubbandAutoEncoder", clrch=1, dwtlevels=2)
    model = CodecWrapper(cfg)
    state = init_state(cfg, model, jnp.zeros((1, 32, 32, 3)),
                       jax.random.PRNGKey(0))
    plane_params = jax.device_get(state.params["codecs_0"])

    plane = LiftingDWTCodec(cfg)
    rng = np.random.RandomState(1)
    h, w, pad = 13, 11, 5
    for which, ic, method in (("pixelcnn_xe", 1, "xe_params"),
                              ("pixelcnn_xo", 3, "coarsest_params")):
        ev = PixelCNNWalker(plane_params, which, ic)
        q = np.round(rng.randn(1, h, w, ic) * 3).astype(np.float32)

        def fn(m, p, _method=method):
            sigma, mu = getattr(m.entropymodel, _method)(p)
            return gaussian.build_indexes(sigma), mu

        idx_j, mu_j = plane.apply({"params": state.params["codecs_0"]},
                                  jnp.asarray(q), method=fn)
        idx_j = np.asarray(idx_j)[0]
        mu_j = np.asarray(mu_j)[0]

        walk = ev.begin(h, w)
        padded = np.zeros((1, h + 2 * pad, w + 2 * pad, ic), np.float32)
        idx_n = np.zeros((h, w, ic), np.int32)
        mu_n = np.zeros((h, w, ic), np.float32)
        for coords in diagonal_order(h, w, a=2):
            # params first (they may only use strictly-past pixels), then
            # reveal the diagonal's true values — as the real walk does
            idx_d, mu_d = walk.step(padded, pad, coords)
            rr, cc = coords[:, 0], coords[:, 1]
            idx_n[rr, cc] = idx_d
            mu_n[rr, cc] = mu_d
            padded[0, rr + pad, cc + pad, :] = q[0, rr, cc, :]

        np.testing.assert_allclose(mu_n, mu_j, atol=2e-4, err_msg=which)
        mismatch = (idx_n != idx_j).mean()
        assert mismatch < 0.02, f"{which} index mismatch rate {mismatch}"


def test_native_level_walk_matches_per_diagonal_reference():
    """The fully-native level walk (one C++ call per plane: diagonal loop,
    eval, rANS, writeback) bit-exactly reproduces a Python-orchestrated
    walk that uses the per-diagonal C++ evaluator — symbols, indexes and
    decoded plane — and the stream round-trips through the inline rANS
    decoder."""
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding.native_ctx import (
        LevelContextEvaluator)
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding.wavefront import (
        diagonal_order)
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding import rans
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding.codec_coder import (
        _gc_tables)

    cfg = Config(netType="CDF97", entropy_layer="conditioned2ZTsepSubbands",
                 autoencoder="SubbandAutoEncoder", clrch=1, dwtlevels=2)
    model = CodecWrapper(cfg)
    state = init_state(cfg, model, jnp.zeros((1, 32, 32, 3)),
                       jax.random.PRNGKey(0))
    plane_params = jax.device_get(state.params["codecs_0"])
    ev = LevelContextEvaluator(plane_params, level=0, so=3)
    cdfs, lengths, offsets = _gc_tables()

    rng = np.random.RandomState(3)
    h, w, so, pad = 11, 14, 3, 2
    x_true = np.round(rng.randn(h, w, so) * 3).astype(np.float32)
    plc = rng.randn(h, w, so * 81).astype(np.float32)

    # reference: Python diagonal loop over the per-diagonal evaluator
    padded_ref = np.zeros((h + 4, w + 4, so), np.float32)
    syms_ref, idxs_ref = [], []
    for coords in diagonal_order(h, w, a=3):
        rr, cc = coords[:, 0], coords[:, 1]
        n = len(rr)
        patches = np.zeros((n, 5, 5, so), np.float32)
        for p in range(n):
            patches[p] = padded_ref[rr[p]:rr[p] + 5, cc[p]:cc[p] + 5]
        idx, mu = ev(patches, plc[rr, cc])
        sym = np.round(x_true[rr, cc] - mu).astype(np.int32)
        padded_ref[rr + pad, cc + pad] = sym.astype(np.float32) + mu
        syms_ref.append(sym.ravel())
        idxs_ref.append(idx.ravel())
    syms_ref = np.concatenate(syms_ref)
    idxs_ref = np.concatenate(idxs_ref)

    # native full walk, encode mode. The walk and the per-diagonal entry
    # point are two -ffast-math instantiations of the same templated
    # eval, so mu can differ in the last ulp — compare with tolerance
    # (production safety needs only walk==walk, asserted below).
    padded = np.zeros((1, h + 4, w + 4, so), np.float32)
    syms, idxs = ev.walk(padded, plc, x_true, cdfs, lengths, offsets)
    assert (syms == syms_ref).mean() > 0.99
    assert (idxs == idxs_ref).mean() > 0.99
    np.testing.assert_allclose(padded[0], padded_ref, atol=1e-4)

    # round trip: flush through the buffered encoder, decode via the walk
    stream = rans.encode_with_indexes(syms, idxs, cdfs, lengths, offsets)
    padded_dec = np.zeros((1, h + 4, w + 4, so), np.float32)
    ev.walk(padded_dec, plc, None, cdfs, lengths, offsets, stream=stream)
    np.testing.assert_array_equal(padded_dec, padded)


def test_native_plc_plane_matches_jax():
    """The host C++ whole-plane parent-context pass (upsample2 + conv3x3
    LReLU + conv3x3) reproduces the jax ``plc_params_from_parent``."""
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding.native_ctx import (
        PLCPlaneEvaluator)

    cfg = Config(netType="CDF97", entropy_layer="conditioned2ZTsepSubbands",
                 autoencoder="SubbandAutoEncoder", clrch=1, dwtlevels=2)
    model = CodecWrapper(cfg)
    state = init_state(cfg, model, jnp.zeros((1, 32, 32, 3)),
                       jax.random.PRNGKey(0))
    plane_params = jax.device_get(state.params["codecs_0"])
    ev = PLCPlaneEvaluator(plane_params, level=0, so=3)

    rng = np.random.RandomState(2)
    # non-multiple-of-32 width exercises the junk-tail-column re-zeroing
    parent = np.round(rng.randn(1, 6, 9, 3) * 3).astype(np.float32)
    out_n = ev(parent)

    plane = LiftingDWTCodec(cfg)

    def fn(m, p):
        return m.entropymodel.plc_params_from_parent(0, p)

    out_j = np.asarray(plane.apply({"params": state.params["codecs_0"]},
                                   jnp.asarray(parent), method=fn))
    assert out_n.shape == out_j.shape == (1, 12, 18, 3 * 81)
    np.testing.assert_allclose(out_n, out_j, atol=5e-4)


def test_ctx_fingerprint_stable_and_checked():
    """ctx_fingerprint is deterministic within a build, and decode refuses
    a stream whose recorded fingerprint differs."""
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding import native_ctx
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding.wavefront import (
        compress_ztsep, decompress_ztsep)
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding.codec_coder import (
        CodecCoder)
    import pytest

    fp1 = native_ctx.ctx_fingerprint()
    native_ctx._ctx_fp_cache = None
    assert native_ctx.ctx_fingerprint() == fp1

    cfg = Config(netType="CDF97", entropy_layer="conditioned2ZTsepSubbands",
                 autoencoder="SubbandAutoEncoder", clrch=3, dwtlevels=2,
                 lambda_=100.0)
    model = CodecWrapper(cfg)
    state = init_state(cfg, model, jnp.zeros((1, 16, 16, 3)),
                       jax.random.PRNGKey(0))
    coder = CodecCoder(cfg, model, state.params)
    rng = np.random.RandomState(5)
    img = rng.rand(1, 16, 16, 3).astype(np.float32) - 0.5
    streams, _, xe_hat, xo_hats = coder.compress_plane(0, img)
    assert streams.meta.get("ctx_fp") == fp1
    assert streams.meta.get("plc_backend_l0") == "native"

    # round trip works with the matching build...
    xe_dec, xo_dec = decompress_ztsep(
        coder, 0, streams, xe_hat.shape, [t.shape for t in xo_hats])
    np.testing.assert_array_equal(np.asarray(xe_dec), np.asarray(xe_hat))
    # ...and is refused with a tampered fingerprint
    streams.meta["ctx_fp"] = "0" * 16
    with pytest.raises(RuntimeError, match="fingerprint"):
        decompress_ztsep(coder, 0, streams, xe_hat.shape,
                         [t.shape for t in xo_hats])


def test_native_pixelcnn_walk_full_plane_bit_exact():
    """The fully-native PixelCNN plane walk (one C++ call: diagonal loop,
    eval, rANS, writeback) is bit-identical to the Python-orchestrated
    step walk — symbols, indexes and decoded plane — and the stream
    round-trips through the inline rANS decoder, for the xe (ic=1) and
    coarsest-details (ic=3) stacks."""
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding.native_ctx import (
        PixelCNNWalker)
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding.wavefront import (
        diagonal_order)
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding import rans
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding.codec_coder import (
        _gc_tables)

    cfg = Config(netType="CDF97", entropy_layer="conditioned2ZTsepSubbands",
                 autoencoder="SubbandAutoEncoder", clrch=1, dwtlevels=2)
    model = CodecWrapper(cfg)
    state = init_state(cfg, model, jnp.zeros((1, 32, 32, 3)),
                       jax.random.PRNGKey(0))
    plane_params = jax.device_get(state.params["codecs_0"])
    cdfs, lengths, offsets = _gc_tables()

    rng = np.random.RandomState(7)
    h, w, pad = 13, 17, 5
    for which, ic in (("pixelcnn_xe", 1), ("pixelcnn_xo", 3)):
        ev = PixelCNNWalker(plane_params, which, ic)
        x_true = np.round(rng.randn(1, h, w, ic) * 3).astype(np.float32)

        # reference: Python step loop (shares the C++ evaluator)
        walk = ev.begin(h, w)
        padded_ref = np.zeros((1, h + 2 * pad, w + 2 * pad, ic), np.float32)
        syms_ref, idxs_ref = [], []
        for coords in diagonal_order(h, w, a=2):
            idx, mu = walk.step(padded_ref, pad, coords)
            rr, cc = coords[:, 0], coords[:, 1]
            sym = np.round(x_true[0, rr, cc] - mu).astype(np.int32)
            padded_ref[0, rr + pad, cc + pad] = sym.astype(np.float32) + mu
            syms_ref.append(sym.ravel())
            idxs_ref.append(idx.ravel())

        padded = np.zeros_like(padded_ref)
        syms, idxs = ev.walk(padded, pad, x_true, cdfs, lengths, offsets)
        np.testing.assert_array_equal(syms, np.concatenate(syms_ref),
                                      err_msg=which)
        np.testing.assert_array_equal(idxs, np.concatenate(idxs_ref),
                                      err_msg=which)
        np.testing.assert_array_equal(padded, padded_ref, err_msg=which)

        stream = rans.encode_with_indexes(syms, idxs, cdfs, lengths, offsets)
        padded_dec = np.zeros_like(padded)
        ev.walk(padded_dec, pad, None, cdfs, lengths, offsets, stream=stream)
        np.testing.assert_array_equal(padded_dec, padded, err_msg=which)


def test_native_plc_plane_geometry_switch_deterministic():
    """The plc pass's persistent scratch reuse must not leak state across
    geometry switches (same input -> same output before/after evaluating a
    different-size plane)."""
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding.native_ctx import (
        PLCPlaneEvaluator)

    cfg = Config(netType="CDF97", entropy_layer="conditioned2ZTsepSubbands",
                 autoencoder="SubbandAutoEncoder", clrch=1, dwtlevels=2)
    model = CodecWrapper(cfg)
    state = init_state(cfg, model, jnp.zeros((1, 32, 32, 3)),
                       jax.random.PRNGKey(0))
    plane_params = jax.device_get(state.params["codecs_0"])
    ev = PLCPlaneEvaluator(plane_params, level=0, so=3)

    rng = np.random.RandomState(3)
    big = np.round(rng.randn(1, 8, 11, 3) * 3).astype(np.float32)
    small = np.round(rng.randn(1, 3, 5, 3) * 3).astype(np.float32)
    out1 = ev(big)
    ev(small)
    out2 = ev(big)
    np.testing.assert_array_equal(out1, out2)
