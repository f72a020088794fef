"""Real bitstream paths: bit-exact subband round trips per entropy model
(the reference's implicit invertibility check — encode+decode feeding the
synthesis transform, SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.config import Config
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding.codec_coder import (
    CodecCoder)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.models.codec import (
    CodecWrapper)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.data import (
    synthetic_images)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.state import (
    init_state)


def _setup(entropy_layer, clrch=3, dwtlevels=2, size=32,
           netType="CDF97", autoencoder="SubbandAutoEncoder", **kw):
    cfg = Config(netType=netType, entropy_layer=entropy_layer,
                 autoencoder=autoencoder, clrch=clrch,
                 dwtlevels=dwtlevels, lambda_=100.0, **kw)
    model = CodecWrapper(cfg)
    state = init_state(cfg, model, jnp.zeros((1, size, size, 3)),
                       jax.random.PRNGKey(0))
    coder = CodecCoder(cfg, model, state.params)
    img = synthetic_images(1, size, seed=3)[0][None].astype(np.float32) / 255.0
    return cfg, coder, img


def _roundtrip_subbands(cfg, coder, img):
    """Compress each plane and assert decode returns bit-identical
    dequantized subbands."""
    if cfg.clrch == 3:
        planes = [img - 0.5]
    else:
        from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.ops import color
        y = np.asarray(color.shift_ycbcr(color.rgb_to_ycbcr(jnp.asarray(img))))
        planes = [y[..., i:i + 1] for i in range(3)]
    for p, plane_img in enumerate(planes):
        streams, _, xe_hat, xo_hats = coder.compress_plane(p, plane_img)
        el = cfg.entropy_layer
        if el == "factorized":
            xe_dec, xo_dec = coder._decompress_factorized(
                p, streams, xe_hat.shape, [t.shape for t in xo_hats])
        elif el == "onlyEZWT":
            xe_dec, xo_dec = coder._decompress_ezwt(
                p, streams, xe_hat.shape, [t.shape for t in xo_hats])
        elif el == "DWTConditioned2EntropyLayerZTBlock":
            xe_dec, xo_dec = coder._decompress_ztblock(
                p, streams, xe_hat.shape, [t.shape for t in xo_hats])
        else:
            from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding.wavefront import (
                decompress_ztsep)
            xe_dec, xo_dec = decompress_ztsep(
                coder, p, streams, xe_hat.shape, [t.shape for t in xo_hats])
        np.testing.assert_array_equal(np.asarray(xe_dec), np.asarray(xe_hat))
        for i in range(cfg.dwtlevels):
            np.testing.assert_array_equal(
                np.asarray(xo_dec[i]), np.asarray(xo_hats[i]))


@pytest.mark.parametrize("layer", [
    "factorized", "onlyEZWT", "DWTConditioned2EntropyLayerZTBlock"])
def test_subband_roundtrip_bit_exact(layer):
    cfg, coder, img = _setup(layer)
    _roundtrip_subbands(cfg, coder, img)


def test_subband_roundtrip_ztsep_wavefront():
    cfg, coder, img = _setup("conditioned2ZTsepSubbands", size=16)
    _roundtrip_subbands(cfg, coder, img)


@pytest.mark.parametrize("layer", ["factorized", "onlyEZWT"])
def test_full_compress_decompress(layer):
    cfg, coder, img = _setup(layer)
    res = coder.compress_decompress(img)
    assert res.xhat.shape == img.shape
    assert res.bpp > 0
    assert np.isfinite(res.psnr)
    # untrained nets: just demand a sane reconstruction range
    assert res.xhat.min() >= 0.0 and res.xhat.max() <= 1.0


def test_full_compress_decompress_ycbcr_ztsep():
    cfg, coder, img = _setup("conditioned2ZTsepSubbands", clrch=1, size=16)
    res = coder.compress_decompress(img)
    assert res.bpp > 0 and np.isfinite(res.psnr)


def test_onlyezwt_learned_upsampler_roundtrip():
    """zt_upsample="learned" (ZeroTreePreviousLayer parent context) must
    still round-trip bit-exactly — the upsampler is deterministic and runs
    identically on encode and decode."""
    cfg, coder, img = _setup("onlyEZWT", dwtlevels=3, zt_upsample="learned")
    em = coder.params["codec"]["entropymodel"]
    assert "ups_0" in em and "ups_1" in em  # learned path actually active
    _roundtrip_subbands(cfg, coder, img)


def test_compress_decompress_many_matches_sequential():
    """The image-pipelined batch harness produces byte-identical streams
    and identical reconstructions to one-at-a-time coding."""
    cfg, coder, img = _setup("onlyEZWT")
    img2 = synthetic_images(1, 32, seed=4)[0][None].astype(np.float32) / 255.0
    img3 = synthetic_images(1, 32, seed=5)[0][None].astype(np.float32) / 255.0
    images = [img, img2, img3]
    seq = [coder.compress_decompress(im) for im in images]
    many = coder.compress_decompress_many(images, workers=2)
    for a, b in zip(seq, many):
        np.testing.assert_array_equal(a.xhat, b.xhat)
        assert a.bpp == b.bpp
        assert [s.xe for s in a.streams] == [s.xe for s in b.streams]
        assert [s.xo for s in a.streams] == [s.xo for s in b.streams]


def test_quincunx_integer_lifting_bitstream_roundtrip():
    """VERDICT r3 item 7 (test half): the quincunx transform with integer
    lifting (``lif_prec_bits>0`` eval-time rounding to the
    ``255 * 2^(bits-8)`` grid, reference ``lifting_nets.py:196-203``) must
    survive the REAL coding path — bit-exact subband recovery and a
    decoder reconstruction identical to the encoder-side one."""
    cfg, coder, img = _setup("factorized", netType="QuincunxLifting",
                             autoencoder="none", split_mode="hv",
                             lif_prec_bits=8)
    _roundtrip_subbands(cfg, coder, img)
    # full path twice: the decode must be deterministic byte-for-byte
    r1 = coder.compress_decompress(img)
    r2 = coder.compress_decompress(img)
    np.testing.assert_array_equal(r1.xhat, r2.xhat)
    assert [s.xe for s in r1.streams] == [s.xe for s in r2.streams]
    assert r1.bpp > 0 and np.isfinite(r1.psnr)
