"""Numerical cross-validation against the reference PyTorch implementation.

The reference at ``/root/reference`` is imported as a torch-cpu oracle (see
``oracle_ref.py``), initialized with random weights, and its ``state_dict``
is mapped onto our flax params by ``tools/weight_import.py``. Both sides then
run the SAME math on the SAME input and must agree to float32 tolerance:

- transform encode/decode (``lifting_dwt_nets.py:724-782``)
- factorized / onlyEZWT / ZTsepSubbands eval forwards
  (``LiftingBasedDWT_net.py:182-231, 759-840, 322-372``)

This is the strongest available fidelity evidence short of the (undistributed)
pretrained checkpoints: it proves the import mapping is CORRECT against real
torch tensor layouts (Conv2d, grouped ConvTranspose2d, GDN reparam, masked
convs, EntropyBottleneck internals), not merely total.

All tests use ``clrch=1`` — the reference's own paper configuration; its v4
lifting skip convs carry hardcoded ``(1,1,3,1)`` weights that only
type-check for 1-channel planes (``lifting_dwt_nets.py:784-827``).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from oracle_ref import load_reference, ref_config_from  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.config import (  # noqa: E402
    Config)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.models.codec import (  # noqa: E402
    CodecWrapper)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.tools import (  # noqa: E402
    weight_import)


def make_cfg(**kw):
    base = dict(
        exp_name="parity", netType="LiftingBasedNeuralWaveletv4",
        entropy_layer="factorized", autoencoder="SubbandAutoEncoder",
        clrch=1, dwtlevels=3, num_lifting_perlayer=2, filtersize=5,
        depth_scale=2, block_property="same", scale=1, linearity_flag=1,
        res_connection_weight=0.1, dtype="float32")
    base.update(kw)
    return Config(**base)


def to_nchw(x):
    return np.ascontiguousarray(np.transpose(np.asarray(x), (0, 3, 1, 2)))


def to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def build_pair(cfg, x_nhwc, seed=0):
    """(ref wrapper in eval mode, our variables with imported weights)."""
    M = load_reference()
    torch.manual_seed(seed)
    ref = M.LiftingBasedDWTNetWrapper(ref_config_from(cfg))
    ref.eval()

    model = CodecWrapper(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_nhwc), False)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, unmatched = weight_import.import_state_dict(
        cfg, variables["params"], sd)
    assert unmatched == [], f"unmapped reference keys: {unmatched[:8]}"
    return ref, model, {"params": params}


def rand_image(shape, seed=1):
    rng = np.random.RandomState(seed)
    return rng.uniform(-0.5, 0.5, size=shape).astype(np.float32)


def assert_close(ours_nhwc, ref_nchw, tol, what):
    a = np.asarray(ours_nhwc)
    b = to_nhwc(ref_nchw)
    err = float(np.max(np.abs(a - b)))
    assert err < tol, f"{what}: max abs err {err:.3e} >= {tol}"


# --------------------------------------------------------------------------


class TestLiftingTransformParity:
    def test_encode_outputs_match(self):
        cfg = make_cfg()
        x = rand_image((2, 32, 32, 3))
        ref, model, variables = build_pair(cfg, x)

        with torch.no_grad():
            ref_xe, ref_xo = ref.model0.autoencoder.encode(
                torch.from_numpy(to_nchw(x[..., :1])))
        xe, xo_list = model.apply(
            variables, jnp.asarray(x[..., :1]),
            method=lambda m, v: m.codecs[0].encode(v))
        assert_close(xe, ref_xe, 1e-4, "xe")
        for i in range(cfg.dwtlevels):
            assert_close(xo_list[i], ref_xo[i], 1e-4, f"xo[{i}]")

    def test_decode_matches(self):
        cfg = make_cfg()
        x = rand_image((1, 32, 32, 3))
        ref, model, variables = build_pair(cfg, x)

        with torch.no_grad():
            ref_xe, ref_xo = ref.model0.autoencoder.encode(
                torch.from_numpy(to_nchw(x[..., :1])))
            ref_xhat = ref.model0.autoencoder.decode(ref_xe, ref_xo)
        xhat = model.apply(
            variables, jnp.asarray(to_nhwc(ref_xe)),
            [jnp.asarray(to_nhwc(t)) for t in ref_xo],
            method=lambda m, xe, xo: m.codecs[0].decode(xe, xo))
        assert_close(xhat, ref_xhat, 1e-4, "xhat")

    def test_berk_ae_encode_matches(self):
        """GDN + ungrouped 3x3 ConvTranspose2d import (the spatial-flip
        path of ``_convT_w``)."""
        cfg = make_cfg(autoencoder="SubbandAutoEncoderBerk", dwtlevels=2)
        x = rand_image((1, 32, 32, 3))
        ref, model, variables = build_pair(cfg, x)

        with torch.no_grad():
            ref_xe, ref_xo = ref.model0.autoencoder.encode(
                torch.from_numpy(to_nchw(x[..., :1])))
            ref_xhat = ref.model0.autoencoder.decode(ref_xe, ref_xo)
        xe, xo_list = model.apply(
            variables, jnp.asarray(x[..., :1]),
            method=lambda m, v: m.codecs[0].encode(v))
        assert_close(xe, ref_xe, 1e-4, "berk xe")
        for i in range(cfg.dwtlevels):
            assert_close(xo_list[i], ref_xo[i], 1e-4, f"berk xo[{i}]")
        xhat = model.apply(
            variables, xe, xo_list,
            method=lambda m, xe, xo: m.codecs[0].decode(xe, xo))
        assert_close(xhat, ref_xhat, 1e-4, "berk xhat")


class TestEntropyModelParity:
    def _forward_pair(self, cfg, x, tol_info=2e-3):
        ref, model, variables = build_pair(cfg, x)
        with torch.no_grad():
            ref_xhat, ref_ixe, ref_ixo = ref(torch.from_numpy(to_nchw(x)))
        xhat, info_xe, info_xo, _aux = model.apply(
            variables, jnp.asarray(x), False)
        assert_close(info_xe, ref_ixe, tol_info, "info_xe")
        assert len(info_xo) == len(ref_ixo)
        for i, (a, b) in enumerate(zip(info_xo, ref_ixo)):
            assert_close(a, b, tol_info, f"info_xo[{i}]")
        assert_close(xhat, ref_xhat, 1e-3, "xhat")

    def test_factorized_forward(self):
        self._forward_pair(make_cfg(), rand_image((1, 32, 32, 3)))

    def test_onlyezwt_forward(self):
        self._forward_pair(make_cfg(entropy_layer="onlyEZWT"),
                           rand_image((1, 32, 32, 3), seed=2))

    def test_ztsep_forward(self):
        self._forward_pair(
            make_cfg(entropy_layer="conditioned2ZTsepSubbands"),
            rand_image((1, 32, 32, 3), seed=3))
