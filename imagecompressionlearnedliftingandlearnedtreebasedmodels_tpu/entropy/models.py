"""Subband entropy models over the wavelet pyramid (reference layer L5b).

Four config-selectable models (reference ``LiftingBasedDWT_net.py:122-134``),
all exposing the training-path contract::

    model(xe, xo_list, training) ->
        (info_xe, info_xo_list, xe_qnt, xo_list_qnt)

where ``info_*`` are per-sample self-informations in bits (the reference's
``-log2(pmf)``), and ``*_qnt`` are the noise/round-quantized subbands fed to
the synthesis transform.

- ``FactorizedEntropy``: one learned-CDF bottleneck per level + one for LL
  (reference ``DWTFactorizedEntropyLayer``, ``LiftingBasedDWT_net.py:182-231``).
- ``OnlyEZWT``: parent->child ("zerotree") conditional Gaussians, no spatial
  AR => fully parallel decode (reference ``onlyEZWT``, ``:759-840``).
- ``ZTSepSubbands``: zerotree + causal spatial context via masked convs —
  the paper's main model (reference ``DWTConditioned2EntropyLayerZTsepSubbands``,
  ``:233-556``).
- ``ZTBlock``: 4-phase polyphase-coset conditioning => decode is 4 batched
  steps per subband (reference ``DWTConditioned2EntropyLayerZTBlock``,
  ``:558-757``).

TPU notes: every context net evaluates over the whole subband in one fused
conv pass (the reference's per-pixel ``compress_ar`` loop never exists on the
training path here); parent context upsampling is a reshape-broadcast, not a
gather.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import Config, compute_dtype
from ..ops.masked_conv import MaskedConv2d
from ..ops.math_utils import quantize_dequantize, quantize_noise
from . import gaussian
from .bottleneck import EntropyBottleneck


def upsample2(x):
    """Nearest x2 upsample (reference ``repeat_interleave(2,2/3)``,
    ``LiftingBasedDWT_net.py:348``) as reshape-broadcast."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def _split_sigma_mu(params):
    """Interleaved (sigma, mu) channel pairs -> (sigma, mu)
    (reference ``out[:, 0::2]``/``[:, 1::2]``, ``LiftingBasedDWT_net.py:332-333``)."""
    return params[..., 0::2], params[..., 1::2]


def _quantize_ctx(x, training: bool, rng):
    """Context quantization: noise in training, plain rounding in eval
    (reference ``quantize(x, "noise"/"dequantize")`` with no means)."""
    return quantize_noise(x, rng) if training else quantize_dequantize(x)


class _ConvStack(nn.Module):
    """Conv -> LReLU -> ... -> Conv, SAME padding (fp32 output)."""

    features: Sequence[int]
    kernels: Sequence[int]
    groups: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        from ..ops.fast_conv import FastConv3x3, FastGroupedConv1x1
        for i, (f, k) in enumerate(zip(self.features, self.kernels)):
            if self.dtype is not None and k == 3 and self.groups == 1:
                # MXU-oriented path for the FLOP-heavy dense 3x3 convs;
                # named Conv_{i} so the param tree matches nn.Conv exactly
                x = FastConv3x3(f, dtype=self.dtype, name=f"Conv_{i}")(x)
            elif self.dtype is not None and k == 1 and self.groups > 1:
                # grouped 1x1 chains (the ZTsep cgp fusion): batched-matmul
                # lowering on large planes, lax on coding-path patch evals
                x = FastGroupedConv1x1(f, groups=self.groups,
                                       dtype=self.dtype,
                                       name=f"Conv_{i}")(x)
            else:
                x = nn.Conv(f, (k, k), padding="SAME", dtype=self.dtype,
                            feature_group_count=self.groups,
                            name=f"Conv_{i}")(x)
            if i < len(self.features) - 1:
                x = nn.leaky_relu(x)
        return x.astype(jnp.float32)


class _MaskedPixelCNN(nn.Module):
    """5-layer grouped masked-conv stack A,B,B,B,B -> (sigma, mu) pairs
    (reference ``LiftingBasedDWT_net.py:298-317``)."""

    in_ch: int
    kernel: int = 3
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        ic = self.in_ch
        wide = ic * 81
        feats = [wide, wide, wide // 3, wide // 9, 2 * ic]
        for i, f in enumerate(feats):
            mask = "A" if i == 0 else "B"
            x = MaskedConv2d(f, (self.kernel, self.kernel), mask_type=mask,
                             feature_group_count=ic, dtype=self.dtype)(x)
            if i < len(feats) - 1:
                x = nn.leaky_relu(x)
        return x.astype(jnp.float32)


class FactorizedEntropy(nn.Module):
    """Per-level factorized bottlenecks (DWTFactorizedEntropyLayer)."""

    cfg: Config

    def setup(self):
        c = self.cfg.clrch
        self.eb_xo = [EntropyBottleneck(3 * c)
                      for _ in range(self.cfg.dwtlevels)]
        self.eb_xe = EntropyBottleneck(1 * c)

    def __call__(self, xe, xo_list, training: bool = True):
        info_xo, xo_qnt = [], []
        for i in range(self.cfg.dwtlevels):
            q, lik = self.eb_xo[i](xo_list[i], training)
            xo_qnt.append(q)
            info_xo.append(-jnp.log2(lik))
        xe_qnt, lik_xe = self.eb_xe(xe, training)
        return -jnp.log2(lik_xe), info_xo, xe_qnt, xo_qnt

    def aux_loss(self):
        return self.eb_xe.aux_loss() + sum(m.aux_loss() for m in self.eb_xo)


class OnlyEZWT(nn.Module):
    """Zerotree-only conditioning (onlyEZWT): LL + coarsest details are
    factorized; finer details get (mu, sigma) from the upsampled parent.

    ``cfg.zt_upsample = "learned"`` swaps the nearest-neighbor parent
    upsampling for the learned ``ZeroTreePreviousLayer`` (the reference's
    ``graphs/layers/upscaling.py``, which its live models never enable);
    deterministic, so coding round trips stay bit-exact."""

    cfg: Config

    def setup(self):
        c = self.cfg.clrch
        L = self.cfg.dwtlevels
        self.eb_xe = EntropyBottleneck(1 * c)
        self.eb_xo = EntropyBottleneck(3 * c)
        wide = 3 * c * 81
        self.plc = [
            _ConvStack(features=(wide, wide, 2 * 3 * c), kernels=(3, 3, 1))
            for _ in range(L - 1)]
        if getattr(self.cfg, "zt_upsample", "nearest") == "learned":
            from ..ops.upscaling import ZeroTreePreviousLayer
            self.ups = [ZeroTreePreviousLayer(3 * c, 3 * c)
                        for _ in range(L - 1)]

    def _up(self, i: int, parent_q):
        """Parent->child context upsampling feeding ``self.plc[i]``."""
        if getattr(self.cfg, "zt_upsample", "nearest") == "learned":
            return self.ups[i](parent_q)
        return upsample2(parent_q)

    def __call__(self, xe, xo_list, training: bool = True):
        L = self.cfg.dwtlevels
        xe_qnt, lik_xe = self.eb_xe(xe, training)
        info_xe = -jnp.log2(lik_xe)
        info_xo: List = [None] * L
        xo_qnt: List = [None] * L
        q, lik = self.eb_xo(xo_list[L - 1], training)
        xo_qnt[L - 1], info_xo[L - 1] = q, -jnp.log2(lik)
        con = self._up(L - 2, q)
        for i in range(L - 2, -1, -1):
            sigma, mu = _split_sigma_mu(self.plc[i](con))
            rng = self.make_rng("noise") if training else None
            q, info = gaussian.self_information_bits(
                xo_list[i], sigma, mu, training, rng)
            xo_qnt[i], info_xo[i] = q, info
            if i > 0:
                con = self._up(i - 1, q)
        return info_xe, info_xo, xe_qnt, xo_qnt

    def level_params_from_parent(self, i: int, parent_hat):
        """(sigma, mu) for finer level i from the decoded parent details —
        the coding path's whole-tensor parameter pass (no AR)."""
        return _split_sigma_mu(self.plc[i](self._up(i, parent_hat)))

    def encode_chain(self, xo_list, con):
        """All finer levels' (symbols, CDF indexes, decoded planes) in ONE
        trace. The encoder's level chain is fully device-resident — each
        level's decode-consistent writeback ``round(x - mu) + mu`` feeds the
        next level's parent context in-graph, so the whole plane encode
        costs one dispatch instead of one per level (each host<->device
        round trip is ~25-40 ms on tunneled backends). ``con`` is the
        decoded coarsest-details plane."""
        L = self.cfg.dwtlevels
        syms: List = [None] * (L - 1)
        idxs: List = [None] * (L - 1)
        hats: List = [None] * (L - 1)
        for i in range(L - 2, -1, -1):
            sigma, mu = self.level_params_from_parent(i, con)
            sym = jnp.round(xo_list[i] - mu).astype(jnp.int32)
            hat = sym.astype(jnp.float32) + mu
            syms[i], idxs[i] = sym, gaussian.build_indexes(sigma)
            hats[i] = hat
            con = hat
        return syms, idxs, hats

    def aux_loss(self):
        return self.eb_xe.aux_loss() + self.eb_xo.aux_loss()


class ZTSepSubbands(nn.Module):
    """Zerotree + causal spatial context (the paper's main model).

    Per finer level: parent-context CNN (plc) on the x2-upsampled quantized
    parent details, 5x5 masked type-A grouped conv (csc) on the current
    quantized details, fused by a grouped 1x1 stack (cgp) into interleaved
    (sigma, mu). Coarsest details + LL use grouped masked-conv PixelCNNs.
    """

    cfg: Config

    def setup(self):
        c = self.cfg.clrch
        L = self.cfg.dwtlevels
        dt = compute_dtype(self.cfg)
        so = 3 * c
        wide = so * 81
        self.plc = [
            _ConvStack(features=(wide, wide), kernels=(3, 3), dtype=dt)
            for _ in range(L - 1)]
        self.csc = [
            MaskedConv2d(wide, (5, 5), mask_type="A", feature_group_count=so,
                         dtype=dt)
            for _ in range(L - 1)]
        fused = 2 * wide
        self.cgp = [
            _ConvStack(features=(fused, fused // 3, fused // 9, 2 * so),
                       kernels=(1, 1, 1, 1), groups=so, dtype=dt)
            for _ in range(L - 1)]
        self.pixelcnn_xo = _MaskedPixelCNN(in_ch=so, kernel=3, dtype=dt)
        self.pixelcnn_xe = _MaskedPixelCNN(in_ch=c, kernel=3, dtype=dt)

    def _fuse(self, plc_params, csc_params):
        """Interleave per-subband 81-channel blocks: (plc_g, csc_g) pairs so
        group g of the cgp stack sees only subband g's context
        (reference ``LiftingBasedDWT_net.py:357-359``)."""
        so = 3 * self.cfg.clrch
        b, h, w, _ = plc_params.shape
        p = plc_params.reshape(b, h, w, so, 81)
        s = csc_params.reshape(b, h, w, so, 81)
        return jnp.concatenate([p, s], axis=-1).reshape(b, h, w, so * 162)

    def level_params(self, i: int, xo_qnt_i, con):
        """(sigma, mu) for finer level i given quantized current + parent
        context. Exposed for the coding path (teacher-forced encode)."""
        csc_params = self.csc[i](xo_qnt_i)
        plc_params = self.plc[i](con)
        return _split_sigma_mu(self.cgp[i](self._fuse(plc_params, csc_params)))

    def coarsest_params(self, xo_qnt):
        return _split_sigma_mu(self.pixelcnn_xo(xo_qnt))

    def xe_params(self, xe_qnt):
        return _split_sigma_mu(self.pixelcnn_xe(xe_qnt))

    # --- coding-path helpers (wavefront decode) -----------------------
    # The wavefront decoder evaluates context parameters only at the pixels
    # of the current anti-diagonal: single-conv contexts via 5x5 patches,
    # 5-layer PixelCNNs via 11x11 patches (exact-center receptive field).

    def plc_params_from_parent(self, i: int, parent_hat):
        """Whole-plane parent context for finer level i — computed once per
        level (the parent is fully decoded before the level starts)."""
        return self.plc[i](upsample2(parent_hat))

    def level_center_params(self, i: int, patches, plc_center):
        """(sigma, mu) at patch centers for finer level i.

        ``patches``: (n, 5, 5, 3c) causal-context windows from the decoded
        plane; ``plc_center``: (n, 3c*81) parent context at those pixels.
        The SAME-padded masked conv's center output on a 5x5 patch equals
        the full-plane value (full window coverage).
        """
        cs = self.csc[i](patches)[:, 2:3, 2:3, :]
        plc = plc_center[:, None, None, :]
        fused = self._fuse(plc, cs)
        p = self.cgp[i](fused)[:, 0, 0, :]
        return p[..., 0::2], p[..., 1::2]

    def coarsest_center_params(self, patches):
        """(sigma, mu) at centers of 11x11 patches through the 5-layer
        coarse-detail PixelCNN (receptive-field radius 5 => exact)."""
        p = self.pixelcnn_xo(patches)[:, 5, 5, :]
        return p[..., 0::2], p[..., 1::2]

    def xe_center_params(self, patches):
        p = self.pixelcnn_xe(patches)[:, 5, 5, :]
        return p[..., 0::2], p[..., 1::2]

    def __call__(self, xe, xo_list, training: bool = True):
        L = self.cfg.dwtlevels

        def rng():
            return self.make_rng("noise") if training else None

        # LL: causal PixelCNN over its own quantized plane
        xe_qnt = _quantize_ctx(xe, training, rng())
        sigma, mu = self.xe_params(xe_qnt)
        _, info_xe = gaussian.self_information_bits(
            xe, sigma, mu, training, rng())

        info_xo: List = [None] * L
        xo_qnt: List = [None] * L
        # coarsest details: own-plane PixelCNN
        q = _quantize_ctx(xo_list[L - 1], training, rng())
        sigma, mu = self.coarsest_params(q)
        _, info = gaussian.self_information_bits(
            xo_list[L - 1], sigma, mu, training, rng())
        xo_qnt[L - 1], info_xo[L - 1] = q, info
        con = upsample2(q)
        # finer levels: parent + causal context
        for i in range(L - 2, -1, -1):
            q = _quantize_ctx(xo_list[i], training, rng())
            sigma, mu = self.level_params(i, q, con)
            _, info = gaussian.self_information_bits(
                xo_list[i], sigma, mu, training, rng())
            xo_qnt[i], info_xo[i] = q, info
            con = upsample2(q)
        return info_xe, info_xo, xe_qnt, xo_qnt

    def aux_loss(self):
        return jnp.zeros(())


class _DepNet(nn.Module):
    """Coset predictor: 3x3,3x3,1x1,1x1 convs (hid 32) -> 1 channel
    (reference ``LiftingBasedDWT_net.py:618-680``)."""

    hidden: int = 32

    @nn.compact
    def __call__(self, x):
        for k, f in ((3, self.hidden), (3, self.hidden), (1, self.hidden),
                     (1, self.hidden)):
            x = nn.leaky_relu(nn.Conv(f, (k, k), padding="SAME")(x))
        return nn.Conv(1, (1, 1))(x)


def _interleave_cosets(ee, eo, oe, oo):
    """Assemble full-res plane from its 4 polyphase cosets (reshape only)."""
    b, h2, w2, c = ee.shape
    top = jnp.stack([ee, eo], axis=3).reshape(b, h2, w2 * 2, c)
    bot = jnp.stack([oe, oo], axis=3).reshape(b, h2, w2 * 2, c)
    return jnp.stack([top, bot], axis=2).reshape(b, h2 * 2, w2 * 2, c)


class ZTBlock(nn.Module):
    """Polyphase-coset zerotree model: each subband's 4 cosets are coded in
    sequence, each conditioned on the parent subband + earlier cosets =>
    decode is 4 batched conv evaluations per subband instead of H*W steps.

    Compile-cost note (measured, 1-core XLA-CPU, dwtlevels=4): the training
    forward traces (L-1)*3*clrch channels x 4 cosets x 2 dep-nets — 360
    tiny convs at clrch=1 (lower 7s / compile 23s) and 1080 at clrch=3
    (lower 18s / compile 62s). Cost scales ~linearly in clrch (the graph is
    wide, not deep), so joint-RGB ZTBlock is a one-minute one-off compile,
    not a blow-up; ``tests/test_entropy.py::test_ztblock_clrch3_lowers``
    keeps a lid on it."""

    cfg: Config

    def setup(self):
        c = self.cfg.clrch
        L = self.cfg.dwtlevels
        self.eb_xe = EntropyBottleneck(1 * c)
        self.eb_xo = EntropyBottleneck(3 * c)
        n = (L - 1) * 3 * c
        self.dep_mu = [[_DepNet() for _ in range(4)] for _ in range(n)]
        self.dep_sigma = [[_DepNet() for _ in range(4)] for _ in range(n)]

    def channel_params(self, idx: int, q_ch, parent_ch):
        """(sigma, mu) planes for one subband channel from its parent channel
        and its own already-coded cosets."""
        ee = q_ch[:, 0::2, 0::2, :]
        eo = q_ch[:, 0::2, 1::2, :]
        oe = q_ch[:, 1::2, 0::2, :]
        deps = [parent_ch,
                jnp.concatenate([parent_ch, ee], -1),
                jnp.concatenate([parent_ch, ee, eo], -1),
                jnp.concatenate([parent_ch, ee, eo, oe], -1)]
        mu = _interleave_cosets(*[self.dep_mu[idx][k](deps[k])
                                  for k in range(4)])
        sigma = _interleave_cosets(*[self.dep_sigma[idx][k](deps[k])
                                     for k in range(4)])
        return sigma, mu

    def level_coset_params(self, step: int, k: int, parents, *prev_cosets):
        """(sigma, mu) for coset k of ALL subband channels of finer-level
        ``step`` in one pass — the coding path's unit of device dispatch.

        ``parents``: the decoded parent level (B, h2, w2, 3c);
        ``prev_cosets``: the k already-decoded cosets, same shape. Each
        channel has its own dep nets (reference per-(level, subband)
        modules, ``LiftingBasedDWT_net.py:618-680``); the trace loops over
        them so XLA compiles one program per coset, turning 3c round
        trips into one on tunneled/remote accelerators."""
        c3 = 3 * self.cfg.clrch
        sigmas, mus = [], []
        for j in range(c3):
            dep = jnp.concatenate(
                [parents[..., j:j + 1]]
                + [p[..., j:j + 1] for p in prev_cosets], axis=-1)
            idx = step * c3 + j
            sigmas.append(self.dep_sigma[idx][k](dep))
            mus.append(self.dep_mu[idx][k](dep))
        return jnp.concatenate(sigmas, -1), jnp.concatenate(mus, -1)

    def encode_chain(self, xo_list, con):
        """(symbols, CDF indexes, decoded planes) for every finer level and
        coset in ONE trace — the ZTBlock encoder's 4(L-1) per-coset
        dispatches collapse to one (decode stays sequential: each coset's
        symbols come from the host rANS stream). ``con`` is the decoded
        coarsest-details plane. Returns (syms, idxs, hats) with syms/idxs
        nested [level-step][coset], hats per level index."""
        L = self.cfg.dwtlevels
        all_syms: List = []
        all_idxs: List = []
        hats: List = [None] * (L - 1)
        for step, lvl in enumerate(range(L - 2, -1, -1)):
            x = xo_list[lvl]
            x_cosets = (x[:, 0::2, 0::2], x[:, 0::2, 1::2],
                        x[:, 1::2, 0::2], x[:, 1::2, 1::2])
            cosets, lsyms, lidxs = [], [], []
            for k in range(4):
                sigma, mu = self.level_coset_params(step, k, con, *cosets)
                sym = jnp.round(x_cosets[k] - mu).astype(jnp.int32)
                hat = sym.astype(jnp.float32) + mu
                cosets.append(hat)
                lsyms.append(sym)
                lidxs.append(gaussian.build_indexes(sigma))
            con = _interleave_cosets(*cosets)
            hats[lvl] = con
            all_syms.append(lsyms)
            all_idxs.append(lidxs)
        return all_syms, all_idxs, hats

    def __call__(self, xe, xo_list, training: bool = True):
        cfg = self.cfg
        L, c = cfg.dwtlevels, cfg.clrch

        def rng():
            return self.make_rng("noise") if training else None

        xe_qnt, lik_xe = self.eb_xe(xe, training)
        info_xe = -jnp.log2(lik_xe)
        info_xo: List = [None] * L
        xo_qnt: List = [None] * L
        q, lik = self.eb_xo(xo_list[L - 1], training)
        xo_qnt[L - 1], info_xo[L - 1] = q, -jnp.log2(lik)
        con = q  # parent stays at its own resolution (cosets match its shape)
        for step, lvl in enumerate(range(L - 2, -1, -1)):
            infos, qs = [], []
            for j in range(3 * c):
                x_ch = xo_list[lvl][..., j:j + 1]
                q_ch = _quantize_ctx(x_ch, training, rng())
                sigma, mu = self.channel_params(
                    step * 3 * c + j, q_ch, con[..., j:j + 1])
                _, info = gaussian.self_information_bits(
                    x_ch, sigma, mu, training, rng())
                infos.append(info)
                qs.append(q_ch)
            info_xo[lvl] = jnp.concatenate(infos, axis=-1)
            xo_qnt[lvl] = jnp.concatenate(qs, axis=-1)
            con = xo_qnt[lvl]
        return info_xe, info_xo, xe_qnt, xo_qnt

    def aux_loss(self):
        return self.eb_xe.aux_loss() + self.eb_xo.aux_loss()


def make_entropy_model(cfg: Config) -> nn.Module:
    """Entropy-model dispatch (reference ``LiftingBasedDWT_net.py:122-134``)."""
    if cfg.entropy_layer == "factorized":
        return FactorizedEntropy(cfg)
    if cfg.entropy_layer == "onlyEZWT":
        return OnlyEZWT(cfg)
    if cfg.entropy_layer == "conditioned2ZTsepSubbands":
        return ZTSepSubbands(cfg)
    if cfg.entropy_layer == "DWTConditioned2EntropyLayerZTBlock":
        return ZTBlock(cfg)
    raise ValueError(f"unknown entropy_layer {cfg.entropy_layer!r}")
