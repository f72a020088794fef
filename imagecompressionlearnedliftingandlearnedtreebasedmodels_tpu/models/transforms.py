"""Analysis/synthesis transforms (reference layer L5a).

Each transform exposes ``encode(x) -> (xe, xo_list)`` and
``decode(xe, xo_list) -> xhat`` over NHWC arrays, where ``xe`` is the coarsest
LL subband after the scaling AE and ``xo_list[i]`` is the level-i detail pack
``(B, H/2^{i+1}, W/2^{i+1}, C*3)``, finest first — the same contract as the
reference's ``autoencoder.encode/decode``
(``graphs/layers/lifting_dwt_nets.py:724-782``).
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import Config, compute_dtype
from ..ops import dwt97
from ..ops.gdn import GDN
from ..ops.lifting import LiftStage, lift_level_forward, lift_level_inverse
from ..ops.subband_ae import make_subband_ae


class CDF97Transform(nn.Module):
    """Fixed 9/7 DWT + per-subband scaling AEs.

    Reference ``DWTPytorchWaveletsLayer`` (``lifting_dwt_nets.py:212-277``)
    rebuilt on the vectorized lifting ladder of :mod:`..ops.dwt97` instead of
    ``pytorch_wavelets`` filter banks.
    """

    cfg: Config

    def setup(self):
        c = self.cfg.clrch
        dt = compute_dtype(self.cfg)
        self.yl_ae = make_subband_ae(self.cfg.autoencoder, 1 * c, dt)
        self.yh_ae = [make_subband_ae(self.cfg.autoencoder, 3 * c, dt)
                      for _ in range(self.cfg.dwtlevels)]

    def encode(self, x):
        ll, highs = dwt97.dwt97_forward(x, self.cfg.dwtlevels)
        xe = self.yl_ae.encode(ll)
        xo_list = [self.yh_ae[i].encode(highs[i])
                   for i in range(self.cfg.dwtlevels)]
        return xe, xo_list

    def decode(self, xe, xo_list):
        ll = self.yl_ae.decode(xe)
        highs = [self.yh_ae[i].decode(xo_list[i])
                 for i in range(self.cfg.dwtlevels)]
        return dwt97.dwt97_inverse(ll, highs)

    def __call__(self, x):  # init path
        xe, xo_list = self.encode(x)
        return self.decode(xe, xo_list)


class LearnedLiftingTransform(nn.Module):
    """Learned nonlinear lifting DWT + per-subband scaling AEs.

    Reference ``LiftingBasedNeuralWaveletv4`` (``lifting_dwt_nets.py:646-827``).
    ``block_property == 'same'`` shares one lifting stage across all levels
    and orientations (the paper's configuration); ``'different'`` gives each
    wavelet level its own stage (see deviation note in ``ops/lifting.py``).
    """

    cfg: Config

    def setup(self):
        cfg = self.cfg
        c = cfg.clrch
        hidden = cfg.depth_scale * 8 * c  # lifting_dwt_nets.py:663 + P_block_v2
        num_stages = 1 if cfg.block_property == "same" else cfg.dwtlevels
        dt = compute_dtype(cfg)
        self.stages = [
            LiftStage(
                channels=c,
                hidden=hidden,
                filtersize=cfg.filtersize,
                num_pairs=cfg.num_lifting_perlayer,
                nonlinear=bool(cfg.linearity_flag),
                res_weight=cfg.res_connection_weight,
                use_scale=bool(cfg.scale),
                dtype=dt,
            )
            for _ in range(num_stages)]
        self.yl_ae = make_subband_ae(cfg.autoencoder, 1 * c, dt)
        self.yh_ae = [make_subband_ae(cfg.autoencoder, 3 * c, dt)
                      for _ in range(cfg.dwtlevels)]

    def _stage(self, level: int) -> LiftStage:
        return self.stages[0 if self.cfg.block_property == "same" else level]

    def encode(self, x):
        ll = x
        xo_list: List[jnp.ndarray] = []
        for lvl in range(self.cfg.dwtlevels):
            ll, lh, hl, hh = lift_level_forward(self._stage(lvl), ll)
            packed = dwt97.pack_details(lh, hl, hh)
            xo_list.append(self.yh_ae[lvl].encode(packed))
        xe = self.yl_ae.encode(ll)
        return xe, xo_list

    def decode(self, xe, xo_list):
        ll = self.yl_ae.decode(xe)
        for lvl in range(self.cfg.dwtlevels - 1, -1, -1):
            packed = self.yh_ae[lvl].decode(xo_list[lvl])
            lh, hl, hh = dwt97.unpack_details(packed)
            ll = lift_level_inverse(self._stage(lvl), ll, lh, hl, hh)
        return ll

    def __call__(self, x):  # init path
        xe, xo_list = self.encode(x)
        return self.decode(xe, xo_list)


class BasicWaveletTransform(nn.Module):
    """Strided-conv "wavelet": per level a stride-2 conv to 4c channels
    (c -> LL, 3c -> details) with optional GDN, inverted by a transposed
    conv (reference ``BasicWavelet``, ``lifting_dwt_nets.py:433-526``).
    Reconstruction is learned, not algebraic."""

    cfg: Config

    def setup(self):
        cfg = self.cfg
        c = cfg.clrch
        self.use_gdn = bool(cfg.linearity_flag)
        fwd, inv, fwd_gdn, inv_gdn = [], [], [], []
        for _ in range(cfg.dwtlevels):
            fwd.append((nn.Conv(4 * c, (3, 3), strides=(2, 2),
                                padding="SAME"),
                        nn.Conv(4 * c, (3, 3), padding="SAME")))
            inv.append((nn.Conv(4 * c, (3, 3), padding="SAME"),
                        nn.ConvTranspose(c, (3, 3), strides=(2, 2),
                                         padding="SAME")))
            if self.use_gdn:
                fwd_gdn.append(GDN(4 * c))
                inv_gdn.append(GDN(4 * c, inverse=True))
        self.fwd, self.inv = fwd, inv
        self.fwd_gdn, self.inv_gdn = fwd_gdn, inv_gdn
        self.yl_ae = make_subband_ae(cfg.autoencoder, 1 * c)
        self.yh_ae = [make_subband_ae(cfg.autoencoder, 3 * c)
                      for _ in range(cfg.dwtlevels)]

    def encode(self, x):
        cfg = self.cfg
        c = cfg.clrch
        ll = x
        xo_list = []
        for i in range(cfg.dwtlevels):
            down_conv, post_conv = self.fwd[i]
            h = down_conv(ll)
            if self.use_gdn:
                h = self.fwd_gdn[i](h)
                h = post_conv(h)
            ll, details = h[..., :c], h[..., c:]
            xo_list.append(self.yh_ae[i].encode(details))
        return self.yl_ae.encode(ll), xo_list

    def decode(self, xe, xo_list):
        cfg = self.cfg
        ll = self.yl_ae.decode(xe)
        for i in range(cfg.dwtlevels):
            lvl = cfg.dwtlevels - 1 - i
            details = self.yh_ae[lvl].decode(xo_list[lvl])
            h = jnp.concatenate([ll, details], axis=-1)
            pre_conv, up_conv = self.inv[i]
            if self.use_gdn:
                h = pre_conv(h)
                h = self.inv_gdn[i](h)
            ll = up_conv(h)
        return ll

    def __call__(self, x):  # init path
        xe, xo_list = self.encode(x)
        return self.decode(xe, xo_list)


class AttentionWaveletTransform(nn.Module):
    """Fixed 9/7 DWT with a softmax LL-attention boost from the coarsest
    LH+HL bands (reference ``AttentionWavelet``,
    ``lifting_dwt_nets.py:527-584``). The attention is applied only on the
    analysis side (the reference does not invert it). With
    ``with_postprocess`` a CBAM restoration head follows synthesis
    (reference ``AttentionWaveletPostProcessing``, ``:585-645``)."""

    cfg: Config
    with_postprocess: bool = False

    def setup(self):
        cfg = self.cfg
        c = cfg.clrch
        self.yl_ae = make_subband_ae("SubbandAutoEncoder", 1 * c)
        self.yh_ae = [make_subband_ae("SubbandAutoEncoder", 3 * c)
                      for _ in range(cfg.dwtlevels)]
        if self.with_postprocess:
            from ..ops.cbam import CBAMPostProcessing
            self.postprocess = CBAMPostProcessing(clrch=c)

    def encode(self, x):
        cfg = self.cfg
        ll, highs = dwt97.dwt97_forward(x, cfg.dwtlevels)
        lh, hl, _ = dwt97.unpack_details(highs[cfg.dwtlevels - 1])
        att = jax.nn.softmax(lh + hl, axis=-1)
        ll = ll + ll * att
        xe = self.yl_ae.encode(ll)
        xo_list = [self.yh_ae[i].encode(highs[i])
                   for i in range(cfg.dwtlevels)]
        return xe, xo_list

    def decode(self, xe, xo_list):
        cfg = self.cfg
        ll = self.yl_ae.decode(xe)
        highs = [self.yh_ae[i].decode(xo_list[i])
                 for i in range(cfg.dwtlevels)]
        xhat = dwt97.dwt97_inverse(ll, highs)
        if self.with_postprocess:
            xhat = self.postprocess(xhat)
        return xhat

    def __call__(self, x):  # init path
        xe, xo_list = self.encode(x)
        return self.decode(xe, xo_list)


class QuincunxLiftingTransform(nn.Module):
    """Multi-level quincunx/polyphase lifting DWT (reference ``DWTLayer``,
    ``lifting_dwt_nets.py:11-78``) with optional integer lifting.

    ``split_mode`` 'hv' composes horizontal+vertical lifts into the standard
    (LL, LH/HL/HH) contract; mode 1 ('1p3') lifts the three odd polyphase
    cosets from the even one. (Modes 2/3 grow the LL channel count per level
    and are exposed for completeness but are incompatible with the standard
    entropy models' 3c-detail contract.)
    """

    cfg: Config

    def setup(self):
        from ..ops.quincunx import (QuincunxHorVerNet, QuincunxLiftingNet,
                                    split_mode_channels)
        cfg = self.cfg
        mode, se, so = split_mode_channels(cfg.split_mode)
        self.mode = mode
        c = cfg.clrch
        layers = []
        ch = c
        for _ in range(cfg.dwtlevels):
            if mode == "hor":
                layers.append(QuincunxHorVerNet(
                    ch=ch, precision_bits=cfg.lif_prec_bits,
                    num_lifting=cfg.num_lifting_perlayer))
            else:
                layers.append(QuincunxLiftingNet(
                    in_xe_ch=se * ch, in_xo_ch=so * ch,
                    out_xe_ch=se * ch, out_xo_ch=so * ch,
                    precision_bits=cfg.lif_prec_bits,
                    num_lifting=cfg.num_lifting_perlayer))
                ch = se * ch
        self.layers = layers
        self.yl_ae = make_subband_ae(cfg.autoencoder, 1 * c)
        self.yh_ae = [make_subband_ae(cfg.autoencoder, 3 * c)
                      for _ in range(cfg.dwtlevels)]

    def encode(self, x, training: bool = False):
        from ..ops.quincunx import quincunx_split
        cfg = self.cfg
        xe = x
        xo_list = []
        for i in range(cfg.dwtlevels):
            if self.mode == "hor":
                even, odd = quincunx_split(xe, "hor")
            else:
                even, odd = quincunx_split(xe, self.mode)
            xe, xo = self.layers[i].forward_lifting(even, odd, training)
            xo_list.append(self.yh_ae[i].encode(xo))
        return self.yl_ae.encode(xe), xo_list

    def decode(self, xe, xo_list, training: bool = False):
        from ..ops.quincunx import quincunx_merge
        cfg = self.cfg
        xe = self.yl_ae.decode(xe)
        for i in range(cfg.dwtlevels - 1, -1, -1):
            xo = self.yh_ae[i].decode(xo_list[i])
            even, odd = self.layers[i].inverse_lifting(xe, xo, training)
            xe = quincunx_merge(even, odd,
                                "hor" if self.mode == "hor" else self.mode)
        return xe

    def __call__(self, x):  # init path
        xe, xo_list = self.encode(x)
        return self.decode(xe, xo_list)


def make_transform(cfg: Config) -> nn.Module:
    """Transform dispatch (reference ``LiftingBasedDWT_net.py:108-120``)."""
    if cfg.netType == "CDF97":
        return CDF97Transform(cfg)
    if cfg.netType == "LiftingBasedNeuralWaveletv4":
        return LearnedLiftingTransform(cfg)
    if cfg.netType == "BasicWavelet":
        return BasicWaveletTransform(cfg)
    if cfg.netType == "AttentionWavelet":
        return AttentionWaveletTransform(cfg)
    if cfg.netType == "AttentionWaveletPostProcessing":
        return AttentionWaveletTransform(cfg, with_postprocess=True)
    if cfg.netType == "QuincunxLifting":
        return QuincunxLiftingTransform(cfg)
    raise NotImplementedError(f"netType {cfg.netType!r} not implemented yet")
