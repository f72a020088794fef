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
import jax.numpy as jnp

from ..config import Config
from ..ops import dwt97
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
        self.yl_ae = make_subband_ae(self.cfg.autoencoder, 1 * c)
        self.yh_ae = [make_subband_ae(self.cfg.autoencoder, 3 * c)
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
        self.stages = [
            LiftStage(
                channels=c,
                hidden=hidden,
                filtersize=cfg.filtersize,
                num_pairs=cfg.num_lifting_perlayer,
                nonlinear=bool(cfg.linearity_flag),
                res_weight=cfg.res_connection_weight,
                use_scale=bool(cfg.scale),
            )
            for _ in range(num_stages)]
        self.yl_ae = make_subband_ae(cfg.autoencoder, 1 * c)
        self.yh_ae = [make_subband_ae(cfg.autoencoder, 3 * c)
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


def make_transform(cfg: Config) -> nn.Module:
    """Transform dispatch (reference ``LiftingBasedDWT_net.py:108-120``)."""
    if cfg.netType == "CDF97":
        return CDF97Transform(cfg)
    if cfg.netType == "LiftingBasedNeuralWaveletv4":
        return LearnedLiftingTransform(cfg)
    raise NotImplementedError(f"netType {cfg.netType!r} not implemented yet")
