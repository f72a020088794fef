"""Quincunx / polyphase lifting networks (the reference's alternative
lifting path: ``graphs/layers/lifting_nets.py`` + ``DWTLayer`` at
``lifting_dwt_nets.py:11-78``).

A 2x2 pixel block is split spatially into "even"/"odd" channel groups
(modes ``1p3``/``2p2``/``3p1``; plus ``hor``/``ver`` row-column splits), and
N predict/update CNN pairs lift between the groups::

    xo = repeat(xo) + round(P(xe));   xe = repeat(xe) + round(U(xo))

with optional integer-lifting rounding (``lif_prec_bits``: uniform noise in
training, rounding to the ``255 * 2^(bits-8)`` grid in eval — reference
``lifting_nets.py:196-203``) so the transform maps integers to integers.
Inversion replays the same nets with subtraction and is exact (bit-exact in
integer mode).

All splits are reshapes (no gathers); the P/U nets are small dense convs.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .math_utils import lifting_round


def quincunx_split(x, mode: str):
    """NHWC spatial split. Returns (x_even, x_odd); see reference
    ``SplitMergeSpatiallyForLiftingNet.split`` (``lifting_nets.py:22-56``)."""
    b, h, w, c = x.shape
    if mode in ("1p3", "2p2", "3p1"):
        assert h % 2 == 0 and w % 2 == 0
        x00 = x[:, 0::2, 0::2, :]
        x01 = x[:, 0::2, 1::2, :]
        x10 = x[:, 1::2, 0::2, :]
        x11 = x[:, 1::2, 1::2, :]
        if mode == "2p2":
            return (jnp.concatenate([x00, x11], -1),
                    jnp.concatenate([x01, x10], -1))
        if mode == "1p3":
            return x00, jnp.concatenate([x01, x10, x11], -1)
        return jnp.concatenate([x00, x01, x10], -1), x11
    if mode == "hor":
        return x[:, :, 0::2, :], x[:, :, 1::2, :]
    if mode == "ver":
        return x[:, 0::2, :, :], x[:, 1::2, :, :]
    raise ValueError(mode)


def quincunx_merge(x_even, x_odd, mode: str):
    """Exact inverse of :func:`quincunx_split`."""
    if mode in ("1p3", "2p2", "3p1"):
        if mode == "2p2":
            c = x_even.shape[-1] // 2
            x00, x11 = x_even[..., :c], x_even[..., c:]
            x01, x10 = x_odd[..., :c], x_odd[..., c:]
        elif mode == "1p3":
            c = x_even.shape[-1]
            x00 = x_even
            x01, x10, x11 = (x_odd[..., :c], x_odd[..., c:2 * c],
                             x_odd[..., 2 * c:])
        else:
            c = x_odd.shape[-1]
            x11 = x_odd
            x00, x01, x10 = (x_even[..., :c], x_even[..., c:2 * c],
                             x_even[..., 2 * c:])
        b, h2, w2, c = x00.shape
        top = jnp.stack([x00, x01], axis=3).reshape(b, h2, w2 * 2, c)
        bot = jnp.stack([x10, x11], axis=3).reshape(b, h2, w2 * 2, c)
        return jnp.stack([top, bot], axis=2).reshape(b, h2 * 2, w2 * 2, c)
    if mode == "hor":
        b, h, w2, c = x_even.shape
        return jnp.stack([x_even, x_odd], axis=3).reshape(b, h, w2 * 2, c)
    if mode == "ver":
        b, h2, w, c = x_even.shape
        return jnp.stack([x_even, x_odd], axis=2).reshape(b, h2 * 2, w, c)
    raise ValueError(mode)


def split_mode_channels(config_split_mode) -> Tuple[str, int, int]:
    """config split_mode -> (mode string, se, so) channel multipliers
    (reference ``get_splitmode_se_so``, ``lifting_nets.py:116-132``)."""
    if config_split_mode == 1:
        return "1p3", 1, 3
    if config_split_mode == 3:
        return "3p1", 3, 1
    if config_split_mode == 2:
        return "2p2", 2, 2
    if config_split_mode == "hv":
        return "hor", 1, 3
    raise ValueError(f"unknown split mode {config_split_mode!r}")


class _PredUpdNet(nn.Module):
    """2-conv predict/update net: in->hid (3x3, no bias), tanh, hid->out
    (reference ``get_nn_sequential`` with ncnns=2, kersz=3,
    ``lifting_nets.py:164-176,226-244``)."""

    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x):
        min_ch, max_ch = (min(self.in_ch, self.out_ch),
                          max(self.in_ch, self.out_ch))
        hid = min(min_ch * 32, max(128, max_ch))
        h = nn.Conv(hid, (3, 3), padding="SAME", use_bias=False)(x)
        h = jnp.tanh(h)
        return nn.Conv(self.out_ch, (3, 3), padding="SAME",
                       use_bias=False)(h)


class QuincunxLiftingNet(nn.Module):
    """N predict/update lifting pairs between even/odd channel groups with
    channel-repeat expansion (reference ``LiftingNet``,
    ``lifting_nets.py:135-223``)."""

    in_xe_ch: int
    in_xo_ch: int
    out_xe_ch: int
    out_xo_ch: int
    precision_bits: int = 0
    num_lifting: int = 1

    def setup(self):
        assert self.out_xe_ch % self.in_xe_ch == 0
        assert self.out_xo_ch % self.in_xo_ch == 0
        self.pred_repeat = self.out_xo_ch // self.in_xo_ch
        self.updt_repeat = self.out_xe_ch // self.in_xe_ch
        self.prediction = _PredUpdNet(self.in_xe_ch, self.out_xo_ch)
        self.update = _PredUpdNet(self.out_xo_ch, self.out_xe_ch)
        self.prediction2 = [
            _PredUpdNet(self.out_xe_ch, self.out_xo_ch)
            for _ in range(self.num_lifting - 1)]
        self.update2 = [
            _PredUpdNet(self.out_xo_ch, self.out_xe_ch)
            for _ in range(self.num_lifting - 1)]

    def _round(self, x, training: bool):
        rng = (self.make_rng("noise")
               if (training and self.precision_bits > 0) else None)
        return lifting_round(x, self.precision_bits, rng)

    def forward_lifting(self, in_xe, in_xo, training: bool = False):
        out_xo = (jnp.tile(in_xo, (1, 1, 1, self.pred_repeat))
                  + self._round(self.prediction(in_xe), training))
        out_xe = (jnp.tile(in_xe, (1, 1, 1, self.updt_repeat))
                  + self._round(self.update(out_xo), training))
        for i in range(self.num_lifting - 1):
            out_xo = out_xo + self._round(self.prediction2[i](out_xe),
                                          training)
            out_xe = out_xe + self._round(self.update2[i](out_xo), training)
        return out_xe, out_xo

    def inverse_lifting(self, in_xe, in_xo, training: bool = False):
        for i in range(self.num_lifting - 2, -1, -1):
            in_xe = in_xe - self._round(self.update2[i](in_xo), training)
            in_xo = in_xo - self._round(self.prediction2[i](in_xe), training)
        out_xe = in_xe - self._round(self.update(in_xo), training)
        out_xe = out_xe[..., : self.in_xe_ch]
        out_xo = in_xo - self._round(self.prediction(out_xe), training)
        return out_xe, out_xo[..., : self.in_xo_ch]

    def __call__(self, xe, xo):  # init path
        return self.forward_lifting(xe, xo)


class QuincunxHorVerNet(nn.Module):
    """Horizontal lift, then vertical split + two vertical lifts ->
    (LL, cat(LH, HL, HH)) (reference ``LiftingHorVerNet``,
    ``lifting_nets.py:252-298``)."""

    ch: int
    precision_bits: int = 0
    num_lifting: int = 1

    def setup(self):
        mk = lambda: QuincunxLiftingNet(  # noqa: E731
            in_xe_ch=self.ch, in_xo_ch=self.ch, out_xe_ch=self.ch,
            out_xo_ch=self.ch, precision_bits=self.precision_bits,
            num_lifting=self.num_lifting)
        self.lift_hor = mk()
        self.lift_ver1 = mk()
        self.lift_ver2 = mk()

    def forward_lifting(self, in_xe, in_xo, training: bool = False):
        xe, xo = self.lift_hor.forward_lifting(in_xe, in_xo, training)
        xe_e, xe_o = quincunx_split(xe, "ver")
        xo_e, xo_o = quincunx_split(xo, "ver")
        ll, lh = self.lift_ver1.forward_lifting(xe_e, xe_o, training)
        hl, hh = self.lift_ver2.forward_lifting(xo_e, xo_o, training)
        return ll, jnp.concatenate([lh, hl, hh], axis=-1)

    def inverse_lifting(self, ll, xo3, training: bool = False):
        c = self.ch
        lh, hl, hh = xo3[..., :c], xo3[..., c:2 * c], xo3[..., 2 * c:]
        xo_e, xo_o = self.lift_ver2.inverse_lifting(hl, hh, training)
        xe_e, xe_o = self.lift_ver1.inverse_lifting(ll, lh, training)
        xo = quincunx_merge(xo_e, xo_o, "ver")
        xe = quincunx_merge(xe_e, xe_o, "ver")
        return self.lift_hor.inverse_lifting(xe, xo, training)

    def __call__(self, xe, xo):  # init path
        return self.forward_lifting(xe, xo)
