"""Learned lifting-scheme DWT (the paper's main transform).

TPU-first re-design of the reference's ``LiftingBasedNeuralWaveletv4``
(``graphs/layers/lifting_dwt_nets.py:646-827``) and its helpers
``wavelet_forward_v2.py`` / ``wavelet_inverse_v2.py`` / ``P_block_v2.py``.

Per level, rows are split even/odd and lifted (predict/update pairs), then
each row-band is split along columns and lifted again, yielding LL/LH/HL/HH.
Each lifting step is::

    skip = fixed_cdf97_conv(src)                 # learnable 3-tap, init 9/7
    dst  = dst + skip + P(skip) * res_weight     # P/U: small residual CNN

The fixed 3-tap skip convolutions carry the CDF 9/7 lifting coefficients as
their linear initialization (reference ``lifting_dwt_nets.py:784-827``), so at
init the transform IS the 9/7 wavelet (up to the gain convention) and training
only bends it nonlinearly. Because forward and inverse share the exact same
modules, inversion is algebraically exact (reference
``wavelet_inverse_v2.py:68-92``).

Everything here is pure elementwise math plus small dense convs: XLA fuses
the ladder into a few vector passes; the P/U convs are the only MXU work.

Design deviations from the reference (documented, deliberate):

- The fixed skip convs are depthwise (one 3-tap filter per color channel).
  The reference declares ``Conv2d(csize, csize, (3,1))`` but assigns a
  ``(1,1,3,1)`` weight, which only type-checks for ``clrch == 1``
  (``lifting_dwt_nets.py:805-819``); depthwise generalizes that to
  ``clrch == 3`` while being identical for 1 channel.
- ``block_property == 'different'`` gives each wavelet level its own P/U
  blocks, shared between forward and inverse. The reference's 'different'
  branch indexes disjoint block ranges for forward vs inverse
  (``lifting_dwt_nets.py:711-722``), making the inverse only approximately
  an inverse; we keep the transform exactly invertible.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .math_utils import LIFTING_COEFF

ALPHA, BETA, GAMMA, DELTA, NH_COEFF, NL_COEFF = LIFTING_COEFF


class PBlock(nn.Module):
    """4-conv residual block (reference ``P_block_v2.py:7-55``).

    conv1 -> (tanh) -> conv2 -> (tanh) -> conv3, + conv1 output, -> conv4.
    Hidden width = ``depth_scale * channels`` where the caller passes
    ``config.depth_scale * 8`` (reference ``lifting_dwt_nets.py:663,700``).
    """

    channels: int
    hidden: int
    filtersize: int = 5
    nonlinear: bool = True
    dtype: object = None

    @property
    def radius(self) -> int:
        """Receptive-field radius: 4 sequential SAME convs."""
        return 4 * (self.filtersize // 2)

    @nn.compact
    def __call__(self, x, mask=None):
        """``mask`` (halo-sharded eval only): a broadcastable 0/1 array
        multiplied onto every conv INPUT. On a halo-extended block whose
        out-of-image rows are zero, re-zeroing each intermediate before the
        next conv reproduces the unsharded SAME zero-padding exactly (conv
        biases would otherwise bleed into the halo rows at global edges)."""
        k = (self.filtersize, self.filtersize)
        names = iter(f"Conv_{i}" for i in range(4))
        if self.dtype is not None and self.filtersize == 5:
            # MXU path: 5x5 narrow-channel convs as polyphase 3x3 with 4x
            # channels (ops/fast_conv.py::conv5x5_s2d) — exactly equivalent.
            # Names pinned to Conv_i so param paths match the nn.Conv form.
            from .fast_conv import FastConv5x5
            conv = lambda f: FastConv5x5(  # noqa: E731
                f, dtype=self.dtype, name=next(names))
        else:
            conv = lambda f: nn.Conv(f, k, padding="SAME",  # noqa: E731
                                     dtype=self.dtype, name=next(names))
        mfn = (lambda t: t) if mask is None else (lambda t: t * mask)
        out_res = conv(self.hidden)(mfn(x))
        t = jnp.tanh(out_res) if self.nonlinear else out_res
        t = conv(self.hidden)(mfn(t))
        if self.nonlinear:
            t = jnp.tanh(t)
        t = conv(self.hidden)(mfn(t))
        t = t + out_res
        # fp32 output: the result feeds the exactly-inverted lifting ladder
        return conv(self.channels)(mfn(t)).astype(jnp.float32)


class SkipConv(nn.Module):
    """Learnable 3-tap depthwise conv along axis 1, zero-padded.

    Initialized with the CDF 9/7 lifting coefficient pattern: 'predict'
    steps see taps (0, c, c) — current + next even sample; 'update' steps
    (c, c, 0) — previous + current odd sample
    (reference ``lifting_dwt_nets.py:784-803``).
    """

    channels: int
    coeff: float
    kind: str  # 'predict' | 'update'

    @nn.compact
    def __call__(self, x):
        def init(_):
            if self.kind == "predict":
                pattern = jnp.array([0.0, self.coeff, self.coeff])
            else:
                pattern = jnp.array([self.coeff, self.coeff, 0.0])
            return jnp.tile(pattern[:, None], (1, self.channels))

        taps = self.param("taps", init)  # (3, C)
        n = x.shape[1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
        return (taps[0] * xp[:, 0:n] + taps[1] * xp[:, 1:n + 1]
                + taps[2] * xp[:, 2:n + 2])


def _split_rows(x):
    b, h, w, c = x.shape
    xr = x.reshape(b, h // 2, 2, w, c)
    return xr[:, :, 0], xr[:, :, 1]


def _merge_rows(even, odd):
    b, h2, w, c = even.shape
    return jnp.stack([even, odd], axis=2).reshape(b, h2 * 2, w, c)


class LiftStage(nn.Module):
    """``num_pairs`` predict/update lifting pairs applied to (L, H) rows.

    Forward math (reference ``wavelet_forward_v2.py:58-81``)::

        skip = S_{2p}(L);   H += skip + P_p(skip) * w
        skip = S_{2p+1}(H); L += skip + U_p(skip) * w

    then optional learned gains H *= nh_eff, L *= nl_eff when ``use_scale``.
    The inverse replays the same modules in reverse with subtraction
    (reference ``wavelet_inverse_v2.py:68-92``), hence exact.
    """

    channels: int
    hidden: int
    filtersize: int
    num_pairs: int = 2
    nonlinear: bool = True
    res_weight: float = 0.1
    use_scale: bool = False
    dtype: object = None

    def setup(self):
        # cycle the 9/7 ladder coefficients: alpha, beta, gamma, delta, ...
        pred_coeffs = [ALPHA, GAMMA]
        updt_coeffs = [BETA, DELTA]
        skips = []
        for p in range(self.num_pairs):
            skips.append(SkipConv(self.channels, pred_coeffs[p % 2], "predict"))
            skips.append(SkipConv(self.channels, updt_coeffs[p % 2], "update"))
        self.skips = skips
        self.p_blocks = [
            PBlock(self.channels, self.hidden, self.filtersize,
                   self.nonlinear, self.dtype)
            for _ in range(self.num_pairs)]
        self.u_blocks = [
            PBlock(self.channels, self.hidden, self.filtersize,
                   self.nonlinear, self.dtype)
            for _ in range(self.num_pairs)]
        if self.use_scale:
            self.nh = self.param("nh", nn.initializers.zeros, (1,))
            self.nl = self.param("nl", nn.initializers.zeros, (1,))

    def _gains(self):
        nh_eff = NH_COEFF + self.nh[0] * 0.1
        nl_eff = NL_COEFF + self.nl[0] * 0.1
        return nh_eff, nl_eff

    def forward(self, L, H):
        w = self.res_weight
        for p in range(self.num_pairs):
            skip = self.skips[2 * p](L)
            H = H + skip + self.p_blocks[p](skip) * w
            skip = self.skips[2 * p + 1](H)
            L = L + skip + self.u_blocks[p](skip) * w
        if self.use_scale:
            nh_eff, nl_eff = self._gains()
            H = H * nh_eff
            L = L * nl_eff
        return L, H

    def inverse(self, L, H):
        w = self.res_weight
        if self.use_scale:
            nh_eff, nl_eff = self._gains()
            H = H / nh_eff
            L = L / nl_eff
        for p in range(self.num_pairs - 1, -1, -1):
            skip = self.skips[2 * p + 1](H)
            L = L - skip - self.u_blocks[p](skip) * w
            skip = self.skips[2 * p](L)
            H = H - skip - self.p_blocks[p](skip) * w
        return L, H

    def __call__(self, L, H):  # for init
        return self.forward(L, H)

    # --- halo-sharded variants (parallel/tiling.py::make_halo_eval_step) --
    #
    # The collectives are injected as callables so this module stays free of
    # mesh/axis knowledge:
    #   ext(t)  — concatenate r neighbor rows on each side along the sharded
    #             axis (ppermute without wraparound: global edges get zeros,
    #             which IS the ladder's zero padding),
    #   mask    — 0/1 array over the extended axis, zero on rows outside the
    #             global image (edge devices only); multiplied onto every
    #             conv input so SAME zero-padding is reproduced exactly at
    #             every conv layer (see PBlock.__call__).
    # Two geometries: in the row pass the lifted axis (1) IS the sharded
    # axis — the skip conv itself needs the extension; in the column pass
    # (arrays transposed, sharded axis 2) the skip conv is local and only
    # the 2D P/U convs need cross-axis halos.

    @property
    def halo_radius(self) -> int:
        """Rows of valid context a P/U block consumes on each side."""
        return 4 * (self.filtersize // 2)

    def forward_halo_rows(self, L, H, ext, mask, R):
        """Row-pass forward: sharded axis == lifted axis (axis 1);
        ``R == halo_radius + 1`` (1 extra row for the 3-tap skip conv)."""
        w = self.res_weight
        for p in range(self.num_pairs):
            sk = self.skips[2 * p](ext(L)) * mask
            H = H + sk[:, R:-R] + self.p_blocks[p](sk, mask)[:, R:-R] * w
            sk = self.skips[2 * p + 1](ext(H)) * mask
            L = L + sk[:, R:-R] + self.u_blocks[p](sk, mask)[:, R:-R] * w
        if self.use_scale:
            nh_eff, nl_eff = self._gains()
            H = H * nh_eff
            L = L * nl_eff
        return L, H

    def inverse_halo_rows(self, L, H, ext, mask, R):
        w = self.res_weight
        if self.use_scale:
            nh_eff, nl_eff = self._gains()
            H = H / nh_eff
            L = L / nl_eff
        for p in range(self.num_pairs - 1, -1, -1):
            sk = self.skips[2 * p + 1](ext(H)) * mask
            L = L - sk[:, R:-R] - self.u_blocks[p](sk, mask)[:, R:-R] * w
            sk = self.skips[2 * p](ext(L)) * mask
            H = H - sk[:, R:-R] - self.p_blocks[p](sk, mask)[:, R:-R] * w
        return L, H

    def forward_halo_cols(self, L, H, ext, mask, r):
        """Column-pass forward on transposed arrays (B, W, Hs, C): the
        lifted axis (1) is local, the sharded axis is 2; ``r ==
        halo_radius``. The skip conv runs locally; only the P/U blocks see
        extended inputs."""
        w = self.res_weight
        for p in range(self.num_pairs):
            sk = self.skips[2 * p](L)
            ske = ext(sk) * mask
            H = H + sk + self.p_blocks[p](ske, mask)[:, :, r:-r] * w
            sk = self.skips[2 * p + 1](H)
            ske = ext(sk) * mask
            L = L + sk + self.u_blocks[p](ske, mask)[:, :, r:-r] * w
        if self.use_scale:
            nh_eff, nl_eff = self._gains()
            H = H * nh_eff
            L = L * nl_eff
        return L, H

    def inverse_halo_cols(self, L, H, ext, mask, r):
        w = self.res_weight
        if self.use_scale:
            nh_eff, nl_eff = self._gains()
            H = H / nh_eff
            L = L / nl_eff
        for p in range(self.num_pairs - 1, -1, -1):
            sk = self.skips[2 * p + 1](H)
            ske = ext(sk) * mask
            L = L - sk - self.u_blocks[p](ske, mask)[:, :, r:-r] * w
            sk = self.skips[2 * p](L)
            ske = ext(sk) * mask
            H = H - sk - self.p_blocks[p](ske, mask)[:, :, r:-r] * w
        return L, H


def lift_level_forward(stage: LiftStage, x):
    """One 2D level: rows then columns (reference wavelet_forward_v2.py:26-54).

    The two column passes (over L and over H) use the SAME stage modules,
    so they are batched into one call along the batch axis — numerically
    identical, half the conv dispatches, double the per-conv batch for the
    MXU.
    """
    L, H = stage.forward(*_split_rows(x))
    # columns: transpose H<->W so the 3-tap skip convs act along the lifted axis
    b = x.shape[0]
    T = jnp.concatenate([jnp.swapaxes(L, 1, 2), jnp.swapaxes(H, 1, 2)],
                        axis=0)
    lo_t, hi_t = stage.forward(*_split_rows(T))
    ll = jnp.swapaxes(lo_t[:b], 1, 2)
    hl = jnp.swapaxes(hi_t[:b], 1, 2)
    lh = jnp.swapaxes(lo_t[b:], 1, 2)
    hh = jnp.swapaxes(hi_t[b:], 1, 2)
    return ll, lh, hl, hh


def lift_level_inverse(stage: LiftStage, ll, lh, hl, hh):
    """Exact inverse of :func:`lift_level_forward` (column passes batched
    the same way)."""
    b = ll.shape[0]
    lo_t = jnp.concatenate(
        [jnp.swapaxes(ll, 1, 2), jnp.swapaxes(lh, 1, 2)], axis=0)
    hi_t = jnp.concatenate(
        [jnp.swapaxes(hl, 1, 2), jnp.swapaxes(hh, 1, 2)], axis=0)
    merged = _merge_rows(*stage.inverse(lo_t, hi_t))
    L = jnp.swapaxes(merged[:b], 1, 2)
    H = jnp.swapaxes(merged[b:], 1, 2)
    return _merge_rows(*stage.inverse(L, H))
