"""Fixed CDF 9/7 (bior4.4) DWT via the lifting scheme, fully vectorized.

TPU-native replacement for the reference's ``pytorch_wavelets``
``DWTForward/DWTInverse(wave='bior4.4', mode='periodization')`` path
(reference ``graphs/layers/lifting_dwt_nets.py:228-231``). Instead of the
filter-bank convolutions used there, we run the lifting factorization of the
9/7 polyphase matrix directly on even/odd lattices — 4 fused elementwise
passes per axis, no strided convolutions, no im2col. XLA fuses each lifting
step into a handful of vector ops, which is the speed-of-light formulation
for this transform on TPU (it is HBM-bandwidth bound).

Boundary handling is periodic ("periodization"), so every level halves both
spatial dims exactly and perfect reconstruction is algebraically exact.

Layout: NHWC. Per-level detail subbands are packed channel-major-last as
``(..., C*3)`` with subband order (LH, HL, HH) per color channel, matching the
reference's ``Yh[i].view(B, C*3, H, W)`` packing
(``lifting_dwt_nets.py:739-740``).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from .math_utils import LIFTING_COEFF

ALPHA, BETA, GAMMA, DELTA, NH, NL = LIFTING_COEFF


def _split_even_odd(x, axis: int):
    """Split along ``axis`` into even/odd index sub-signals via reshape."""
    shape = x.shape
    n = shape[axis]
    assert n % 2 == 0, f"axis {axis} length {n} must be even"
    new_shape = shape[:axis] + (n // 2, 2) + shape[axis + 1:]
    xr = x.reshape(new_shape)
    even = jnp.take(xr, 0, axis=axis + 1)
    odd = jnp.take(xr, 1, axis=axis + 1)
    return even, odd


def _merge_even_odd(even, odd, axis: int):
    """Inverse of :func:`_split_even_odd`."""
    stacked = jnp.stack([even, odd], axis=axis + 1)
    shape = even.shape
    new_shape = shape[:axis] + (shape[axis] * 2,) + shape[axis + 1:]
    return stacked.reshape(new_shape)


def lift97_1d(x, axis: int):
    """One 9/7 analysis lifting pass along ``axis`` -> (low, high)."""
    s, d = _split_even_odd(x, axis)
    # predict/update ladder with periodic extension:
    #   d_i += alpha * (s_i + s_{i+1});  s_i += beta  * (d_{i-1} + d_i)
    #   d_i += gamma * (s_i + s_{i+1});  s_i += delta * (d_{i-1} + d_i)
    d = d + ALPHA * (s + jnp.roll(s, -1, axis=axis))
    s = s + BETA * (jnp.roll(d, 1, axis=axis) + d)
    d = d + GAMMA * (s + jnp.roll(s, -1, axis=axis))
    s = s + DELTA * (jnp.roll(d, 1, axis=axis) + d)
    return s * NL, d * NH


def ilift97_1d(low, high, axis: int):
    """Exact inverse of :func:`lift97_1d`."""
    s = low / NL
    d = high / NH
    s = s - DELTA * (jnp.roll(d, 1, axis=axis) + d)
    d = d - GAMMA * (s + jnp.roll(s, -1, axis=axis))
    s = s - BETA * (jnp.roll(d, 1, axis=axis) + d)
    d = d - ALPHA * (s + jnp.roll(s, -1, axis=axis))
    return _merge_even_odd(s, d, axis)


def dwt97_level(x):
    """One 2D decomposition level. NHWC -> (LL, LH, HL, HH), half-res each.

    Axis order mirrors the reference (``wavelet_forward_v2.py:26-54``): rows
    (H) first, then columns (W) of each row-band. Subband naming follows the
    reference: (LL, HL) from the row-low band, (LH, HH) from the row-high.
    """
    low, high = lift97_1d(x, axis=1)
    ll, hl = lift97_1d(low, axis=2)
    lh, hh = lift97_1d(high, axis=2)
    return ll, lh, hl, hh


def idwt97_level(ll, lh, hl, hh):
    """Exact inverse of :func:`dwt97_level`."""
    low = ilift97_1d(ll, hl, axis=2)
    high = ilift97_1d(lh, hh, axis=2)
    return ilift97_1d(low, high, axis=1)


def pack_details(lh, hl, hh):
    """(B,h,w,C) x3 -> (B,h,w,C*3) with per-channel (LH,HL,HH) order."""
    stacked = jnp.stack([lh, hl, hh], axis=-1)  # (B,h,w,C,3)
    b, h, w, c, _ = stacked.shape
    return stacked.reshape(b, h, w, c * 3)


def unpack_details(xo):
    """Inverse of :func:`pack_details`."""
    b, h, w, c3 = xo.shape
    stacked = xo.reshape(b, h, w, c3 // 3, 3)
    return stacked[..., 0], stacked[..., 1], stacked[..., 2]


def dwt97_forward(x, levels: int) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Multi-level 9/7 DWT.

    :return: ``(ll, highs)`` where ``highs[i]`` is the level-i detail pack
        ``(B, H/2^{i+1}, W/2^{i+1}, C*3)``, finest level first (matching the
        reference's ``out_xo_list`` ordering, ``lifting_dwt_nets.py:724-746``).
    """
    highs = []
    ll = x
    for _ in range(levels):
        ll, lh, hl, hh = dwt97_level(ll)
        highs.append(pack_details(lh, hl, hh))
    return ll, highs


def dwt97_inverse(ll, highs: List[jnp.ndarray]):
    """Exact inverse of :func:`dwt97_forward`."""
    for xo in reversed(highs):
        lh, hl, hh = unpack_details(xo)
        ll = idwt97_level(ll, lh, hl, hh)
    return ll


def analysis_filters_ref():
    """Effective 9/7 analysis filters implied by the lifting ladder.

    Derived algebraically (numpy) from the same coefficients — used only as a
    test oracle for parity between this lifting implementation and direct
    circular convolution. Returns ``(h_low, h_high, low_phase, high_phase)``
    where the phases give the output-sample alignment on the input grid.
    """
    import numpy as np

    n = 64
    # build the analysis operator by passing unit impulses through a numpy
    # re-statement of the ladder (independent of the JAX code above)
    def lift_np(sig):
        s, d = sig[0::2].copy(), sig[1::2].copy()
        d += ALPHA * (s + np.roll(s, -1))
        s += BETA * (np.roll(d, 1) + d)
        d += GAMMA * (s + np.roll(s, -1))
        s += DELTA * (np.roll(d, 1) + d)
        return s * NL, d * NH

    L = np.zeros((n // 2, n))
    H = np.zeros((n // 2, n))
    for i in range(n):
        e = np.zeros(n)
        e[i] = 1.0
        lo, hi = lift_np(e)
        L[:, i] = lo
        H[:, i] = hi
    return L, H
