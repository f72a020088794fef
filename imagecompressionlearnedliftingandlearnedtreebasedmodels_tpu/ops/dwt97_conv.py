"""CDF 9/7 DWT as explicit separable stride-2 convolutions.

Alternative formulation of the fixed transform (counterpart of the
reference's ``DWTCDF97Layer``, ``lifting_dwt_nets.py:319-430``, which builds
2D kernels from hardcoded 10-tap filters). Here the analysis filter taps are
DERIVED from the lifting ladder (same construction as the
:func:`..ops.dwt97.analysis_filters_ref` oracle) so both formulations are
guaranteed consistent, and the convolutions are circular (periodization) to
match the lifting path exactly.

Mostly useful as a cross-check and as the natural formulation when fusing
the transform into neighboring convs; the lifting form in :mod:`.dwt97`
does ~2x fewer FLOPs and is the production path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .math_utils import LIFTING_COEFF

ALPHA, BETA, GAMMA, DELTA, NH, NL = LIFTING_COEFF


@functools.lru_cache(maxsize=1)
def cdf97_filters():
    """(h_low, h_high, low_offset, high_offset): analysis taps + the input
    offset of each filter's first tap relative to its output sample."""
    n = 32

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
    # row 0 of L covers input samples around index 0 (circularly)
    low_row = L[0]
    high_row = H[0]

    def extract(row, support):
        # center the circular row: taps live near index 0 (mod n)
        idx = [(i - n // 2) for i in range(n)]
        rolled = np.roll(row, n // 2)
        nz = np.abs(rolled) > 1e-12
        first = int(np.argmax(nz))
        last = n - 1 - int(np.argmax(nz[::-1]))
        assert last - first + 1 == support
        return rolled[first:last + 1], idx[first]

    h_low, off_low = extract(low_row, 9)
    h_high, off_high = extract(high_row, 7)
    return (jnp.asarray(h_low, jnp.float32), jnp.asarray(h_high, jnp.float32),
            off_low, off_high)


def _circ_filter_downsample(x, taps, offset: int, axis: int):
    """y[k] = sum_t taps[t] * x[2k + offset + t] with circular indexing."""
    n = x.shape[axis]
    acc = None
    for t in range(taps.shape[0]):
        shift = -(offset + t)
        term = taps[t] * jnp.roll(x, shift, axis=axis)
        acc = term if acc is None else acc + term
    # downsample: even samples along axis
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, n, 2)
    return acc[tuple(sl)]


def dwt97_conv_1d(x, axis: int):
    """One 1D analysis pass via explicit filtering -> (low, high).

    The derived tap offsets are relative to the even output grid (the high
    filter is symmetric about offset +1, i.e. the odd sample), so both
    bands apply directly at stride 2 with no extra phase shift.
    """
    h_low, h_high, off_low, off_high = cdf97_filters()
    low = _circ_filter_downsample(x, h_low, off_low, axis)
    high = _circ_filter_downsample(x, h_high, off_high, axis)
    return low, high


def dwt97_conv_level(x):
    """One 2D level via separable filtering (rows then cols), matching
    :func:`..ops.dwt97.dwt97_level` numerically."""
    low, high = dwt97_conv_1d(x, axis=1)
    ll, hl = dwt97_conv_1d(low, axis=2)
    lh, hh = dwt97_conv_1d(high, axis=2)
    return ll, lh, hl, hh
