"""Pallas TPU kernel: fused CDF 9/7 lifting ladder.

The vectorized jnp ladder in :mod:`.dwt97` lowers to ~10 elementwise
passes (split, 4 predict/update steps with neighbor rolls, gains) — each a
separate HBM round trip unless XLA fuses them. This kernel keeps the whole
row block resident in VMEM and runs the complete ladder in ONE pass:
split, alpha/beta/gamma/delta couplings with periodic neighbor access, and
the NL/NH gains, emitting both subbands.

Layout contract: input is reshaped to (rows, cols) with the lifted axis as
rows and everything else flattened into cols (a multiple of 128 lanes when
possible). The grid tiles the column axis; the full row extent stays in
VMEM because the ladder couples all rows through the periodic boundary.

Falls back transparently to the jnp ladder off-TPU (``interpret=True`` under
tests on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .math_utils import LIFTING_COEFF

ALPHA, BETA, GAMMA, DELTA, NH, NL = LIFTING_COEFF


def _ladder_kernel(x_ref, low_ref, high_ref):
    x = x_ref[:]                      # (H, TILE_C)
    h = x.shape[0]
    xr = x.reshape(h // 2, 2, x.shape[1])
    s = xr[:, 0, :]
    d = xr[:, 1, :]
    # periodic neighbor access via roll (VMEM-resident, no HBM traffic);
    # pltpu.roll wants non-negative shifts: roll by n-1 == roll by -1
    n = h // 2
    d = d + ALPHA * (s + pltpu.roll(s, n - 1, 0))
    s = s + BETA * (pltpu.roll(d, 1, 0) + d)
    d = d + GAMMA * (s + pltpu.roll(s, n - 1, 0))
    s = s + DELTA * (pltpu.roll(d, 1, 0) + d)
    low_ref[:] = s * NL
    high_ref[:] = d * NH


def _inverse_kernel(low_ref, high_ref, x_ref):
    s = low_ref[:] / NL               # (H/2, TILE_C)
    d = high_ref[:] / NH
    n = s.shape[0]
    s = s - DELTA * (pltpu.roll(d, 1, 0) + d)
    d = d - GAMMA * (s + pltpu.roll(s, n - 1, 0))
    s = s - BETA * (pltpu.roll(d, 1, 0) + d)
    d = d - ALPHA * (s + pltpu.roll(s, n - 1, 0))
    h2 = s.shape[0]
    x_ref[:] = jnp.stack([s, d], axis=1).reshape(h2 * 2, s.shape[1])


def _pick_tile(cols: int, h: int, budget_bytes: int = 8 * 2 ** 20) -> int:
    """Largest 128-multiple column tile whose in+out blocks fit VMEM."""
    per_col = h * 4 * 2  # fp32, input block + output blocks
    tile = max(128, (budget_bytes // per_col) // 128 * 128)
    while cols % tile and tile > 128:
        tile -= 128
    return tile if cols % tile == 0 else cols


@functools.partial(jax.jit, static_argnames=("interpret",))
def lift97_rows_fused(x2d, interpret: bool = False):
    """(H, C) -> (low (H/2, C), high (H/2, C)), fused 9/7 analysis ladder."""
    h, cols = x2d.shape
    tile = _pick_tile(cols, h)
    grid = (cols // tile,)
    return pl.pallas_call(
        _ladder_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((h, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((h // 2, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((h // 2, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((h // 2, cols), x2d.dtype),
                   jax.ShapeDtypeStruct((h // 2, cols), x2d.dtype)),
        interpret=interpret,
    )(x2d)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ilift97_rows_fused(low2d, high2d, interpret: bool = False):
    """Exact inverse of :func:`lift97_rows_fused`."""
    h2, cols = low2d.shape
    tile = _pick_tile(cols, h2 * 2)
    grid = (cols // tile,)
    return pl.pallas_call(
        _inverse_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((h2, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((h2, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((h2 * 2, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h2 * 2, cols), low2d.dtype),
        interpret=interpret,
    )(low2d, high2d)


def lift97_1d_pallas(x, axis: int, interpret: bool = False):
    """NHWC drop-in for :func:`..ops.dwt97.lift97_1d` using the fused
    kernel: moves the lifted axis to rows, flattens the rest to cols."""
    moved = jnp.moveaxis(x, axis, 0)
    h = moved.shape[0]
    rest = moved.shape[1:]
    flat = moved.reshape(h, -1)
    low, high = lift97_rows_fused(flat, interpret=interpret)
    low = jnp.moveaxis(low.reshape((h // 2,) + rest), 0, axis)
    high = jnp.moveaxis(high.reshape((h // 2,) + rest), 0, axis)
    return low, high


def ilift97_1d_pallas(low, high, axis: int, interpret: bool = False):
    moved_l = jnp.moveaxis(low, axis, 0)
    moved_h = jnp.moveaxis(high, axis, 0)
    h2 = moved_l.shape[0]
    rest = moved_l.shape[1:]
    out = ilift97_rows_fused(moved_l.reshape(h2, -1),
                             moved_h.reshape(h2, -1), interpret=interpret)
    return jnp.moveaxis(out.reshape((h2 * 2,) + rest), 0, axis)
