"""Fused-halo 3x3 convolution as a Pallas TPU kernel.

Why: the production 3x3 path (``fast_conv.conv3x3_im2colT``) reaches
~26 TFLOP/s bf16 by recasting the conv as one big matmul, but it pays for
that with a materialized im2col buffer — 9x the input read AND written
through HBM before the MXU ever sees it. At the Berk-AE shapes
((8,256,384,96->192) and friends) that traffic is ~40% of the layer's
wall time. This kernel keeps a (TH+2)-row halo tile of the input in VMEM
and accumulates the nine tap matmuls straight into the output block: the
input crosses HBM once, the output once, nothing else.

Design notes (see /opt/skills/guides/pallas_guide.md):
- Grid ``(B, H/TH)``; the batch dim is squeezed, rows are tiled.
- The input arrives pre-padded (H+2, W+2) and is windowed with
  ``pl.Element`` row indexing so consecutive grid steps read overlapping
  (TH+2)-row windows — halo reads without manual DMA.
- Channels ride the lane axis; W rides sublanes. Narrow-channel layers
  (Cin or Cout < 32) waste lanes, so the dispatcher falls back to the
  im2colT path for them (they carry <5% of the FLOPs anyway).
- Nine ``dot_general`` calls per tile with ``preferred_element_type=f32``
  accumulate into the fp32 output block; operands stay bf16 on the MXU.

Training still works: ``conv3x3_halo`` carries a ``custom_vjp`` whose
backward is the spatially-flipped conv (for dx, same kernel) plus one
im2colT-style contraction (for dk). Training runs at 64^2 patches where
the im2col traffic is irrelevant; the fused kernel earns its keep on the
full-resolution eval/encode path.

Reference parity: this computes exactly ``nn.Conv(features, (3,3),
padding='SAME')`` (reference ``graphs/layers/lifting_dwt_nets.py:126-165``
uses torch ``Conv2d(3x3, padding=1)``); unit tests check both values and
gradients against the XLA conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Flipped to True by tests (CPU interpret mode) and by the dispatcher when
# no TPU is attached.
_INTERPRET = False


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _pick_tile_h(h: int, w: int, cin: int, cout: int,
                 dsize: int = 2, budget: int = 11 << 20) -> int:
    """Largest row tile whose VMEM footprint fits the budget.

    Footprint model (padded to the (8,128)/(16,128) tile grid): the input
    halo block double-buffered by the pipeline, the fp32 accumulator, the
    output block, and the full weight stack. ~11 MB of the 16 MB VMEM
    leaves room for Mosaic's own scratch.
    """
    kw = 9 * _round_up(cin, 128) * _round_up(cout, 128) * dsize
    for th in (32, 16, 8, 4, 2, 1):
        xin = 2 * (th + 2) * _round_up(w + 2, 8) * _round_up(cin, 128) * dsize
        out = 2 * th * _round_up(w, 8) * _round_up(cout, 128) * 4
        if xin + 2 * out + kw <= budget:
            return th
    return 0  # nothing fits: caller must use the im2colT path


def _conv_kernel(x_ref, k_ref, o_ref, *, th: int, w: int):
    """One (TH, W, Cout) output tile from a (TH+2, W+2, Cin) halo tile."""
    dn = (((2,), (0,)), ((), ()))  # contract channels, no batch dims
    acc = None
    t = 0
    for du in range(3):
        for dv in range(3):
            xs = x_ref[0, du:du + th, dv:dv + w, :]
            y = jax.lax.dot_general(xs, k_ref[t], dn,
                                    preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
            t += 1
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("dtype", "interpret"))
def _conv3x3_halo_fwd(x, kernel, dtype=jnp.bfloat16, interpret=False):
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    th = _pick_tile_h(h, w, cin, cout, 2 if dtype == jnp.bfloat16 else 4)
    if th == 0:
        raise ValueError(
            f"conv3x3_halo: no row tile fits the VMEM budget for shape "
            f"{x.shape} -> {cout}; gate calls with supported()")
    # Ragged heights: pad rows up to a tile multiple (the pad rows are
    # zeros past the conv's own 1-row zero pad, so rows < h are exact) and
    # slice the valid output.
    hp = _round_up(h, th)
    xp = jnp.pad(x.astype(dtype),
                 ((0, 0), (1, 1 + hp - h), (1, 1), (0, 0)))
    kr = kernel.reshape(9, cin, cout).astype(dtype)
    grid = (b, hp // th)
    y = pl.pallas_call(
        functools.partial(_conv_kernel, th=th, w=w),
        grid=grid,
        in_specs=[
            pl.BlockSpec((pl.Element(1), pl.Element(th + 2),
                          pl.Element(w + 2), pl.Element(cin)),
                         lambda bi, i: (bi, i * th, 0, 0)),
            pl.BlockSpec((9, cin, cout), lambda bi, i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, th, w, cout),
                               lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, cout), jnp.float32),
        interpret=interpret,
    )(xp, kr)
    return y if hp == h else y[:, :h]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_halo(x, kernel, dtype=jnp.bfloat16):
    """SAME 3x3 conv, NHWC, zero padding; fused Pallas halo kernel.

    kernel: (3, 3, Cin, Cout) (flax layout); output fp32 NHWC.
    """
    return _conv3x3_halo_fwd(x, kernel, dtype, _INTERPRET)


def _fwd(x, kernel, dtype):
    return conv3x3_halo(x, kernel, dtype), (x, kernel)


def _bwd(dtype, res, dy):
    x, kernel = res
    b, h, w, cin = x.shape
    # dx: correlate dy with the spatially-flipped, in/out-swapped kernel.
    k_flip = kernel[::-1, ::-1].transpose(0, 1, 3, 2)  # (3,3,Cout,Cin)
    dx = _conv3x3_halo_fwd(dy, k_flip, dtype, _INTERPRET)
    # dk[du,dv,c,o] = sum_{b,y,x} x[b, y+du-1, x+dv-1, c] * dy[b,y,x,o]
    xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, i:i + h, j:j + w, :].reshape(b * h * w, cin)
            for i in range(3) for j in range(3)]
    patches = jnp.stack(cols, 0)                       # (9, BHW, Cin)
    dyf = dy.reshape(b * h * w, -1).astype(dtype)      # (BHW, Cout)
    dk = jax.lax.dot_general(
        patches, dyf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (9, Cin, Cout)
    return dx.astype(x.dtype), dk.reshape(kernel.shape).astype(kernel.dtype)


conv3x3_halo.defvjp(_fwd, _bwd)


def supported(x_shape, cin: int, cout: int, dsize: int = 2) -> bool:
    """Shapes where the fused kernel beats the im2colT path (and fits the
    VMEM budget — pathological width/channel combinations fall back).

    The spatial floor is measured, not modeled: at the flagship's finest
    level ((8,256,384), HW=98k) the fused kernel wins 1.0-1.6x, but one
    pyramid level down ((8,128,192), HW=24k) the im2colT matmul runs 1.45x
    FASTER (55 vs 38 TF/s — the whole im2col buffer is cache/VMEM-friendly
    at that size while the kernel's per-tile overheads stop amortizing), so
    mid-pyramid shapes stay on im2colT (`scripts/bench_pallas_conv.py`)."""
    _, h, w, _ = x_shape
    return (cin >= 32 and cout >= 32 and h >= 2 and (w % 8) == 0
            and h * w >= 65536
            and _pick_tile_h(h, w, cin, cout, dsize) > 0)
