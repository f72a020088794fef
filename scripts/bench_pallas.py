"""A/B of a fused Pallas 9/7 lifting ladder against the jnp ladder.

DECISION RECORD (measured on the tunneled v5e, slope-method timing): the
XLA-fused jnp ladder WINS at the codec's working shapes — rows 2.13 ms vs
2.89 ms Pallas, full 2D level 1.04 ms vs 2.68 ms at (8,512,768,3); Pallas
only edges ahead (1.22x) at (1,2048,2048,3) single-level. XLA already
fuses the ladder's elementwise passes, and the kernel's layout moves cost
more than the fusion saves, so production keeps the jnp form and the
former ``ops/lifting_pallas.py`` lives here as the benchmarked artifact.
"""

import sys
import time

sys.path.insert(0, ".")

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.utils.compile_cache import (  # noqa: E402
    enable_compile_cache)

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import functools  # noqa: E402

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.ops import (  # noqa: E402
    dwt97)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.ops.math_utils import (  # noqa: E402
    LIFTING_COEFF)

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


def _pick_tile(cols: int, h: int, budget_bytes: int = 2 * 2 ** 20) -> int:
    """Largest 128-multiple column tile whose in+out blocks AND the
    ladder's ~6 live row-pair temporaries fit the 16 MB scoped VMEM (the
    compiler stacks them; an 8 MB in/out budget alone OOMs at Kodak
    shapes)."""
    per_col = h * 4 * 5  # fp32: in + 2 out + ~4 half-height temporaries
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



def timeit(fn, *args, n1=2, n2=10, rounds=3):
    def chain(n):
        out = fn(*args)
        x0 = args[0]
        for _ in range(n - 1):
            x0 = x0 + jax.tree_util.tree_leaves(out)[0].ravel()[0] * 0.0
            out = fn(x0, *args[1:])
        return float(jax.tree_util.tree_leaves(out)[0].ravel()[0])

    chain(1)

    def run(n):
        t0 = time.perf_counter()
        chain(n)
        return time.perf_counter() - t0

    return min((run(n2) - run(n1)) / (n2 - n1) for _ in range(rounds))


def main():
    shapes = [(8, 512, 768, 3), (1, 2048, 2048, 3)]
    for shape in shapes:
        x = jax.random.uniform(jax.random.PRNGKey(0), shape)

        @jax.jit
        def jnp_rows(x):
            return dwt97.lift97_1d(x, axis=1)

        @jax.jit
        def pallas_rows(x):
            return lift97_1d_pallas(x, axis=1)

        @jax.jit
        def jnp_level(x):
            lo, hi = dwt97.lift97_1d(x, axis=1)
            ll, hl = dwt97.lift97_1d(lo, axis=2)
            lh, hh = dwt97.lift97_1d(hi, axis=2)
            return ll, hl, lh, hh

        @jax.jit
        def pallas_level(x):
            lo, hi = lift97_1d_pallas(x, axis=1)
            ll, hl = lift97_1d_pallas(lo, axis=2)
            lh, hh = lift97_1d_pallas(hi, axis=2)
            return ll, hl, lh, hh

        t_j = timeit(jnp_rows, x)
        t_p = timeit(pallas_rows, x)
        t_jl = timeit(jnp_level, x)
        t_pl = timeit(pallas_level, x)
        print(f"{shape}: rows jnp {t_j*1e3:7.2f} ms  pallas {t_p*1e3:7.2f} "
              f"ms ({t_j/t_p:4.2f}x) | level jnp {t_jl*1e3:7.2f} ms  "
              f"pallas {t_pl*1e3:7.2f} ms ({t_jl/t_pl:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
