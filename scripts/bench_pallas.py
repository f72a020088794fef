"""A/B the fused Pallas 9/7 ladder against the jnp ladder on the TPU.

Decides VERDICT round-1 item 10 (wire-or-delete ``ops/lifting_pallas.py``):
the kernel is wired into ``ops.dwt97`` only if it measures faster at the
codec's working shapes. Slope-method timing (see bench.py).
"""

import sys
import time

sys.path.insert(0, ".")

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.utils.compile_cache import (  # noqa: E402
    enable_compile_cache)

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.ops import (  # noqa: E402
    dwt97, lifting_pallas)


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
            return lifting_pallas.lift97_1d_pallas(x, axis=1)

        @jax.jit
        def jnp_level(x):
            lo, hi = dwt97.lift97_1d(x, axis=1)
            ll, hl = dwt97.lift97_1d(lo, axis=2)
            lh, hh = dwt97.lift97_1d(hi, axis=2)
            return ll, hl, lh, hh

        @jax.jit
        def pallas_level(x):
            lo, hi = lifting_pallas.lift97_1d_pallas(x, axis=1)
            ll, hl = lifting_pallas.lift97_1d_pallas(lo, axis=2)
            lh, hh = lifting_pallas.lift97_1d_pallas(hi, axis=2)
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
