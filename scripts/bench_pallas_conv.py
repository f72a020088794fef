"""A/B: Pallas fused-halo 3x3 conv vs the im2colT matmul conv on TPU.

Times serially-dependent chains (slope method, see bench.py) at the Berk-AE
shapes that dominate the flagship eval path. Run with a quiet tunnel —
a concurrent training sweep adds multi-second queue delays per dispatch.

Usage: python scripts/bench_pallas_conv.py
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
    fast_conv, pallas_conv)

# (B, H, W, Cin) -> Cout at the flagship per-plane eval shapes
SHAPES = [
    ((8, 256, 384, 96), 192),   # Berk AE mid layer, finest level
    ((8, 256, 384, 192), 96),
    ((8, 128, 192, 96), 192),   # level 2
    ((8, 256, 384, 96), 96),    # plc/context-net-like
]


def slope_time(fn, x, k, n1=2, n2=10, rounds=5):
    @jax.jit
    def chain_step(x, k):
        y = fn(x, k)
        # fold output back into the input: serial dependency, same shape
        return x + y.mean() * 0.0, y

    def chain(n):
        xc = x
        out = None
        for _ in range(n):
            xc, out = chain_step(xc, k)
        return float(out.mean())

    chain(2)  # compile
    samples = []
    for _ in range(rounds):
        t0 = time.perf_counter(); chain(n1); t1 = time.perf_counter()
        chain(n2); t2 = time.perf_counter()
        samples.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return min(samples)


def main():
    print(jax.devices())
    for (shape, cout) in SHAPES:
        b, h, w, cin = shape
        x = jax.random.uniform(jax.random.PRNGKey(0), shape, jnp.float32)
        k = jax.random.normal(jax.random.PRNGKey(1),
                              (3, 3, cin, cout), jnp.float32) * 0.05
        t_im2col = slope_time(
            lambda x, k: fast_conv.conv3x3_im2colT(x, k), x, k)
        t_pallas = slope_time(
            lambda x, k: pallas_conv.conv3x3_halo(x, k), x, k)
        flops = 2 * b * h * w * 9 * cin * cout
        print(f"{shape}->{cout}: im2colT {t_im2col*1e3:7.2f} ms "
              f"({flops/t_im2col/1e12:5.1f} TF/s) | pallas "
              f"{t_pallas*1e3:7.2f} ms ({flops/t_pallas/1e12:5.1f} TF/s) "
              f"| speedup {t_im2col/t_pallas:4.2f}x")


if __name__ == "__main__":
    main()
