"""Per-sublayer timing of the Berk scaling AE on TPU.

The r4 flagship profile puts the Berk AEs at ~220 ms of a ~405 ms eval
step; `scripts/bench_pallas_conv.py` covers only its two wide 3x3 convs
(96->192, 192->96). This breaks the whole AE down — narrow in/out convs,
GDN/IGDN at both widths, per pyramid level — so optimization effort lands
where the milliseconds actually are. Run with the TPU queue paused.

Usage: python scripts/bench_ae_parts.py
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
    fast_conv, gdn as gdn_mod)


def slope_time(step, args, n1=2, n2=12, rounds=3):
    """Serial-chain slope timing (see bench.py): RTT/enqueue cancel."""
    def chain(n):
        out = None
        x = args[0]
        for _ in range(n):
            x, out = step(x, *args[1:])
        return float(out.mean())

    chain(2)
    samples = []
    for _ in range(rounds):
        t0 = time.perf_counter(); chain(n1); t1 = time.perf_counter()
        chain(n2); t2 = time.perf_counter()
        samples.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return min(samples)


def conv_cases(shape, cout):
    b, h, w, cin = shape
    x = jax.random.uniform(jax.random.PRNGKey(0), shape, jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                          jnp.float32) * 0.05

    @jax.jit
    def lax_step(x, k):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)
        return x + y.mean() * 0.0, y

    @jax.jit
    def im2colT_step(x, k):
        y = fast_conv.conv3x3_im2colT(x, k)
        return x + y.mean() * 0.0, y

    fl = 2 * 9 * cin * cout * b * h * w
    tl = slope_time(lax_step, (x, k))
    ti = slope_time(im2colT_step, (x, k))
    print(f"conv {shape}->{cout}: lax {tl*1e3:7.3f} ms "
          f"({fl/tl/1e12:5.1f} TF/s) | im2colT {ti*1e3:7.3f} ms "
          f"({fl/ti/1e12:5.1f} TF/s)")


def gdn_case(shape):
    b, h, w, c = shape
    x = jax.random.uniform(jax.random.PRNGKey(0), shape, jnp.float32) + 0.1
    mod = gdn_mod.GDN(c, dtype=jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(2), x)

    @jax.jit
    def step(x, params):
        y = mod.apply(params, x)
        return x + y.mean() * 0.0, y

    t = slope_time(step, (x, params))
    fl = 2 * c * c * b * h * w  # the 1x1 matmul; elementwise is extra
    print(f"gdn  {shape}: {t*1e3:7.3f} ms (matmul-only {fl/t/1e12:5.1f} TF/s)")


def main():
    print(jax.devices())
    # Berk AE (clrch=1 plane): detail pack in_ch=3, hidden 64 -> 96/192
    for lvl, (h, w) in enumerate(((256, 384), (128, 192), (64, 96))):
        print(f"-- level {lvl} ({h}x{w}) --")
        conv_cases((8, h, w, 3), 96)
        conv_cases((8, h, w, 96), 192)
        conv_cases((8, h, w, 192), 96)
        conv_cases((8, h, w, 96), 3)
        gdn_case((8, h, w, 96))
        gdn_case((8, h, w, 192))


if __name__ == "__main__":
    main()
