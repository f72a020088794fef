"""A/B micro-bench: lowering variants for the ZTsep entropy model's
grouped context ops at flagship per-plane shapes (VERDICT r3 item 8).

Candidates:
- csc  (masked 5x5 grouped conv, 3 groups of 1->81): lax grouped conv vs
  25-tap im2colT batched matmul (einsum over the group axis).
- cgp  (grouped 1x1 stack 486->486->162->54->6, 3 groups): lax grouped conv
  chain vs block-diagonal einsum chain.
- plc layer 2 (dense 243->243 3x3): im2colT vs Pallas (for reference).
- GDN channel matmul at Berk-AE widths.

Run with a quiet tunnel. Usage: python scripts/bench_entropy_parts.py
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
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.ops.masked_conv import (  # noqa: E402
    causal_mask, masked_conv2d)

B, H, W = 8, 256, 384   # level-0 detail shape per plane (Kodak, clrch=1)
G, CPG = 3, 81          # groups, out-channels per group
DT = jnp.bfloat16


def slope_time(fn, *args, n1=2, n2=10, rounds=5):
    @jax.jit
    def chain_step(x, *rest):
        y = fn(x, *rest)
        return x + y.mean().astype(x.dtype) * 0.0, y

    def chain(n):
        xc = args[0]
        out = None
        for _ in range(n):
            xc, out = chain_step(xc, *args[1:])
        return float(out.mean())

    chain(2)
    samples = []
    for _ in range(rounds):
        t0 = time.perf_counter(); chain(n1); t1 = time.perf_counter()
        chain(n2); t2 = time.perf_counter()
        samples.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return min(samples)


# ---------------------------------------------------------------- csc

def csc_lax(x, kernel):
    """Current lowering: grouped masked conv via lax (mask pre-folded)."""
    return masked_conv2d(x.astype(DT), kernel.astype(DT), None, "A", G)


def csc_taps(x, kernel):
    """25-tap im2colT batched matmul (the shipping fast path)."""
    mask = jnp.asarray(causal_mask((5, 5), "A"), kernel.dtype)
    k = kernel * mask[:, :, None, None]
    return fast_conv.grouped_conv_taps(x, k, None, groups=G, dtype=DT)


# ---------------------------------------------------------------- cgp

CGP_FEATS = (486, 486, 162, 54, 6)   # in -> chain of grouped 1x1 outputs


def cgp_lax(x, kernels):
    y = x.astype(DT)
    for k in kernels:
        y = jax.lax.conv_general_dilated(
            y, k.astype(DT), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=G)
        y = jax.nn.leaky_relu(y)
    return y.astype(jnp.float32)


def cgp_einsum(x, kernels):
    """Block-diagonal einsum chain (the shipping fast path)."""
    y = x
    for k in kernels:
        y = fast_conv.grouped_conv1x1_einsum(y, k, None, groups=G, dtype=DT)
        y = jax.nn.leaky_relu(y)
    return y.astype(jnp.float32)


def main():
    print(jax.devices())
    rng = jax.random.PRNGKey(0)

    # csc
    x = jax.random.uniform(rng, (B, H, W, G), jnp.float32)
    k5 = jax.random.normal(rng, (5, 5, 1, G * CPG), jnp.float32) * 0.05
    ref = csc_lax(x, k5)
    alt = csc_taps(x, k5)
    err = float(jnp.max(jnp.abs(ref - alt)))
    t0 = slope_time(csc_lax, x, k5)
    t1 = slope_time(csc_taps, x, k5)
    print(f"csc 5x5A grouped {x.shape}->{G*CPG}: lax {t0*1e3:7.2f} ms | "
          f"taps {t1*1e3:7.2f} ms | speedup {t0/t1:4.2f}x | maxerr {err:.3e}")

    # cgp
    xg = jax.random.uniform(rng, (B, H, W, CGP_FEATS[0]), jnp.float32)
    ks = []
    cin = CGP_FEATS[0]
    for co in CGP_FEATS[1:]:
        ks.append(jax.random.normal(rng, (1, 1, cin // G, co),
                                    jnp.float32) * 0.05)
        cin = co
    ref = cgp_lax(xg, ks)
    alt = cgp_einsum(xg, ks)
    err = float(jnp.max(jnp.abs(ref - alt)))
    t0 = slope_time(lambda x: cgp_lax(x, ks), xg)
    t1 = slope_time(lambda x: cgp_einsum(x, ks), xg)
    print(f"cgp 1x1 grouped chain {CGP_FEATS}: lax {t0*1e3:7.2f} ms | "
          f"einsum {t1*1e3:7.2f} ms | speedup {t0/t1:4.2f}x | "
          f"maxerr {err:.3e}")

    # plc layer 2 reference point
    xp = jax.random.uniform(rng, (B, H, W, 243), jnp.float32)
    kp = jax.random.normal(rng, (3, 3, 243, 243), jnp.float32) * 0.02
    t_i = slope_time(lambda x, k: fast_conv.conv3x3_im2colT(x, k), xp, kp)
    t_p = slope_time(lambda x, k: pallas_conv.conv3x3_halo(x, k), xp, kp)
    fl = 2 * B * H * W * 9 * 243 * 243
    print(f"plc 3x3 243->243: im2colT {t_i*1e3:7.2f} ms "
          f"({fl/t_i/1e12:5.1f} TF/s) | pallas {t_p*1e3:7.2f} ms "
          f"({fl/t_p/1e12:5.1f} TF/s)")

    # GDN channel matmul at AE width
    for c in (96, 192):
        xg = jax.random.uniform(rng, (B, H, W, c), jnp.float32)
        g = jax.random.uniform(rng, (c, c), jnp.float32) * 0.1

        def gdn_norm(x, g):
            xc = x.astype(DT)
            n = jnp.einsum("...j,ij->...i", xc * xc, g.astype(DT),
                           preferred_element_type=jnp.float32)
            return x / jnp.sqrt(n + 1.0)

        t = slope_time(gdn_norm, xg, g)
        fl = 2 * B * H * W * c * c
        print(f"GDN c={c}: {t*1e3:7.2f} ms ({fl/t/1e12:5.1f} TF/s)")


if __name__ == "__main__":
    main()
