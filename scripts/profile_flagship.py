"""Component-level TPU timing for the flagship surrogate path.

Times (slope method, serial-dependent chains — see bench.py) each compute
component of the flagship codec per plane at Kodak batch-8 scale:

- learned lifting ladder fwd+inv (without subband AEs)
- SubbandAutoEncoderBerk encode+decode at level-0 detail shape
- ZTSepSubbands entropy eval over the pyramid
- the full eval_step for reference

Usage: python scripts/profile_flagship.py [--no-fastconv]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.utils.compile_cache import (  # noqa: E402
    enable_compile_cache)

enable_compile_cache()

from __graft_entry__ import flagship_config  # noqa: E402
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.models.codec import (  # noqa: E402
    CodecWrapper)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.models.transforms import (  # noqa: E402
    LearnedLiftingTransform)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.entropy.models import (  # noqa: E402
    ZTSepSubbands)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.ops.subband_ae import (  # noqa: E402
    SubbandAutoEncoderBerk)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.state import (  # noqa: E402
    init_state, make_eval_step)


def timeit(fn, *args, n1=1, n2=5, rounds=3):
    """Per-call seconds via two-chain slope."""

    def chain(n):
        out = None
        x = args
        for _ in range(n):
            out = fn(*x)
        return jax.block_until_ready(out)

    def leaf_scalar(out):
        leaves = jax.tree_util.tree_leaves(out)
        return leaves[0].ravel()[0]

    def chain_dep(n):
        x0 = args[0]
        out = None
        for _ in range(n):
            out = fn(x0, *args[1:])
            x0 = x0 + leaf_scalar(out) * 0.0
        return float(leaf_scalar(out))

    chain_dep(1)  # compile

    def run(n):
        t0 = time.perf_counter()
        chain_dep(n)
        return time.perf_counter() - t0

    return min((run(n2) - run(n1)) / (n2 - n1) for _ in range(rounds))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-fastconv", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    if args.no_fastconv:
        import imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.ops.fast_conv as fc

        def plain(x, kernel, bias=None, dtype=jnp.bfloat16):
            y = jax.lax.conv_general_dilated(
                x.astype(dtype), kernel.astype(dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            if bias is not None:
                y = y + bias
            return y

        fc.conv3x3_im2colT = plain
        print("fastconv DISABLED (plain lax conv)")

    cfg = flagship_config(dtype="bfloat16")
    B, H, W = args.batch, 512, 768
    rng = jax.random.PRNGKey(0)

    # --- full eval step ---
    model = CodecWrapper(cfg)
    state = init_state(cfg, model, jnp.zeros((1, 64, 64, 3)), rng)
    eval_step = make_eval_step(cfg, model)
    img = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3))
    t_full = timeit(lambda x: eval_step(state.params, x), img)
    mp = B * H * W / 1e6
    print(f"full eval_step: {t_full*1e3:8.1f} ms  -> {mp/t_full:6.2f} MP/s")

    # --- lifting transform alone (1 plane) ---
    tr = LearnedLiftingTransform(cfg)
    x1 = jax.random.uniform(rng, (B, H, W, 1))
    tvars = tr.init(rng, x1)

    @jax.jit
    def tr_roundtrip(x):
        def run(m, x):
            xe, xo = m.encode(x)
            return m.decode(xe, xo)
        return tr.apply(tvars, x, method=run)

    t_tr = timeit(tr_roundtrip, x1)
    print(f"transform enc+dec (1 plane, incl AEs): {t_tr*1e3:8.1f} ms  x3 = {3*t_tr*1e3:.1f} ms")

    # --- Berk AE alone at level-0 detail shape ---
    ae = SubbandAutoEncoderBerk(in_ch=3, dtype=jnp.bfloat16)
    d0 = jax.random.uniform(rng, (B, H // 2, W // 2, 3))
    avars = ae.init(rng, d0)

    @jax.jit
    def ae_roundtrip(x):
        def run(m, x):
            return m.decode(m.encode(x))
        return ae.apply(avars, x, method=run)

    t_ae = timeit(ae_roundtrip, d0)
    print(f"Berk AE enc+dec (1 plane, level-0 shape): {t_ae*1e3:8.1f} ms  (pyramid~x1.33, x3 planes = {3*1.328*t_ae*1e3:.1f} ms)")

    # --- entropy model alone (1 plane) ---
    em = ZTSepSubbands(cfg)
    xe = jax.random.uniform(rng, (B, H // 16, W // 16, 1))
    xo = [jax.random.uniform(rng, (B, H >> (i + 1), W >> (i + 1), 3))
          for i in range(cfg.dwtlevels)]
    evars = em.init({"params": rng, "noise": rng}, xe, xo, False)

    @jax.jit
    def em_eval(xe, xo):
        return em.apply(evars, xe, xo, False)

    t_em = timeit(em_eval, xe, xo)
    print(f"entropy eval (1 plane): {t_em*1e3:8.1f} ms  x3 = {3*t_em*1e3:.1f} ms")


if __name__ == "__main__":
    main()
