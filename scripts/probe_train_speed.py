"""Probe flagship train-step throughput across (batch, patch, k) configs.

The RD sweep's wall-clock is dominated by the train step; this measures the
practical steps/s (including tunnel RTT + metric readback, exactly as the
agent pays it) for candidate shapes so the sweep runs the fastest one.

Usage:
  python scripts/probe_train_speed.py --configs 8x64x10,2x128x10,8x64x1
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.utils.compile_cache import (  # noqa: E402
    enable_compile_cache)

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def probe(batch: int, patch: int, k: int, chunks: int = 8) -> float:
    from __graft_entry__ import flagship_config
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.models.codec import (
        CodecWrapper)
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.state import (
        init_state, make_chained_train_step, make_optimizer, make_train_step)

    cfg = flagship_config(lambda_=400.0, batch_size=batch, patch_size=patch,
                          steps_per_call=k, dtype="bfloat16")
    model = CodecWrapper(cfg)
    tx = make_optimizer(cfg)
    rng = jax.random.PRNGKey(0)
    state = init_state(cfg, model, jnp.zeros((batch, patch, patch, 3)), rng)
    lr = jnp.asarray(1e-4, jnp.float32)
    one = jnp.asarray(1.0, jnp.float32)
    rs = np.random.RandomState(0)

    if k > 1:
        step = make_chained_train_step(cfg, model, tx)

        def run(i):
            nonlocal state
            data = jnp.asarray(rs.randint(
                0, 256, (k, batch, patch, patch, 3), np.uint8))
            keys = jax.random.split(jax.random.PRNGKey(i), k)
            state, ms = step(state, data, keys, lr, one)
            return float(np.asarray(ms)[-1, 0])
    else:
        step = make_train_step(cfg, model, tx)

        def run(i):
            nonlocal state
            data = jnp.asarray(rs.randint(
                0, 256, (batch, patch, patch, 3), np.uint8
            ).astype(np.float32) / 255.0)
            state, out, _ = step(state, data, jax.random.PRNGKey(i), lr, one)
            return float(out.loss)

    t0 = time.time()
    run(0)
    print(f"  first call (compile): {time.time() - t0:.1f}s", flush=True)
    run(1)  # second call: exclude any residual autotune
    t0 = time.time()
    for i in range(chunks):
        run(2 + i)
    dt = time.time() - t0
    sps = chunks * k / dt
    mpixps = sps * batch * patch * patch / 1e6
    print(f"  batch={batch} patch={patch} k={k}: {sps:.2f} steps/s "
          f"({dt / chunks * 1000:.0f} ms/call, {mpixps:.2f} MPix/s)",
          flush=True)
    return sps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="8x64x10,2x128x10,8x64x1",
                    help="comma list of BxPxK")
    ap.add_argument("--chunks", type=int, default=8)
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    for spec in args.configs.split(","):
        b, p, k = (int(v) for v in spec.split("x"))
        print(f"config {spec}:", flush=True)
        probe(b, p, k, chunks=args.chunks)


if __name__ == "__main__":
    main()
