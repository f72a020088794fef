"""Benchmark: flagship codec throughput on a Kodak-size image, single chip.

Measures the full surrogate encode+decode path (analysis lifting transform +
entropy-model evaluation + synthesis) on 768x512 RGB — the reference's
``validate`` path workload. Prints ONE JSON line:
``{"metric", "value", "unit", "vs_baseline"}`` with ``vs_baseline`` relative
to the 5 MP/s/chip target from BASELINE.md.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from __graft_entry__ import flagship_config  # noqa: E402
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.models.codec import (  # noqa: E402
    CodecWrapper)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.state import (  # noqa: E402
    init_state, make_eval_step)


def main():
    cfg = flagship_config()
    model = CodecWrapper(cfg)
    h, w = 512, 768  # Kodak portrait orientation
    batch = jnp.zeros((1, h, w, 3), jnp.float32)
    # init params on a small patch (shapes are resolution-agnostic)
    state = init_state(cfg, model, jnp.zeros((1, 64, 64, 3)),
                       jax.random.PRNGKey(0))
    eval_step = make_eval_step(cfg, model)

    img = jax.random.uniform(jax.random.PRNGKey(1), (1, h, w, 3))
    # warmup / compile
    out = eval_step(state.params, img)
    jax.block_until_ready(out.loss)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = eval_step(state.params, img)
    jax.block_until_ready(out.loss)
    dt = time.perf_counter() - t0

    mp_per_s = (h * w / 1e6) * iters / dt
    print(json.dumps({
        "metric": "kodak_flagship_surrogate_encdec_throughput",
        "value": round(mp_per_s, 4),
        "unit": "MP/s/chip",
        "vs_baseline": round(mp_per_s / 5.0, 4),
    }))


if __name__ == "__main__":
    main()
