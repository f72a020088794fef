"""Benchmark: flagship codec throughput on a Kodak-size image, single chip.

Measures the full surrogate encode+decode path (analysis lifting transform +
entropy-model evaluation + synthesis) on 768x512 RGB — the reference's
``validate`` path workload — with bf16 conv compute (fp32 params, fp32
quantization arithmetic). Prints ONE JSON line:
``{"metric", "value", "unit", "vs_baseline"}`` with ``vs_baseline`` relative
to the 5 MP/s/chip target from BASELINE.md.

Measurement method: the tunneled TPU backend's ``block_until_ready`` does
not reliably synchronize and per-call readbacks add ~25 ms RPC latency, so
we time two serially-dependent chains of different lengths and take the
slope — RTT and enqueue effects cancel.
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
    cfg = flagship_config(dtype="bfloat16")
    model = CodecWrapper(cfg)
    h, w = 512, 768  # Kodak portrait orientation
    batch = 8        # batched Kodak eval (BASELINE config 2 workload)
    # init params on a small patch (shapes are resolution-agnostic)
    state = init_state(cfg, model, jnp.zeros((1, 64, 64, 3)),
                       jax.random.PRNGKey(0))
    eval_step = make_eval_step(cfg, model)

    img = jax.random.uniform(jax.random.PRNGKey(1), (batch, h, w, 3))

    def chain(n):
        x = img
        out = None
        for _ in range(n):
            out = eval_step(state.params, x)
            x = img + out.loss * 0.0  # serial dependency
        return float(out.loss)  # one readback

    chain(2)  # warmup / compile

    def run(n):
        t0 = time.perf_counter()
        chain(n)
        return time.perf_counter() - t0

    n1, n2 = 2, 8
    per_iter = min((run(n2) - run(n1)) / (n2 - n1) for _ in range(2))
    mp_per_s = (batch * h * w / 1e6) / per_iter
    print(json.dumps({
        "metric": "kodak_flagship_surrogate_encdec_throughput",
        "value": round(mp_per_s, 4),
        "unit": "MP/s/chip",
        "vs_baseline": round(mp_per_s / 5.0, 4),
    }))


if __name__ == "__main__":
    main()
