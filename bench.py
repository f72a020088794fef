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
import os
import sys
import time

import jax
import jax.numpy as jnp


def _probe_backend_with_retry(max_retries: int = 10, wait_s: float = 240.0):
    """The TPU here is reached through a tunneled relay that drops
    occasionally (UNAVAILABLE backend-init errors). jax caches backend-init
    failure per process, so on failure we sleep and re-exec this script —
    bounded by BENCH_RETRY — instead of failing the whole benchmark run.
    """
    import threading

    state = {}

    def probe():
        try:
            state["devices"] = jax.devices()
        except Exception as e:  # noqa: BLE001 — report any init failure
            state["error"] = e

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout=300.0)  # a healthy tunnel answers in seconds
    if "devices" in state:
        return
    err = state.get("error", "backend probe hung >300s")
    tries = int(os.environ.get("BENCH_RETRY", "0"))
    if tries >= max_retries:
        raise RuntimeError(f"backend unavailable after {tries} retries: "
                           f"{err}")
    print(f"backend unavailable ({err}); retry {tries + 1}/{max_retries} "
          f"in {wait_s:.0f}s", file=sys.stderr)
    time.sleep(wait_s)
    env = dict(os.environ, BENCH_RETRY=str(tries + 1))
    # execve replaces the process (incl. a probe thread stuck in C code)
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.utils.compile_cache import (  # noqa: E402
    enable_compile_cache)

enable_compile_cache()

sys.path.insert(0, ".")

from __graft_entry__ import flagship_config  # noqa: E402
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.models.codec import (  # noqa: E402
    CodecWrapper)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.state import (  # noqa: E402
    init_state, make_eval_step)


def _stop_background_runs():
    """The driver runs this bench unattended at round end, possibly while a
    long supervised training run still holds the TPU and the single CPU
    core; measuring under that contention corrupts both the surrogate and
    the coding numbers. Stop known background runs first — strictly by
    recorded PID from our own pid files (never by name/pattern): any
    ``/tmp/rd_sweep*.pid`` / ``/tmp/probe*.pid`` written by a launcher or
    by ``train/supervisor.py --pidfile``. Before signaling, the PID's
    ``/proc`` cmdline must look like one of our runs (a recycled PID after
    a stale pidfile must never be killed); the pidfile is removed once its
    process is gone. SIGTERM to the supervisor makes it SIGKILL its child
    process group (``supervisor._terminate``); the agent checkpoints every
    ``save_every_epochs`` so at most ~2500 steps are lost.
    """
    import glob
    import signal

    def _is_ours(pid: int) -> bool:
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as fh:
                cmd = fh.read().replace(b"\0", b" ").decode(errors="ignore")
        except OSError:
            return False
        return any(k in cmd for k in
                   ("supervisor", "rd_sweep", "probe_train_speed",
                    "tpu_queue", "postprocess_gain", "headtohead"))

    # BENCH_KEEP_BG=1: interactive mid-session measurement with the queue
    # deliberately idle/paused — skip the cleanup (the unattended driver
    # run at round end never sets it).
    if os.environ.get("BENCH_KEEP_BG") == "1":
        return

    # Queue shells (serialized job runners, /tmp/tpu_queue*.pid) would
    # launch their NEXT job right after we stop the current one — drop the
    # stop-file first (queues exit at the next job boundary) and stop the
    # shells before their supervised children.
    try:
        with open("/tmp/queue_stop", "w") as fh:
            fh.write("bench\n")
    except OSError:
        pass

    killed = False
    for pidfile in sorted(set(glob.glob("/tmp/tpu_queue*.pid"))) + \
            sorted(set(glob.glob("/tmp/rd_sweep*.pid")
                       + glob.glob("/tmp/probe*.pid"))):
        try:
            pid = int(open(pidfile).read().strip())
        except (OSError, ValueError):
            continue
        try:
            if not _is_ours(pid):
                raise ProcessLookupError  # dead or recycled: just clean up
            os.kill(pid, signal.SIGTERM)
        except ProcessLookupError:
            try:
                os.remove(pidfile)
            except OSError:
                pass
            continue
        killed = True
        print(f"bench: stopping background run pid={pid} ({pidfile})",
              file=sys.stderr)
        for _ in range(20):
            time.sleep(1)
            try:
                os.kill(pid, 0)
            except ProcessLookupError:
                break
        else:
            try:
                os.kill(pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
        try:
            os.remove(pidfile)
        except OSError:
            pass
    if killed:
        time.sleep(10)  # let the backend free the held buffers


def main():
    _stop_background_runs()
    _probe_backend_with_retry()
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
    # the tunneled backend is high-variance window to window: 5 rounds,
    # keep the min (the clean-window estimate), report the spread
    samples = [(run(n2) - run(n1)) / (n2 - n1) for _ in range(5)]
    per_iter = min(samples)
    spread = (max(samples) - min(samples)) / min(samples)
    mp_per_s = (batch * h * w / 1e6) / per_iter
    extra = {"surrogate_timing_spread": round(spread, 3)}
    extra.update(bench_real_coding())
    print(json.dumps({
        "metric": "kodak_flagship_surrogate_encdec_throughput",
        "value": round(mp_per_s, 4),
        "unit": "MP/s/chip",
        "vs_baseline": round(mp_per_s / 5.0, 4),
        "extra": extra,
    }))


def bench_real_coding():
    """Real-bitstream enc+dec seconds/image at Kodak size for the two
    headline entropy models (tracked so coding-path regressions are visible
    to the driver; VERDICT round 1 item 8). Untrained nets — throughput,
    not RD, is the observable. Skippable via BENCH_CODING=0."""
    import os

    import numpy as np

    if os.environ.get("BENCH_CODING", "1") == "0":
        return {}
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding.codec_coder import (
        CodecCoder)

    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.data import (
        synthetic_natural_images)

    out = {}
    # natural-statistics content (dead-leaves + 1/f): uniform noise is
    # max-entropy and pathological for the coder (every symbol near the
    # escape range), which over-reports coding time vs photographic input
    img = np.asarray(synthetic_natural_images(1, 512, seed=2)[0],
                     np.float32)[None] / 255.0
    img = np.concatenate([img, img[:, :, :256]], axis=2)  # (1,512,768,3)
    zt_coder = None
    for name, entropy in (("onlyEZWT", "onlyEZWT"),
                          ("ztsep", "conditioned2ZTsepSubbands"),
                          ("ztblock", "DWTConditioned2EntropyLayerZTBlock")):
        cfg = flagship_config(entropy_layer=entropy)
        model = CodecWrapper(cfg)
        state = init_state(cfg, model, jnp.zeros((1, 64, 64, 3)),
                           jax.random.PRNGKey(0))
        coder = CodecCoder(cfg, model, state.params)
        times = []
        for _ in range(2):  # first run pays compiles; keep the min
            t0 = time.perf_counter()
            res = coder.compress_decompress(img)
            times.append(time.perf_counter() - t0)
        assert np.isfinite(res.psnr)
        out[f"{name}_coding_s_per_img"] = round(min(times), 2)
        if name == "ztsep":
            zt_coder = coder
    # Honest end-to-end coded MP/s (VERDICT r3 item 3): N distinct Kodak-
    # size images through the warmed flagship (ZTsep) coder, image-
    # pipelined so host coding work overlaps accelerator dispatches. This
    # is the real transform+entropy-coded number, vs the surrogate headline.
    n_img = 4
    imgs = []
    for s in range(n_img):
        im = np.asarray(synthetic_natural_images(1, 512, seed=10 + s)[0],
                        np.float32)[None] / 255.0
        imgs.append(np.concatenate([im, im[:, :, :256]], axis=2))
    t0 = time.perf_counter()
    results = zt_coder.compress_decompress_many(imgs, workers=2)
    dt = time.perf_counter() - t0
    assert all(np.isfinite(r.psnr) for r in results)
    out["coded_throughput_mps"] = round(n_img * (512 * 768 / 1e6) / dt, 4)
    return out


if __name__ == "__main__":
    main()
