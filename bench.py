"""Benchmark: flagship codec throughput on a Kodak-size image, single chip.

Measures the full surrogate encode+decode path (analysis lifting transform +
entropy-model evaluation + synthesis) on 768x512 RGB — the reference's
``validate`` path workload — with bf16 conv compute (fp32 params, fp32
quantization arithmetic). Prints the headline JSON line
``{"metric", "value", "unit", "vs_baseline"}`` (``vs_baseline`` relative to
the 5 MP/s/chip target from BASELINE.md) THE MOMENT it is measured, then
attempts the real-bitstream coding extras and re-prints the merged line.
A timeout or crash in the extras can therefore never erase the headline
(VERDICT r4 item 1: round 4 recorded NO number because one late phase hung).

Deadline contract: the whole run is wall-clock-bounded by ``BENCH_DEADLINE_S``
(default 1200 s), carried across backend-retry re-execs via ``BENCH_T0``.
Backend retries, surrogate sampling rounds, and each coding model check the
remaining budget and degrade gracefully (fewer samples / skipped models,
recorded in ``extra``) instead of overrunning.

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

# Wall-clock budget, shared across re-execs (BENCH_T0 pins the epoch start).
_DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "1200"))
_T0 = float(os.environ.get("BENCH_T0", str(time.time())))
os.environ.setdefault("BENCH_T0", str(_T0))


def _remaining() -> float:
    return _DEADLINE_S - (time.time() - _T0)


def _emit(obj, out=None):
    """Print ONE JSON line and flush immediately — the driver must see the
    headline even if the process is killed right after."""
    out = out if out is not None else sys.stdout
    out.write(json.dumps(obj) + "\n")
    out.flush()


def _probe_backend_with_retry(max_retries: int = 10):
    """The TPU here is reached through a tunneled relay that drops
    occasionally (UNAVAILABLE backend-init errors). jax caches backend-init
    failure per process, so on failure we sleep and re-exec this script —
    bounded by BENCH_RETRY *and by the remaining wall-clock budget* —
    instead of failing the whole benchmark run.
    """
    import threading

    state = {}

    def probe():
        try:
            state["devices"] = jax.devices()
        except Exception as e:  # noqa: BLE001 — report any init failure
            state["error"] = e

    # A healthy tunnel answers in seconds; a down tunnel can block ~25 min
    # before raising. Cap the probe by the remaining budget so one hung
    # probe can't eat the whole deadline.
    probe_s = max(60.0, min(300.0, _remaining() - 60.0))
    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout=probe_s)
    if "devices" in state:
        return
    err = state.get("error", f"backend probe hung >{probe_s:.0f}s")
    tries = int(os.environ.get("BENCH_RETRY", "0"))
    if tries >= max_retries or _remaining() < 120.0:
        raise RuntimeError(
            f"backend unavailable after {tries} retries "
            f"({_remaining():.0f}s budget left): {err}")
    wait_s = min(240.0, max(15.0, _remaining() - 420.0))
    print(f"backend unavailable ({err}); retry {tries + 1}/{max_retries} "
          f"in {wait_s:.0f}s ({_remaining():.0f}s budget left)",
          file=sys.stderr)
    time.sleep(wait_s)
    env = dict(os.environ, BENCH_RETRY=str(tries + 1), BENCH_T0=str(_T0))
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


def run_bench(surrogate_fn, coding_fn, out=None):
    """Output contract (unit-tested on CPU, tests/test_bench_output.py):
    emit the headline line as soon as ``surrogate_fn`` returns; run
    ``coding_fn`` best-effort; re-emit the merged line. The last parseable
    JSON line is always the most complete measurement available."""
    headline = surrogate_fn()
    _emit(headline, out)
    extra = dict(headline.get("extra") or {})
    try:
        extra.update(coding_fn())
    except Exception as e:  # noqa: BLE001 — extras must never kill the run
        extra["coding_error"] = f"{type(e).__name__}: {e}"[:300]
    merged = dict(headline)
    merged["extra"] = extra
    _emit(merged, out)
    return merged


def bench_surrogate():
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
    # the tunneled backend is high-variance window to window: up to 5
    # rounds (budget-bounded, min 1), keep the min (the clean-window
    # estimate), report the spread
    samples = []
    while len(samples) < 5:
        samples.append((run(n2) - run(n1)) / (n2 - n1))
        if len(samples) >= 1 and _remaining() < 240.0:
            break
    per_iter = min(samples)
    spread = ((max(samples) - min(samples)) / min(samples)
              if len(samples) > 1 else 0.0)
    mp_per_s = (batch * h * w / 1e6) / per_iter
    return {
        "metric": "kodak_flagship_surrogate_encdec_throughput",
        "value": round(mp_per_s, 4),
        "unit": "MP/s/chip",
        "vs_baseline": round(mp_per_s / 5.0, 4),
        "extra": {"surrogate_timing_spread": round(spread, 3),
                  "surrogate_timing_samples": len(samples)},
    }


def bench_real_coding():
    """Real-bitstream enc+dec seconds/image at Kodak size for the three
    headline entropy models (tracked so coding-path regressions are visible
    to the driver; VERDICT round 1 item 8). Untrained nets — throughput,
    not RD, is the observable. Skippable via BENCH_CODING=0; each model is
    gated on the remaining wall-clock budget and skipped models are
    recorded in ``coding_skipped``."""
    import numpy as np

    if os.environ.get("BENCH_CODING", "1") == "0":
        return {}
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding.codec_coder import (
        CodecCoder)

    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.data import (
        synthetic_natural_images)

    out = {}
    skipped = []
    # natural-statistics content (dead-leaves + 1/f): uniform noise is
    # max-entropy and pathological for the coder (every symbol near the
    # escape range), which over-reports coding time vs photographic input
    img = np.asarray(synthetic_natural_images(1, 512, seed=2)[0],
                     np.float32)[None] / 255.0
    img = np.concatenate([img, img[:, :, :256]], axis=2)  # (1,512,768,3)
    zt_coder = None
    for name, entropy in (("ztsep", "conditioned2ZTsepSubbands"),
                          ("onlyEZWT", "onlyEZWT"),
                          ("ztblock", "DWTConditioned2EntropyLayerZTBlock")):
        # Cold compiles for one model can run minutes; with the on-disk
        # cache warm (scripts/prewarm_bench.py) this gate never trips.
        if _remaining() < 180.0:
            skipped.append(name)
            continue
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
    if zt_coder is not None and _remaining() > 120.0:
        n_img = 4
        imgs = []
        for s in range(n_img):
            im = np.asarray(synthetic_natural_images(1, 512, seed=10 + s)[0],
                            np.float32)[None] / 255.0
            imgs.append(np.concatenate([im, im[:, :, :256]], axis=2))
        # workers=1: image-level threading ON TOP of the coder's internal
        # per-plane threading is pathological over the single tunneled
        # stream — measured 25 s/img pipelined vs 5.4 s/img serial
        # (2026-08-21, two reproducible runs): six concurrent dispatch
        # chains multiply every RTT. Sequential images, each internally
        # plane-pipelined, is the honest best configuration here.
        t0 = time.perf_counter()
        results = zt_coder.compress_decompress_many(imgs, workers=1)
        dt = time.perf_counter() - t0
        assert all(np.isfinite(r.psnr) for r in results)
        out["coded_throughput_mps"] = round(n_img * (512 * 768 / 1e6) / dt, 4)
    elif zt_coder is not None:
        skipped.append("coded_throughput")
    if skipped:
        out["coding_skipped"] = skipped
    return out


def main():
    _stop_background_runs()
    _probe_backend_with_retry()
    run_bench(bench_surrogate, bench_real_coding)


if __name__ == "__main__":
    main()
