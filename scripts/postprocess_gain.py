"""Postprocess (restoration) RD evidence — VERDICT r3 item 6.

The reference's ``train_postprocess`` stage (``agents/liftingDWT_agent.py:
113-152``) freezes a trained codec and trains a restoration net on its
reconstructions; the claimed benefit is a PSNR gain at unchanged bpp (the
restoration runs decoder-side, after entropy decoding). This script
produces that artifact for the rebuild:

1. restore a trained flagship lambda point from the RD sweep
   (``experiments/rd_sweep/flagship/lam_<lam>``),
2. run the postprocess training stage (``train/postprocess_loop.py``,
   default net ``iwave`` = iWave++-style residual restoration, reference
   ``post_processing_networks.py:39-77``) on the same streaming corpus,
3. evaluate every held-out eval image with and without restoration —
   the codec reconstruction is the deterministic round-quantize decode,
   bit-identical to the real-bitstream decode (decode-consistency tests in
   tests/test_coding.py), so the PSNR delta applies verbatim to the coded
   path at the recorded bpp of ``results/rd_flagship.json``.

Writes ``results/postprocess_gain.json``. Run under the supervisor:

  python -m ...train.supervisor --timeout 900 --max-restarts 100 -- \
      python scripts/postprocess_gain.py --lam 400 --steps 15000
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

import numpy as np  # noqa: E402

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.utils.compile_cache import (  # noqa: E402
    enable_compile_cache)

enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lam", type=float, default=400.0)
    ap.add_argument("--steps", type=int, default=15000)
    ap.add_argument("--net", default="iwave")
    ap.add_argument("--preset", default="flagship")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from rd_sweep import build_dirs, make_cfg
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.models.postprocess import (
        make_postprocess)
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.loop import (
        LiftingDWTAgent)
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.postprocess_loop import (
        train_postprocess)
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.state import (
        apply_color_forward)

    train_dir, eval_dir = build_dirs(ROOT)
    cfg = make_cfg(args.preset, args.lam, args.steps, train_dir, eval_dir,
                   ROOT)
    cfg.postprocess = args.net
    cfg.resume_training = True
    # fewer, longer epochs: the pp loop validates after every epoch
    cfg.steps_per_epoch = 2500
    cfg.max_epoch = max(1, args.steps // cfg.steps_per_epoch)

    agent = LiftingDWTAgent(cfg)
    assert agent.current_iteration > 0, (
        f"no trained checkpoint for lam={args.lam:g} — run the RD sweep "
        "first (scripts/rd_sweep.py)")
    codec_iters = int(agent.current_iteration)

    t0 = time.time()
    train_postprocess(agent)  # sets agent.pp_variables
    train_minutes = round((time.time() - t0) / 60, 1)

    pp_model = make_postprocess(cfg)

    @jax.jit
    def eval_pair(codec_params, pp_variables, x):
        """(psnr_codec, psnr_restored) on one [0,1] RGB image."""
        xs, xhat, _, _, _ = apply_color_forward(
            cfg, agent.model, codec_params, x, False, None)
        restored = pp_model.apply(pp_variables, xhat + 0.5, False) - 0.5

        def _psnr(a, b):
            mse = jnp.mean((a - jnp.clip(b, -0.5, 0.5)) ** 2)
            return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))

        return _psnr(xs, xhat), _psnr(xs, restored)

    from PIL import Image

    files = sorted(f for f in os.listdir(eval_dir) if f.endswith(".png"))
    per_image = []
    for f in files:
        img = np.asarray(Image.open(os.path.join(eval_dir, f))
                         .convert("RGB")).astype(np.float32)[None] / 255.0
        p0, p1 = eval_pair(agent.state.params, agent.pp_variables,
                           jnp.asarray(img))
        agent.heartbeat.beat()
        per_image.append({"image": f, "psnr_codec": round(float(p0), 3),
                          "psnr_restored": round(float(p1), 3),
                          "gain_db": round(float(p1 - p0), 3)})
        print(f"{f}: {float(p0):.3f} -> {float(p1):.3f} dB "
              f"({float(p1 - p0):+.3f})", flush=True)

    gains = [p["gain_db"] for p in per_image]
    out = {
        "preset": args.preset, "lambda": args.lam, "net": args.net,
        "pp_steps": args.steps, "codec_iterations": codec_iters,
        "train_minutes": train_minutes,
        "mean_gain_db": round(float(np.mean(gains)), 3),
        "median_gain_db": round(float(np.median(gains)), 3),
        "note": ("restoration is decoder-side: bpp is unchanged from the "
                 "recorded real-bitstream point in results/rd_flagship.json"),
        "per_image": per_image,
    }
    out_path = os.path.join(ROOT, "results", "postprocess_gain.json")
    tmp = out_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(out, fh, indent=1)
    os.replace(tmp, out_path)
    print(f"mean gain {out['mean_gain_db']:+.3f} dB over {len(gains)} "
          f"images -> {out_path}", flush=True)


if __name__ == "__main__":
    main()
