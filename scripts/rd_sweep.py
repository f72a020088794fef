"""Multi-lambda RD sweep with REAL-bitstream evaluation (VERDICT item 3).

No photographic corpus ships in this environment (zero egress), so:
- training data = dead-leaves + 1/f synthetic corpus
  (``train/data.py::synthetic_natural_images`` — natural-image statistics)
- held-out eval = unseen dead-leaves images + matplotlib's bundled
  ``grace_hopper.jpg`` photograph
- the comparison anchor = JPEG at matched rates, generated with PIL on the
  SAME eval images, reported as BD-rate via ``tools/rd_plot.py``

Usage:
  python scripts/rd_sweep.py --preset cdf97   --lambdas 50,400,2000 --steps 4000
  python scripts/rd_sweep.py --preset flagship --lambdas 400,2000   --steps 8000

Writes results to ``results/rd_<preset>.json`` after EVERY lambda (safe to
interrupt) and trains on whatever backend jax selects (TPU under the
driver).
"""

import argparse
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.utils.compile_cache import (  # noqa: E402
    enable_compile_cache)

enable_compile_cache()


def _eval_photo_sources():
    """Every real photograph shipped by installed packages (zero egress —
    these are the only non-synthetic images available offline)."""
    import matplotlib

    mpl = os.path.join(os.path.dirname(matplotlib.__file__), "mpl-data",
                       "sample_data")
    cands = [("grace_hopper", os.path.join(mpl, "grace_hopper.jpg"))]
    try:
        import sklearn

        skd = os.path.join(os.path.dirname(sklearn.__file__), "datasets",
                           "images")
        cands += [("sk_china", os.path.join(skd, "china.jpg")),
                  ("sk_flower", os.path.join(skd, "flower.jpg"))]
    except ImportError:
        pass
    try:
        import pygame

        pgd = os.path.join(os.path.dirname(pygame.__file__), "docs",
                           "generated", "_images")
        cands += [("pg_camera", os.path.join(pgd, "camera_rgb.jpg")),
                  ("pg_background", os.path.join(pgd,
                                                 "camera_background.jpg"))]
    except ImportError:
        pass
    return [(n, p) for n, p in cands if os.path.exists(p)]


def build_dirs(root: str):
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.data import (
        write_corpus)

    train_dir = os.path.join(root, "data", "corpus_train")
    eval_dir = os.path.join(root, "data", "corpus_eval")
    # 10x the round-2 corpus (VERDICT r2 item 2: the 160-image corpus
    # overfit at lambda=400). First 160 images are bit-identical to the old
    # corpus (same seed, sequential generation), so resumed checkpoints see
    # a superset of their original data. ~28 ms/img to generate, cached as
    # PNGs on disk.
    write_corpus(train_dir, 1600, 256, seed=0)
    # Held-out set, round-4 size (VERDICT r3 item 4: 5 images were too few
    # for stable BD-rates): 19 unseen dead-leaves seeds (first 4 identical
    # to the round-3 set — same seed, sequential generation) + every real
    # photo shipped by installed packages. Dimensions cropped to a multiple
    # of 64 for the 4-level pyramids.
    write_corpus(eval_dir, 19, 256, seed=9999)
    from PIL import Image

    for name, src in _eval_photo_sources():
        dst = os.path.join(eval_dir, f"{name}.png")
        if os.path.exists(dst):
            continue
        img = np.asarray(Image.open(src).convert("RGB"))
        h, w, _ = img.shape
        img = img[: h - h % 64, : w - w % 64]
        Image.fromarray(img).save(dst)
    return train_dir, eval_dir


def _anchor_points(eval_dir: str, encode):
    """(bpp, psnr) averaged over the eval set for each setting of a PIL
    codec; ``encode(img) -> (buf, decoded)`` per quality setting."""
    from PIL import Image

    files = sorted(os.path.join(eval_dir, f) for f in os.listdir(eval_dir)
                   if f.endswith(".png"))
    bpps, psnrs = [], []
    for f in files:
        img = np.asarray(Image.open(f).convert("RGB"))
        nbytes, dec = encode(img)
        h, w, _ = img.shape
        bpps.append(nbytes * 8.0 / (h * w))
        mse = np.mean((img.astype(np.float64) / 255
                       - dec.astype(np.float64) / 255) ** 2)
        psnrs.append(-10 * np.log10(max(mse, 1e-12)))
    return float(np.mean(bpps)), float(np.mean(psnrs))


def jpeg_anchor(eval_dir: str):
    """(bpp, psnr) averaged over the eval set per JPEG quality."""
    from PIL import Image

    points = []
    for q in (5, 10, 15, 20, 30, 40, 50, 60, 70, 80, 90, 95):
        def enc(img, q=q):
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, "JPEG", quality=q)
            return len(buf.getvalue()), np.asarray(
                Image.open(buf).convert("RGB"))
        points.append(_anchor_points(eval_dir, enc))
    return points


def jpeg2000_anchor(eval_dir: str):
    """Same-corpus JPEG2000 anchor (the paper's headline comparison,
    reference ``README.md:16`` / ``plot_sketcher.py:7-44``), via Pillow's
    OpenJPEG binding. ``quality_layers=[r]`` targets compression ratio r
    (irreversible 9/7 path — the same wavelet family the codec learns)."""
    from PIL import Image, features

    if not features.check("jpg_2000"):   # pragma: no cover - env-dependent
        return None
    points = []
    for rate in (160, 96, 64, 48, 32, 24, 16, 12, 8, 6, 4, 3):
        def enc(img, rate=rate):
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, "JPEG2000", quality_mode="rates",
                                      quality_layers=[rate],
                                      irreversible=True)
            return len(buf.getvalue()), np.asarray(
                Image.open(buf).convert("RGB"))
        points.append(_anchor_points(eval_dir, enc))
    return points


def make_cfg(preset: str, lam: float, steps: int, train_dir: str,
             eval_dir: str, root: str):
    from __graft_entry__ import flagship_config
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.config import Config

    exp = os.path.join(root, "experiments", "rd_sweep", preset,
                       f"lam_{lam:g}")
    steps_per_epoch = 500
    common = dict(
        lambda_=lam, learning_rate=1e-4, batch_size=8, patch_size=64,
        steps_per_epoch=steps_per_epoch,
        max_epoch=max(1, steps // steps_per_epoch),
        validate_every=10 ** 9,  # no mid-run validation; test at the end
        save_every_epochs=5,     # tunnel-drop insurance (~2500 steps)
        loss_prnt_iters=250, training_loss_switch=1,
        steps_per_call=10,   # scan 10 steps/dispatch: the tunneled backend's
        #   ~25-40 ms per-dispatch RTT otherwise dominates the ~20 ms step
        train_data_1=train_dir, test_data=eval_dir, valid_data=eval_dir,
        test_patch_size=0, val_patch_size=256,
        dtype="bfloat16")
    if preset == "flagship":
        cfg = flagship_config(**common)
    elif preset == "cdf97":
        cfg = Config(netType="CDF97", entropy_layer="factorized",
                     autoencoder="SubbandAutoEncoder", clrch=3, dwtlevels=4,
                     **common)
    elif preset == "quincunx":
        # integer-lifting operating point (VERDICT r3 item 7): quincunx
        # split + lif_prec_bits>0 eval-time rounding grid (reference
        # ``lifting_nets.py:196-203``) through the REAL bitstream.
        # SubbandAutoEncoder scaling is required for a meaningful RD
        # point: without it the unscaled detail subbands (std ~0.01-0.05
        # in [-0.5,0.5] input range) are annihilated by the unit
        # quantization bin — the round-5 'none' run converged to 15.6 dB
        # @ 0.69 bpp, i.e. quantized-to-zero details.
        cfg = Config(netType="QuincunxLifting", entropy_layer="factorized",
                     autoencoder="SubbandAutoEncoder", clrch=3, dwtlevels=3,
                     split_mode="hv", lif_prec_bits=8, **common)
    else:
        raise ValueError(preset)
    cfg.checkpoint_dir = os.path.join(exp, "checkpoints")
    cfg.log_dir = os.path.join(exp, "logs")
    cfg.summary_dir = os.path.join(exp, "summaries")
    for d in (cfg.checkpoint_dir, cfg.log_dir, cfg.summary_dir):
        os.makedirs(d, exist_ok=True)
    return cfg


def save_params_snapshot(preset: str, lam: float, agent, root: str) -> str:
    """Durable (git-committed) f16 params snapshot for a completed lambda
    point — VERDICT r4 item 8a: a mid-round VM wipe destroyed the
    lam=2000/6000 checkpoints because ``experiments/`` is git-ignored;
    ``results/`` is tracked, so snapshots there survive a reprovision.
    Params only (~30 MB f16 for the 16.7M-param flagship): enough to
    re-test after an eval-set change or to warm-start a resume (the
    optimizer restarts). f16 rounding perturbs the operating point
    negligibly, and the coder uses the SAME params for enc and dec, so
    bitstreams stay decode-consistent."""
    import jax

    snap_dir = os.path.join(root, "results", "ckpt_snapshots")
    os.makedirs(snap_dir, exist_ok=True)
    arrs = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            agent.state.params)[0]:
        a = np.asarray(jax.device_get(leaf))
        if np.issubdtype(a.dtype, np.floating):
            a = a.astype(np.float16)
        arrs[jax.tree_util.keystr(path)] = a
    arrs["__iteration__"] = np.asarray(int(agent.current_iteration))
    out = os.path.join(snap_dir, f"{preset}_lam{lam:g}.npz")
    tmp = out + ".tmp.npz"
    with open(tmp, "wb") as fh:
        np.savez_compressed(fh, **arrs)
    os.replace(tmp, out)
    return out


def load_params_snapshot(preset: str, lam: float, agent, root: str) -> int:
    """Restore a snapshot into the agent's freshly initialized state.
    Returns the snapshot's iteration count, or 0 if no snapshot exists."""
    import jax
    import jax.numpy as jnp

    path = os.path.join(root, "results", "ckpt_snapshots",
                        f"{preset}_lam{lam:g}.npz")
    if not os.path.exists(path):
        return 0
    data = np.load(path)

    def restore(kp, leaf):
        return jnp.asarray(data[jax.tree_util.keystr(kp)], dtype=leaf.dtype)

    params = jax.tree_util.tree_map_with_path(restore, agent.state.params)
    agent.state = agent.state._replace(params=params)
    agent.current_iteration = int(data["__iteration__"])
    return agent.current_iteration


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=("cdf97", "flagship", "quincunx"),
                    required=True)
    ap.add_argument("--lambdas", type=str, required=True)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--resume", action="store_true",
                    help="continue each lambda from its saved checkpoint "
                         "(trains up to --steps total iterations)")
    ap.add_argument("--retest-only", action="store_true",
                    help="skip training: restore each lambda's checkpoint "
                         "and re-run the real-bitstream test (use after "
                         "the eval set changes)")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    train_dir, eval_dir = build_dirs(root)
    os.makedirs(os.path.join(root, "results"), exist_ok=True)
    out_path = os.path.join(root, "results", f"rd_{args.preset}.json")
    results = {}
    if os.path.exists(out_path):
        results = json.load(open(out_path))

    # Eval-set-change invalidation: anchors and points measured on a
    # different held-out set are not comparable — recompute anchors now,
    # flag the points stale until each is re-tested (--retest-only).
    cur_eval = sorted(os.listdir(eval_dir))
    if results.get("eval_set") != cur_eval:
        results.pop("jpeg_anchor", None)
        results.pop("jpeg2000_anchor", None)
        for v in results.get("points", {}).values():
            v["stale_eval_set"] = True

    if "jpeg_anchor" not in results:   # setdefault would encode eagerly
        results["jpeg_anchor"] = jpeg_anchor(eval_dir)
    if "jpeg2000_anchor" not in results:
        results["jpeg2000_anchor"] = jpeg2000_anchor(eval_dir)
    results.setdefault("points", {})
    results["eval_set"] = cur_eval
    results["steps"] = args.steps

    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.loop import (
        LiftingDWTAgent)

    def refresh_bd_rates():
        """Recompute the BD-rate summary fields from the current points —
        run after EVERY lambda so an interrupted sweep never leaves them
        stale relative to the points (they are what gets quoted)."""
        pts = sorted((v["bpp"], v["psnr"])
                     for v in results["points"].values()
                     if not v.get("stale_eval_set"))
        if len(pts) < 3:
            return
        from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.tools.rd_plot import (
            bd_rate)

        for anchor, field in (("jpeg_anchor", "bd_rate_vs_jpeg_pct"),
                              ("jpeg2000_anchor",
                               "bd_rate_vs_jpeg2000_pct")):
            if not results.get(anchor):
                continue
            ja = sorted(results[anchor])
            results[field] = bd_rate(
                [p[0] for p in ja], [p[1] for p in ja],
                [p[0] for p in pts], [p[1] for p in pts])

    def write_results():
        # atomic: a reader (or a crash) never sees a partial file
        import tempfile
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(out_path),
                                   suffix=".json")
        with os.fdopen(fd, "w") as fh:
            json.dump(results, fh, indent=1)
        os.replace(tmp, out_path)

    for lam in (float(v) for v in args.lambdas.split(",")):
        t0 = time.time()
        cfg = make_cfg(args.preset, lam, args.steps, train_dir, eval_dir,
                       root)
        cfg.resume_training = bool(args.resume or args.retest_only)
        agent = LiftingDWTAgent(cfg)
        if args.retest_only:
            if agent.current_iteration == 0:
                # checkpoint gone (e.g. VM wipe of experiments/) — fall
                # back to the durable git-tracked params snapshot
                if load_params_snapshot(args.preset, lam, agent, root):
                    print(f"lambda={lam:g}: restored from params snapshot "
                          f"(it={agent.current_iteration})")
                else:
                    print(f"lambda={lam:g}: no checkpoint — skipping "
                          f"retest")
                    continue
        else:
            agent.run()                  # train (crash-saves on error)
            agent.save_checkpoint(is_best=True)
            save_params_snapshot(args.preset, lam, agent, root)
        psnr, bpp = agent.test()         # REAL bitstream enc+dec
        results["points"][f"{lam:g}"] = {
            "bpp": bpp, "psnr": psnr,
            "iterations": int(agent.current_iteration),
            "per_image": getattr(agent, "last_test_per_image", None),
            "train_minutes": round((time.time() - t0) / 60, 1)}
        refresh_bd_rates()
        write_results()
        print(f"lambda={lam:g}: {bpp:.4f} bpp @ {psnr:.2f} dB "
              f"({results['points'][f'{lam:g}']['train_minutes']} min)")
        for field in ("bd_rate_vs_jpeg_pct", "bd_rate_vs_jpeg2000_pct"):
            if field in results:
                print(f"  {field}: {results[field]:.2f}")


if __name__ == "__main__":
    main()
