"""Merge flagship RD points from concurrent sweep runs and recompute BD-rates.

Two ``rd_sweep.py`` processes that overlap in time each load
``results/rd_flagship.json`` once at startup and rewrite it at the end, so
the later writer clobbers the earlier one's updated point. This tool
restores the best (lowest RD-cost is not comparable across lambdas, so:
keep the HIGHEST-iteration measurement per lambda, falling back to a
snapshot file for points the clobber lost) and recomputes BD-rate vs the
stored JPEG anchor and, when present, vs the cdf97 curve.

Usage: python scripts/merge_rd_points.py SNAPSHOT.json
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.tools.rd_plot import (  # noqa: E402
    bd_rate)


def main():
    import glob
    import tempfile

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "results", "rd_flagship.json")
    for pidfile in glob.glob("/tmp/rd_sweep*.pid"):
        try:
            pid = int(open(pidfile).read().strip())
            os.kill(pid, 0)
            print(f"WARNING: a sweep appears to be running (pid {pid}, "
                  f"{pidfile}) — it may rewrite {path} after this merge",
                  file=sys.stderr)
        except (OSError, ValueError):
            pass
    cur = json.load(open(path))
    snap = json.load(open(sys.argv[1]))

    for lam, pt in snap["points"].items():
        have = cur["points"].get(lam)
        if have is None or pt["iterations"] > have["iterations"]:
            cur["points"][lam] = pt

    pts = sorted((v["bpp"], v["psnr"]) for v in cur["points"].values())
    ja = sorted(cur["jpeg_anchor"])
    cur["bd_rate_vs_jpeg_pct"] = bd_rate(
        [p[0] for p in ja], [p[1] for p in ja],
        [p[0] for p in pts], [p[1] for p in pts])

    cdf97_path = os.path.join(root, "results", "rd_cdf97.json")
    if os.path.exists(cdf97_path):
        cd = json.load(open(cdf97_path))
        cpts = sorted((v["bpp"], v["psnr"]) for v in cd["points"].values())
        cur["bd_rate_vs_cdf97_pct"] = bd_rate(
            [p[0] for p in cpts], [p[1] for p in cpts],
            [p[0] for p in pts], [p[1] for p in pts])

    # the top-level "steps" summary (the sweep's --steps target) is
    # meaningless after merging points from different runs
    cur.pop("steps", None)
    # atomic replace: a reader (or a crashed merge) never sees a torn file
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".json")
    with os.fdopen(fd, "w") as fh:
        json.dump(cur, fh, indent=1)
    os.replace(tmp, path)
    for lam, v in sorted(cur["points"].items(), key=lambda kv: float(kv[0])):
        print(f"lambda={lam}: {v['bpp']:.4f} bpp @ {v['psnr']:.2f} dB "
              f"({v['iterations']} it)")
    print("BD-rate vs JPEG:", round(cur["bd_rate_vs_jpeg_pct"], 2), "%")
    if "bd_rate_vs_cdf97_pct" in cur:
        print("BD-rate vs cdf97:", round(cur["bd_rate_vs_cdf97_pct"], 2), "%")


if __name__ == "__main__":
    main()
