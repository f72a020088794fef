"""Render the measured RD curves (results/rd_*.json) to results/rd_measured.png.

Own-eval-set comparison: JPEG anchor vs CDF97+factorized vs the flagship
(lifting v4 + ZTsepSubbands), all real-bitstream points on the same held-out
images (see results/README.md for methodology). Kept separate from
tools/rd_plot.py's Kodak-anchor figure: these numbers are NOT Kodak.

Colors are Okabe-Ito (colorblind-safe), fixed per codec identity.
"""

import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SERIES = [
    # (file/points key, label, okabe-ito color, linestyle)
    ("jpeg_anchor", "JPEG (PIL)", "#7f7f7f", "--"),
    ("jpeg2000_anchor", "JPEG 2000 (OpenJPEG)", "#009E73", "--"),
    ("rd_cdf97", "CDF 9/7 + factorized", "#56B4E9", "-"),
    ("rd_flagship", "Lifting v4 + ZTsepSubbands", "#D55E00", "-"),
]


def load_points(name):
    if name.endswith("_anchor"):
        # anchors are stamped into both results files; prefer the flagship
        # copy, fall back to cdf97 (same eval set, same encoder settings)
        for src in ("rd_flagship", "rd_cdf97"):
            d = json.load(open(os.path.join(ROOT, "results", f"{src}.json")))
            if d.get(name):
                return sorted((b, p) for b, p in d[name])
        return []
    d = json.load(open(os.path.join(ROOT, "results", f"{name}.json")))
    return sorted((v["bpp"], v["psnr"]) for v in d["points"].values())


def cross_bd_rates():
    """BD-rates between the measured curves (same eval set), printed and
    stamped into rd_flagship.json: flagship vs JPEG, flagship vs cdf97 —
    the paper's headline relative claim (learned lifting + tree entropy
    beats the fixed wavelet, reference README.md:16)."""
    sys.path.insert(0, ROOT)
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.tools.rd_plot import (
        bd_rate)

    flag_path = os.path.join(ROOT, "results", "rd_flagship.json")
    flag = json.load(open(flag_path))
    fl = load_points("rd_flagship")
    out = {}
    for anchor_key, name in (("jpeg_anchor", "bd_rate_vs_jpeg_pct"),
                             ("jpeg2000_anchor", "bd_rate_vs_jpeg2000_pct"),
                             ("rd_cdf97", "bd_rate_vs_cdf97_pct")):
        an = load_points(anchor_key)
        if len(an) >= 3 and len(fl) >= 3:
            out[name] = bd_rate([p[0] for p in an], [p[1] for p in an],
                                [p[0] for p in fl], [p[1] for p in fl])
            print(f"flagship {name}: {out[name]:.1f}%")
    flag.update(out)
    json.dump(flag, open(flag_path, "w"), indent=1)
    return out


def main(out_path=None):
    out_path = out_path or os.path.join(ROOT, "results", "rd_measured.png")
    fig, ax = plt.subplots(figsize=(7.2, 4.6), dpi=150)
    for key, label, color, ls in SERIES:
        pts = load_points(key)
        bpp = [p[0] for p in pts]
        psnr = [p[1] for p in pts]
        ax.plot(bpp, psnr, ls, color=color, marker="o", markersize=4,
                linewidth=2, label=label)
        # direct label at the last point inside the x-range (identity is
        # not color-alone; clipped-off labels help nobody)
        vis = [i for i, b in enumerate(bpp) if b <= 2.9]
        if vis:
            i = vis[-1]
            ax.annotate(label, (bpp[i], psnr[i]), textcoords="offset points",
                        xytext=(6, -10), fontsize=8, color="#444444")
    ax.set_xlabel("bits per pixel")
    ax.set_ylabel("PSNR (dB)")
    ax.set_title("Real-bitstream RD on the held-out eval set "
                 "(synthetic corpus + grace_hopper)")
    ax.set_xlim(0, 3.2)
    ax.grid(True, color="#e0e0e0", linewidth=0.6)
    ax.set_axisbelow(True)
    for spine in ("top", "right"):
        ax.spines[spine].set_visible(False)
    ax.legend(frameon=False, fontsize=9, loc="lower right")
    fig.tight_layout()
    fig.savefig(out_path)
    print("wrote", out_path)
    cross_bd_rates()


if __name__ == "__main__":
    main(*sys.argv[1:])
