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
    ("rd_quincunx", "Quincunx integer lifting + factorized", "#CC79A7", "-"),
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
    path = os.path.join(ROOT, "results", f"{name}.json")
    if not os.path.exists(path):
        return []
    d = json.load(open(path))
    # stale_eval_set points were measured on a different held-out set —
    # never mix them into plotted curves or BD-rate inputs
    return sorted((v["bpp"], v["psnr"]) for v in d["points"].values()
                  if not v.get("stale_eval_set"))


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
    # The reference's published Kodak curve stops at 1.982 bpp
    # (plot_sketcher.py:4-5); our lambda=6000 point sits at ~4.2 bpp where
    # the 16.7M model saturates and classical codecs keep climbing, which
    # drags full-span BD-rate. Report BOTH: full measured span and the
    # reference's rate range (points <= 2.1 bpp) for the like-for-like
    # comparison.
    fl_ref_range = [p for p in fl if p[0] <= 2.1]
    for anchor_key, name in (("jpeg_anchor", "bd_rate_vs_jpeg_pct"),
                             ("jpeg2000_anchor", "bd_rate_vs_jpeg2000_pct"),
                             ("rd_cdf97", "bd_rate_vs_cdf97_pct")):
        an = load_points(anchor_key)
        if len(an) >= 3 and len(fl) >= 3:
            out[name] = bd_rate([p[0] for p in an], [p[1] for p in an],
                                [p[0] for p in fl], [p[1] for p in fl])
            print(f"flagship {name}: {out[name]:.1f}%")
        if len(an) >= 3 and len(fl_ref_range) >= 3:
            key2 = name.replace("_pct", "_le2bpp_pct")
            out[key2] = bd_rate([p[0] for p in an], [p[1] for p in an],
                                [p[0] for p in fl_ref_range],
                                [p[1] for p in fl_ref_range])
            print(f"flagship {key2}: {out[key2]:.1f}%")
    flag.update(out)
    json.dump(flag, open(flag_path, "w"), indent=1)
    return out


def main(out_path=None):
    out_path = out_path or os.path.join(ROOT, "results", "rd_measured.png")
    fig, ax = plt.subplots(figsize=(7.2, 4.6), dpi=150)
    for key, label, color, ls in SERIES:
        pts = load_points(key)
        if not pts:
            continue
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
    # decoder-side restoration gain at unchanged bpp (results/
    # postprocess_gain.json, VERDICT r3 item 6): an upward arrow at the
    # matching flagship point
    pp_path = os.path.join(ROOT, "results", "postprocess_gain.json")
    if os.path.exists(pp_path):
        pp = json.load(open(pp_path))
        flag = json.load(open(os.path.join(ROOT, "results",
                                           "rd_flagship.json")))
        pt = flag["points"].get(f"{pp['lambda']:g}")
        if pt and not pt.get("stale_eval_set"):
            b0, p0 = pt["bpp"], pt["psnr"]
            ax.annotate("", xy=(b0, p0 + pp["mean_gain_db"]), xytext=(b0, p0),
                        arrowprops=dict(arrowstyle="->", color="#D55E00"))
            ax.plot([b0], [p0 + pp["mean_gain_db"]], "^", color="#D55E00",
                    markersize=5,
                    label=f"+ {pp['net']} postprocess "
                          f"({pp['mean_gain_db']:+.2f} dB)")

    ax.set_xlabel("bits per pixel")
    ax.set_ylabel("PSNR (dB)")
    ax.set_title("Real-bitstream RD on the 24-image held-out eval set "
                 "(19 dead-leaves seeds + 5 photos)")
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
