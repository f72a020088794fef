"""Microbenchmark of the native ZTsep coding kernels at flagship dims.

Pure numpy + ctypes (no JAX): times the whole-plane plc pass and the
fully-native level walk on synthetic weights at the real flagship shapes
(so=3, wide=243, cgp 486/162/54/6; Kodak level-0 details 256x384), so the
host-side coding budget can be iterated on without the TPU tunnel.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding import native_ctx  # noqa: E402
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding import rans  # noqa: E402
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.entropy import gaussian  # noqa: E402


def fake_level_params(so=3, seed=0):
    rng = np.random.RandomState(seed)
    wide = so * 81
    fused = 2 * wide

    def conv(shape):
        return (rng.randn(*shape) * 0.05).astype(np.float32)

    em = {
        "csc_0": {"kernel": conv((5, 5, 1, wide)), "bias": conv((wide,))},
        "plc_0": {"Conv_0": {"kernel": conv((3, 3, so, wide)),
                             "bias": conv((wide,))},
                  "Conv_1": {"kernel": conv((3, 3, wide, wide)),
                             "bias": conv((wide,))}},
        "cgp_0": {f"Conv_{i}": {"kernel": conv((1, 1, ing, out)),
                                "bias": conv((out,))}
                  for i, (ing, out) in enumerate(
                      [(fused // so, fused), (fused // so, fused // 3),
                       ((fused // 3) // so, fused // 9),
                       ((fused // 9) // so, 2 * so)])},
    }
    return {"entropymodel": em}


def gc_tables():
    table = gaussian.get_scale_table().astype(np.float64)
    cdfs, lengths, offsets = [], [], []
    max_len = 0
    rows = []
    for s in table:
        # +-4 sigma support, quantized pmf
        tail = int(np.ceil(4 * s)) + 2
        xs = np.arange(-tail, tail + 1)
        pmf = (np.exp(-0.5 * ((xs + 0.5) / s) ** 2)
               - np.exp(-0.5 * ((xs - 0.5) / s) ** 2) * 0)
        pmf = np.exp(-0.5 * (xs / s) ** 2)
        pmf = pmf / pmf.sum()
        cdf = rans.pmf_to_quantized_cdf(pmf.astype(np.float32))
        rows.append(cdf)
        lengths.append(len(cdf))
        offsets.append(-tail)
        max_len = max(max_len, len(cdf))
    out = np.zeros((len(rows), max_len), np.uint32)
    for i, r in enumerate(rows):
        out[i, :len(r)] = r
    return out, np.asarray(lengths, np.int32), np.asarray(offsets, np.int32)


def main():
    so = 3
    params = fake_level_params(so)
    lev = native_ctx.LevelContextEvaluator(params, 0, so)
    plc_ev = native_ctx.PLCPlaneEvaluator(params, 0, so)
    cdfs, lengths, offsets = gc_tables()

    h, w = 256, 384
    rng = np.random.RandomState(1)
    parent = np.round(rng.randn(1, h // 2, w // 2, so) * 2).astype(np.float32)
    x_true = np.round(rng.randn(h, w, so) * 2).astype(np.float32)

    # --- plc whole-plane pass ---
    for rep in range(3):
        t0 = time.perf_counter()
        plc = plc_ev(parent)
        dt = time.perf_counter() - t0
        mac = h * w * (so * 81 * so * 9 + 243 * 243 * 9)
        print(f"plc plane {h}x{w}: {dt*1e3:7.1f} ms  "
              f"{mac/dt/1e9:6.1f} GMAC/s")

    # --- fully-native level walk, encode ---
    n_centers = h * w
    mac_center = (243 * 12        # csc
                  + 486 * 162     # cgp1
                  + 162 * 162     # cgp2
                  + 54 * 54       # cgp3
                  + 6 * 18)       # cgp4
    for rep in range(3):
        padded = np.zeros((1, h + 4, w + 4, so), np.float32)
        t0 = time.perf_counter()
        syms, idxs = lev.walk(padded, plc[0], x_true, cdfs, lengths, offsets)
        dt = time.perf_counter() - t0
        print(f"level walk enc {h}x{w}: {dt*1e3:7.1f} ms  "
              f"{n_centers*mac_center/dt/1e9:6.1f} GMAC/s(orig-count)")

    stream = rans.encode_with_indexes(syms, idxs, cdfs, lengths, offsets)
    for rep in range(3):
        padded_dec = np.zeros((1, h + 4, w + 4, so), np.float32)
        t0 = time.perf_counter()
        lev.walk(padded_dec, plc[0], None, cdfs, lengths, offsets,
                 stream=stream)
        dt = time.perf_counter() - t0
        print(f"level walk dec {h}x{w}: {dt*1e3:7.1f} ms")
    assert np.array_equal(padded_dec, padded), "enc/dec plane mismatch"
    print("round trip OK")


if __name__ == "__main__":
    main()
