"""Phase-level profile of ZTsep real-bitstream coding at Kodak size.

Times the transform, each wavefront walk kind (xe / coarsest / level), and
within the level walks the per-diagonal sub-phases (patch gather, native
eval, rANS, writeback) by monkey-patching light timers around the
hot functions. Run on the session backend (transform on TPU, walks on host).
"""

import time
from collections import defaultdict

import numpy as np
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.utils.compile_cache import (
    enable_compile_cache)

enable_compile_cache()

from __graft_entry__ import flagship_config
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.models.codec import CodecWrapper
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.state import init_state
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding.codec_coder import CodecCoder
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding import wavefront
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.data import (
    synthetic_natural_images)

T = defaultdict(float)
N = defaultdict(int)


def timed(name, fn):
    def wrap(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        T[name] += time.perf_counter() - t0
        N[name] += 1
        return out
    return wrap


wavefront._gather_patches = timed("gather", wavefront._gather_patches)

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding import native_ctx  # noqa: E402

native_ctx.LevelContextEvaluator.walk = timed(
    "native_walk", native_ctx.LevelContextEvaluator.walk)

orig_code = wavefront.ZTSepPlaneCoder.code


def code_timed(self, kind, level, x_true, shape, decoder, con=None,
               **kw):
    t0 = time.perf_counter()
    out = orig_code(self, kind, level, x_true, shape, decoder, con, **kw)
    key = f"walk_{kind}" + (f"_l{level}" if level is not None else "")
    mode = "enc" if x_true is not None else "dec"
    T[f"{key}_{mode}"] += time.perf_counter() - t0
    N[f"{key}_{mode}"] += 1
    return out


wavefront.ZTSepPlaneCoder.code = code_timed


def main():
    cfg = flagship_config(entropy_layer="conditioned2ZTsepSubbands")
    model = CodecWrapper(cfg)
    state = init_state(cfg, model, jnp.zeros((1, 64, 64, 3)),
                       __import__("jax").random.PRNGKey(0))
    coder = CodecCoder(cfg, model, state.params)
    img = np.asarray(synthetic_natural_images(1, 512, seed=2)[0],
                     np.float32)[None] / 255.0
    img = np.concatenate([img, img[:, :, :256]], axis=2)  # (1,512,768,3)

    import os as _os
    serial = _os.environ.get("PROFILE_SERIAL_PLANES") == "1"
    for run in range(3):
        T.clear(); N.clear()
        if serial:
            coder._warm = False  # force the serial (unthreaded) plane path
        t0 = time.perf_counter()
        c0 = time.process_time()
        res = coder.compress_decompress(img)
        total = time.perf_counter() - t0
        cpu = time.process_time() - c0
        print(f"run {run}: total {total:.2f}s  cpu {cpu:.2f}s  "
              f"psnr {res.psnr:.2f} bpp {res.bpp:.4f}")
        if run == 0:
            continue  # compile noise
        walks = 0.0
        for k in sorted(T):
            if k.startswith("walk"):
                walks += T[k]
            print(f"  {k:26s} {T[k]:8.2f}s  x{N[k]}")
        print(f"  walks total {walks:.2f}s; non-walk {total - walks:.2f}s")


if __name__ == "__main__":
    main()
