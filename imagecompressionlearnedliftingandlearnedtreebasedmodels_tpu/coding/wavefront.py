"""Wavefront (anti-diagonal) coding for the causal-context entropy model.

The reference's ``compress_ar``/``decompress_ar``
(``LiftingBasedDWT_net.py:458-556``) run a per-pixel Python loop — O(H*W)
sequential steps, each invoking a tiny conv on a k x k crop. On TPU we
exploit the causal mask's structure: under a mask-A conv with kernel height
``kh``, every pixel on anti-diagonal ``d = a*row + col`` (``a = kh//2 + 1``)
depends only on pixels of diagonals < d. So coding proceeds one diagonal at
a time — O(a*H + W) batched steps instead of O(H*W) serial ones — and within
a step all of the diagonal's pixels (and all subband channels, which are
group-separated in the context nets) are processed as one batch:

- parameters come from patch-center evaluation: (n_d, 5, 5, C) causal
  windows for the single-conv finer-level context, (n_d, 11, 11, C) for the
  5-layer coarse/LL PixelCNNs (exact-center receptive field), with the
  parent context precomputed once per level as a whole-plane pass;
- one host rANS ``decode_stream`` call consumes the diagonal's symbols.

The encoder walks the same diagonals (symbols from the true values) so the
context plane is bit-identical on both sides: every context input is the
decoded value ``round(x - mu) + mu`` (the reference's writeback at
``LiftingBasedDWT_net.py:488``). Batch sizes are bucketed to powers of two
to bound jit recompiles.
"""

from __future__ import annotations

import os
import threading
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import gaussian
from . import rans

# The per-plane walks are CPU-bound host compute (C++ context nets + rANS).
# Plane threads exist to overlap accelerator round trips, but running more
# walks than physical cores concurrently just thrashes the cache (~3x
# slowdown measured on a 1-core host) — gate the compute-heavy section to
# one walk per core.
_WALK_SLOTS = threading.BoundedSemaphore(max(1, os.cpu_count() or 1))


def diagonal_order(h: int, w: int, a: int) -> List[np.ndarray]:
    """Pixel coordinates grouped by anti-diagonal d = a*row + col; each
    entry is an (n_d, 2) int array of (row, col), rows ascending."""
    rows, cols = np.mgrid[0:h, 0:w]
    d = a * rows + cols
    order = []
    for dv in range(int(d.max()) + 1):
        mask = d == dv
        if mask.any():
            rr, cc = rows[mask], cols[mask]
            order.append(np.stack([rr, cc], axis=1))
    return order


def _bucket(n: int) -> int:
    b = 1
    while b < n:
        b <<= 1
    return b


def _gather_patches(padded: np.ndarray, coords: np.ndarray, k: int,
                    bucket: int) -> np.ndarray:
    """(n,2) coords -> (bucket, k, k, C) windows from the zero-padded plane
    (window top-left at the unpadded coordinate)."""
    n = coords.shape[0]
    c = padded.shape[-1]
    out = np.zeros((bucket, k, k, c), np.float32)
    ri = coords[:, 0, None, None] + np.arange(k)[None, :, None]
    ci = coords[:, 1, None, None] + np.arange(k)[None, None, :]
    out[:n] = padded[0, ri, ci, :]
    return out


class ZTSepPlaneCoder:
    """Shared encode/decode wavefront walker for one tensor plane.

    The per-diagonal context nets are tiny (a handful of patches through
    small convs), so they run on the HOST CPU jax backend — the sequential
    loop never crosses the accelerator boundary (which costs ~25-40 ms RTT
    per step on tunneled TPUs). Only the whole-plane parent-context pass
    runs on the accelerator, once per level.
    """

    def __init__(self, coder, plane: int):
        self.coder = coder
        self.plane = plane

    def code(self, kind: str, level: Optional[int], x_true, shape,
             stream: Optional[bytes], con=None,
             force_evaluator: Optional[str] = None,
             force_plc_backend: Optional[str] = None
             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Walk the plane. Encode mode when ``x_true`` is given (returns
        symbols/indexes diagonal-major); decode mode consumes the raw
        ``stream`` bytes. Returns (hat, symbols, indexes).

        ``force_evaluator`` pins the context evaluator for the "level" kind
        ("native" C++ fp32 vs "jax"): the two can differ in the last ulp of
        sigma/mu, so a stream encoded with one MUST be decoded with the
        same one — the encoder records its choice in ``PlaneStreams.meta``
        and the decoder passes it back here. ``self.last_evaluator`` holds
        the evaluator actually used. ``force_plc_backend`` pins the
        whole-plane parent-context pass the same way: "native" (the
        default, deterministic host C++ — portable across machines whose
        ``ctx_fingerprint`` matches) or an accelerator backend name (legacy
        streams; bf16 accumulation order differs between backends).
        """
        coder = self.coder
        if x_true is not None:
            shape = x_true.shape
        b, h, w, c = shape
        assert b == 1
        if kind == "level":
            k, name, static = 5, "level_center_params", (level,)
            # Whole-plane parent context, once per level: nearest-x2
            # upsample + two dense 243-channel 3x3 convs. Preferred path is
            # the native host kernel (deterministic fp32, no backend
            # pinning, memoized across the encode/decode of one image);
            # fall back to the session accelerator with backend pinning
            # only if the C++ build is unavailable.
            plc_native = None
            if force_plc_backend in (None, "native"):
                plc_native = coder._native_plc_eval(self.plane, level)
            if plc_native is not None:
                parent = np.ascontiguousarray(np.asarray(con), np.float32)
                plc = coder._plc_memoized(self.plane, level, parent,
                                          plc_native)
                self.last_plc_backend = "native"
            else:
                if force_plc_backend == "native":
                    raise RuntimeError(
                        "stream's parent-context pass used the native (C++)"
                        " evaluator but it is unavailable here — decoding "
                        "with an accelerator pass could corrupt the plane")
                backend = jax.default_backend()
                if force_plc_backend is not None \
                        and force_plc_backend != backend:
                    raise RuntimeError(
                        f"stream's parent-context pass ran on "
                        f"{force_plc_backend!r} but this session's backend "
                        f"is {backend!r} — bf16 accumulation differs across "
                        f"backends, decoding could corrupt the plane")
                self.last_plc_backend = backend
                # Trace with the Pallas conv path disabled: the recorded
                # backend NAME is the stream's arithmetic pin, and legacy
                # backend-pinned streams were encoded with the im2colT
                # lowering — the Pallas kernel's different bf16 accumulation
                # order would silently corrupt them (and make the name an
                # ambiguous pin for new streams).
                from ..ops.fast_conv import disable_pallas
                with disable_pallas():
                    plc = np.asarray(coder._entropy_method(
                        self.plane, "plc_params_from_parent", level)(
                            None, jnp.asarray(np.asarray(con))))
        else:
            k, name, static = 11, ("xe_center_params" if kind == "xe"
                                   else "coarsest_center_params"), ()
            plc = None
        a = (5 // 2 + 1) if kind == "level" else (3 // 2 + 1)
        pad = k // 2
        native = None
        if force_evaluator != "jax":
            native = (coder._native_level_eval(self.plane, level)
                      if kind == "level"
                      else coder._native_pixelcnn_eval(self.plane, kind))
            if native is None and force_evaluator == "native":
                raise RuntimeError(
                    "stream was encoded with the native (C++) context "
                    "evaluator but it is unavailable here — decoding with "
                    "the jax path could corrupt the plane (last-ulp "
                    "sigma/mu differences change CDF indexes)")
        self.last_evaluator = "native" if native is not None else "jax"

        padded = np.zeros((1, h + 2 * pad, w + 2 * pad, c), np.float32)
        hat = padded[:, pad:h + pad, pad:w + pad, :]  # view for readback
        if native is not None:
            # fully-native plane walk: diagonal loop, context eval, rANS
            # and writeback all in one C++ call (no Python per diagonal)
            x_np = None if x_true is None else np.asarray(x_true)[0]
            with _WALK_SLOTS:
                if kind == "level":
                    syms, idxs = native.walk(
                        padded, plc[0], x_np,
                        coder._gc_cdfs, coder._gc_lengths,
                        coder._gc_offsets,
                        stream=b"" if stream is None else stream)
                else:
                    syms, idxs = native.walk(
                        padded, pad, x_np,
                        coder._gc_cdfs, coder._gc_lengths,
                        coder._gc_offsets,
                        stream=b"" if stream is None else stream)
            if x_true is None:
                syms = np.zeros(0, np.int32)
                idxs = np.zeros(0, np.int32)
            return np.ascontiguousarray(hat), syms, idxs

        codes_fn = coder._entropy_codes_cpu(self.plane, name, *static)
        order = diagonal_order(h, w, a)
        decoder = None
        if x_true is None:
            decoder = rans.RansDecoder()
            decoder.set_stream(stream)
        with _WALK_SLOTS:
            return self._walk_loop(order, codes_fn, kind, plc, padded, hat,
                                   pad, k, c, x_true, decoder, coder)

    def _walk_loop(self, order, codes_fn, kind, plc, padded, hat,
                   pad, k, c, x_true, decoder, coder):
        """Python-orchestrated per-diagonal walk over the CPU-jax context
        evaluators — the fallback when the native C++ build is unavailable
        (and the decode path for streams tagged ``evaluator == "jax"``)."""
        all_syms, all_idxs = [], []
        cpu = jax.devices("cpu")[0]
        for coords in order:
            n = coords.shape[0]
            bucket = _bucket(n)
            patches = _gather_patches(padded, coords, k, bucket)
            with jax.default_device(cpu):
                if kind == "level":
                    plc_c = np.zeros((bucket, plc.shape[-1]), np.float32)
                    plc_c[:n] = plc[0, coords[:, 0], coords[:, 1], :]
                    idx, mu = codes_fn(jnp.asarray(patches),
                                       jnp.asarray(plc_c))
                else:
                    idx, mu = codes_fn(jnp.asarray(patches))
            idx = np.asarray(idx)[:n]
            mu = np.asarray(mu)[:n]
            idx_d = np.asarray(idx).ravel()
            mu = np.asarray(mu)
            rr, cc = coords[:, 0], coords[:, 1]
            if x_true is not None:
                x_d = x_true[0, rr, cc, :]
                sym_d = np.round(x_d - mu).astype(np.int32).ravel()
            else:
                sym_d = decoder.decode_stream(
                    idx_d, coder._gc_cdfs, coder._gc_lengths,
                    coder._gc_offsets)
            val_d = sym_d.reshape(n, c).astype(np.float32) + mu
            padded[0, rr + pad, cc + pad, :] = val_d
            all_syms.append(sym_d)
            all_idxs.append(idx_d)
        return (np.ascontiguousarray(hat), np.concatenate(all_syms),
                np.concatenate(all_idxs))


def compress_ztsep(coder, plane: int, xe, xo_list):
    """Encode one plane's pyramid: LL and coarsest details via their
    PixelCNN wavefronts, finer levels via parent+causal context."""
    from .codec_coder import PlaneStreams

    cfg = coder.cfg
    L = cfg.dwtlevels
    walker = ZTSepPlaneCoder(coder, plane)

    def flush(syms, idxs) -> bytes:
        enc = rans.BufferedRansEncoder()
        enc.encode_with_indexes(syms, idxs, coder._gc_cdfs,
                                coder._gc_lengths, coder._gc_offsets)
        return enc.flush()

    meta = {}
    xe_hat, syms, idxs = walker.code("xe", None, np.asarray(xe), None, None)
    meta["evaluator_xe"] = walker.last_evaluator
    stream_xe = flush(syms, idxs)

    streams_xo: List[bytes] = [b""] * L
    xo_hats: List[np.ndarray] = [None] * L
    hat, syms, idxs = walker.code(
        "coarsest", None, np.asarray(xo_list[L - 1]), None, None)
    meta["evaluator_coarsest"] = walker.last_evaluator
    xo_hats[L - 1] = hat
    streams_xo[L - 1] = flush(syms, idxs)
    con = hat
    for i in range(L - 2, -1, -1):
        hat, syms, idxs = walker.code(
            "level", i, np.asarray(xo_list[i]), None, None, con=con)
        meta[f"evaluator_l{i}"] = walker.last_evaluator
        meta[f"plc_backend_l{i}"] = walker.last_plc_backend
        xo_hats[i] = hat
        streams_xo[i] = flush(syms, idxs)
        con = hat
    if "native" in meta.values():
        # arithmetic fingerprint of this build of the C++ coding kernels —
        # the decoder refuses to decode native-encoded streams with a
        # build whose kernels produce different bits (FMA/vector-width
        # freedom under -march=native)
        from .native_ctx import ctx_fingerprint

        meta["ctx_fp"] = ctx_fingerprint()
    return (PlaneStreams(stream_xe, streams_xo, meta), xo_hats, xe_hat,
            xo_hats)


def decompress_ztsep(coder, plane: int, streams, xe_shape, xo_shapes):
    cfg = coder.cfg
    L = cfg.dwtlevels
    walker = ZTSepPlaneCoder(coder, plane)

    meta = getattr(streams, "meta", None) or {}
    if "native" in meta.values():
        from .native_ctx import ctx_fingerprint

        fp = meta.get("ctx_fp")
        try:
            local_fp = ctx_fingerprint()
        except Exception as e:
            raise RuntimeError(
                "stream was encoded with the native (C++) coding kernels "
                f"but they are unavailable here ({type(e).__name__}: {e})"
            ) from e
        if fp is None:
            # Legacy streams from builds that predate fingerprint stamping
            # used kernels whose bit-level arithmetic has since changed
            # (composed cgp layer 0, vectorized PixelCNN, different GEMM
            # accumulation order) — treating the absent fingerprint as a
            # match would silently corrupt exactly those planes.
            raise RuntimeError(
                "stream was encoded with the native (C++) coding kernels "
                "but carries no kernel fingerprint ('ctx_fp') — it predates "
                "fingerprint stamping and the kernels' bit-level arithmetic "
                "has changed since; refusing to decode (re-encode with a "
                "current build)")
        if fp != local_fp:
            raise RuntimeError(
                f"stream's native coding kernels fingerprint {fp} != this "
                f"build's {local_fp} — the builds produce different bits "
                "(FMA/vector-width differences), decoding would corrupt "
                "the planes")
    xe_hat, _, _ = walker.code("xe", None, None, xe_shape, streams.xe,
                               force_evaluator=meta.get("evaluator_xe"))
    xo_hat: List[np.ndarray] = [None] * L
    xo_hat[L - 1], _, _ = walker.code(
        "coarsest", None, None, xo_shapes[L - 1], streams.xo[L - 1],
        force_evaluator=meta.get("evaluator_coarsest"))
    con = xo_hat[L - 1]
    for i in range(L - 2, -1, -1):
        xo_hat[i], _, _ = walker.code(
            "level", i, None, xo_shapes[i], streams.xo[i], con=con,
            force_evaluator=meta.get(f"evaluator_l{i}"),
            force_plc_backend=meta.get(f"plc_backend_l{i}"))
        con = xo_hat[i]
    return xe_hat, xo_hat
