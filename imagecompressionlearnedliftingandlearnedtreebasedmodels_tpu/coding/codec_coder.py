"""Real encode+decode: device-computed CDF indexes -> host rANS bitstreams.

TPU-native re-design of the reference's ``test`` path
(``LiftingBasedDWT_net.py:136-152`` compress; ``:374-456`` entropymodel.test):
the device computes all (mu, sigma) context parameters and CDF indexes with
whole-tensor fused convs, and only integer symbols/indexes cross the
host<->device boundary for the C++ rANS coder. The reference instead runs an
O(H*W) per-pixel Python loop per subband (``:469-556``); here

- factorized / onlyEZWT: ONE device pass + one host rANS call per tensor
  (the models have no intra-subband serial dependency),
- ZTBlock: 4 batched passes per LEVEL (polyphase cosets; all subband
  channels of a coset share one dispatch via ``level_coset_params``),
- ZTsepSubbands: wavefront anti-diagonal decode (see ``wavefront.py``).

Decode-consistency contract: every context input is the *decoded* value
``round(x - mu) + mu`` (the reference's writeback at
``LiftingBasedDWT_net.py:488``), so encoder and decoder see bit-identical
context and the symbol streams round-trip exactly.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..entropy import gaussian
from ..ops import color
from . import rans


@dataclasses.dataclass
class PlaneStreams:
    """Byte streams for one color plane: LL + one per detail level.

    ``meta`` records per-stream coding variants the decoder must honor —
    notably which context evaluator ("native" C++ vs "jax") produced each
    AR level, since their last-ulp sigma/mu differences change CDF indexes.
    """
    xe: bytes
    xo: List[bytes]
    meta: dict = dataclasses.field(default_factory=dict)

    def nbytes(self) -> int:
        return len(self.xe) + sum(len(s) for s in self.xo)


@dataclasses.dataclass
class CodecResult:
    xhat: np.ndarray
    bpp: float
    psnr: float
    streams: List[PlaneStreams]


def _gc_tables() -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Quantized CDF matrix for the 64-entry Gaussian scale table."""
    pmf, tail, lengths, offsets = gaussian.cdf_table()
    cdfs, cdf_lengths = rans.build_cdf_matrix(pmf, tail, lengths)
    return cdfs, cdf_lengths, offsets.astype(np.int32)


class CodecCoder:
    """Bitstream compress/decompress around a trained CodecWrapper."""

    def __init__(self, cfg: Config, model, params):
        self.cfg = cfg
        self.model = model  # CodecWrapper (kept for API symmetry)
        self.params = params
        self.n_planes = 1 if cfg.clrch == 3 else 3
        self._gc_cdfs, self._gc_lengths, self._gc_offsets = _gc_tables()
        self._jit_cache: Dict = {}
        self._eb_tables: Dict = {}
        # A bare single-plane codec module: the wrapper stacks per-plane
        # params with a leading axis (vmap); the coder slices out one
        # plane's tree and applies this module directly.
        from ..models.codec import LiftingDWTCodec
        self._plane_codec = LiftingDWTCodec(cfg)
        self._plane_params_cache: Dict[int, dict] = {}
        self._plane_params_cpu_cache: Dict[int, dict] = {}
        self._warm = False  # first image runs serially to build jit caches

    # --- module access ------------------------------------------------
    def _plane_params(self, plane: int):
        if plane not in self._plane_params_cache:
            if self.cfg.clrch == 3:
                tree = self.params["codec"]
            else:
                tree = self.params[f"codecs_{plane}"]
            self._plane_params_cache[plane] = tree
        return self._plane_params_cache[plane]

    def _native_level_eval(self, plane: int, level: int):
        """Native (C++) per-diagonal evaluator for the ZTsep level path;
        None if unavailable (falls back to the CPU-jax path)."""
        if not hasattr(self, "_native_cache"):
            self._native_cache = {}
        key = (plane, level)
        if key not in self._native_cache:
            try:
                from .native_ctx import LevelContextEvaluator
                params_np = jax.device_get(self._plane_params(plane))
                self._native_cache[key] = LevelContextEvaluator(
                    params_np, level, 3 * self.cfg.clrch)
            except Exception as e:
                # loud fallback: the jax path produces valid streams but is
                # NOT bit-compatible with native-encoded ones (decode
                # verifies via PlaneStreams.meta)
                import logging

                logging.getLogger(__name__).warning(
                    "native C++ context evaluator unavailable for plane=%d "
                    "level=%d (%s: %s) — falling back to the jax evaluator",
                    plane, level, type(e).__name__, e)
                self._native_cache[key] = None
        return self._native_cache[key]

    def _native_plc_eval(self, plane: int, level: int):
        """Native (C++) whole-plane parent-context pass for the ZTsep level
        path; None if unavailable (falls back to the accelerator pass with
        backend pinning, the round-2 behavior)."""
        if not hasattr(self, "_native_cache"):
            self._native_cache = {}
        key = (plane, "plc", level)
        if key not in self._native_cache:
            try:
                from .native_ctx import PLCPlaneEvaluator
                params_np = jax.device_get(self._plane_params(plane))
                self._native_cache[key] = PLCPlaneEvaluator(
                    params_np, level, 3 * self.cfg.clrch)
            except Exception as e:
                import logging

                logging.getLogger(__name__).warning(
                    "native C++ plc evaluator unavailable for plane=%d "
                    "level=%d (%s: %s) — falling back to the accelerator "
                    "pass (stream pinned to this backend)",
                    plane, level, type(e).__name__, e)
                self._native_cache[key] = None
        return self._native_cache[key]

    # Parent-keyed plc memo: the decoder's parent plane is bit-identical to
    # the encoder's writeback by construction, so an encode+decode round
    # trip (and repeated bench runs on one image) reuse each (plane, level)
    # pass instead of recomputing ~70 GMAC/plane. Size-capped.
    _PLC_MEMO_BYTES = 512 * 1024 * 1024

    def _plc_memoized(self, plane: int, level: int, parent_np, evaluator):
        import hashlib
        import threading
        from collections import OrderedDict

        if not hasattr(self, "_plc_memo"):
            self._plc_memo = OrderedDict()
            self._plc_memo_bytes = 0
            self._plc_memo_lock = threading.Lock()
        key = (plane, level,
               hashlib.blake2b(parent_np.tobytes(), digest_size=16).digest())
        with self._plc_memo_lock:
            hit = self._plc_memo.get(key)
        if hit is None:
            hit = evaluator(parent_np)
            with self._plc_memo_lock:
                self._plc_memo[key] = hit
                self._plc_memo_bytes += hit.nbytes
                while self._plc_memo_bytes > self._PLC_MEMO_BYTES \
                        and len(self._plc_memo) > 1:
                    _, old = self._plc_memo.popitem(last=False)
                    self._plc_memo_bytes -= old.nbytes
        return hit

    def _native_pixelcnn_eval(self, plane: int, kind: str):
        """Native (C++) PixelCNN center evaluator for the ZTsep xe /
        coarsest-details wavefronts; None if unavailable."""
        if not hasattr(self, "_native_cache"):
            self._native_cache = {}
        key = (plane, kind)
        if key not in self._native_cache:
            try:
                from .native_ctx import PixelCNNWalker
                which = "pixelcnn_xe" if kind == "xe" else "pixelcnn_xo"
                ic = (1 if kind == "xe" else 3) * self.cfg.clrch
                params_np = jax.device_get(self._plane_params(plane))
                self._native_cache[key] = PixelCNNWalker(
                    params_np, which, ic)
            except Exception as e:
                import logging

                logging.getLogger(__name__).warning(
                    "native C++ PixelCNN evaluator unavailable for plane=%d "
                    "kind=%s (%s: %s) — falling back to the jax evaluator",
                    plane, kind, type(e).__name__, e)
                self._native_cache[key] = None
        return self._native_cache[key]

    def _plane_params_cpu(self, plane: int):
        """Host-CPU copy of one plane's params (for latency-bound AR loops:
        the per-diagonal context nets are tiny, so evaluating them on the
        host CPU backend avoids one accelerator round trip per diagonal)."""
        if plane not in self._plane_params_cpu_cache:
            cpu = jax.devices("cpu")[0]
            self._plane_params_cpu_cache[plane] = jax.device_put(
                self._plane_params(plane), cpu)
        return self._plane_params_cpu_cache[plane]

    def _jit(self, key, fn):
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                lambda params, *args: self._plane_codec.apply(
                    {"params": params}, *args, method=fn))
        return self._jit_cache[key]

    def _entropy_plane_cpu(self, plane: int, name: str, *static):
        """CPU-backend jit of a whole-plane entropy param method."""
        key = ("cpu_plane", name) + static

        def fn(m, *args):
            return getattr(m.entropymodel, name)(*static, *args)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                lambda p, *a: self._plane_codec.apply(
                    {"params": p}, *a, method=fn))
        fn_jit = self._jit_cache[key]
        cpu = jax.devices("cpu")[0]
        params = self._plane_params_cpu(plane)

        def call(*args):
            with jax.default_device(cpu):
                return fn_jit(params, *args)
        return call

    def _entropy_codes_cpu(self, plane: int, name: str, *static):
        """CPU-backend jit of an entropy param method fused with
        ``build_indexes``: (args...) -> (indexes, mu), no TPU round trip."""
        key = ("cpu_codes", name) + static
        if key not in self._jit_cache:
            def fn(m, *args):
                sigma, mu = getattr(m.entropymodel, name)(*static, *args)
                return gaussian.build_indexes(sigma), mu
            self._jit_cache[key] = jax.jit(
                lambda p, *a: self._plane_codec.apply(
                    {"params": p}, *a, method=fn))
        fn_jit = self._jit_cache[key]
        cpu = jax.devices("cpu")[0]
        params = self._plane_params_cpu(plane)

        def call(*args):
            with jax.default_device(cpu):
                return fn_jit(params, *args)
        return call

    def _analysis(self, plane: int):
        fn = self._jit(("enc",), lambda m, x: m.transform.encode(x))
        return lambda _params, x: fn(self._plane_params(plane), x)

    def _synthesis(self, plane: int):
        fn = self._jit(("dec",),
                       lambda m, xe, xo: m.transform.decode(xe, list(xo)))
        return lambda _params, xe, xo: fn(self._plane_params(plane), xe, xo)

    # --- fused multi-plane transform dispatches --------------------------
    # With clrch == 1 the three YCbCr planes have independent param trees;
    # running their analysis (and synthesis) sequentially inside ONE jitted
    # call turns 3 tunneled round trips into 1 without the batched-kernel
    # conv penalty a params-vmap would pay (see CLAUDE.md).
    def _analysis_all(self):
        key = ("enc_all", self.n_planes)
        if key not in self._jit_cache:
            codec = self._plane_codec

            def enc_one(p, y):
                return codec.apply({"params": p}, y,
                                   method=lambda m, v: m.transform.encode(v))

            self._jit_cache[key] = jax.jit(
                lambda ps, ys: tuple(enc_one(p, y)
                                     for p, y in zip(ps, ys)))
        fn = self._jit_cache[key]
        params = tuple(self._plane_params(p) for p in range(self.n_planes))
        return lambda ys: fn(params, tuple(ys))

    def _synthesis_all(self):
        key = ("dec_all", self.n_planes)
        if key not in self._jit_cache:
            codec = self._plane_codec

            def dec_one(p, xe, xo):
                return codec.apply(
                    {"params": p}, xe, list(xo),
                    method=lambda m, a, b: m.transform.decode(a, b))

            self._jit_cache[key] = jax.jit(
                lambda ps, xs: tuple(dec_one(p, xe, xo)
                                     for p, (xe, xo) in zip(ps, xs)))
        fn = self._jit_cache[key]
        params = tuple(self._plane_params(p) for p in range(self.n_planes))
        return lambda xs: fn(params, tuple(
            (jnp.asarray(xe), tuple(jnp.asarray(t) for t in xo))
            for xe, xo in xs))

    def _entropy_method(self, plane: int, name: str, *static):
        """Jitted entropy-model method with Python-level static leading args
        (level / dep-net / coset indices select submodules, so they must be
        baked into the trace; planes share the compiled fn)."""
        key = (name,) + static

        def fn(m, *args):
            return getattr(m.entropymodel, name)(*static, *args)
        jitted = self._jit(key, fn)
        return lambda _params, *args: jitted(self._plane_params(plane), *args)

    # --- EB (factorized bottleneck) coding ----------------------------
    def _eb_table(self, plane: int, attr: str, index: Optional[int] = None):
        key = (plane, attr, index)
        if key not in self._eb_tables:
            def fn(m):
                eb = getattr(m.entropymodel, attr)
                if index is not None:
                    eb = eb[index]
                pmf, tail, length, offset = eb.pmf_table()
                return pmf, tail, length, offset, eb.medians()
            pmf, tail, length, offset, med = jax.device_get(
                self._plane_codec.apply(
                    {"params": self._plane_params(plane)}, method=fn))
            cdfs, lengths = rans.build_cdf_matrix(
                np.asarray(pmf), np.asarray(tail), np.asarray(length))
            self._eb_tables[key] = (cdfs, lengths,
                                    np.asarray(offset, np.int32),
                                    np.asarray(med))
        return self._eb_tables[key]

    def _eb_encode(self, x: np.ndarray, table) -> Tuple[bytes, np.ndarray]:
        cdfs, lengths, offsets, med = table
        symbols = np.round(x - med).astype(np.int32)
        indexes = np.broadcast_to(
            np.arange(x.shape[-1], dtype=np.int32), x.shape)
        data = rans.encode_with_indexes(
            symbols.ravel(), indexes.ravel(), cdfs, lengths, offsets)
        xhat = symbols.astype(np.float32) + med
        return data, xhat

    def _eb_decode(self, data: bytes, shape, table) -> np.ndarray:
        cdfs, lengths, offsets, med = table
        indexes = np.broadcast_to(
            np.arange(shape[-1], dtype=np.int32), shape)
        symbols = rans.decode_with_indexes(
            data, indexes.ravel(), cdfs, lengths, offsets).reshape(shape)
        return symbols.astype(np.float32) + med

    # --- fused per-step decode kernel ------------------------------------
    # Each host<->device round trip costs real latency, so the device side
    # of one decode step (context params -> CDF indexes + means) is ONE
    # jitted call per level/coset, not two. (The ENCODE side needs no
    # per-step dispatch at all: ``encode_chain`` runs the entire causal
    # chain in one graph — decode can't, its symbols arrive from the host
    # rANS stream between steps.)
    def _fused_dec_params(self, plane: int, name: str, *static):
        key = ("fdec", name) + static
        if key not in self._jit_cache:
            def fn(m, *args):
                sigma, mu = getattr(m.entropymodel, name)(*static, *args)
                return gaussian.build_indexes(sigma), mu
            self._jit_cache[key] = jax.jit(
                lambda p, *a: self._plane_codec.apply(
                    {"params": p}, *a, method=fn))
        fn_jit = self._jit_cache[key]
        return lambda *args: fn_jit(self._plane_params(plane), *args)

    # --- GC (conditional Gaussian) coding ------------------------------
    def _gc_encode(self, x: np.ndarray, sigma, mu) -> Tuple[bytes, np.ndarray]:
        indexes = np.asarray(gaussian.build_indexes(jnp.asarray(sigma)))
        symbols = np.round(np.asarray(x) - np.asarray(mu)).astype(np.int32)
        data = rans.encode_with_indexes(
            symbols.ravel(), indexes.ravel(), self._gc_cdfs,
            self._gc_lengths, self._gc_offsets)
        return data, symbols.astype(np.float32) + np.asarray(mu)

    def _gc_decode(self, data: bytes, sigma, mu) -> np.ndarray:
        indexes = np.asarray(gaussian.build_indexes(jnp.asarray(sigma)))
        symbols = rans.decode_with_indexes(
            data, indexes.ravel(), self._gc_cdfs, self._gc_lengths,
            self._gc_offsets).reshape(indexes.shape)
        return symbols.astype(np.float32) + np.asarray(mu)

    def _gc_stream_decode(self, dec: rans.RansDecoder, sigma, mu) -> np.ndarray:
        indexes = np.asarray(gaussian.build_indexes(jnp.asarray(sigma)))
        symbols = dec.decode_stream(
            indexes.ravel(), self._gc_cdfs, self._gc_lengths,
            self._gc_offsets).reshape(indexes.shape)
        return symbols.astype(np.float32) + np.asarray(mu)

    # --- per-entropy-model plane coding --------------------------------
    def compress_plane(self, plane: int, y: np.ndarray
                       ) -> Tuple[PlaneStreams, List, jnp.ndarray, List]:
        """Analysis + entropy-encode one color plane. Returns streams plus
        the decode-consistent subband reconstructions."""
        xe, xo_list = self._analysis(plane)(self.params, jnp.asarray(y))
        return self._compress_entropy(plane, xe, xo_list)

    def _compress_entropy(self, plane: int, xe, xo_list):
        el = self.cfg.entropy_layer
        if el == "factorized":
            return self._compress_factorized(plane, xe, xo_list)
        if el == "onlyEZWT":
            return self._compress_ezwt(plane, xe, xo_list)
        if el == "DWTConditioned2EntropyLayerZTBlock":
            return self._compress_ztblock(plane, xe, xo_list)
        if el == "conditioned2ZTsepSubbands":
            from .wavefront import compress_ztsep
            return compress_ztsep(self, plane, xe, xo_list)
        raise ValueError(el)

    def _decompress_entropy(self, plane: int, streams: PlaneStreams,
                            xe_shape, xo_shapes):
        el = self.cfg.entropy_layer
        if el == "factorized":
            return self._decompress_factorized(
                plane, streams, xe_shape, xo_shapes)
        if el == "onlyEZWT":
            return self._decompress_ezwt(plane, streams, xe_shape, xo_shapes)
        if el == "DWTConditioned2EntropyLayerZTBlock":
            return self._decompress_ztblock(
                plane, streams, xe_shape, xo_shapes)
        if el == "conditioned2ZTsepSubbands":
            from .wavefront import decompress_ztsep
            return decompress_ztsep(self, plane, streams, xe_shape,
                                    xo_shapes)
        raise ValueError(el)

    def decompress_plane(self, plane: int, streams: PlaneStreams,
                         xe_shape, xo_shapes) -> np.ndarray:
        xe_hat, xo_hat = self._decompress_entropy(plane, streams, xe_shape,
                                                  xo_shapes)
        yhat = self._synthesis(plane)(
            self.params, jnp.asarray(xe_hat),
            tuple(jnp.asarray(t) for t in xo_hat))
        return np.asarray(yhat)

    # factorized ---------------------------------------------------------
    def _compress_factorized(self, plane, xe, xo_list):
        L = self.cfg.dwtlevels
        xo_streams, xo_hats = [], []
        for i in range(L):
            table = self._eb_table(plane, "eb_xo", i)
            data, hat = self._eb_encode(np.asarray(xo_list[i]), table)
            xo_streams.append(data)
            xo_hats.append(hat)
        data_xe, xe_hat = self._eb_encode(
            np.asarray(xe), self._eb_table(plane, "eb_xe"))
        return (PlaneStreams(data_xe, xo_streams), xo_hats, xe_hat, xo_hats)

    def _decompress_factorized(self, plane, streams, xe_shape, xo_shapes):
        xe_hat = self._eb_decode(streams.xe, xe_shape,
                                 self._eb_table(plane, "eb_xe"))
        xo_hat = [self._eb_decode(streams.xo[i], xo_shapes[i],
                                  self._eb_table(plane, "eb_xo", i))
                  for i in range(self.cfg.dwtlevels)]
        return xe_hat, xo_hat

    # onlyEZWT -----------------------------------------------------------
    def _compress_ezwt(self, plane, xe, xo_list):
        L = self.cfg.dwtlevels
        data_xe, xe_hat = self._eb_encode(
            np.asarray(xe), self._eb_table(plane, "eb_xe"))
        xo_streams: List[bytes] = [b""] * L
        xo_hats: List[np.ndarray] = [None] * L
        data, hat = self._eb_encode(
            np.asarray(xo_list[L - 1]), self._eb_table(plane, "eb_xo"))
        xo_streams[L - 1], xo_hats[L - 1] = data, hat
        # whole level chain in ONE dispatch + ONE readback (encode_chain)
        chain = self._jit(
            ("ezwt_chain",),
            lambda m, xo, con: m.entropymodel.encode_chain(list(xo), con))
        syms, idxs, hats = chain(
            self._plane_params(plane),
            tuple(jnp.asarray(t) for t in xo_list), jnp.asarray(hat))
        syms, idxs, hats = jax.device_get((syms, idxs, hats))
        for i in range(L - 2, -1, -1):
            xo_streams[i] = rans.encode_with_indexes(
                syms[i].ravel(), idxs[i].ravel(), self._gc_cdfs,
                self._gc_lengths, self._gc_offsets)
            xo_hats[i] = np.asarray(hats[i])
        return (PlaneStreams(data_xe, xo_streams), xo_hats, xe_hat, xo_hats)

    def _decompress_ezwt(self, plane, streams, xe_shape, xo_shapes):
        L = self.cfg.dwtlevels
        xe_hat = self._eb_decode(streams.xe, xe_shape,
                                 self._eb_table(plane, "eb_xe"))
        xo_hat: List[np.ndarray] = [None] * L
        xo_hat[L - 1] = self._eb_decode(
            streams.xo[L - 1], xo_shapes[L - 1],
            self._eb_table(plane, "eb_xo"))
        con = jnp.asarray(xo_hat[L - 1])
        for i in range(L - 2, -1, -1):
            idx, mu = self._fused_dec_params(
                plane, "level_params_from_parent", i)(con)
            idx, mu = jax.device_get((idx, mu))
            symbols = rans.decode_with_indexes(
                streams.xo[i], idx.ravel(), self._gc_cdfs,
                self._gc_lengths, self._gc_offsets).reshape(idx.shape)
            xo_hat[i] = symbols.astype(np.float32) + mu
            con = jnp.asarray(xo_hat[i])
        return xe_hat, xo_hat

    # ZTBlock ------------------------------------------------------------
    def _compress_ztblock(self, plane, xe, xo_list):
        L, c = self.cfg.dwtlevels, self.cfg.clrch
        data_xe, xe_hat = self._eb_encode(
            np.asarray(xe), self._eb_table(plane, "eb_xe"))
        xo_streams: List[bytes] = [b""] * L
        xo_hats: List[np.ndarray] = [None] * L
        data, hat = self._eb_encode(
            np.asarray(xo_list[L - 1]), self._eb_table(plane, "eb_xo"))
        xo_streams[L - 1], xo_hats[L - 1] = data, hat
        # every level x coset in ONE dispatch + ONE readback (encode_chain)
        chain = self._jit(
            ("ztblock_chain",),
            lambda m, xo, con: m.entropymodel.encode_chain(list(xo), con))
        syms, idxs, hats = chain(
            self._plane_params(plane),
            tuple(jnp.asarray(t) for t in xo_list), jnp.asarray(hat))
        syms, idxs, hats = jax.device_get((syms, idxs, hats))
        for step, lvl in enumerate(range(L - 2, -1, -1)):
            datas = [rans.encode_with_indexes(
                syms[step][k].ravel(), idxs[step][k].ravel(),
                self._gc_cdfs, self._gc_lengths, self._gc_offsets)
                for k in range(4)]
            xo_streams[lvl] = _pack_chunks(datas)
            xo_hats[lvl] = np.asarray(hats[lvl])
        return (PlaneStreams(data_xe, xo_streams), xo_hats, xe_hat, xo_hats)

    def _decompress_ztblock(self, plane, streams, xe_shape, xo_shapes):
        L, c = self.cfg.dwtlevels, self.cfg.clrch
        xe_hat = self._eb_decode(streams.xe, xe_shape,
                                 self._eb_table(plane, "eb_xe"))
        xo_hat: List[np.ndarray] = [None] * L
        xo_hat[L - 1] = self._eb_decode(
            streams.xo[L - 1], xo_shapes[L - 1],
            self._eb_table(plane, "eb_xo"))
        con = jnp.asarray(xo_hat[L - 1])
        for step, lvl in enumerate(range(L - 2, -1, -1)):
            (chunks,) = _unpack_chunks(streams.xo[lvl])
            cosets: List[jnp.ndarray] = []
            for k in range(4):
                sidx, mu = self._fused_dec_params(
                    plane, "level_coset_params", step, k)(con, *cosets)
                sidx, mu = jax.device_get((sidx, mu))
                symbols = rans.decode_with_indexes(
                    chunks[k], sidx.ravel(), self._gc_cdfs,
                    self._gc_lengths, self._gc_offsets).reshape(sidx.shape)
                cosets.append(jnp.asarray(symbols.astype(np.float32) + mu))
            from ..entropy.models import _interleave_cosets
            con = _interleave_cosets(*cosets)
            xo_hat[lvl] = np.asarray(con)
        return xe_hat, xo_hat

    # --- top level ------------------------------------------------------
    def compress_decompress(self, batch: np.ndarray) -> CodecResult:
        """Full round trip for a batch of RGB images in [0,1]; returns the
        reconstruction, true bitstream bpp and PSNR (reference
        ``agents/liftingDWT_agent.py:262-311`` semantics)."""
        cfg = self.cfg
        b, h, w, _ = batch.shape
        assert b == 1, "coding path processes one image at a time"
        if cfg.clrch == 3:
            planes = [batch - 0.5]
        else:
            ycbcr = np.asarray(color.shift_ycbcr(
                color.rgb_to_ycbcr(jnp.asarray(batch))))
            planes = [ycbcr[..., i:i + 1] for i in range(3)]

        # All planes' analysis in ONE dispatch (fused multi-plane graph),
        # then per-plane entropy round trips (threaded: overlapping RTTs),
        # then all planes' synthesis in ONE dispatch.
        if len(planes) > 1:
            xe_xo = self._analysis_all()(jnp.asarray(p) for p in planes)
        else:
            xe_xo = [self._analysis(0)(self.params, jnp.asarray(planes[0]))]

        def roundtrip(p):
            xe, xo_list = xe_xo[p]
            plane_streams, _, xe_hat, xo_hats = self._compress_entropy(
                p, xe, xo_list)
            xe_hat2, xo_hat2 = self._decompress_entropy(
                p, plane_streams, xe_hat.shape, [t.shape for t in xo_hats])
            return plane_streams, xe_hat2, xo_hat2

        if len(planes) > 1 and self._warm:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=len(planes)) as pool:
                results = list(pool.map(roundtrip, range(len(planes))))
        else:
            results = [roundtrip(p) for p in range(len(planes))]
            self._warm = True
        streams = [r[0] for r in results]
        if len(planes) > 1:
            yhats = [np.asarray(t) for t in self._synthesis_all()(
                [(r[1], r[2]) for r in results])]
        else:
            yhats = [np.asarray(self._synthesis(0)(
                self.params, jnp.asarray(results[0][1]),
                tuple(jnp.asarray(t) for t in results[0][2])))]

        if cfg.clrch == 3:
            xhat = np.clip(yhats[0], -0.5, 0.5) + 0.5
        else:
            y = np.concatenate(yhats, axis=-1)
            xhat = np.asarray(color.ycbcr_to_rgb(
                color.unshift_ycbcr(jnp.asarray(y))))
            xhat = np.clip(xhat, 0.0, 1.0)
        total_bytes = sum(s.nbytes() for s in streams)
        bpp = total_bytes * 8.0 / (h * w)
        mse = float(np.mean((batch - xhat) ** 2))
        psnr = float(-10.0 * np.log10(max(mse, 1e-12)))
        return CodecResult(xhat, bpp, psnr, streams)


    def compress_decompress_many(self, images, workers: int = 2
                                 ) -> List[CodecResult]:
        """Image-parallel coding harness (VERDICT r3 item 3): pipeline N
        single-image round trips so one image's host-CPU coding work (rANS,
        native context walks) overlaps another's accelerator dispatches.
        The first image runs alone to build the jit/native caches; the
        rest run under a thread pool. Results keep input order; streams
        are identical to sequential coding (each image's round trip is
        self-contained).

        CAVEAT (measured 2026-08-21): on a 1-core host behind the
        tunneled single-stream backend, ``workers>1`` is COUNTER-
        productive — ``compress_decompress`` already threads its three
        plane round trips internally, and stacking image-level workers on
        top yields six concurrent dispatch chains whose RTTs multiply
        (25 s/img pipelined vs 5.4 s/img sequential). Use ``workers=1``
        there; ``workers>1`` is for hosts with local dispatch and spare
        cores."""
        if not images:
            return []
        first = self.compress_decompress(images[0])
        rest = list(images[1:])
        if not rest:
            return [first]
        if workers <= 1:
            return [first] + [self.compress_decompress(im) for im in rest]
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=workers) as pool:
            out = list(pool.map(self.compress_decompress, rest))
        return [first] + out


def _pack_chunks(chunks) -> bytes:
    """Length-prefixed concatenation of nested byte chunks."""
    flat: List[bytes] = []

    def walk(c):
        if isinstance(c, (bytes, bytearray)):
            flat.append(bytes(c))
        else:
            for e in c:
                walk(e)
    walk(chunks)
    out = [np.int64(len(flat)).tobytes()]
    for f in flat:
        out.append(np.int64(len(f)).tobytes())
        out.append(f)
    return b"".join(out)


def _unpack_chunks(data: bytes, group: int = 4):
    """Inverse of :func:`_pack_chunks`, regrouped into lists of ``group``."""
    n = int(np.frombuffer(data[:8], np.int64)[0])
    pos = 8
    flat: List[bytes] = []
    for _ in range(n):
        ln = int(np.frombuffer(data[pos:pos + 8], np.int64)[0])
        pos += 8
        flat.append(data[pos:pos + ln])
        pos += ln
    return [flat[i:i + group] for i in range(0, len(flat), group)]
