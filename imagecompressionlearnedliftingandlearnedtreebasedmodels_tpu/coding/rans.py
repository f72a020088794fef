"""ctypes binding + build driver for the C++ rANS coder.

Python-facing API mirrors the reference's native coding surface
(``compressai.ans`` semantics at ``LiftingBasedDWT_net.py:502-505,540-546``):

- :class:`BufferedRansEncoder` — accumulate ``(symbols, indexes)`` batches,
  ``flush()`` to one byte stream.
- :class:`RansDecoder` — ``set_stream(bytes)`` + incremental
  ``decode_stream(indexes)`` calls (the wavefront decode consumes one
  anti-diagonal per call).
- :func:`pmf_to_quantized_cdf` — 16-bit CDF quantization (the piece
  compressai implements in C++ as ``_CXX.pmf_to_quantized_cdf``).

The shared library is compiled on demand with g++ -O3 and cached next to
the source; rebuilds happen when the source is newer than the binary.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "csrc", "rans.cpp")
_HDR = os.path.join(os.path.dirname(__file__), "csrc", "rans_core.h")
_LIB = os.path.join(os.path.dirname(__file__), "csrc", "librans.so")
_BUILD_LOCK = threading.Lock()
_lib = None


def _build() -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    with _BUILD_LOCK:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < max(os.path.getmtime(_SRC),
                                                os.path.getmtime(_HDR))):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.rans_encode_with_indexes.restype = ctypes.c_int64
        lib.rans_decode_with_indexes.restype = ctypes.c_int64
        lib.rans_decoder_new.restype = ctypes.c_void_p
        lib.rans_decoder_decode.restype = ctypes.c_int64
        lib.pmf_to_quantized_cdf.restype = ctypes.c_int32
        _lib = lib
        return _lib


def _as_i32(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.int32)


def _as_u32(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.uint32)


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def pmf_to_quantized_cdf(pmf: Sequence[float], precision: int = 16
                         ) -> np.ndarray:
    """Quantize one pmf row (tail mass as the last element) to a CDF of
    length ``len(pmf) + 1`` summing exactly to ``2**precision``."""
    lib = get_lib()
    pmf = np.ascontiguousarray(pmf, dtype=np.float64)
    out = np.zeros(len(pmf) + 1, dtype=np.uint32)
    rc = lib.pmf_to_quantized_cdf(
        _ptr(pmf, ctypes.c_double), len(pmf), precision,
        _ptr(out, ctypes.c_uint32))
    if rc != 0:
        raise ValueError(f"pmf_to_quantized_cdf failed with code {rc}")
    return out


def build_cdf_matrix(pmfs: np.ndarray, tails: np.ndarray,
                     pmf_lengths: np.ndarray, precision: int = 16):
    """Stack variable-length pmf rows into the (cdfs, lengths) matrix the
    coder consumes. Row i codes symbols ``0..pmf_lengths[i]-1`` plus the
    escape/tail interval."""
    n = len(pmf_lengths)
    max_cdf_len = int(np.max(pmf_lengths)) + 2
    cdfs = np.zeros((n, max_cdf_len), dtype=np.uint32)
    lengths = np.zeros(n, dtype=np.int32)
    for i in range(n):
        ln = int(pmf_lengths[i])
        row = np.concatenate([pmfs[i, :ln], [max(float(tails[i]), 1e-12)]])
        cdf = pmf_to_quantized_cdf(row, precision)
        cdfs[i, : ln + 2] = cdf
        lengths[i] = ln + 2
    return cdfs, lengths


class BufferedRansEncoder:
    """Accumulates symbol/index batches; one stream out on flush.

    All batches of one flush must share the same CDF tables (the stream
    holds no per-batch table framing). Unlike compressai — which silently
    keeps the last tables — mixing tables raises immediately instead of
    corrupting earlier batches.
    """

    def __init__(self):
        self._symbols: List[np.ndarray] = []
        self._indexes: List[np.ndarray] = []
        self._cdfs = None

    def encode_with_indexes(self, symbols, indexes, cdfs, cdf_lengths,
                            offsets) -> None:
        self._symbols.append(_as_i32(np.asarray(symbols).ravel()))
        self._indexes.append(_as_i32(np.asarray(indexes).ravel()))
        cdfs = _as_u32(cdfs)
        cdf_lengths = _as_i32(cdf_lengths)
        offsets = _as_i32(offsets)
        if self._cdfs is None:
            self._cdfs, self._cdf_lengths, self._offsets = (
                cdfs, cdf_lengths, offsets)
        elif not (np.array_equal(self._cdfs, cdfs)
                  and np.array_equal(self._cdf_lengths, cdf_lengths)
                  and np.array_equal(self._offsets, offsets)):
            raise ValueError(
                "BufferedRansEncoder: CDF tables changed between batches "
                "of one flush; flush() per table set instead")

    def flush(self) -> bytes:
        if self._cdfs is None:
            return b""
        lib = get_lib()
        symbols = (np.concatenate(self._symbols)
                   if self._symbols else np.zeros(0, np.int32))
        indexes = (np.concatenate(self._indexes)
                   if self._indexes else np.zeros(0, np.int32))
        assert symbols.shape == indexes.shape
        capacity = max(1024, symbols.size * 8 + 1024)
        out = np.zeros(capacity, dtype=np.uint8)
        n = lib.rans_encode_with_indexes(
            _ptr(symbols, ctypes.c_int32), _ptr(indexes, ctypes.c_int32),
            symbols.size, _ptr(self._cdfs, ctypes.c_uint32),
            self._cdfs.shape[1], _ptr(self._cdf_lengths, ctypes.c_int32),
            _ptr(self._offsets, ctypes.c_int32),
            _ptr(out, ctypes.c_uint8), capacity)
        if n < 0:
            raise RuntimeError("rANS encode buffer overflow")
        self._symbols, self._indexes, self._cdfs = [], [], None
        return bytes(out[:n].tobytes())


def encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets) -> bytes:
    enc = BufferedRansEncoder()
    enc.encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets)
    return enc.flush()


class RansDecoder:
    """Streaming decoder over one byte stream."""

    def __init__(self):
        self._handle = None

    def set_stream(self, data: bytes) -> None:
        lib = get_lib()
        self._free()
        buf = np.frombuffer(data, dtype=np.uint8)
        buf = np.ascontiguousarray(buf)
        self._handle = lib.rans_decoder_new(
            _ptr(buf, ctypes.c_uint8), buf.size)

    def decode_stream(self, indexes, cdfs, cdf_lengths, offsets) -> np.ndarray:
        assert self._handle is not None, "set_stream first"
        lib = get_lib()
        indexes = _as_i32(np.asarray(indexes).ravel())
        cdfs = _as_u32(cdfs)
        out = np.zeros(indexes.size, dtype=np.int32)
        lib.rans_decoder_decode(
            ctypes.c_void_p(self._handle), _ptr(indexes, ctypes.c_int32),
            indexes.size, _ptr(cdfs, ctypes.c_uint32), cdfs.shape[1],
            _ptr(_as_i32(cdf_lengths), ctypes.c_int32),
            _ptr(_as_i32(offsets), ctypes.c_int32),
            _ptr(out, ctypes.c_int32))
        return out

    def _free(self):
        if self._handle is not None:
            get_lib().rans_decoder_free(ctypes.c_void_p(self._handle))
            self._handle = None

    def __del__(self):
        try:
            self._free()
        except Exception:
            pass


def decode_with_indexes(data: bytes, indexes, cdfs, cdf_lengths,
                        offsets) -> np.ndarray:
    dec = RansDecoder()
    dec.set_stream(data)
    return dec.decode_stream(indexes, cdfs, cdf_lengths, offsets)
