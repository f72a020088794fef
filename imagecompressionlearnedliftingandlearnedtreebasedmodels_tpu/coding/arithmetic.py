"""Standalone arithmetic-coding utilities (reference ``utils/ae.py``).

The reference keeps a side-path coder built on the ``range_coder`` C
extension with strict CDF validation and a ``measure_bpp`` round-trip assert
(``utils/ae.py:37-42,145-150``). Here the same utility surface is backed by
our C++ rANS library: per-channel symbol coding against quantized CDFs, an
adaptive per-symbol variant, and the validation asserts kept as API.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from . import rans

PRECISION = 16


def validate_cdf(cdf: np.ndarray) -> None:
    """CDF well-formedness asserts (reference ``utils/ae.py:145-150``):
    16-bit normalization, monotone, starts at 0."""
    cdf = np.asarray(cdf)
    assert cdf[0] == 0, "cdf must start at 0"
    assert cdf[-1] == (1 << PRECISION), "cdf must be normalized to 2^16"
    assert (np.diff(cdf) >= 1).all(), "cdf must be strictly increasing"


def _with_escape(row: np.ndarray) -> np.ndarray:
    """Append a 1-wide escape interval (the rANS rows treat the final
    interval as escape), stealing one count from the widest bin."""
    row = np.asarray(row, np.int64).copy()
    widest = int(np.argmax(np.diff(row)))
    row[widest + 1:] -= 1
    return np.concatenate([row, [1 << PRECISION]]).astype(np.uint32)


class ArithmeticCoder:
    """Encode/decode per-channel symbol lists against per-channel CDFs.

    ``cdfs``: list of quantized CDF arrays (one per channel), each summing
    to 2^16; symbols are non-negative ints below ``len(cdf)-1``.
    """

    def __init__(self, cdfs: Sequence[np.ndarray]):
        for c in cdfs:
            validate_cdf(c)
        max_len = max(len(c) for c in cdfs)
        self.cdfs = np.zeros((len(cdfs), max_len + 1), np.uint32)
        self.lengths = np.zeros(len(cdfs), np.int32)
        for i, c in enumerate(cdfs):
            row = _with_escape(c)
            self.cdfs[i, : len(row)] = row
            self.lengths[i] = len(row)
        self.offsets = np.zeros(len(cdfs), np.int32)

    def encode(self, symbols_per_channel: Sequence[Sequence[int]]) -> bytes:
        syms, idxs = [], []
        for ch, symbols in enumerate(symbols_per_channel):
            syms.append(np.asarray(symbols, np.int32))
            idxs.append(np.full(len(symbols), ch, np.int32))
        return rans.encode_with_indexes(
            np.concatenate(syms), np.concatenate(idxs), self.cdfs,
            self.lengths, self.offsets)

    def decode(self, data: bytes, counts: Sequence[int]) -> List[np.ndarray]:
        idxs = np.concatenate([
            np.full(n, ch, np.int32) for ch, n in enumerate(counts)])
        flat = rans.decode_with_indexes(data, idxs, self.cdfs, self.lengths,
                                        self.offsets)
        out, pos = [], 0
        for n in counts:
            out.append(flat[pos:pos + n])
            pos += n
        return out

    def measure_bpp(self, symbols_per_channel, num_pixels: int) -> float:
        """Encode, decode, assert bit-exact recovery, return bits/pixel
        (reference ``utils/ae.py:37-42``)."""
        data = self.encode(symbols_per_channel)
        decoded = self.decode(data, [len(s) for s in symbols_per_channel])
        for got, want in zip(decoded, symbols_per_channel):
            assert np.array_equal(got, np.asarray(want)), \
                "arithmetic coder round-trip mismatch"
        return len(data) * 8.0 / num_pixels


class ContextArithmeticCoder:
    """Per-symbol adaptive CDFs (reference ``ContextArithmeticCoder``):
    every symbol carries its own CDF row."""

    @staticmethod
    def _matrix(cdfs):
        max_len = max(len(c) for c in cdfs) + 1
        mat = np.zeros((len(cdfs), max_len), np.uint32)
        lengths = np.zeros(len(cdfs), np.int32)
        for i, c in enumerate(cdfs):
            validate_cdf(c)
            row = _with_escape(c)
            mat[i, : len(row)] = row
            lengths[i] = len(row)
        return mat, lengths

    def encode(self, symbols: Sequence[int],
               cdfs: Sequence[np.ndarray]) -> bytes:
        assert len(symbols) == len(cdfs)
        mat, lengths = self._matrix(cdfs)
        idxs = np.arange(len(symbols), dtype=np.int32)
        return rans.encode_with_indexes(
            np.asarray(symbols, np.int32), idxs, mat, lengths,
            np.zeros(len(cdfs), np.int32))

    def decode(self, data: bytes, cdfs: Sequence[np.ndarray]) -> np.ndarray:
        mat, lengths = self._matrix(cdfs)
        idxs = np.arange(len(cdfs), dtype=np.int32)
        return rans.decode_with_indexes(data, idxs, mat, lengths,
                                        np.zeros(len(cdfs), np.int32))
