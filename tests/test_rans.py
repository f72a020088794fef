"""rANS coder: round-trip property tests (reference utils/ae.py's
round-trip asserts, SURVEY.md section 4 test pyramid item 2)."""

import numpy as np
import pytest

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding import rans


def _random_cdfs(rng, n_rows=4, max_support=16):
    pmfs, tails, lengths = [], [], []
    for _ in range(n_rows):
        ln = rng.randint(3, max_support)
        p = rng.dirichlet(np.ones(ln)) * 0.999
        pmfs.append(p)
        tails.append(1.0 - p.sum())
        lengths.append(ln)
    max_len = max(lengths)
    mat = np.zeros((n_rows, max_len))
    for i, p in enumerate(pmfs):
        mat[i, : len(p)] = p
    return rans.build_cdf_matrix(mat, np.array(tails), np.array(lengths))


def test_pmf_to_quantized_cdf_is_valid():
    rng = np.random.RandomState(0)
    for _ in range(20):
        n = rng.randint(2, 40)
        pmf = rng.dirichlet(np.ones(n))
        cdf = rans.pmf_to_quantized_cdf(pmf)
        assert cdf[0] == 0
        assert cdf[-1] == 1 << 16
        assert (np.diff(cdf) >= 1).all()  # no zero-width interval


def test_roundtrip_in_range_symbols():
    rng = np.random.RandomState(1)
    cdfs, lengths = _random_cdfs(rng)
    offsets = np.array([-3, 0, 2, -5], dtype=np.int32)
    n = 2000
    indexes = rng.randint(0, 4, n).astype(np.int32)
    symbols = np.array([
        rng.randint(0, lengths[i] - 2) + offsets[i] for i in indexes],
        dtype=np.int32)
    data = rans.encode_with_indexes(symbols, indexes, cdfs, lengths, offsets)
    decoded = rans.decode_with_indexes(data, indexes, cdfs, lengths, offsets)
    np.testing.assert_array_equal(decoded, symbols)


def test_roundtrip_with_escape_symbols():
    rng = np.random.RandomState(2)
    cdfs, lengths = _random_cdfs(rng)
    offsets = np.zeros(4, dtype=np.int32)
    n = 500
    indexes = rng.randint(0, 4, n).astype(np.int32)
    # include wild out-of-range values in both directions
    symbols = rng.randint(-1000, 1000, n).astype(np.int32)
    data = rans.encode_with_indexes(symbols, indexes, cdfs, lengths, offsets)
    decoded = rans.decode_with_indexes(data, indexes, cdfs, lengths, offsets)
    np.testing.assert_array_equal(decoded, symbols)


def test_streaming_decode_matches_oneshot():
    rng = np.random.RandomState(3)
    cdfs, lengths = _random_cdfs(rng)
    offsets = np.array([0, 1, -1, 2], dtype=np.int32)
    n = 300
    indexes = rng.randint(0, 4, n).astype(np.int32)
    symbols = np.array([
        rng.randint(0, lengths[i] - 2) + offsets[i] for i in indexes],
        dtype=np.int32)
    data = rans.encode_with_indexes(symbols, indexes, cdfs, lengths, offsets)

    dec = rans.RansDecoder()
    dec.set_stream(data)
    # consume in irregular chunks (like wavefront diagonals)
    out = []
    pos = 0
    for chunk in (7, 100, 1, 50, n - 158):
        out.append(dec.decode_stream(indexes[pos:pos + chunk], cdfs,
                                     lengths, offsets))
        pos += chunk
    np.testing.assert_array_equal(np.concatenate(out), symbols)


def test_rate_close_to_entropy():
    """Coded length must be within a few percent of the pmf entropy."""
    rng = np.random.RandomState(4)
    ln = 32
    p = rng.dirichlet(np.ones(ln) * 0.5) * 0.999
    mat = p[None, :]
    cdfs, lengths = rans.build_cdf_matrix(
        mat, np.array([1 - p.sum()]), np.array([ln]))
    offsets = np.zeros(1, dtype=np.int32)
    n = 50000
    symbols = rng.choice(ln, n, p=p / p.sum()).astype(np.int32)
    indexes = np.zeros(n, dtype=np.int32)
    data = rans.encode_with_indexes(symbols, indexes, cdfs, lengths, offsets)
    entropy_bits = -np.sum(np.log2(p / p.sum()) * (p / p.sum())) * n
    actual_bits = len(data) * 8
    assert actual_bits < entropy_bits * 1.03 + 64


def test_empty_and_single_symbol():
    cdfs, lengths = _random_cdfs(np.random.RandomState(5), n_rows=1)
    offsets = np.zeros(1, dtype=np.int32)
    data = rans.encode_with_indexes(
        np.zeros(1, np.int32), np.zeros(1, np.int32), cdfs, lengths, offsets)
    out = rans.decode_with_indexes(
        data, np.zeros(1, np.int32), cdfs, lengths, offsets)
    assert out[0] == 0
