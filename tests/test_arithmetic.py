"""ArithmeticCoder utility parity tests (reference utils/ae.py asserts)."""

import numpy as np
import pytest

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding.arithmetic import (
    ArithmeticCoder, ContextArithmeticCoder, validate_cdf)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding.rans import (
    pmf_to_quantized_cdf)


def _cdf(pmf):
    return pmf_to_quantized_cdf(np.asarray(pmf) / np.sum(pmf))


def test_validate_cdf():
    validate_cdf(_cdf([1, 2, 3]))
    with pytest.raises(AssertionError):
        validate_cdf(np.array([0, 10, 5, 1 << 16]))
    with pytest.raises(AssertionError):
        validate_cdf(np.array([0, 10, 20]))


def test_measure_bpp_roundtrip():
    rng = np.random.RandomState(0)
    cdfs = [_cdf(rng.rand(8) + 0.1) for _ in range(3)]
    coder = ArithmeticCoder(cdfs)
    symbols = [rng.randint(0, 8, 500) for _ in range(3)]
    bpp = coder.measure_bpp(symbols, num_pixels=500)
    assert 0 < bpp < 3 * 8  # sane range


def test_context_coder_roundtrip():
    rng = np.random.RandomState(1)
    n = 400
    cdfs = [_cdf(rng.rand(rng.randint(4, 12)) + 0.05) for _ in range(n)]
    symbols = [rng.randint(0, len(c) - 1) for c in cdfs]
    coder = ContextArithmeticCoder()
    data = coder.encode(symbols, cdfs)
    decoded = coder.decode(data, cdfs)
    np.testing.assert_array_equal(decoded, symbols)
