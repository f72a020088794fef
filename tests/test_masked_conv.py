"""Masked conv causality properties (mask correctness per SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.ops.masked_conv import (
    ChannelIncrementalConv2d, MaskedConv2d, causal_mask)


def test_causal_mask_shapes():
    a = causal_mask((3, 3), "A")
    b = causal_mask((3, 3), "B")
    np.testing.assert_array_equal(a, [[1, 1, 1], [1, 0, 0], [0, 0, 0]])
    np.testing.assert_array_equal(b, [[1, 1, 1], [1, 1, 0], [0, 0, 0]])


@pytest.mark.parametrize("mask_type,center_used", [("A", False), ("B", True)])
def test_spatial_causality(mask_type, center_used):
    """Perturbing a future pixel must not change the output at (i, j)."""
    model = MaskedConv2d(4, (5, 5), mask_type=mask_type)
    x = jnp.zeros((1, 8, 8, 2))
    variables = model.init(jax.random.PRNGKey(0), x)
    base = model.apply(variables, x)
    i, j = 4, 4
    # future pixel (same row, right)
    x2 = x.at[0, i, j + 1, 0].set(10.0)
    out2 = model.apply(variables, x2)
    assert np.allclose(np.asarray(base[0, i, j]), np.asarray(out2[0, i, j]))
    # next row
    x3 = x.at[0, i + 1, j - 2, 0].set(10.0)
    out3 = model.apply(variables, x3)
    assert np.allclose(np.asarray(base[0, i, j]), np.asarray(out3[0, i, j]))
    # center pixel itself
    x4 = x.at[0, i, j, 0].set(10.0)
    out4 = model.apply(variables, x4)
    same = np.allclose(np.asarray(base[0, i, j]), np.asarray(out4[0, i, j]))
    assert same != center_used
    # past pixel must flow through
    x5 = x.at[0, i - 1, j, 0].set(10.0)
    out5 = model.apply(variables, x5)
    assert not np.allclose(np.asarray(base[0, i, j]),
                           np.asarray(out5[0, i, j]))


def test_channel_incremental_causality():
    model = ChannelIncrementalConv2d(6, (3, 3), blocks=3, mask_type="A")
    x = jnp.zeros((1, 4, 4, 6))
    variables = model.init(jax.random.PRNGKey(0), x)
    base = model.apply(variables, x)
    # block 2 input change must not affect block 0/1 outputs
    x2 = x.at[0, 2, 2, 5].set(7.0)
    out2 = model.apply(variables, x2)
    assert np.allclose(np.asarray(base[..., :4]), np.asarray(out2[..., :4]))
    # block 0 input change must affect later blocks
    x3 = x.at[0, 2, 2, 0].set(7.0)
    out3 = model.apply(variables, x3)
    assert not np.allclose(np.asarray(base[..., 2:]),
                           np.asarray(out3[..., 2:]))
