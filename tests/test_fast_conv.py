"""FastConv3x3 == nn.Conv numerically (up to bf16 rounding)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.ops.fast_conv import (
    FastConv3x3, conv3x3_im2colT)


def test_fast_conv_matches_nn_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 24, 8).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, 8, 12).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(12).astype(np.float32) * 0.1)
    ref = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    out = conv3x3_im2colT(x, kernel, bias, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    out_bf16 = conv3x3_im2colT(x, kernel, bias, dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out_bf16), np.asarray(ref),
                               atol=0.05)


def test_fast_conv_module_param_compat():
    """Param tree must be identical to nn.Conv (for checkpoints/import)."""
    x = jnp.zeros((1, 8, 8, 4))
    fast = FastConv3x3(6)
    ref = nn.Conv(6, (3, 3), padding="SAME")
    vf = fast.init(jax.random.PRNGKey(0), x)
    vr = ref.init(jax.random.PRNGKey(0), x)
    sf = jax.tree_util.tree_map(lambda a: a.shape, vf)
    sr = jax.tree_util.tree_map(lambda a: a.shape, vr)
    assert sf == sr
    # same init rng -> same values
    for a, b in zip(jax.tree_util.tree_leaves(vf),
                    jax.tree_util.tree_leaves(vr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_conv5x5_s2d_matches_nn_conv():
    """Polyphase 5x5 must be EXACT in fp32 (same FLOPs, reordered)."""
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.ops.fast_conv import (
        conv5x5_s2d)

    rng = np.random.RandomState(1)
    for cin, cout, h, w in ((1, 32, 16, 24), (32, 32, 8, 12), (3, 5, 6, 6)):
        x = jnp.asarray(rng.randn(2, h, w, cin).astype(np.float32))
        kernel = jnp.asarray(
            rng.randn(5, 5, cin, cout).astype(np.float32) * 0.1)
        bias = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
        ref = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        out = conv5x5_s2d(x, kernel, bias, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
        out_bf16 = conv5x5_s2d(x, kernel, bias, dtype=jnp.bfloat16)
        np.testing.assert_allclose(np.asarray(out_bf16), np.asarray(ref),
                                   atol=0.05 * max(1.0, cin ** 0.5))


def test_fast_conv5x5_module_param_compat_and_odd_fallback():
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.ops.fast_conv import (
        FastConv5x5)

    x = jnp.zeros((1, 8, 8, 4))
    fast = FastConv5x5(6, dtype=jnp.float32)
    ref = nn.Conv(6, (5, 5), padding="SAME")
    vf = fast.init(jax.random.PRNGKey(0), x)
    vr = ref.init(jax.random.PRNGKey(0), x)
    sf = jax.tree_util.tree_map(lambda a: a.shape, vf)
    sr = jax.tree_util.tree_map(lambda a: a.shape, vr)
    assert sf == sr
    # odd spatial dims take the plain-conv fallback; same params, same out
    rng = np.random.RandomState(2)
    xo = jnp.asarray(rng.randn(1, 7, 9, 4).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(fast.apply(vf, xo)), np.asarray(ref.apply(vf, xo)),
        atol=1e-5)


def test_fast_conv5x5_differentiable_bf16():
    """jax.grad must flow through the bf16 polyphase conv (the flagship
    TRAIN step hit a conv-transpose dtype mismatch when the forward
    produced an fp32 output from bf16 operands)."""
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.ops.fast_conv import (
        FastConv5x5)

    x = jnp.ones((1, 8, 8, 2))
    mod = FastConv5x5(4, dtype=jnp.bfloat16)
    v = mod.init(jax.random.PRNGKey(0), x)

    def loss(params, x):
        return jnp.sum(mod.apply(params, x) ** 2)

    g = jax.grad(loss)(v, x)
    assert all(np.isfinite(np.asarray(t)).all()
               for t in jax.tree_util.tree_leaves(g))
    gx = jax.grad(loss, argnums=1)(v, x)
    assert np.isfinite(np.asarray(gx)).all()


def test_grouped_conv1x1_einsum_matches_lax():
    """Block-diagonal einsum == lax grouped 1x1 conv (fp32 exactness)."""
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.ops.fast_conv import (
        grouped_conv1x1_einsum)

    rng = np.random.RandomState(0)
    G, cin, cout = 3, 486, 162
    x = jnp.asarray(rng.randn(2, 6, 7, cin).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1, cin // G, cout).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(cout).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=G) + b
    got = grouped_conv1x1_einsum(x, k, b, groups=G, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_grouped_conv_taps_matches_lax():
    """T-tap batched matmul == lax grouped SAME conv, incl. mask pre-fold
    (the csc 5x5-A shape) and a 3x3 multi-input-channel case."""
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.ops.fast_conv import (
        grouped_conv_taps)
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.ops.masked_conv import (
        causal_mask)

    rng = np.random.RandomState(1)
    for (kh, G, cin, cout, mask_type) in ((5, 3, 3, 243, "A"),
                                          (3, 3, 12, 24, None)):
        x = jnp.asarray(rng.randn(2, 8, 10, cin).astype(np.float32))
        k = jnp.asarray(
            rng.randn(kh, kh, cin // G, cout).astype(np.float32) * 0.1)
        if mask_type:
            m = jnp.asarray(causal_mask((kh, kh), mask_type))
            k = k * m[:, :, None, None]
        b = jnp.asarray(rng.randn(cout).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=G) + b
        got = grouped_conv_taps(x, k, b, groups=G, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4)
