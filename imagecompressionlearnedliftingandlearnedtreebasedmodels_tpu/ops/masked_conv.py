"""PixelCNN-style causally masked convolutions (types A and B).

TPU-native counterpart of the reference's ``graphs/layers/masked_conv2d.py``.
Instead of mutating ``weight.data`` in-place each forward (reference
``masked_conv2d.py:19-21``), the mask is a constant folded into the conv at
trace time — XLA sees an ordinary convolution with zeroed taps, which it maps
straight onto the MXU.

Mask semantics (NHWC, kernel (kh, kw)): position (i, j) is visible when
``i < ch`` or (``i == ch`` and ``j < cw``); type B additionally includes the
center. Used by the causal-context entropy models
(reference ``LiftingBasedDWT_net.py:275-317``).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def causal_mask(kernel_size: Tuple[int, int], mask_type: str) -> np.ndarray:
    """(kh, kw) 0/1 mask; type 'A' excludes the center, 'B' includes it."""
    assert mask_type in ("A", "B")
    kh, kw = kernel_size
    mask = np.zeros((kh, kw), dtype=np.float32)
    ch, cw = kh // 2, kw // 2
    mask[:ch, :] = 1.0
    mask[ch, :cw] = 1.0
    if mask_type == "B":
        mask[ch, cw] = 1.0
    return mask


def masked_conv2d(x, kernel, bias, mask_type: str, groups: int = 1):
    """Apply a causally-masked SAME conv. kernel: (kh, kw, in/groups, out)."""
    mask = jnp.asarray(causal_mask(kernel.shape[:2], mask_type),
                       dtype=kernel.dtype)
    kernel = kernel * mask[:, :, None, None]
    y = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if bias is not None:
        y = y + bias
    return y


class MaskedConv2d(nn.Module):
    """Causal conv over NHWC with optional channel grouping.

    ``feature_group_count`` mirrors the reference's ``groups=`` arg
    (``LiftingBasedDWT_net.py:276`` uses one group per subband channel so
    LH/HL/HH contexts stay independent).
    """

    features: int
    kernel_size: Tuple[int, int]
    mask_type: str = "A"
    feature_group_count: int = 1
    use_bias: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, in_ch // self.feature_group_count, self.features),
        )
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        if self._use_taps(x):
            # Whole-plane grouped context convs (the ZTsep csc): the
            # feature_group_count lowering starves the MXU with one input
            # channel per group; the T-tap batched matmul is ~MXU-shaped.
            # Gated to large planes so the coding path's tiny patch evals
            # (5x5/11x11 windows, and anything under disable_pallas) keep
            # the original lax arithmetic that pinned streams were encoded
            # with.
            from .fast_conv import grouped_conv_taps
            mask = jnp.asarray(causal_mask((kh, kw), self.mask_type),
                               kernel.dtype)
            return grouped_conv_taps(
                x, kernel * mask[:, :, None, None], bias,
                groups=self.feature_group_count, dtype=self.dtype)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype) if bias is not None else None
        return masked_conv2d(x, kernel, bias, self.mask_type,
                             self.feature_group_count)

    def _use_taps(self, x) -> bool:
        from .fast_conv import pallas_disabled
        return (self.dtype is not None
                and self.feature_group_count > 1
                and x.shape[1] * x.shape[2] >= 4096
                and not pallas_disabled())


class ChannelIncrementalConv2d(nn.Module):
    """Channel-causal conv: output channel block i only sees input channel
    blocks < i (+ itself for type B). Counterpart of the reference's
    ``Conv2dChIncremental`` (``masked_conv2d.py``), used for channel-wise
    autoregressive factorizations.
    """

    features: int
    kernel_size: Tuple[int, int]
    blocks: int
    mask_type: str = "A"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        assert in_ch % self.blocks == 0 and self.features % self.blocks == 0
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, in_ch, self.features))
        in_blk = np.repeat(np.arange(self.blocks), in_ch // self.blocks)
        out_blk = np.repeat(np.arange(self.blocks),
                            self.features // self.blocks)
        if self.mask_type == "A":
            mask = (in_blk[:, None] < out_blk[None, :]).astype(np.float32)
        else:
            mask = (in_blk[:, None] <= out_blk[None, :]).astype(np.float32)
        kernel = kernel * jnp.asarray(mask)[None, None]
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,))
        return y
