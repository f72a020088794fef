"""Learned upscaling for parent->child zerotree context.

Counterpart of the reference's ``graphs/layers/upscaling.py``: a transposed
conv x2 upsampler with a LeakyReLU + residual conv (``upscale``) and the
parent-context head built on it (``zeroTreeWaveletPreviousLayer``). In the
reference these are only used by the abandoned "Berk" entropy variant, so
the live models use the nearest-neighbor ``upsample2`` reshape instead —
this module exists for experimentation parity.
"""

from __future__ import annotations

import flax.linen as nn


class Upscale(nn.Module):
    """ConvTranspose x2 + LeakyReLU + residual 3x3 conv."""

    features: int

    @nn.compact
    def __call__(self, x):
        up = nn.ConvTranspose(self.features, (2, 2), strides=(2, 2))(x)
        up = nn.leaky_relu(up)
        res = nn.Conv(self.features, (3, 3), padding="SAME")(up)
        return up + res


class ZeroTreePreviousLayer(nn.Module):
    """Learned x2 parent upsampling + 1x1 mixing head for parent->child
    conditioning."""

    features: int
    out_features: int

    @nn.compact
    def __call__(self, parent):
        h = Upscale(self.features)(parent)
        return nn.Conv(self.out_features, (1, 1))(h)
