"""CBAM attention (channel gate x spatial gate).

JAX re-implementation of the attention block vendored by the reference
(``graphs/layers/cbam.py``, copied from the official BAM/CBAM repo) and used
by its CBAM ``PostProcessing`` head (``lifting_dwt_nets.py:298-318``).

Deviation: the spatial gate's BatchNorm is replaced by GroupNorm — batch-size
independent, no mutable state to thread through the codec graph, and
TPU-friendlier (no cross-batch reduction).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ChannelGate(nn.Module):
    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        mlp = nn.Sequential([
            nn.Dense(max(self.channels // self.reduction, 1)), nn.relu,
            nn.Dense(self.channels)])
        avg = jnp.mean(x, axis=(1, 2))
        mx = jnp.max(x, axis=(1, 2))
        scale = nn.sigmoid(mlp(avg) + mlp(mx))
        return x * scale[:, None, None, :]


class SpatialGate(nn.Module):
    @nn.compact
    def __call__(self, x):
        pooled = jnp.concatenate([
            jnp.max(x, axis=-1, keepdims=True),
            jnp.mean(x, axis=-1, keepdims=True)], axis=-1)
        att = nn.Conv(1, (7, 7), padding="SAME", use_bias=False)(pooled)
        att = nn.GroupNorm(num_groups=1)(att)
        return x * nn.sigmoid(att)


class CBAM(nn.Module):
    channels: int
    reduction: int = 16
    no_spatial: bool = False

    @nn.compact
    def __call__(self, x):
        x = ChannelGate(self.channels, self.reduction)(x)
        if not self.no_spatial:
            x = SpatialGate()(x)
        return x


class CBAMPostProcessing(nn.Module):
    """CBAM restoration head (reference ``PostProcessing``,
    ``lifting_dwt_nets.py:298-318``): 5x5 conv lift to 64*clrch, CBAM,
    tanh bottleneck back to image channels, weighted input skip."""

    clrch: int

    @nn.compact
    def __call__(self, x):
        width = 64 * self.clrch
        res_w = self.param("res_weight", lambda _: jnp.asarray(0.1))
        h = nn.Conv(width, (5, 5), padding="SAME")(x)
        h = CBAM(width, 16)(h)
        h = nn.Conv(width // 8, (5, 5), padding="SAME")(h)
        h = jnp.tanh(h)
        h = nn.Conv(self.clrch, (5, 5), padding="SAME")(h)
        return h + x * res_w
