"""Color transforms (BT.601 RGB <-> YCbCr).

Replaces the reference's dependency on ``compressai.transforms.RGB2YCbCr`` /
``YCbCr2RGB`` (used at ``agents/liftingDWT_agent.py:10,86-91``) with plain JAX
functions over NHWC arrays in [0, 1].
"""

from __future__ import annotations

import jax.numpy as jnp


def rgb_to_ycbcr(x):
    """NHWC RGB in [0,1] -> YCbCr in [0,1] (Cb/Cr offset by 0.5)."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 0.5 * (b - y) / (1.0 - 0.114) + 0.5
    cr = 0.5 * (r - y) / (1.0 - 0.299) + 0.5
    return jnp.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(x):
    """NHWC YCbCr in [0,1] -> RGB in [0,1]."""
    y, cb, cr = x[..., 0], x[..., 1], x[..., 2]
    r = y + 2.0 * (1.0 - 0.299) * (cr - 0.5)
    b = y + 2.0 * (1.0 - 0.114) * (cb - 0.5)
    g = (y - 0.299 * r - 0.114 * b) / 0.587
    return jnp.stack([r, g, b], axis=-1)


# Per-channel mean shift used by the reference before the codec:
# subtract 0.5 from Y only; Cb/Cr are already offset (liftingDWT_agent.py:87).
# Kept as a plain tuple: a module-level jnp.array would initialize the
# default backend at import time (hanging every import — including the
# driver's CPU-only dryrun — whenever the accelerator transport is down).
YCBCR_SHIFT = (0.5, 0.0, 0.0)


def shift_ycbcr(y):
    return y - jnp.asarray(YCBCR_SHIFT, dtype=y.dtype)


def unshift_ycbcr(y):
    return y + jnp.asarray(YCBCR_SHIFT, dtype=y.dtype)
