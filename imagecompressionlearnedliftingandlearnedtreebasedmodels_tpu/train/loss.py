"""Rate-distortion losses (reference layer L6, ``graphs/losses/rate_dist.py``).

Keeps the reference's exact rate normalization quirk: rates are
``sum(bits) / numel(x) * 3`` — bits per *pixel per color plane* times 3,
regardless of ``clrch`` (reference ``rate_dist.py:37-40``; SURVEY.md
"fidelity quirks"). Distortion is mean MSE over the (shifted) RGB tensor.
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax.numpy as jnp


class RDLossOutput(NamedTuple):
    loss: jnp.ndarray
    mse: jnp.ndarray
    rate1: jnp.ndarray   # LL (xe) bits-per-pixel
    rate2: jnp.ndarray   # detail (xo) bits-per-pixel, summed over levels


def rd_loss3(x, xhat, info_xe, info_xo_list: List, lambda_: float,
             rate_weight: float = 1.0) -> RDLossOutput:
    """``TrainRDLoss.forward3`` (reference ``rate_dist.py:35-42``).

    ``rate_weight = 0`` gives the D-only warmup loss (``TrainDLoss.forward3``,
    reference ``rate_dist.py:64-71``) while still reporting rates.
    """
    numel = jnp.asarray(x.size, jnp.float32)
    mse = jnp.mean((x - xhat) ** 2)
    rate1 = jnp.sum(info_xe) / numel * 3.0
    rate2 = jnp.zeros(())
    for info in info_xo_list:
        rate2 = rate2 + jnp.sum(info) / numel * 3.0
    loss = rate_weight * (rate1 + rate2) + lambda_ * mse
    return RDLossOutput(loss, mse, rate1, rate2)


def psnr(x, xhat, peak: float = 1.0):
    """Per-image PSNR averaged over the batch (reference
    ``rate_dist.py:89-94`` / ``liftingDWT_agent.py:186``)."""
    mse = jnp.mean((x - xhat) ** 2, axis=tuple(range(1, x.ndim)))
    return jnp.mean(-10.0 * jnp.log10(mse / (peak ** 2)))


def rate_loss(self_informations) -> jnp.ndarray:
    """Mean self-information — the legacy rate-only training loss
    (reference ``graphs/losses/rate_distortion_loss.py`` TrainRateLoss /
    ValidRateLoss)."""
    return jnp.mean(self_informations)


def valid_rd_loss(x, xhat, info_xe, info_xo_list, lambda_: float):
    """PSNR-based validation objective (reference ``ValidRDLoss``,
    ``rate_dist.py:74-94``): psnr + lambda * rate."""
    numel = jnp.asarray(x.size, jnp.float32)
    p = psnr(x, xhat)
    rate = jnp.sum(info_xe) / numel * 3.0
    for info in info_xo_list:
        rate = rate + jnp.sum(info) / numel * 3.0
    return p + rate * lambda_, p, rate
