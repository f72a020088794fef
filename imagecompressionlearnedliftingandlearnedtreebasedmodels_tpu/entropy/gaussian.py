"""Conditional Gaussian entropy model.

JAX re-implementation of ``compressai.entropy_models.GaussianConditional``
as used throughout the reference's context models
(``LiftingBasedDWT_net.py:291,307,318`` with ``scale_bound=0.11``): an
integer-bin Gaussian likelihood ``Phi((0.5-|v|)/s) - Phi((-0.5-|v|)/s)``
around a predicted mean, plus the 64-entry log-spaced scale table used to
index quantized CDF rows at coding time (``LiftingBasedDWT_net.py:12-14,
32-33``).

All functions are shape-polymorphic elementwise math — they vectorize over
whole subbands in one fused XLA pass (the reference evaluates them per pixel
inside its AR loops; we never do).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import norm as _scipy_norm

from ..ops.math_utils import (lower_bound, quantize_dequantize,
                              quantize_noise, quantize_symbols)

SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64
SCALE_BOUND = 0.11
LIKELIHOOD_BOUND = 1e-9
TAIL_MASS = 1e-9


def get_scale_table(smin=SCALES_MIN, smax=SCALES_MAX, levels=SCALES_LEVELS):
    """exp-linspace scale table (reference LiftingBasedDWT_net.py:32-33)."""
    return np.exp(np.linspace(np.log(smin), np.log(smax), levels))


def _standardized_cumulative(x):
    """Phi(x) via erfc for upper-tail stability."""
    return 0.5 * jax.lax.erfc(-(2 ** -0.5) * x)


def likelihood(x, scales, means=None, training: bool = True, rng=None):
    """Quantize (noise or round) and evaluate integer-bin likelihood.

    Returns ``(x_qnt, lik)``; mirrors ``GaussianConditional.forward``.
    """
    if training:
        x_qnt = quantize_noise(x, rng)
    else:
        x_qnt = quantize_dequantize(x, means)
    values = x_qnt - means if means is not None else x_qnt
    scales = lower_bound(scales, SCALE_BOUND)
    values = jnp.abs(values)
    upper = _standardized_cumulative((0.5 - values) / scales)
    lower = _standardized_cumulative((-0.5 - values) / scales)
    lik = lower_bound(upper - lower, LIKELIHOOD_BOUND)
    return x_qnt, lik


def self_information_bits(x, scales, means=None, training=True, rng=None):
    """-log2 likelihood (the reference's ``-torch.log2(pmf_values)``)."""
    x_qnt, lik = likelihood(x, scales, means, training, rng)
    return x_qnt, -jnp.log2(lik)


@jax.jit
def _build_indexes_default(scales):
    table = jnp.asarray(get_scale_table()[:-1], jnp.float32)
    scales = lower_bound(scales, SCALE_BOUND)
    return jnp.sum(scales[..., None] > table, axis=-1).astype(jnp.int32)


def build_indexes(scales, scale_table=None):
    """Map each scale to its CDF-table row (GaussianConditional.build_indexes).

    index = number of table entries strictly below the (bounded) scale,
    capped at len(table)-1 — one vectorized comparison against the table
    (the reference iterates the 64-entry table per call).
    """
    if scale_table is None:
        return _build_indexes_default(jnp.asarray(scales, jnp.float32))
    table = jnp.asarray(np.asarray(scale_table)[:-1], jnp.float32)
    scales = lower_bound(jnp.asarray(scales, jnp.float32), SCALE_BOUND)
    return jnp.sum(scales[..., None] > table, axis=-1).astype(jnp.int32)


def quantize_for_coding(x, means=None):
    """Integer symbols relative to the predicted mean."""
    return quantize_symbols(x, means)


def dequantize(symbols, means=None):
    y = symbols.astype(jnp.float32)
    return y + means if means is not None else y


def cdf_table(scale_table=None, tail_mass: float = TAIL_MASS):
    """Dense pmf rows per scale-table entry for the host CDF builder.

    Mirrors ``GaussianConditional.update``: row i covers symbols
    ``[-center_i, center_i]`` with ``center_i = ceil(scale_i * z_tail)``.
    Returns numpy ``(pmf, tail, pmf_length, offset)``.
    """
    if scale_table is None:
        scale_table = get_scale_table()
    scale_table = np.asarray(scale_table, dtype=np.float64)
    multiplier = -_scipy_norm.ppf(tail_mass / 2.0)
    centers = np.ceil(scale_table * multiplier).astype(np.int64)
    pmf_length = 2 * centers + 1
    max_length = int(pmf_length.max())
    # per-row samples |j - center_i| (compressai's update()): element 0 of
    # row i is symbol -center_i, so each row's tail is evaluated at its OWN
    # center — a global max_center would give small-scale rows tail ~0 and
    # cost extra bits on every escape symbol
    samples = np.abs(np.arange(max_length)[None, :] - centers[:, None])
    s = scale_table[:, None]
    upper = 0.5 * _scipy_erfc(-(2 ** -0.5) * (0.5 - samples) / s)
    lower = 0.5 * _scipy_erfc(-(2 ** -0.5) * (-0.5 - samples) / s)
    pmf = upper - lower  # (levels, max_len); row i valid in [0, 2*center_i]
    tail = 2.0 * lower[:, 0]
    mask = np.arange(max_length)[None, :] >= pmf_length[:, None]
    pmf[mask] = 0.0
    offset = -centers
    return pmf, tail, pmf_length, offset


def _scipy_erfc(x):
    from scipy.special import erfc
    return erfc(x)
