"""Custom-gradient math primitives shared by transforms and entropy models.

TPU-native equivalents of the reference's vendored compressAI autograd pieces
(``utils/bound_ops.py:22-42`` LowerBound, ``utils/parametrizers.py``
NonNegativeParametrizer) expressed with ``jax.custom_vjp``, plus the
quantization surrogates used throughout the entropy models
(reference ``LiftingBasedDWT_net.py:330`` quantize modes and
``lifting_nets.py:196-203`` integer-lifting rounding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# CDF 9/7 (bior4.4) lifting coefficients, in the reference's order
# (wavelet_forward_v2.py:4-5): [alpha, beta, gamma, delta, nh, nl].
LIFTING_COEFF = (
    -1.586134342059924,   # alpha: predict 1
    -0.052980118572961,   # beta:  update 1
    0.882911075530934,    # gamma: predict 2
    0.443506852043971,    # delta: update 2
    0.869864451624781,    # nh: high-band gain
    1.149604398860241,    # nl: low-band gain
)


@jax.custom_vjp
def lower_bound(x, bound):
    """max(x, bound) with the compressAI gradient convention.

    Gradient passes through when ``x >= bound`` OR when the incoming gradient
    pushes x upward (grad < 0), matching reference ``utils/bound_ops.py:22-42``.
    """
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


@jax.custom_vjp
def upper_bound(x, bound):
    """min(x, bound) with the symmetric gradient convention."""
    return jnp.minimum(x, bound)


def _upper_bound_fwd(x, bound):
    return jnp.minimum(x, bound), (x, bound)


def _upper_bound_bwd(res, g):
    x, bound = res
    pass_through = (x <= bound) | (g > 0)
    return (jnp.where(pass_through, g, 0.0), None)


upper_bound.defvjp(_upper_bound_fwd, _upper_bound_bwd)


# --- NonNegativeParametrizer (sqrt reparam + pedestal) --------------------
NNP_MINIMUM = 0.0
NNP_REPARAM_OFFSET = 2 ** -18


def nnp_pedestal() -> float:
    return NNP_REPARAM_OFFSET ** 2


def nnp_init(x):
    """Map an initial target value to reparametrized space."""
    return jnp.sqrt(jnp.maximum(x + nnp_pedestal(), nnp_pedestal()))


def nnp_apply(x):
    """Reparametrized value -> non-negative parameter."""
    bound = (NNP_MINIMUM + NNP_REPARAM_OFFSET ** 2) ** 0.5
    return lower_bound(x, bound) ** 2 - nnp_pedestal()


@jax.custom_vjp
def ste_round(x):
    """round(x) with a straight-through gradient."""
    return jnp.round(x)


def _ste_round_fwd(x):
    return jnp.round(x), None


def _ste_round_bwd(_, g):
    return (g,)


ste_round.defvjp(_ste_round_fwd, _ste_round_bwd)


def quantize_noise(x, rng):
    """Additive-uniform-noise quantization surrogate (training)."""
    return x + jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)


def quantize_dequantize(x, means=None):
    """Hard rounding around an optional mean (eval): round(x - mu) + mu."""
    if means is None:
        return jnp.round(x)
    return jnp.round(x - means) + means


def quantize_symbols(x, means=None):
    """Integer symbols for entropy coding: round(x - mu) as int32."""
    if means is None:
        return jnp.round(x).astype(jnp.int32)
    return jnp.round(x - means).astype(jnp.int32)


def lifting_round(x, precision_bits: int, rng=None):
    """Integer-lifting rounding (reference lifting_nets.py:196-203).

    With ``precision_bits > 0``: training adds uniform noise of one grid step,
    eval rounds to the ``255 * 2**(bits-8)`` grid. ``rng is None`` selects the
    eval path.
    """
    if precision_bits <= 0:
        return x
    factor = 255.0 * (2.0 ** (precision_bits - 8))
    if rng is not None:
        return x + jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5) / factor
    return jnp.round(x * factor) / factor
