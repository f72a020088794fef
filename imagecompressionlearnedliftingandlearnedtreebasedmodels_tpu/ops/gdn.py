"""Generalized Divisive Normalization (GDN/IGDN).

JAX re-implementation of the activation used by the reference's
``SubbandAutoEncoderBerk`` (``graphs/layers/lifting_dwt_nets.py:139-150``, via
``compressai.layers.GDN``; the reference also vendors a copy at
``graphs/layers/gdn.py``):   y = x / sqrt(beta + sum_j gamma_ij * x_j^2)
with the inverse form multiplying instead of dividing. The non-negativity of
``beta``/``gamma`` uses the sqrt-reparametrization + pedestal from the
reference's ``utils/parametrizers.py`` via :mod:`.math_utils`.

The per-pixel ``gamma`` contraction is a (C x C) matmul over the channel
axis — exactly the shape the MXU wants; XLA fuses the square/sqrt around it.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .math_utils import lower_bound, nnp_init, nnp_pedestal


class GDN(nn.Module):
    channels: int
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    dtype: object = None  # compute dtype for the channel matmul (bf16 ok)

    @nn.compact
    def __call__(self, x):
        c = self.channels
        beta_reparam = self.param(
            "beta", lambda _: nnp_init(jnp.ones((c,))))
        gamma_reparam = self.param(
            "gamma", lambda _: nnp_init(self.gamma_init * jnp.eye(c)))

        beta_bound = (self.beta_min + nnp_pedestal()) ** 0.5
        gamma_bound = nnp_pedestal() ** 0.5
        beta = lower_bound(beta_reparam, beta_bound) ** 2 - nnp_pedestal()
        gamma = lower_bound(gamma_reparam, gamma_bound) ** 2 - nnp_pedestal()

        # norm_i = beta_i + sum_j gamma_ij x_j^2  — channel-axis matmul (MXU)
        xc = x.astype(self.dtype) if self.dtype is not None else x
        gc = gamma.astype(self.dtype) if self.dtype is not None else gamma
        norm = jnp.einsum("...j,ij->...i", xc * xc, gc,
                          preferred_element_type=jnp.float32) + beta
        norm = jnp.sqrt(norm)
        return x * norm if self.inverse else x / norm
