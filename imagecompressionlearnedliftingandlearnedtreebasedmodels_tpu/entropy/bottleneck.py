"""Fully-factorized learned-CDF entropy model ("EntropyBottleneck").

JAX re-implementation of the univariate non-parametric density model of
Balle et al. 2018 as used by the reference via ``compressai.entropy_models.
EntropyBottleneck`` (reference ``LiftingBasedDWT_net.py:204-209,800-801``):
a per-channel monotone MLP models the cumulative distribution; the
likelihood of an integer bin is ``sigmoid(logits(v+0.5)) -
sigmoid(logits(v-0.5))``. Training quantization is additive uniform noise;
eval is hard rounding around the learned median. The auxiliary quantile loss
(trained via stop-gradient separation rather than compressai's second
optimizer) pins the tails so the coding CDF table covers the support.

Everything is elementwise + tiny per-channel matmuls; under jit the whole
likelihood evaluation fuses into a handful of VPU passes.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.math_utils import lower_bound, quantize_dequantize, quantize_noise

LIKELIHOOD_BOUND = 1e-9


class EntropyBottleneck(nn.Module):
    """Per-channel learned CDF over the last (channel) axis of NHWC input."""

    channels: int
    filters: Tuple[int, ...] = (3, 3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = 1e-9

    def setup(self):
        dims = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1.0 / (len(self.filters) + 1))
        matrices, biases, factors = [], [], []
        for i in range(len(self.filters) + 1):
            init_m = float(np.log(np.expm1(1.0 / scale / dims[i + 1])))
            matrices.append(self.param(
                f"matrix_{i}",
                lambda _, v=init_m, s=(self.channels, dims[i + 1], dims[i]):
                    jnp.full(s, v)))
            biases.append(self.param(
                f"bias_{i}",
                lambda k, s=(self.channels, dims[i + 1], 1):
                    jax.random.uniform(k, s, minval=-0.5, maxval=0.5)))
            if i < len(self.filters):
                factors.append(self.param(
                    f"factor_{i}",
                    lambda _, s=(self.channels, dims[i + 1], 1): jnp.zeros(s)))
        self.matrices = matrices
        self.biases = biases
        self.factors = factors
        self.quantiles = self.param(
            "quantiles",
            lambda _: jnp.tile(
                jnp.array([-self.init_scale, 0.0, self.init_scale]),
                (self.channels, 1, 1)))

    def _logits_cumulative(self, inputs, stop_gradient: bool):
        """inputs: (C, 1, N) -> logits (C, 1, N)."""
        logits = inputs
        for i in range(len(self.filters) + 1):
            m, b = self.matrices[i], self.biases[i]
            if stop_gradient:
                m, b = jax.lax.stop_gradient(m), jax.lax.stop_gradient(b)
            logits = jnp.einsum("cij,cjn->cin", jax.nn.softplus(m), logits) + b
            if i < len(self.factors):
                f = self.factors[i]
                if stop_gradient:
                    f = jax.lax.stop_gradient(f)
                logits = logits + jnp.tanh(f) * jnp.tanh(logits)
        return logits

    def medians(self):
        return self.quantiles[:, 0, 1]

    def aux_loss(self):
        """Quantile pinning loss; gradients flow only into ``quantiles``."""
        logits = self._logits_cumulative(self.quantiles, stop_gradient=True)
        t = float(np.log(2.0 / self.tail_mass - 1.0))
        target = jnp.array([-t, 0.0, t])
        return jnp.abs(logits - target).sum()

    def __call__(self, x, training: bool = True, rng=None):
        """x: (..., C). Returns (x_qnt, likelihood) like the reference's
        ``EntropyBottleneck.forward`` (quantize + likelihood in one call)."""
        if training:
            if rng is None:
                rng = self.make_rng("noise")
            x_qnt = quantize_noise(x, rng)
        else:
            med = self.medians().reshape((1,) * (x.ndim - 1) + (-1,))
            x_qnt = quantize_dequantize(x, med)
        c = self.channels
        orig_shape = x_qnt.shape
        flat = jnp.moveaxis(x_qnt, -1, 0).reshape(c, 1, -1)
        lower = self._logits_cumulative(flat - 0.5, stop_gradient=False)
        upper = self._logits_cumulative(flat + 0.5, stop_gradient=False)
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        lik = jnp.abs(jax.nn.sigmoid(sign * upper)
                      - jax.nn.sigmoid(sign * lower))
        lik = lower_bound(lik, LIKELIHOOD_BOUND)
        lik = jnp.moveaxis(lik.reshape(c, *orig_shape[:-1]),
                           0, -1)
        return x_qnt, lik

    def pmf_table(self):
        """Dense pmf rows for CDF-table construction at coding time.

        Returns ``(pmf, tail_mass, pmf_length, offset)`` with shapes
        ``(C, max_len)``, ``(C,)``, ``(C,)``, ``(C,)`` — the inputs the host
        C++ ``pmf_to_quantized_cdf`` needs (mirrors compressai's
        ``EntropyBottleneck.update``).
        """
        q = self.quantiles
        medians = q[:, 0, 1]
        minima = jnp.maximum(jnp.ceil(medians - q[:, 0, 0]), 0).astype(jnp.int32)
        maxima = jnp.maximum(jnp.ceil(q[:, 0, 2] - medians), 0).astype(jnp.int32)
        pmf_length = minima + maxima + 1
        max_length = int(jnp.max(pmf_length))
        samples = (jnp.arange(max_length)[None, :]
                   - minima[:, None] + medians[:, None])  # (C, max_len)
        flat = samples[:, None, :]
        lower = self._logits_cumulative(flat - 0.5, stop_gradient=True)
        upper = self._logits_cumulative(flat + 0.5, stop_gradient=True)
        sign = -jnp.sign(lower + upper)
        pmf = jnp.abs(jax.nn.sigmoid(sign * upper)
                      - jax.nn.sigmoid(sign * lower))[:, 0, :]
        tail = (jax.nn.sigmoid(lower[:, 0, 0])
                + jax.nn.sigmoid(-upper[:, 0, -1]))
        offset = -minima
        return pmf, tail, pmf_length, offset
