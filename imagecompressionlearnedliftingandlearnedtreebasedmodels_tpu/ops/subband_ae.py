"""Per-subband learned scaling autoencoders.

These replace per-channel quantization step sizes: each DWT subband passes
through a small pointwise companding net before quantization and its inverse
after (reference ``graphs/layers/lifting_dwt_nets.py:82-209``).

Variants (selected by ``config.autoencoder``, reference
``lifting_dwt_nets.py:666-673``):

- ``SubbandAutoEncoder``: 4 x (1x1 grouped conv, hidden 32, tanh) per
  coefficient — a learned scalar companding curve per channel. On TPU the
  grouped 1x1 convs are batched tiny matmuls; XLA fuses the tanh chain.
- ``SubbandAutoEncoderBerk``: 3x3 convs, hidden iC*32 / iC*64, GDN/IGDN —
  a spatial context-aware compander (the paper's main configs use this).
- ``IdentityAE``: no-op (new; lets the entropy model see raw subbands).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .gdn import GDN


class SubbandAutoEncoder(nn.Module):
    """Pointwise grouped compander (reference lifting_dwt_nets.py:82-124)."""

    in_ch: int
    hidden: int = 32
    dtype: object = None

    def setup(self):
        ic, h = self.in_ch, self.hidden
        conv = lambda feats: nn.Conv(  # noqa: E731
            feats, (1, 1), feature_group_count=ic, dtype=self.dtype)
        self.down = [conv(ic * h), conv(ic * h), conv(ic * h), conv(ic)]
        self.up = [conv(ic * h), conv(ic * h), conv(ic * h), conv(ic)]

    def encode(self, x):
        for layer in self.down[:-1]:
            x = jnp.tanh(layer(x))
        return self.down[-1](x)

    def decode(self, y):
        for layer in self.up[:-1]:
            y = jnp.tanh(layer(y))
        return self.up[-1](y)

    def __call__(self, x):  # for init
        return self.decode(self.encode(x))


class SubbandAutoEncoderBerk(nn.Module):
    """3x3 GDN compander (reference lifting_dwt_nets.py:126-165).

    The FLOP-heaviest block in the flagship codec (full-resolution 96/192
    channel 3x3 convs); ``dtype=bfloat16`` runs the convs and GDN matmuls on
    the MXU at double rate with fp32 params and fp32 outputs at the ends.
    """

    in_ch: int
    hidden: int = 64
    dtype: object = None

    def setup(self):
        ic, h = self.in_ch, self.hidden
        if self.dtype is not None:
            from .fast_conv import FastConv3x3
            conv = lambda feats: FastConv3x3(feats, dtype=self.dtype)  # noqa: E731
        else:
            conv = lambda feats: nn.Conv(  # noqa: E731
                feats, (3, 3), padding="SAME", dtype=self.dtype)
        self.down = [conv(ic * h // 2), conv(ic * h), conv(ic * h // 2), conv(ic)]
        self.down_gdn = [GDN(ic * h // 2, dtype=self.dtype),
                         GDN(ic * h, dtype=self.dtype),
                         GDN(ic * h // 2, dtype=self.dtype)]
        self.up = [conv(ic * h // 2), conv(ic * h), conv(ic * h // 2), conv(ic)]
        self.up_gdn = [GDN(ic * h // 2, inverse=True, dtype=self.dtype),
                       GDN(ic * h, inverse=True, dtype=self.dtype),
                       GDN(ic * h // 2, inverse=True, dtype=self.dtype)]

    def encode(self, x):
        for layer, gdn in zip(self.down[:-1], self.down_gdn):
            x = gdn(layer(x))
        return self.down[-1](x).astype(jnp.float32)

    def decode(self, y):
        for layer, gdn in zip(self.up[:-1], self.up_gdn):
            y = gdn(layer(y))
        return self.up[-1](y).astype(jnp.float32)

    def __call__(self, x):  # for init
        return self.decode(self.encode(x))


class IdentityAE(nn.Module):
    """No-op compander."""

    in_ch: int = 0

    def encode(self, x):
        return x

    def decode(self, y):
        return y

    def __call__(self, x):  # for init
        return x


def make_subband_ae(kind: str, in_ch: int, dtype=None) -> nn.Module:
    if kind == "SubbandAutoEncoder":
        return SubbandAutoEncoder(in_ch=in_ch, dtype=dtype)
    if kind == "SubbandAutoEncoderBerk":
        return SubbandAutoEncoderBerk(in_ch=in_ch, dtype=dtype)
    if kind == "none":
        return IdentityAE()
    raise ValueError(f"unknown autoencoder kind {kind!r}")
