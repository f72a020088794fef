"""Post-processing (restoration) networks applied to reconstructions.

JAX re-implementations of the config-selectable restoration nets the
reference trains on top of a frozen codec (``config.postprocess`` dispatch at
``agents/liftingDWT_agent.py:26-36``; architectures in
``graphs/layers/post_processing_networks.py``):

- ``DnCNN``      shallow residual denoiser ``DnCNN(D=clrch, C=64)``
                 (reference ``:340-369``; module-scope name shadowing — see
                 the class docstring)
- ``iwave``      iWave++-style residual restoration (reference ``:39-77``)
- ``IRCNN``      7-layer dilated denoiser, dilations 1,2,3,4,3,2,1
                 (reference ``:79-118``)
- ``DIDN``       deep iterative down-up net with pixel-shuffle upsampling
                 (reference ``:125-330``)
- ``DUDnCNN``    dilated-U DnCNN (reference ``:417-481``)

(The reference also carries ``UDnCNN`` with max-unpool, but it is not
selectable from config — dead code we do not reproduce.)

BatchNorm uses flax's ``batch_stats`` collection; callers pass
``train=True`` and ``mutable=["batch_stats"]`` during postprocess training.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..config import Config


def pixel_shuffle(x, r: int):
    """NHWC depth-to-space matching torch.PixelShuffle channel order."""
    b, h, w, c = x.shape
    co = c // (r * r)
    x = x.reshape(b, h, w, co, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, co)


class DnCNN(nn.Module):
    """Config-selectable DnCNN: conv-relu, D x (conv-BN-relu), conv with a
    global residual ADD.

    NOTE: the reference file defines ``DnCNN`` twice; the later
    NNRegressor-style class (``post_processing_networks.py:340-369``)
    shadows the 17-layer Sequential one at module scope, so the net the
    agent actually builds is ``DnCNN(D=clrch, C=64)``
    (``liftingDWT_agent.py:28``) — a shallow residual denoiser, not the
    17-layer ``x - f(x)`` form.
    """

    depth: int
    features: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.relu(nn.Conv(self.features, (3, 3), padding="SAME")(x))
        for _ in range(self.depth):
            h = nn.Conv(self.features, (3, 3), padding="SAME")(h)
            # the reference constructs ``nn.BatchNorm2d(C, C)`` — the second
            # positional arg is eps, so eps == C == 64 (:357)
            h = nn.BatchNorm(use_running_average=not train,
                             epsilon=float(self.features))(h)
            h = nn.relu(h)
        return nn.Conv(x.shape[-1], (3, 3), padding="SAME")(h) + x


class PostProcessResidual(nn.Module):
    """conv-relu-conv residual block at width clrch*64."""

    width: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Conv(self.width, (3, 3), padding="SAME")(x))
        h = nn.Conv(self.width, (3, 3), padding="SAME")(h)
        return x + h


class PostProcessingiWave(nn.Module):
    """iWave++-style restoration: head conv, resnetlevel residual blocks,
    long skip, tail conv, global residual."""

    cfg: Config

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = self.cfg.clrch * 64
        t1 = nn.Conv(width, (3, 3), padding="SAME")(x)
        t2 = t1
        for _ in range(self.cfg.resnetlevel):
            t2 = PostProcessResidual(width)(t2)
        t2 = nn.Conv(width, (3, 3), padding="SAME")(t2)
        t2 = t2 + t1
        out = nn.Conv(x.shape[-1], (3, 3), padding="SAME")(t2)
        return out + x


class IRCNN(nn.Module):
    """Dilated residual denoiser (dilations 1,2,3,4,3,2,1)."""

    channels: int
    features: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        dilations = (1, 2, 3, 4, 3, 2, 1)
        h = x
        for i, d in enumerate(dilations):
            feats = self.channels if i == len(dilations) - 1 else self.features
            h = nn.Conv(feats, (3, 3), padding="SAME",
                        kernel_dilation=(d, d))(h)
            if i < len(dilations) - 1:
                h = nn.relu(h)
        return x - h


class _DIDNResidualBlock(nn.Module):
    """DIDN down-up residual block (reference ``_Residual_Block``)."""

    width: int

    @nn.compact
    def __call__(self, x):
        w = self.width
        # stride-2 convs use explicit ((1,1),(1,1)) padding: torch's
        # Conv2d(k=3, s=2, padding=1) alignment, NOT flax SAME (which pads
        # (0,1) at stride 2 — a half-pixel shift that breaks reference
        # weight parity)
        conv = lambda f, k=3, s=1: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s),
            padding=((1, 1), (1, 1)) if (k, s) == (3, 2) else "SAME",
            use_bias=False)
        prelu = lambda h: nn.PReLU()(h)  # noqa: E731

        res1 = x
        out = prelu(conv(w)(x))
        out = prelu(conv(w)(out))
        out = out + res1
        cat1 = out

        out = prelu(conv(w * 2, s=2)(out))
        res2 = out
        out = prelu(conv(w * 2)(out))
        out = out + res2
        cat2 = out

        out = prelu(conv(w * 4, s=2)(out))
        res3 = out
        out = prelu(conv(w * 4)(out))
        out = out + res3

        out = pixel_shuffle(conv(w * 8, k=1)(out), 2)
        out = jnp.concatenate([out, cat2], axis=-1)
        out = conv(w * 2, k=1)(out)
        res4 = out
        out = prelu(conv(w * 2)(out))
        out = out + res4

        out = pixel_shuffle(conv(w * 4, k=1)(out), 2)
        out = jnp.concatenate([out, cat1], axis=-1)
        out = conv(w, k=1)(out)
        res5 = out
        out = prelu(conv(w)(out))
        out = prelu(conv(w)(out))
        out = out + res5
        out = conv(w)(out)
        return out + res1


class _DIDNReconBlock(nn.Module):
    width: int

    @nn.compact
    def __call__(self, x):
        w = self.width
        conv = lambda: nn.Conv(w, (3, 3), padding="SAME", use_bias=False)  # noqa: E731
        res1 = x
        out = x
        for _ in range(4):
            res = out
            out = nn.PReLU()(conv()(out))
            out = nn.PReLU()(conv()(out))
            out = out + res
        out = conv()(out)
        return out + res1


class DIDN(nn.Module):
    """Deep iterative down-up network (6 recursive blocks + shared recon)."""

    cfg: Config
    width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.width
        residual = x
        out = nn.PReLU()(nn.Conv(w, (3, 3), padding="SAME",
                                 use_bias=False)(x))
        out = nn.PReLU()(nn.Conv(w, (3, 3), strides=(2, 2),
                                 padding=((1, 1), (1, 1)),
                                 use_bias=False)(out))
        blocks = [_DIDNResidualBlock(w) for _ in range(6)]
        recon = _DIDNReconBlock(w)
        outs = []
        for blk in blocks:
            out = blk(out)
            outs.append(out)
        recons = [recon(o) for o in outs]
        out = jnp.concatenate(recons, axis=-1)
        out = nn.PReLU()(nn.Conv(w, (1, 1), use_bias=False)(out))
        res2 = out
        out = nn.PReLU()(nn.Conv(w, (3, 3), padding="SAME",
                                 use_bias=False)(out))
        out = out + res2
        out = pixel_shuffle(out, 2)
        out = nn.Conv(x.shape[-1], (3, 3), padding="SAME",
                      use_bias=False)(out)
        return out + residual


class DUDnCNN(nn.Module):
    """Dilated-U DnCNN: DnCNN with a dilation schedule emulating the
    down/up pooling of UDnCNN without losing resolution."""

    cfg: Config
    features: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        D = self.cfg.resnetlevel
        # dilation schedule (reference ``:425-432``): grows to D//2, shrinks
        k = [0] + list(range(D // 2)) + [max(D // 2 - 1, 0)] * (D + 1 - D // 2)
        ell = [0] * (D // 2 + 1) + list(range(D + 1 - (D // 2 + 1)))
        ell.append(ell[-1])
        dilations = [2 ** (a - b) for a, b in zip(k, ell)][: D + 2]

        conv = lambda f, d: nn.Conv(  # noqa: E731
            f, (3, 3), padding="SAME", kernel_dilation=(d, d))
        # ``nn.BatchNorm2d(C, C)`` in the reference (:469) sets eps == C
        bn = lambda h: nn.BatchNorm(  # noqa: E731
            use_running_average=not train,
            epsilon=float(self.features))(h)
        h = nn.relu(conv(self.features, dilations[0])(x))
        h_buff = []
        for i in range(D // 2 - 1):
            h = conv(self.features, dilations[i + 1])(h)
            h = nn.relu(bn(h))
            h_buff.append(h)
        for i in range(D // 2 - 1, D // 2 + 1):
            h = conv(self.features, dilations[i + 1])(h)
            h = nn.relu(bn(h))
        for i in range(D // 2 + 1, D):
            j = i - (D // 2 + 1) + 1
            h = conv(self.features, dilations[i + 1])(
                (h + h_buff[-j]) / np.sqrt(2))
            h = nn.relu(bn(h))
        return conv(x.shape[-1], dilations[-1])(h) + x


def make_postprocess(cfg: Config) -> nn.Module:
    """Restoration-net dispatch (reference ``liftingDWT_agent.py:26-36``)."""
    kind = cfg.postprocess
    if kind == "DnCNN":
        return DnCNN(depth=cfg.clrch)
    if kind == "iwave":
        return PostProcessingiWave(cfg)
    if kind == "IRCNN":
        return IRCNN(channels=3)
    if kind == "DIDN":
        return DIDN(cfg)
    if kind == "DUDnCNN":
        return DUDnCNN(cfg)
    raise ValueError(f"unknown postprocess {kind!r}")
