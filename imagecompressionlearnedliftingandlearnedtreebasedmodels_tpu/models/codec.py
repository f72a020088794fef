"""Codec graphs (reference layer L4).

``LiftingDWTCodec`` = analysis transform -> entropy model -> synthesis
(reference ``LiftingBasedDWTNet.forward``, ``LiftingBasedDWT_net.py:154-170``).

``CodecWrapper`` handles the color-channel policy (reference
``LiftingBasedDWTNetWrapper``, ``LiftingBasedDWT_net.py:35-99``):
``clrch == 3`` runs one codec on joint RGB; ``clrch == 1`` runs three
independent codecs on Y, Cb, Cr planes and concatenates the outputs. The
RGB<->YCbCr conversion + mean shift lives in the training loop (reference
``agents/liftingDWT_agent.py:80-94``), not here.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..config import Config
from ..entropy.models import make_entropy_model
from .transforms import make_transform


class LiftingDWTCodec(nn.Module):
    """Single-colorgroup codec: transform + entropy + inverse transform."""

    cfg: Config

    def setup(self):
        self.transform = make_transform(self.cfg)
        self.entropymodel = make_entropy_model(self.cfg)

    def __call__(self, x, training: bool = True):
        xe, xo_list = self._encode(x, training)
        info_xe, info_xo_list, xe_qnt, xo_qnt = self.entropymodel(
            xe, xo_list, training)
        xhat = self._decode(xe_qnt, xo_qnt, training)
        return xhat, info_xe, info_xo_list

    def _encode(self, x, training: bool):
        from .transforms import QuincunxLiftingTransform
        if isinstance(self.transform, QuincunxLiftingTransform):
            # integer lifting needs the training flag (noisy rounding)
            return self.transform.encode(x, training)
        return self.transform.encode(x)

    def _decode(self, xe_qnt, xo_qnt, training: bool):
        from .transforms import QuincunxLiftingTransform
        if isinstance(self.transform, QuincunxLiftingTransform):
            return self.transform.decode(xe_qnt, xo_qnt, training)
        return self.transform.decode(xe_qnt, xo_qnt)

    def encode(self, x):
        return self.transform.encode(x)

    def decode(self, xe_qnt, xo_qnt):
        return self.transform.decode(xe_qnt, xo_qnt)

    def aux_loss(self):
        return self.entropymodel.aux_loss()


class CodecWrapper(nn.Module):
    """Color-policy wrapper: 1 joint-RGB codec or 3 per-plane codecs
    (reference ``LiftingBasedDWTNetWrapper``, ``LiftingBasedDWT_net.py:35-99``).

    The three YCbCr codecs run sequentially inside one jit, like the
    reference's three models. (A vmapped-over-planes variant was measured
    6x SLOWER on TPU: per-plane weights make every conv a batched-kernel
    conv that XLA cannot map to a single MXU convolution, so the sequential
    form — three dense convs — wins.)

    ``__call__`` returns ``(xhat, info_xe, info_xo_list, aux_loss)``.
    """

    cfg: Config

    def setup(self):
        if self.cfg.clrch == 3:
            self.codec = LiftingDWTCodec(self.cfg)
        else:
            self.codecs = [LiftingDWTCodec(self.cfg) for _ in range(3)]

    def __call__(self, x, training: bool = True):
        if self.cfg.clrch == 3:
            xhat, info_xe, info_xo = self.codec(x, training)
            return xhat, info_xe, info_xo, self.codec.aux_loss()
        outs = [self.codecs[i](x[..., i:i + 1], training) for i in range(3)]
        xhat = jnp.concatenate([o[0] for o in outs], axis=-1)
        info_xe = jnp.concatenate([o[1] for o in outs], axis=-1)
        info_xo_list: List = []
        for o in outs:
            info_xo_list.extend(o[2])
        aux = sum(c.aux_loss() for c in self.codecs)
        return xhat, info_xe, info_xo_list, aux
