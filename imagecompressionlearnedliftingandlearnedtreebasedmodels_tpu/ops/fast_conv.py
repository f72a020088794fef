"""MXU-oriented 3x3 convolution via transposed im2col.

Measured on this TPU backend: the standard NHWC conv lowering reaches only
~13 TFLOP/s bf16 for the codec's narrow-channel shapes (Cin/Cout 96-243),
because the matmul orientation puts the huge spatial extent on M and the
narrow channel count on N. Recasting the conv as

    (Cout, 9*Cin) @ (9*Cin, B*H*W)

puts the spatial extent on N (the MXU's wide axis) and reaches ~26 TFLOP/s
— 2x — at the cost of one output transpose that XLA fuses into the next op.
Used by the FLOP-dominant stacks (Berk scaling AE, parent-context CNNs)
when bf16 compute is enabled.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def conv3x3_im2colT(x, kernel, bias=None, dtype=jnp.bfloat16):
    """SAME 3x3 conv, NHWC, zero padding; bf16 matmul in (Cout, N) layout.

    kernel: (3, 3, Cin, Cout) (flax layout); output fp32 NHWC.
    """
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, i:i + h, j:j + w, :] for i in range(3) for j in range(3)]
    patches = jnp.concatenate(cols, axis=-1).reshape(b * h * w, 9 * cin)
    km = kernel.reshape(9 * cin, cout).astype(dtype)
    y = jnp.einsum("oc,nc->on", km.T, patches,
                   preferred_element_type=jnp.float32)   # (Cout, BHW)
    y = y.T.reshape(b, h, w, cout)
    if bias is not None:
        y = y + bias
    return y


class FastConv3x3(nn.Module):
    """Drop-in for ``nn.Conv(features, (3,3), padding='SAME')`` with the
    transposed-im2col compute path. Param names/shapes identical to
    ``nn.Conv`` (kernel (3,3,Cin,Cout), bias (Cout,)), so checkpoints and
    the weight importer are layout-compatible."""

    features: int
    dtype: object = jnp.bfloat16
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return conv3x3_im2colT(x, kernel, bias, self.dtype)
