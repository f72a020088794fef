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

import contextlib
import threading

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import pallas_conv

_TL = threading.local()


def pallas_disabled() -> bool:
    return getattr(_TL, "no_pallas", False)


@contextlib.contextmanager
def disable_pallas():
    """Trace-time override forcing :class:`FastConv3x3` onto the im2colT
    path regardless of backend/shape.

    The coding path pins a stream's whole-plane parent-context pass to a
    backend NAME (``PlaneStreams.meta['plc_backend_*']``); that name must
    identify the arithmetic. The Pallas kernel changes bf16 accumulation
    order vs the im2colT lowering legacy streams were encoded with, so the
    coding-path fallback traces its plc pass under this context — the
    backend name then always means "im2colT on that backend"."""
    old = getattr(_TL, "no_pallas", False)
    _TL.no_pallas = True
    try:
        yield
    finally:
        _TL.no_pallas = old


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


def _s2d_index_map():
    """Static index map for the 5x5 -> (3x3 over 2x2 phases) kernel remap.

    For output phase (i,j), input phase (a,b) and block offset (du,dv) in
    {-1,0,1}^2, the contributing original tap is (u,v) with
    ``u = 2*du + 2 + a - i`` (rows; same for columns) when 0<=u,v<5, else
    none. Returns (3,3,2,2,2,2) int32 of flattened tap ids, 25 = "zero".
    """
    import numpy as np

    idx = np.full((3, 3, 2, 2, 2, 2), 25, np.int32)  # du,dv,a,b,i,j
    for du in range(3):
        for dv in range(3):
            for a in range(2):
                for b in range(2):
                    for i in range(2):
                        for j in range(2):
                            u = 2 * (du - 1) + 2 + a - i
                            v = 2 * (dv - 1) + 2 + b - j
                            if 0 <= u < 5 and 0 <= v < 5:
                                idx[du, dv, a, b, i, j] = u * 5 + v
    return idx


_S2D_IDX = _s2d_index_map()


def s2d_kernel_5x5(kernel, dtype=None):
    """(5,5,Cin,Cout) -> (3,3,4*Cin,4*Cout) polyphase-equivalent kernel.

    Channel layouts: in_flat = (a*2+b)*Cin + c, out_flat = (i*2+j)*Cout + o
    (matching :func:`space_to_depth2`).
    """
    cin, cout = kernel.shape[2], kernel.shape[3]
    if dtype is not None:
        kernel = kernel.astype(dtype)
    kpad = jnp.concatenate(
        [kernel.reshape(25, cin, cout),
         jnp.zeros((1, cin, cout), kernel.dtype)], axis=0)
    k2 = kpad[_S2D_IDX]                     # (3,3,2,2,2,2,cin,cout)
    k2 = k2.transpose(0, 1, 2, 3, 6, 4, 5, 7)  # du,dv,a,b,c,i,j,o
    return k2.reshape(3, 3, 4 * cin, 4 * cout)


def space_to_depth2(x):
    """(B,H,W,C) -> (B,H/2,W/2,4C), phase-major channel layout."""
    b, h, w, c = x.shape
    xr = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return xr.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space2(y):
    """Inverse of :func:`space_to_depth2`."""
    b, h2, w2, c4 = y.shape
    c = c4 // 4
    yr = y.reshape(b, h2, w2, 2, 2, c)
    return yr.transpose(0, 1, 3, 2, 4, 5).reshape(b, h2 * 2, w2 * 2, c)


def conv5x5_s2d(x, kernel, bias=None, dtype=jnp.bfloat16):
    """SAME 5x5 conv, NHWC, via the space-to-depth polyphase identity.

    A stride-1 5x5 conv over narrow channels (the lifting P/U blocks run
    1->32->32->1 at full resolution) leaves the MXU mostly idle: the
    contraction axis is 25*Cin <= 800 and the output axis Cout <= 32.
    Decomposing the image into 2x2 polyphase components turns it into an
    exactly-equivalent 3x3 conv with 4x the channels (128 wide) on 1/4 the
    spatial positions — same FLOPs, MXU-aligned operands. Exact in fp32;
    with ``dtype=bfloat16`` the matmuls run at bf16 like every other heavy
    conv stack here. Requires even H and W (guaranteed along the lifting
    ladder; callers fall back to ``nn.Conv`` otherwise).
    """
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    xs = space_to_depth2(x.astype(dtype))
    k2 = s2d_kernel_5x5(kernel, dtype)
    # output in the compute dtype, fp32 cast after (nn.Conv's convention):
    # a preferred_element_type=fp32 output here would feed an fp32
    # cotangent into the conv transpose rule against bf16 operands, which
    # lax.conv rejects under jax.grad
    ys = jax.lax.conv_general_dilated(
        xs, k2, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = depth_to_space2(ys).astype(jnp.float32)
    if bias is not None:
        y = y + bias
    return y


def grouped_conv1x1_einsum(x, kernel, bias=None, groups=1,
                           dtype=jnp.bfloat16):
    """Grouped 1x1 conv as a block-diagonal batched matmul.

    XLA lowers ``feature_group_count`` convs through a generic grouped-conv
    path that leaves the MXU underfed for the entropy model's per-subband
    1x1 stacks (3 groups of 162-wide channels). Recasting as a batched
    matmul ``(G, BHW, Cin/G) @ (G, Cin/G, Cout/G)`` gives XLA a plain
    batch-matmul it tiles well. kernel: (1, 1, Cin/G, Cout) (flax grouped
    layout, output groups consecutive); fp32 output.
    """
    b, h, w, c = x.shape
    in_g = c // groups
    out = kernel.shape[-1]
    out_g = out // groups
    xg = (x.astype(dtype).reshape(b * h * w, groups, in_g)
          .transpose(1, 0, 2))                            # (G, BHW, in_g)
    km = (kernel.reshape(in_g, groups, out_g).transpose(1, 0, 2)
          .astype(dtype))                                 # (G, in_g, out_g)
    y = jnp.einsum("gni,gio->gno", xg, km,
                   preferred_element_type=jnp.float32)
    y = y.transpose(1, 0, 2).reshape(b, h, w, out)
    if bias is not None:
        y = y + bias
    return y


def grouped_conv_taps(x, kernel, bias=None, groups=1, dtype=jnp.bfloat16):
    """Grouped SAME kxk conv as a T-tap transposed-im2col batched matmul
    ``(G, BHW, T*Cin/G) @ (G, T*Cin/G, Cout/G)``.

    Built for the ZTsep csc context conv (masked 5x5, 3 groups of 1->81):
    the grouped-conv lowering with one input channel per group starves the
    MXU; as a batched matmul the contraction axis is the tap count. Masks
    are handled by the caller pre-zeroing kernel taps (same trace-time fold
    as :func:`ops.masked_conv.masked_conv2d`). kernel: (kh, kw, Cin/G, Cout).
    """
    b, h, w, c = x.shape
    kh, kw = kernel.shape[:2]
    in_g = c // groups
    out = kernel.shape[-1]
    out_g = out // groups
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x.astype(dtype), ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    cols = [xp[:, i:i + h, j:j + w, :]
            for i in range(kh) for j in range(kw)]       # T x (B,H,W,C)
    # (B,H,W,T,G,in_g) -> (G, BHW, T*in_g)
    p = jnp.stack(cols, axis=3).reshape(b * h * w, kh * kw, groups, in_g)
    p = p.transpose(2, 0, 1, 3).reshape(groups, b * h * w, kh * kw * in_g)
    km = (kernel.astype(dtype).reshape(kh * kw, in_g, groups, out_g)
          .transpose(2, 0, 1, 3).reshape(groups, kh * kw * in_g, out_g))
    y = jnp.einsum("gnk,gko->gno", p, km,
                   preferred_element_type=jnp.float32)
    y = y.transpose(1, 0, 2).reshape(b, h, w, out)
    if bias is not None:
        y = y + bias
    return y


class FastGroupedConv1x1(nn.Module):
    """Drop-in for ``nn.Conv(features, (1,1), feature_group_count=G)``
    (param names/shapes identical: kernel (1,1,Cin/G,Cout), bias (Cout,)).

    Dispatches large planes to the block-diagonal batched matmul
    (:func:`grouped_conv1x1_einsum`); small inputs (the coding path's patch
    evals) and anything under :func:`disable_pallas` keep the lax grouped
    conv so pinned-stream arithmetic is unchanged."""

    features: int
    groups: int
    dtype: object = jnp.bfloat16
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, cin // self.groups, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        if (x.shape[1] * x.shape[2] >= 4096) and not pallas_disabled():
            return grouped_conv1x1_einsum(x, kernel, bias,
                                          groups=self.groups,
                                          dtype=self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class FastConv5x5(nn.Module):
    """Drop-in for ``nn.Conv(features, (5,5), padding='SAME')`` using the
    space-to-depth polyphase path. Param names/shapes identical to
    ``nn.Conv`` (kernel (5,5,Cin,Cout), bias (Cout,)) so checkpoints and
    the weight importer are layout-compatible."""

    features: int
    dtype: object = jnp.bfloat16
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (5, 5, cin, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        # NOTE: isolated microbenches (2026-08-21) show plain lax beating
        # s2d for the wide ladder convs (48->48 at 512x384: 8.1 vs 10.2
        # ms) — but switching FastConv5x5 to lax in-model DROPPED the
        # flagship surrogate from 9.1 to ~5 MP/s (bisected): the s2d form
        # keeps the whole lifting ladder in the space-to-depth layout, and
        # XLA cancels the s2d/d2s pairs between adjacent P/U convs; a lax
        # conv in the middle forces layout round trips that cost far more
        # than the per-conv win. Keep s2d for even dims.
        if x.shape[1] % 2 or x.shape[2] % 2:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype), (1, 1),
                "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            ).astype(jnp.float32)
            return y + bias if bias is not None else y
        return conv5x5_s2d(x, kernel, bias, self.dtype)


class FastConv3x3(nn.Module):
    """Drop-in for ``nn.Conv(features, (3,3), padding='SAME')``. Param
    names/shapes identical to ``nn.Conv`` (kernel (3,3,Cin,Cout), bias
    (Cout,)), so checkpoints and the weight importer are layout-compatible.

    Compute path (re-measured 2026-08-21, `scripts/bench_ae_parts.py` +
    `/tmp/bench_plc_shape.py` numbers in the dev notes): on the current
    TPU backend the PLAIN lax NHWC conv beats both the transposed-im2col
    matmul and the fused-halo Pallas kernel at every flagship eval shape
    that matters — (8,256,384,192)->96: lax 7.3 ms vs pallas 9.5 vs
    im2colT 15.6; (8,256,384,243)->243: lax 14.0 vs pallas 14.6 vs
    im2colT 40.8; (8,128,192,243)->243: lax 3.0 vs im2colT 8.5. (The
    rounds-2/3 "standard lowering is 6x slower" measurement that
    motivated im2colT/Pallas predates several backend updates and no
    longer reproduces.) Tiny-plane thin convs (HW < 64k and a <32-wide
    end) stay on im2colT, which still wins there ((8,128,192,96)->3:
    0.25 ms vs 0.80). CPU (tests) keeps im2colT. ``pallas_disabled()``
    (the coding path's pinned-arithmetic context) and ``use_pallas=False``
    both force im2colT — streams are encoded against that exact
    accumulation order. All paths are value-equivalent to ``nn.Conv``.
    The Pallas kernel (``ops/pallas_conv.py``) is kept for A/B timing on
    future backends via `scripts/bench_pallas_conv.py`."""

    features: int
    dtype: object = jnp.bfloat16
    use_bias: bool = True
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        hw = x.shape[1] * x.shape[2]
        if (self.use_pallas
                and not pallas_disabled()
                and jax.default_backend() in ("tpu", "axon")
                and (hw >= 65536 or min(cin, self.features) >= 32)):
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype), (1, 1),
                "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            ).astype(jnp.float32)
            return y + bias if bias is not None else y
        return conv3x3_im2colT(x, kernel, bias, self.dtype)
