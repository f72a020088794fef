"""Load the reference PyTorch implementation as a numerical test oracle.

The reference at ``/root/reference`` is imported **by file path** (no code is
copied into this repo) with its missing pip dependencies stubbed:

- ``compressai.layers.GDN``            -> the reference's own vendored copy
  (``graphs/layers/gdn.py``), whose parametrizer comes from the vendored
  ``utils/parametrizers.py`` / ``utils/bound_ops.py``.
- ``compressai.entropy_models``        -> minimal torch implementations of
  ``EntropyBottleneck`` / ``GaussianConditional`` below, written to
  compressai's published semantics (parameter names/shapes included) so that
  reference ``state_dict``s round-trip through ``tools/weight_import.py``.
- ``compressai.ans``, ``pytorch_wavelets`` -> inert placeholders (only needed
  so module-level imports succeed; tests that need them must not touch them).

Everything runs on torch-cpu in fp64-free fp32, eval mode.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import torch
import torch.nn as nn

REF = "/root/reference"


# --------------------------------------------------------------------------
# compressai entropy-model stubs (public semantics; see compressai
# entropy_models/entropy_models.py upstream)
# --------------------------------------------------------------------------


def _ref_lower_bound(x, bound: float):
    """compressai ``LowerBound`` gradient semantics — pass-through when the
    incoming gradient pushes x upward — via the reference's vendored copy
    (``utils/bound_ops.py:22-42``). A plain ``torch.clamp`` here would zero
    gradients whenever the bound is active (e.g. tail coefficients whose
    likelihood clamps at 1e-9), which is NOT what compressai does and made
    the train-step parity tests diverge on cgp gradients."""
    bound_ops = _load("ref_utils.bound_ops", "utils/bound_ops.py")
    return bound_ops.LowerBoundFunction.apply(
        x, torch.tensor([bound], dtype=x.dtype))


class GaussianConditional(nn.Module):
    """Minimal eval-path replica of compressai's GaussianConditional."""

    def __init__(self, scale_table=None, scale_bound=0.11, tail_mass=1e-9,
                 likelihood_bound=1e-9):
        super().__init__()
        self.scale_table = scale_table
        self.scale_bound = float(scale_bound)
        self.likelihood_bound = float(likelihood_bound)
        self.tail_mass = float(tail_mass)

    def quantize(self, inputs, mode, means=None):
        if mode == "noise":
            noise = torch.empty_like(inputs).uniform_(-0.5, 0.5)
            return inputs + noise
        outputs = inputs.clone()
        if means is not None:
            outputs -= means
        outputs = torch.round(outputs)
        if mode == "dequantize":
            if means is not None:
                outputs += means
            return outputs
        assert mode == "symbols", mode
        return outputs.int()

    @staticmethod
    def _standardized_cumulative(x):
        return 0.5 * torch.erfc(-(2 ** -0.5) * x)

    def _likelihood(self, inputs, scales, means=None):
        values = inputs - means if means is not None else inputs
        scales = _ref_lower_bound(scales, self.scale_bound)
        values = torch.abs(values)
        upper = self._standardized_cumulative((0.5 - values) / scales)
        lower = self._standardized_cumulative((-0.5 - values) / scales)
        return upper - lower

    def forward(self, inputs, scales, means=None, training=None):
        if training is None:
            training = self.training
        outputs = self.quantize(inputs, "noise" if training else "dequantize",
                                means)
        likelihood = self._likelihood(outputs, scales, means)
        likelihood = _ref_lower_bound(likelihood, self.likelihood_bound)
        return outputs, likelihood


class EntropyBottleneck(nn.Module):
    """Minimal eval-path replica of compressai's EntropyBottleneck.

    Parameter names (``_matrix{i}``, ``_bias{i}``, ``_factor{i}``,
    ``quantiles``) and shapes match compressai so state_dicts are
    interchangeable with real reference checkpoints.
    """

    def __init__(self, channels, filters=(3, 3, 3, 3), init_scale=10.0,
                 tail_mass=1e-9, likelihood_bound=1e-9):
        super().__init__()
        import numpy as np

        channels = int(channels)  # the reference passes float (se/se)
        self.channels = channels
        self.filters = tuple(filters)
        self.likelihood_bound = float(likelihood_bound)
        self.tail_mass = float(tail_mass)
        dims = (1,) + self.filters + (1,)
        scale = init_scale ** (1.0 / (len(self.filters) + 1))
        for i in range(len(self.filters) + 1):
            init = float(np.log(np.expm1(1.0 / scale / dims[i + 1])))
            matrix = torch.full((channels, dims[i + 1], dims[i]), init)
            self.register_parameter(f"_matrix{i}", nn.Parameter(matrix))
            bias = torch.empty(channels, dims[i + 1], 1).uniform_(-0.5, 0.5)
            self.register_parameter(f"_bias{i}", nn.Parameter(bias))
            if i < len(self.filters):
                factor = torch.zeros(channels, dims[i + 1], 1)
                self.register_parameter(f"_factor{i}", nn.Parameter(factor))
        q = torch.tensor([-init_scale, 0.0, init_scale])
        self.quantiles = nn.Parameter(q.repeat(channels, 1, 1))

    def _get_medians(self):
        return self.quantiles[:, :, 1:2]

    def _logits_cumulative(self, inputs):
        logits = inputs
        for i in range(len(self.filters) + 1):
            m = torch.nn.functional.softplus(getattr(self, f"_matrix{i}"))
            logits = torch.matmul(m, logits) + getattr(self, f"_bias{i}")
            if i < len(self.filters):
                f = torch.tanh(getattr(self, f"_factor{i}"))
                logits = logits + f * torch.tanh(logits)
        return logits

    def _likelihood(self, inputs):
        lower = self._logits_cumulative(inputs - 0.5)
        upper = self._logits_cumulative(inputs + 0.5)
        sign = -torch.sign(lower + upper).detach()
        return torch.abs(torch.sigmoid(sign * upper)
                         - torch.sigmoid(sign * lower))

    def quantize(self, inputs, mode, means=None):
        if mode == "noise":
            return inputs + torch.empty_like(inputs).uniform_(-0.5, 0.5)
        outputs = inputs.clone()
        if means is not None:
            outputs -= means
        outputs = torch.round(outputs)
        if mode == "dequantize":
            if means is not None:
                outputs += means
            return outputs
        return outputs.int()

    def forward(self, x, training=None):
        if training is None:
            training = self.training
        # (B, C, ...) -> (C, 1, -1), matching compressai's permutation
        perm = (1, 0) + tuple(range(2, x.dim()))
        shape = x.shape
        values = x.permute(*perm).reshape(x.shape[1], 1, -1)
        medians = self._get_medians()
        outputs = self.quantize(values, "noise" if training else "dequantize",
                                medians)
        likelihood = self._likelihood(outputs)
        likelihood = _ref_lower_bound(likelihood, self.likelihood_bound)
        outputs = outputs.reshape(shape[1], shape[0], *shape[2:]).permute(*perm)
        likelihood = likelihood.reshape(
            shape[1], shape[0], *shape[2:]).permute(*perm)
        return outputs, likelihood


# --------------------------------------------------------------------------
# module loader
# --------------------------------------------------------------------------

_loaded = {}


def _load(name: str, relpath: str):
    """Import a reference source file under its reference module name,
    bypassing the package ``__init__`` auto-import machinery."""
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _pkg(name: str):
    if name not in sys.modules:
        m = types.ModuleType(name)
        m.__path__ = []
        sys.modules[name] = m
    return sys.modules[name]


def load_reference():
    """Install stubs and load the reference model modules. Returns the
    ``graphs.models.LiftingBasedDWT_net`` module."""
    if "graphs.models.LiftingBasedDWT_net" in sys.modules:
        return sys.modules["graphs.models.LiftingBasedDWT_net"]

    # fake parent packages so absolute reference imports resolve
    for p in ("graphs", "graphs.layers", "graphs.models", "utils"):
        _pkg(p)

    # vendored compressai pieces -> compressai stub package
    _load("utils.bound_ops", "utils/bound_ops.py")
    parametrizers = _load("utils.parametrizers", "utils/parametrizers.py")
    _pkg("compressai")
    ops = _pkg("compressai.ops")
    ops.parametrizers = parametrizers
    sys.modules["compressai.ops.parametrizers"] = parametrizers
    gdn_mod = _load("graphs.layers.gdn", "graphs/layers/gdn.py")
    layers = _pkg("compressai.layers")
    layers.GDN = gdn_mod.GDN
    layers.GDN1 = gdn_mod.GDN1

    em = _pkg("compressai.entropy_models")
    em.EntropyBottleneck = EntropyBottleneck
    em.GaussianConditional = GaussianConditional

    ans = _pkg("compressai.ans")

    class _Unavailable:
        def __init__(self, *a, **k):
            raise RuntimeError("compressai.ans not available in oracle")

    ans.BufferedRansEncoder = _Unavailable
    ans.RansDecoder = _Unavailable

    pw = _pkg("pytorch_wavelets")
    pw.DWTForward = _Unavailable
    pw.DWTInverse = _Unavailable

    # reference modules, dependency order
    _load("graphs.layers.masked_conv2d", "graphs/layers/masked_conv2d.py")
    _load("graphs.layers.basic_block", "graphs/layers/basic_block.py")
    _load("graphs.layers.post_processing_networks",
          "graphs/layers/post_processing_networks.py")
    _load("graphs.layers.cbam", "graphs/layers/cbam.py")
    _load("graphs.layers.lifting_nets", "graphs/layers/lifting_nets.py")
    _load("graphs.layers.P_block_v2", "graphs/layers/P_block_v2.py")
    _load("graphs.layers.wavelet_forward_v2",
          "graphs/layers/wavelet_forward_v2.py")
    _load("graphs.layers.wavelet_inverse_v2",
          "graphs/layers/wavelet_inverse_v2.py")
    _load("graphs.layers.upscaling", "graphs/layers/upscaling.py")
    _load("graphs.layers.lifting_dwt_nets", "graphs/layers/lifting_dwt_nets.py")
    return _load("graphs.models.LiftingBasedDWT_net",
                 "graphs/models/LiftingBasedDWT_net.py")


def load_reference_losses():
    """Load the reference loss module (``graphs/losses/rate_dist.py``) with
    its (unused here) visdom import stubbed."""
    if "graphs.losses.rate_dist" in sys.modules:
        return sys.modules["graphs.losses.rate_dist"]
    vis = _pkg("visdom")
    if not hasattr(vis, "Visdom"):
        vis.Visdom = type("Visdom", (), {})
    _pkg("graphs.losses")
    return _load("graphs.losses.rate_dist", "graphs/losses/rate_dist.py")


class RefConfig:
    """Attribute-access config like the reference's EasyDict."""

    def __init__(self, **kw):
        base = dict(mode="test", imshow_validation="false", scale=0,
                    postprocess="none")
        base.update(kw)
        self.__dict__.update(base)


def ref_config_from(cfg) -> "RefConfig":
    """Translate our typed Config into the reference's config surface."""
    return RefConfig(
        netType=cfg.netType,
        entropy_layer=cfg.entropy_layer,
        autoencoder=cfg.autoencoder,
        clrch=cfg.clrch,
        dwtlevels=cfg.dwtlevels,
        num_lifting_perlayer=cfg.num_lifting_perlayer,
        filtersize=cfg.filtersize,
        depth_scale=cfg.depth_scale,
        block_property=cfg.block_property,
        scale=cfg.scale,
        linearity_flag=cfg.linearity_flag,
        res_connection_weight=cfg.res_connection_weight,
    )
