"""Typed experiment configuration.

Replaces the reference's JSON -> EasyDict pipeline (``utils/config.py:50-97``
in the reference) with a dataclass schema that validates the full
config-selectable surface (reference SURVEY.md section 2.2) and resolves the
key drift that exists between the reference's config files (``autoencoder`` in
``liftingDWT.json:14`` vs ``autoencoderFlag`` in ``liftingDWT_berk.json:14``).

Sweeps: the reference's ``multi_agent``/``multi_param`` mechanism
(``main.py:17-24``) is exposed via :func:`expand_sweep`, which yields one
resolved config per sweep value with ``exp_name`` rewritten to
``<multi_exp_name>/exp_<value>``.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence, Union

# Accepted values of each categorical knob (reference dispatch points cited).
NET_TYPES = (
    "CDF97",                        # LiftingBasedDWT_net.py:108
    "LiftingBasedNeuralWaveletv4",  # LiftingBasedDWT_net.py:110
    "BasicWavelet",                 # LiftingBasedDWT_net.py:114
    "AttentionWavelet",             # LiftingBasedDWT_net.py:117
    "AttentionWaveletPostProcessing",  # LiftingBasedDWT_net.py:119
    "QuincunxLifting",              # reference graphs/layers/lifting_dwt_nets.py:11 DWTLayer
)
ENTROPY_LAYERS = (
    "factorized",                   # LiftingBasedDWT_net.py:124
    "onlyEZWT",                     # LiftingBasedDWT_net.py:127
    "conditioned2ZTsepSubbands",    # LiftingBasedDWT_net.py:130
    "DWTConditioned2EntropyLayerZTBlock",  # LiftingBasedDWT_net.py:133
)
AUTOENCODERS = (
    "SubbandAutoEncoder",           # lifting_dwt_nets.py:666
    "SubbandAutoEncoderBerk",       # lifting_dwt_nets.py:670
    "none",                         # identity (no per-subband scaling AE)
)
POSTPROCESS = ("none", "DnCNN", "iwave", "IRCNN", "DIDN", "DUDnCNN")  # liftingDWT_agent.py:26-36
MODES = ("train", "train_postprocess", "validate", "validate_recu_reco", "test", "debug")  # agents/base.py:130-147
BLOCK_PROPERTIES = ("same", "different")  # lifting_dwt_nets.py:690-722
SPLIT_MODES = ("hv", 1, 2, 3)  # lifting_nets.py:116-132


@dataclass
class Config:
    """Full hyperparameter surface of the reference (liftingDWT.json:1-53)."""

    exp_name: str = "exp"
    multi_exp_name: str = ""
    agent: str = "LiftingBasedDWTAgent"
    mode: str = "train"
    resume_training: bool = False
    imshow_validation: bool = False
    seed: int = 1337

    # --- model selection -------------------------------------------------
    clrch: int = 3                  # 3 = joint RGB, 1 = three per-channel YCbCr models
    netType: str = "CDF97"
    entropy_layer: str = "factorized"
    autoencoder: str = "SubbandAutoEncoder"
    postprocess: str = "none"

    # --- transform hyperparameters --------------------------------------
    dwtlevels: int = 4
    num_lifting_perlayer: int = 2
    filtersize: int = 5
    resnetlevel: int = 6
    block_property: str = "same"
    scale: int = 0                  # 1 = learned subband gains nh/nl
    linearity_flag: int = 1         # 1 = tanh nonlinearity inside P/U blocks
    depth_scale: int = 2            # hidden width of P/U blocks = depth_scale * 8
    res_connection_weight: float = 0.1
    split_mode: Union[str, int] = "hv"
    lif_prec_bits: int = 0          # >0 enables integer lifting rounding

    # --- training --------------------------------------------------------
    batch_size: int = 4
    patch_size: int = 256
    grad_acc_iters: int = 1
    loss_prnt_iters: int = 3600
    val_batch_size: int = 1
    val_patch_size: int = 256
    test_patch_size: int = 0        # 0 = full resolution (image_dl.py:77-78)
    learning_rate: float = 1e-4
    lambda_: Union[float, List[float]] = 0.01
    loss_switch_thr: float = 0.0015
    training_loss_switch: int = 1   # 0 = start with D-only loss, switch later
    max_epoch: int = 3000
    validate_every: int = 1
    checkpoint_file: str = "checkpoint"
    steps_per_epoch: int = 0        # 0 = full pass over the dataset
    save_every_epochs: int = 0      # >0: rolling checkpoint every N epochs
                                    # (crash insurance on flaky transports)
    profile_steps: int = 0          # >0: capture a jax.profiler device
                                    # trace of N early train steps into
                                    # <log_dir>/trace (TensorBoard format)
    phase_timers: bool = False      # log per-phase wall-clock totals
                                    # (data / step / log) each epoch

    # --- sweeps ----------------------------------------------------------
    multi_agent: bool = False
    multi_param: str = "lambda_"

    # --- data ------------------------------------------------------------
    num_train_dirs: int = 1
    train_data_1: str = ""
    train_data_2: str = ""
    train_data_3: str = ""
    train_data_4: str = ""
    test_data: str = ""
    valid_data: str = ""

    # --- entropy-model options -------------------------------------------
    zt_upsample: str = "nearest"    # "learned" = ZeroTreePreviousLayer
    #   parent upsampling in onlyEZWT (reference graphs/layers/upscaling.py,
    #   never enabled by its live configs)

    # --- TPU execution (new; no reference equivalent, SURVEY.md §2.4) ----
    mesh_shape: Sequence[int] = (1,)    # data-parallel mesh axes
    mesh_axis_names: Sequence[str] = ("data",)
    steps_per_call: int = 1             # >1: lax.scan this many optimizer
    #   steps inside ONE device dispatch (single-device path only). On a
    #   tunneled backend each dispatch+readback costs ~25-40 ms RTT, so
    #   per-step dispatch caps training at ~5 steps/s regardless of compute;
    #   chunking k steps amortizes the RTT to ~1/k per step.
    dtype: str = "float32"              # compute dtype of transform path
    tile_size: int = 0                  # >0: spatially tiled encode with halo
    halo_eval: bool = False             # CDF97 + mesh: validate() runs the
    #   EXACT mesh-sharded 9/7 transform (parallel/tiling.py
    #   make_halo_eval_step — boundary rows over ICI ppermute) instead of
    #   the batch-sharded eval step; image heights must divide by
    #   n_devices * 2^dwtlevels
    jit_backend: Optional[str] = None

    # --- experiment dirs (filled by process_config) ----------------------
    summary_dir: str = ""
    checkpoint_dir: str = ""
    out_dir: str = ""
    log_dir: str = ""

    def validate(self) -> "Config":
        if not self.exp_name:
            raise ValueError("exp_name must be non-empty")
        if self.netType not in NET_TYPES:
            raise ValueError(f"netType {self.netType!r} not in {NET_TYPES}")
        if self.entropy_layer not in ENTROPY_LAYERS:
            raise ValueError(f"entropy_layer {self.entropy_layer!r} not in {ENTROPY_LAYERS}")
        if self.autoencoder not in AUTOENCODERS:
            raise ValueError(f"autoencoder {self.autoencoder!r} not in {AUTOENCODERS}")
        if self.postprocess not in POSTPROCESS:
            raise ValueError(f"postprocess {self.postprocess!r} not in {POSTPROCESS}")
        if self.mode not in MODES:
            raise ValueError(f"mode {self.mode!r} not in {MODES}")
        if self.block_property not in BLOCK_PROPERTIES:
            raise ValueError(f"block_property {self.block_property!r} not in {BLOCK_PROPERTIES}")
        if self.clrch not in (1, 3):
            raise ValueError("clrch must be 1 or 3")
        if self.zt_upsample not in ("nearest", "learned"):
            raise ValueError("zt_upsample must be 'nearest' or 'learned'")
        if self.dwtlevels < 1:
            raise ValueError("dwtlevels must be >= 1")
        return self


# Key aliases seen across the reference's config files.
_ALIASES = {
    "autoencoderFlag": "autoencoder",
    "lambda": "lambda_",
}
# Reference keys we accept but do not use: hardware/loader knobs that have
# no analog here, plus template leftovers that are dead in the reference
# too — "gamma"/"log_interval" are never read by any reference code path
# and "test_every" only appears in commented-out lines
# (reference agents/base.py:166,180).
_IGNORED = {"cuda", "gpu_device", "async_loading", "pin_memory", "data_mode",
            "gamma", "log_interval", "test_every"}


def config_from_dict(raw: dict) -> Config:
    known = {f.name for f in dataclasses.fields(Config)}
    kwargs: dict = {}
    for key, value in raw.items():
        key = _ALIASES.get(key, key)
        if key in _IGNORED:
            continue
        if key in known:
            kwargs[key] = value
    cfg = Config(**kwargs)
    return cfg.validate()


def get_config_from_json(path: str) -> Config:
    """JSON file -> validated Config (reference utils/config.py:50-66)."""
    with open(path, "r") as fh:
        raw = json.load(fh)
    return config_from_dict(raw)


def process_config(path: str, experiments_root: str = "experiments") -> Config:
    """Load config and create the experiment directory tree.

    Mirrors reference ``utils/config.py:69-97``: creates
    ``experiments/<exp_name>/{summaries,checkpoints,out,logs}``.
    """
    cfg = get_config_from_json(path)
    return _attach_dirs(cfg, experiments_root)


def _attach_dirs(cfg: Config, experiments_root: str) -> Config:
    base = os.path.join(experiments_root, cfg.exp_name)
    cfg.summary_dir = os.path.join(base, "summaries")
    cfg.checkpoint_dir = os.path.join(base, "checkpoints")
    cfg.out_dir = os.path.join(base, "out")
    cfg.log_dir = os.path.join(base, "logs")
    for d in (cfg.summary_dir, cfg.checkpoint_dir, cfg.out_dir, cfg.log_dir):
        os.makedirs(d, exist_ok=True)
    return cfg


def expand_sweep(cfg: Config, experiments_root: str = "experiments") -> List[Config]:
    """Expand a multi_agent sweep into per-value configs (main.py:17-24).

    Each returned config has ``multi_param`` replaced with a scalar value and
    ``exp_name`` rewritten to ``<multi_exp_name>/exp_<value>``.
    """
    if not cfg.multi_agent:
        return [cfg]
    values = getattr(cfg, cfg.multi_param)
    if not isinstance(values, (list, tuple)):
        values = [values]
    out = []
    for v in values:
        sub = dataclasses.replace(cfg)
        setattr(sub, cfg.multi_param, v)
        sub.multi_agent = False
        sub.exp_name = os.path.join(cfg.multi_exp_name or cfg.exp_name, f"exp_{v}")
        out.append(_attach_dirs(sub, experiments_root))
    return out


def to_json(cfg: Config) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2, default=str)


def compute_dtype(cfg: Config):
    """Compute dtype for the heavy conv stacks (params stay fp32).

    bf16 keeps the lifting transform exactly invertible — inversion
    subtracts the *same deterministic* P/U outputs — while doubling MXU
    rate; the entropy/quantization arithmetic stays fp32.
    """
    if cfg.dtype == "bfloat16":
        import jax.numpy as jnp
        return jnp.bfloat16
    return None
