"""One-train-step parity against the reference PyTorch implementation.

The forward-parity tests (``test_ref_parity.py``) prove the rebuild
*evaluates* like the reference; these prove it *trains* like it: with the
same imported weights, the same batch, and quantization noise pinned to
zero on both sides (the noise enters additively with unit Jacobian, so
zeroing it changes the evaluation point but not the gradient STRUCTURE),
one training step must produce

1. the same loss/mse/rate values (``TrainRDLoss.forward3``,
   reference ``graphs/losses/rate_dist.py:35-42``),
2. the same parameter gradients (reference backward at
   ``agents/liftingDWT_agent.py:96-98``), and
3. the same post-Adam parameters (plain ``optim.Adam`` over all params,
   ``agents/liftingDWT_agent.py:369-389``; ours
   ``train/state.py::make_optimizer``)

to fp32 cross-framework tolerance.

Documented deviations handled here:

- The reference's current agent never backwards the EntropyBottleneck aux
  (quantile) loss — quantiles get exactly zero grad and never move. Our
  train step adds ``aux_loss`` with stop-gradient separation so ONLY the
  quantiles train (``train/state.py:80-84``). Quantile leaves are
  therefore excluded from the grad comparison (and the reference's
  quantile grads are asserted None/zero).
- Torch masked convs multiply ``weight.data`` by the mask each forward
  (reference ``masked_conv2d.py:19-21``), so masked tap positions receive
  NONZERO grads that are re-zeroed on the next forward; our trace-time
  mask fold gives them exactly-zero grads. Both are compared after
  multiplying by the mask — the functionally meaningful values.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from oracle_ref import (load_reference, load_reference_losses,  # noqa: E402
                        ref_config_from)
import oracle_ref  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.config import (  # noqa: E402
    Config)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.models.codec import (  # noqa: E402
    CodecWrapper)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.ops import (  # noqa: E402
    math_utils)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.entropy import (  # noqa: E402
    bottleneck as eb_mod, gaussian as g_mod, models as em_mod)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.tools import (  # noqa: E402
    weight_import)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.loss import (  # noqa: E402
    rd_loss3)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.state import (  # noqa: E402
    make_optimizer)

LR = 1e-4
LAM = 400.0


def make_cfg(**kw):
    base = dict(
        exp_name="parity_train", netType="LiftingBasedNeuralWaveletv4",
        entropy_layer="factorized", autoencoder="SubbandAutoEncoder",
        clrch=1, dwtlevels=3, num_lifting_perlayer=2, filtersize=5,
        depth_scale=2, block_property="same", scale=1, linearity_flag=1,
        res_connection_weight=0.1, dtype="float32", learning_rate=LR,
        lambda_=LAM, grad_acc_iters=1)
    base.update(kw)
    return Config(**base)


def to_nchw(x):
    return np.ascontiguousarray(np.transpose(np.asarray(x), (0, 3, 1, 2)))


def rand_image(shape, seed=1):
    rng = np.random.RandomState(seed)
    return rng.uniform(-0.5, 0.5, size=shape).astype(np.float32)


def _zero_noise(monkeypatch):
    """Pin training quantization noise to zero on BOTH frameworks."""
    ident = lambda x, rng=None: x  # noqa: E731
    for mod in (math_utils, g_mod, eb_mod, em_mod):
        monkeypatch.setattr(mod, "quantize_noise", ident)

    def t_quant(self, inputs, mode, means=None):
        if mode == "noise":
            return inputs
        out = inputs.clone()
        if means is not None:
            out -= means
        out = torch.round(out)
        if mode == "dequantize":
            if means is not None:
                out += means
            return out
        return out.int()

    monkeypatch.setattr(oracle_ref.EntropyBottleneck, "quantize", t_quant)
    monkeypatch.setattr(oracle_ref.GaussianConditional, "quantize", t_quant)


def build_pair(cfg, x_nhwc, seed=0):
    M = load_reference()
    torch.manual_seed(seed)
    ref = M.LiftingBasedDWTNetWrapper(ref_config_from(cfg))
    ref.train()
    model = CodecWrapper(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "noise": jax.random.PRNGKey(1)},
        jnp.asarray(x_nhwc), True)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, unmatched = weight_import.import_state_dict(
        cfg, variables["params"], sd)
    assert unmatched == [], f"unmapped reference keys: {unmatched[:8]}"
    return ref, model, params, sd


def _mask_for(sd, key):
    """Torch mask buffer for a masked-conv weight key, or None."""
    mk = key[: -len(".weight")] + ".mask"
    if mk in sd:
        return np.asarray(sd[mk])
    return None


def _masked_torch_dict(d, sd):
    """Multiply masked-conv weights/grads by their mask (same-shape rules
    as torch's in-place ``weight.data *= mask``)."""
    out = {}
    for k, v in d.items():
        if k.endswith(".weight"):
            m = _mask_for(sd, k)
            if m is not None:
                v = np.asarray(v) * m
        out[k] = np.asarray(v)
    return out


def _flax_mask_tree(cfg, params, sd):
    """{flax_path: mask in flax layout} for masked-conv kernels."""
    masks = {}
    for tkey, fpath, kind in weight_import.build_mapping(cfg):
        if kind == "conv" and tkey.endswith(".weight"):
            m = _mask_for(sd, tkey)
            if m is not None:
                masks[fpath] = weight_import._conv_w(m)
    return masks


def _apply_flax_masks(tree, masks):
    import copy

    tree = copy.deepcopy(jax.tree_util.tree_map(np.asarray, tree))
    for path, m in masks.items():
        keys = path.split("/")
        node = tree
        for k in keys[:-1]:
            node = node[k]
        node[keys[-1]] = node[keys[-1]] * m
    return tree


def _compare_trees(a, b, rtol, atol, skip_substr=("quantiles",), path=""):
    """Elementwise comparison of two nested param dicts; returns the worst
    (err, path) over non-skipped leaves."""
    worst = (0.0, "")
    if isinstance(a, dict):
        assert set(a) == set(b), f"{path}: key mismatch"
        for k in a:
            if any(s in k for s in skip_substr):
                continue
            w = _compare_trees(a[k], b[k], rtol, atol, skip_substr,
                               f"{path}/{k}")
            if w[0] > worst[0]:
                worst = w
        return worst
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = atol + rtol * np.maximum(np.abs(a), np.abs(b))
    err = float(np.max(np.abs(a - b) / scale)) if a.size else 0.0
    np.testing.assert_allclose(
        a, b, rtol=rtol, atol=atol,
        err_msg=f"mismatch at {path} (max scaled err {err:.2f})")
    return (err, path)


def _torch_train_step(ref, sd, x):
    """Reference semantics: forward3 loss, backward, one Adam step
    (``agents/liftingDWT_agent.py:75-111``, optimizer ``:369-389``)."""
    losses = load_reference_losses()
    loss_mod = losses.TrainRDLoss(LAM)
    params_dict = dict(ref.named_parameters())
    parameters = sorted(n for n, p in params_dict.items() if p.requires_grad)
    opt = torch.optim.Adam(
        [{"params": [params_dict[n] for n in parameters], "lr": LR}])
    opt.zero_grad()
    xt = torch.from_numpy(to_nchw(x))
    xhat, ixe, ixo = ref(xt)
    rd_loss, mse, rate1, rate2 = loss_mod.forward3(xt, xhat, ixe, ixo)
    rd_loss.backward()
    # collect grads under ALL alias names (shared modules register twice,
    # e.g. autoencoder.preProcessingList == autoencoder.waveletForward....;
    # named_parameters() dedupes to the first name, the import mapping
    # expects the autoencoder.* one)
    grads = {n: (p.grad.detach().numpy().copy()
                 if p.grad is not None else None)
             for n, p in ref.named_parameters(remove_duplicate=False)}
    # the reference never backwards the aux loss: quantiles must be inert
    for n, g in grads.items():
        if n.endswith("quantiles") and g is not None:
            assert float(np.abs(g).max()) == 0.0, f"{n} got grads in ref"
    grads = {n: g for n, g in grads.items() if g is not None}
    opt.step()
    new_sd = {k: v.detach().numpy().copy()
              for k, v in ref.state_dict().items()}
    metrics = tuple(float(t) for t in (rd_loss, mse, rate1, rate2))
    return grads, new_sd, metrics


def _jax_train_step(cfg, model, params, x):
    """Our ``_one_train_step`` semantics minus the color policy (the model
    input is fed directly, as in the forward-parity tests)."""
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(42)  # unused: noise patched to zero

    def loss_fn(p):
        xhat, info_xe, info_xo, aux = model.apply(
            {"params": p}, jnp.asarray(x), True, rngs={"noise": rng})
        out = rd_loss3(jnp.asarray(x), xhat, info_xe, info_xo, LAM, 1.0)
        return out.loss + aux, out

    grads, out = jax.grad(loss_fn, has_aux=True)(params)
    opt_state.hyperparams["learning_rate"] = jnp.asarray(LR, jnp.float32)
    updates, opt_state = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    metrics = tuple(float(v) for v in
                    (out.loss, out.mse, out.rate1, out.rate2))
    return (jax.tree_util.tree_map(np.asarray, grads),
            jax.tree_util.tree_map(np.asarray, new_params), metrics)


def _import_tree(cfg, template, torch_dict):
    tree, _ = weight_import.import_state_dict(cfg, template, torch_dict)
    return tree


def _run_case(cfg, monkeypatch, grad_rtol=3e-4, grad_atol=2e-6):
    _zero_noise(monkeypatch)
    x = rand_image((1, 32, 32, 3), seed=7)
    ref, model, params, sd = build_pair(cfg, x)

    t_grads, t_new_sd, t_metrics = _torch_train_step(ref, sd, x)
    j_grads, j_new_params, j_metrics = _jax_train_step(cfg, model, params, x)

    # 1. loss/metric parity
    names = ("rd_loss", "mse", "rate1", "rate2")
    for name, tv, jv in zip(names, t_metrics, j_metrics):
        assert abs(tv - jv) < 2e-4 * max(1.0, abs(tv)), (
            f"{name}: torch {tv:.6f} vs jax {jv:.6f}")

    masks = _flax_mask_tree(cfg, params, sd)

    # 2. gradient parity (masked taps compared post-mask; quantiles skipped;
    # torch params with no grad compare as zero)
    zeros = jax.tree_util.tree_map(
        lambda a: np.zeros_like(np.asarray(a)), params)
    t_grad_sd = _masked_torch_dict(t_grads, sd)
    t_grad_tree = _import_tree(cfg, zeros, t_grad_sd)
    j_grad_tree = _apply_flax_masks(j_grads, masks)
    worst = _compare_trees(t_grad_tree, j_grad_tree, grad_rtol, grad_atol)
    print(f"grad parity worst scaled err {worst[0]:.3f} at {worst[1]}")

    # 3. post-Adam parameter parity. Adam's unit-scaled update
    # g_hat/(|g_hat|+eps) has slope 1/eps near g=0, so elements whose grads
    # are pure fp32 cross-framework noise (|g| ~ atol) legitimately step in
    # different directions; compare only where the gradient is resolvable.
    thresh = 20 * grad_atol

    def cmp_updated(t_leaf, j_leaf, g_leaf, path):
        sel = np.abs(g_leaf) > thresh
        if not sel.any():
            return
        np.testing.assert_allclose(
            t_leaf[sel], j_leaf[sel], rtol=1e-5, atol=0.05 * LR,
            err_msg=f"post-Adam params mismatch at {path}")

    t_new_tree = _import_tree(cfg, params, _masked_torch_dict(t_new_sd, sd))
    j_new_tree = _apply_flax_masks(j_new_params, masks)

    def walk(t, j, g, path=""):
        if isinstance(t, dict):
            for k in t:
                if "quantiles" in k:
                    continue
                walk(t[k], j[k], g[k], f"{path}/{k}")
            return
        cmp_updated(np.asarray(t), np.asarray(j), np.asarray(g), path)

    walk(t_new_tree, j_new_tree, t_grad_tree)


class TestTrainStepParity:
    def test_factorized(self, monkeypatch):
        _run_case(make_cfg(), monkeypatch)

    def test_ztsep(self, monkeypatch):
        _run_case(make_cfg(entropy_layer="conditioned2ZTsepSubbands"),
                  monkeypatch)

    def test_onlyezwt_berk(self, monkeypatch):
        """onlyEZWT entropy + GDN (Berk) scaling AE — covers the GDN
        reparam and grouped-transpose import surfaces under grad."""
        _run_case(make_cfg(entropy_layer="onlyEZWT",
                           autoencoder="SubbandAutoEncoderBerk",
                           dwtlevels=2), monkeypatch)
