"""Weight import: synthetic reference checkpoints map fully onto our tree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.config import Config
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.models.codec import (
    CodecWrapper)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.tools.weight_import import (
    build_mapping, import_state_dict)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.state import (
    init_state)


def _fake_state_dict(cfg, params):
    """Build a torch-style state_dict with the right keys/shapes by
    inverting our own layout conventions."""
    rng = np.random.RandomState(0)
    sd = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    by_path = {"/".join(str(p.key) for p in path): np.asarray(leaf)
               for path, leaf in flat}
    for torch_key, flax_path, kind in build_mapping(cfg):
        target = by_path[flax_path]
        if kind == "conv":
            shape = (target.shape[3], target.shape[2],
                     target.shape[0], target.shape[1])
        elif kind == "convT":
            shape = (target.shape[2], target.shape[3],
                     target.shape[0], target.shape[1])
        elif isinstance(kind, tuple) and kind[0] == "convT":
            # grouped ConvTranspose2d: torch stores (I, O/g, kh, kw);
            # flax grouped kernel is (kh, kw, I/g, O)
            g = kind[1]
            kh, kw, i_per_g, o_total = target.shape
            shape = (i_per_g * g, o_total // g, kh, kw)
        elif kind == "skip":
            shape = (1, 1, 3, 1)
        elif kind == "flat1":
            shape = (1, 1, 1, 1)
        else:
            shape = target.shape
        # small magnitudes: unit-variance weights explode through the
        # 4-level recursive lifting stack (numerics, not mapping)
        sd[torch_key] = (rng.randn(*shape) * 0.02).astype(np.float32)
    return sd


@pytest.mark.parametrize("cfg", [
    Config(netType="CDF97", entropy_layer="factorized",
           autoencoder="SubbandAutoEncoder", clrch=3, dwtlevels=2),
    Config(netType="LiftingBasedNeuralWaveletv4",
           entropy_layer="conditioned2ZTsepSubbands",
           autoencoder="SubbandAutoEncoderBerk", clrch=1, dwtlevels=2,
           depth_scale=2, filtersize=5),
    Config(netType="CDF97", entropy_layer="onlyEZWT",
           autoencoder="SubbandAutoEncoder", clrch=1, dwtlevels=2),
])
def test_import_covers_tree_and_roundtrips(cfg):
    model = CodecWrapper(cfg)
    state = init_state(cfg, model, jnp.zeros((1, 32, 32, 3)),
                       jax.random.PRNGKey(0))
    sd = _fake_state_dict(cfg, state.params)
    new_params, unmatched = import_state_dict(cfg, state.params, sd)
    assert unmatched == []
    # every mapped tensor actually landed (values differ from init)
    changed = 0
    flat_old = jax.tree_util.tree_leaves(state.params)
    flat_new = jax.tree_util.tree_leaves(new_params)
    for a, b in zip(flat_old, flat_new):
        if not np.allclose(np.asarray(a), np.asarray(b)):
            changed += 1
    assert changed > 0
    # imported params still produce a working forward
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.state import (
        make_eval_step)
    out = make_eval_step(cfg, model)(new_params,
                                     jnp.zeros((1, 32, 32, 3)) + 0.5)
    assert np.isfinite(float(out.loss))


def test_flagship_mapping_counts():
    """The flagship mapping must address most of the param tree (all convs,
    GDNs, skips; excluded: only structures absent from the checkpoint)."""
    cfg = Config(netType="LiftingBasedNeuralWaveletv4",
                 entropy_layer="conditioned2ZTsepSubbands",
                 autoencoder="SubbandAutoEncoderBerk", clrch=1, dwtlevels=4,
                 depth_scale=2, filtersize=5)
    model = CodecWrapper(cfg)
    state = init_state(cfg, model, jnp.zeros((1, 64, 64, 3)),
                       jax.random.PRNGKey(0))
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    all_paths = {"/".join(str(p.key) for p in path) for path, _ in flat}
    mapped_paths = {fp for _, fp, _ in build_mapping(cfg)}
    missing = all_paths - mapped_paths
    assert not missing, sorted(missing)[:10]
