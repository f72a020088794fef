"""End-to-end training slice: loss decreases, schedulers behave, ckpt works."""

import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.config import Config
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.models.codec import (
    CodecWrapper)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.data import (
    ImageDataLoader, synthetic_images)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.state import (
    LossSwitchController, PlateauScheduler, init_state, make_eval_step,
    make_optimizer, make_train_step)


def _tiny_cfg(**kw):
    base = dict(netType="CDF97", entropy_layer="factorized",
                autoencoder="SubbandAutoEncoder", clrch=3, dwtlevels=2,
                patch_size=32, batch_size=2, lambda_=100.0,
                learning_rate=1e-3, steps_per_epoch=4, max_epoch=1,
                training_loss_switch=1)
    base.update(kw)
    return Config(**base)


def test_training_reduces_loss():
    cfg = _tiny_cfg()
    model = CodecWrapper(cfg)
    tx = make_optimizer(cfg)
    train_step = make_train_step(cfg, model, tx)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((cfg.batch_size, 32, 32, 3))
    state = init_state(cfg, model, sample, rng)

    data = ImageDataLoader(cfg)
    losses = []
    lr = jnp.asarray(cfg.learning_rate)
    one = jnp.asarray(1.0)
    for i, batch in enumerate(data.train_batches(20)):
        rng, srng = jax.random.split(rng)
        state, out, aux = train_step(state, jnp.asarray(batch), srng, lr, one)
        losses.append(float(out.loss))
        assert np.isfinite(losses[-1])
    # training must make progress on the tiny synthetic set
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_eval_step_runs_and_clamps():
    cfg = _tiny_cfg()
    model = CodecWrapper(cfg)
    tx = make_optimizer(cfg)
    state = init_state(cfg, model, jnp.zeros((1, 32, 32, 3)),
                       jax.random.PRNGKey(0))
    eval_step = make_eval_step(cfg, model)
    batch = jnp.asarray(synthetic_images(1, 32)[0][None] / 255.0,
                        jnp.float32)
    out = eval_step(state.params, batch)
    assert np.isfinite(float(out.loss))
    assert float(out.rate1) >= 0 and float(out.rate2) >= 0


def test_ycbcr_per_channel_mode_forward():
    cfg = _tiny_cfg(clrch=1)
    model = CodecWrapper(cfg)
    state = init_state(cfg, model, jnp.zeros((1, 32, 32, 3)),
                       jax.random.PRNGKey(0))
    eval_step = make_eval_step(cfg, model)
    batch = jnp.asarray(synthetic_images(1, 32)[0][None] / 255.0,
                        jnp.float32)
    out = eval_step(state.params, batch)
    assert np.isfinite(float(out.loss))


def test_plateau_scheduler_matches_reference_semantics():
    s = PlateauScheduler(lr=1e-4, patience=2)
    for _ in range(3):
        assert s.step(1.0) == 1e-4  # first sets best, then 2 bad epochs
    assert s.step(1.0) == 5e-5      # 3rd bad epoch (> patience) halves
    assert s.step(0.5) == 5e-5      # improvement resets
    for _ in range(8):
        s.step(0.5)
    for _ in range(40):
        s.step(0.5)
    assert s.lr >= 1e-6             # min_lr floor


def test_loss_switch_controller():
    c = LossSwitchController(enabled=True, threshold=0.0015)
    assert c.rate_weight() == 0.0
    c.observe_window_mse(0.1)
    assert c.rate_weight() == 0.0
    c.observe_window_mse(0.001)
    assert c.rate_weight() == 1.0
    c.observe_window_mse(0.2)      # switch is permanent
    assert c.rate_weight() == 1.0


def test_agent_train_validate_checkpoint(tmp_path):
    cfg = _tiny_cfg(steps_per_epoch=2, max_epoch=1, loss_prnt_iters=2)
    cfg.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.log_dir = str(tmp_path / "logs")
    cfg.summary_dir = str(tmp_path / "sum")
    for d in (cfg.checkpoint_dir, cfg.log_dir, cfg.summary_dir):
        os.makedirs(d, exist_ok=True)
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.loop import (
        LiftingDWTAgent)
    agent = LiftingDWTAgent(cfg)
    agent.run()
    assert os.path.exists(os.path.join(cfg.checkpoint_dir, "checkpoint"))
    # resume path restores epoch counter
    cfg2 = _tiny_cfg(steps_per_epoch=2, max_epoch=2, loss_prnt_iters=2)
    cfg2.checkpoint_dir = cfg.checkpoint_dir
    cfg2.resume_training = True
    agent2 = LiftingDWTAgent(cfg2)
    assert agent2.current_epoch == agent.current_epoch
    # restored opt_state must keep its optax node types (namedtuples with
    # .hyperparams), not plain dicts — training after resume exercises it
    agent2.run()
    assert agent2.current_iteration > agent.current_iteration
    # a lost rolling checkpoint (crashed save) falls back to model_best
    shutil.rmtree(os.path.join(cfg.checkpoint_dir, "checkpoint"))
    cfg3 = _tiny_cfg(steps_per_epoch=2, max_epoch=2, loss_prnt_iters=2)
    cfg3.checkpoint_dir = cfg.checkpoint_dir
    cfg3.resume_training = True
    agent3 = LiftingDWTAgent(cfg3)
    assert agent3.current_iteration > 0

def test_imshow_validation_saves_wavelet_pyramid(tmp_path):
    """imshow_validation draws the nested wavelet-pyramid montage during
    validate() (reference show_wavelet_coeff, lifting_dwt_nets.py:393-410)."""
    cfg = _tiny_cfg(imshow_validation=True, val_patch_size=32)
    cfg.out_dir = str(tmp_path / "out")
    cfg.log_dir = str(tmp_path / "logs")
    for d in (cfg.out_dir, cfg.log_dir):
        os.makedirs(d, exist_ok=True)
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.loop import (
        LiftingDWTAgent)
    agent = LiftingDWTAgent(cfg)
    agent.validate()
    pngs = [f for f in os.listdir(cfg.out_dir)
            if f.startswith("wavelet_pyramid") and f.endswith(".png")]
    assert pngs, "imshow_validation produced no pyramid montage"


def test_agent_test_mode_tiles_highres(tmp_path):
    """cfg.tile_size routes large test images through per-tile bitstreams
    (TiledCodecCoder); small images keep the whole-image coder."""
    from PIL import Image

    data_dir = tmp_path / "imgs"
    os.makedirs(data_dir)
    img = synthetic_images(1, 128, seed=5)[0]
    Image.fromarray(img).save(str(data_dir / "big.png"))
    cfg = _tiny_cfg(test_data=str(data_dir), valid_data=str(data_dir),
                    tile_size=32, test_patch_size=0)
    cfg.log_dir = str(tmp_path / "logs")
    os.makedirs(cfg.log_dir, exist_ok=True)
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.loop import (
        LiftingDWTAgent)
    agent = LiftingDWTAgent(cfg)
    psnr, bpp = agent.test()
    assert np.isfinite(psnr) and bpp > 0


def test_agent_profiling_hooks(tmp_path, caplog):
    """profile_steps captures a device trace; phase_timers logs per-phase
    wall-clock totals (SURVEY.md section 5 TPU profiling plan)."""
    cfg = _tiny_cfg(steps_per_epoch=3, max_epoch=1, profile_steps=1,
                    phase_timers=True)
    cfg.log_dir = str(tmp_path / "logs")
    os.makedirs(cfg.log_dir, exist_ok=True)
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.loop import (
        LiftingDWTAgent)
    agent = LiftingDWTAgent(cfg)
    agent.run()
    assert not agent._trace_on
    trace_dir = os.path.join(cfg.log_dir, "trace")
    assert os.path.isdir(trace_dir)
    assert any(os.scandir(trace_dir)), "profiler trace wrote no files"
    assert agent.timers.counts["step"] == 3
    assert agent.timers.counts["data"] == 4  # includes the exhausted next()
    assert "step" in agent.timers.report()

def test_chained_train_step_matches_sequential():
    """steps_per_call chunking (state.py::make_chained_train_step) is
    semantically identical to k sequential train_step calls with the same
    per-step rngs and constant (lr, rate_w) — params and per-step metrics
    must match to float tolerance, with uint8 batches converted on device."""
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.state import (
        make_chained_train_step)

    k = 4
    cfg = _tiny_cfg(steps_per_call=k)
    model = CodecWrapper(cfg)
    tx = make_optimizer(cfg)
    step = make_train_step(cfg, model, tx)
    chained = make_chained_train_step(cfg, model, tx)
    rng = jax.random.PRNGKey(3)
    state0 = init_state(cfg, model, jnp.zeros((cfg.batch_size, 32, 32, 3)),
                        rng)
    rngs = jax.random.split(jax.random.PRNGKey(11), k)
    batches_u8 = np.stack(
        [np.stack([synthetic_images(1, 32, seed=10 * i + b)[0]
                   for b in range(cfg.batch_size)]) for i in range(k)])
    assert batches_u8.dtype == np.uint8
    lr = jnp.asarray(cfg.learning_rate)
    one = jnp.asarray(1.0)

    # sequential reference
    st = state0
    seq = []
    for i in range(k):
        st, out, _ = step(st, jnp.asarray(batches_u8[i], jnp.float32) / 255.0,
                          rngs[i], lr, one)
        seq.append([float(out.loss), float(out.mse), float(out.rate1),
                    float(out.rate2)])

    st_c, ms = chained(state0, jnp.asarray(batches_u8), rngs, lr, one)
    np.testing.assert_allclose(np.asarray(ms), np.asarray(seq),
                               rtol=2e-4, atol=2e-5)
    flat_a = jax.tree_util.tree_leaves(st.params)
    flat_b = jax.tree_util.tree_leaves(st_c.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    assert int(st_c.step) == k


def test_agent_chunked_epoch_matches_iteration_bookkeeping(tmp_path):
    """The agent's chunked epoch keeps iteration counts, loggers, and the
    loss-print window aligned (loss switch may only flip at chunk ends)."""
    cfg = _tiny_cfg(steps_per_epoch=4, max_epoch=1, loss_prnt_iters=2,
                    steps_per_call=2)
    cfg.log_dir = str(tmp_path / "logs")
    os.makedirs(cfg.log_dir, exist_ok=True)
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.loop import (
        LiftingDWTAgent)
    agent = LiftingDWTAgent(cfg)
    agent.run()
    assert agent.current_iteration == 4
    assert agent.timers.counts["step"] == 2  # 2 chunks of 2 steps

    # misaligned chunking falls back to per-step dispatch with a warning
    cfg2 = _tiny_cfg(steps_per_epoch=5, max_epoch=1, loss_prnt_iters=2,
                     steps_per_call=2)
    cfg2.log_dir = str(tmp_path / "logs2")
    os.makedirs(cfg2.log_dir, exist_ok=True)
    agent2 = LiftingDWTAgent(cfg2)
    assert agent2._chunk_size(5) == 1
