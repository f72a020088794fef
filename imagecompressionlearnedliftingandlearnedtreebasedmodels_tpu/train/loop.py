"""Training/eval runtime (reference layer L2: ``agents/base.py`` +
``agents/liftingDWT_agent.py``), re-shaped around a pure jitted step.

Mode dispatch mirrors ``BaseAgent.run`` (``agents/base.py:130-154``):
train / train_postprocess / validate / validate_recu_reco / test / debug
(debug wraps training in ``jax.debug_nans`` — the analog of the reference's
``torch.autograd.detect_anomaly``). Crash-save semantics are preserved: any
exception triggers a checkpoint save before re-raising
(``agents/base.py:148-154``).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.codec import CodecWrapper
from ..utils.heartbeat import Heartbeat
from . import checkpoint as ckpt
from .data import ImageDataLoader
from .loggers import RDLogger, setup_logging
from .state import (LossSwitchController, PlateauScheduler, TrainState,
                    init_state, make_eval_step, make_optimizer,
                    make_train_step)


class LiftingDWTAgent:
    """End-to-end experiment runtime for the wavelet codec family."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.logger = setup_logging(cfg.log_dir)
        # liveness beacon for train/supervisor.py (no-op unless the
        # LIFTING_TPU_HEARTBEAT env var is set by a supervisor)
        self.heartbeat = Heartbeat()
        self.model = CodecWrapper(cfg)
        self.data = ImageDataLoader(cfg)
        self.tx = make_optimizer(cfg)
        self.mesh = self._build_mesh()
        if self.mesh is not None:
            from ..parallel import dp
            self.train_step, self._shard_state = dp.make_shardmap_train_step(
                cfg, self.model, self.tx, self.mesh)
            if cfg.halo_eval:
                from ..parallel.tiling import make_halo_eval_step
                self.eval_step = make_halo_eval_step(
                    cfg, self.model, self.mesh)
            else:
                self.eval_step = dp.make_dp_eval_step(
                    cfg, self.model, self.mesh)
            if cfg.steps_per_call > 1:
                self.chained_step = dp.make_chained_shardmap_train_step(
                    cfg, self.model, self.tx, self.mesh)
        else:
            self.train_step = make_train_step(cfg, self.model, self.tx)
            self.eval_step = make_eval_step(cfg, self.model)
            self._shard_state = lambda s: s
            if cfg.steps_per_call > 1:
                from .state import make_chained_train_step
                self.chained_step = make_chained_train_step(
                    cfg, self.model, self.tx)

        rng = jax.random.PRNGKey(cfg.seed)
        sample = jnp.zeros(
            (1, max(cfg.patch_size, 32), max(cfg.patch_size, 32), 3))
        self.state = self._shard_state(init_state(cfg, self.model, sample, rng))
        self.rng = jax.random.fold_in(rng, 7)

        self.scheduler = PlateauScheduler(lr=cfg.learning_rate)
        self.loss_switch = LossSwitchController(
            enabled=(cfg.training_loss_switch == 0),
            threshold=cfg.loss_switch_thr)
        self.current_epoch = 0
        self.current_iteration = 0
        self.best_valid_loss = float("inf")
        # SURVEY.md section 5 TPU plan: per-phase timers + device traces
        # (the reference has no profiling at all)
        from ..utils.profiling import PhaseTimers
        self.timers = PhaseTimers()
        self._trace_on = False

        jsonl = f"{cfg.summary_dir}/metrics.jsonl" if cfg.summary_dir else None
        self.train_logger = RDLogger(self.logger, jsonl)
        self.trnit_logger = RDLogger(self.logger, jsonl)
        self.valid_logger = RDLogger(self.logger, jsonl)
        self.test_logger = RDLogger(self.logger, jsonl)

        if cfg.mode in ("test", "validate", "validate_recu_reco"):
            self.load_checkpoint("model_best")
        elif cfg.resume_training:
            self.load_checkpoint(cfg.checkpoint_file)
        self.model_size_estimation()

    def _build_mesh(self):
        """Data-parallel mesh from ``cfg.mesh_shape`` (SURVEY.md section 2.4:
        shard_map DP over ICI replaces the reference's absent DDP). A
        1-device shape keeps the plain single-chip step."""
        import numpy as _np

        n = int(_np.prod(self.cfg.mesh_shape))
        if n <= 1:
            return None
        from ..parallel import mesh as mesh_lib

        if self.cfg.batch_size % n:
            raise ValueError(
                f"batch_size {self.cfg.batch_size} not divisible by "
                f"mesh size {n}")
        mesh = mesh_lib.make_mesh(n)
        self.logger.info(f"data-parallel mesh: {n} devices "
                         f"({self.cfg.batch_size // n} examples/device)")
        return mesh

    # ------------------------------------------------------------------
    def run(self):
        mode = self.cfg.mode
        try:
            if mode == "train":
                self.train()
            elif mode == "debug":
                with jax.debug_nans(True):
                    self.train()
            elif mode == "validate":
                self.validate()
            elif mode == "validate_recu_reco":
                self.validate_recu_reco()
            elif mode == "test":
                self.test()
            elif mode == "train_postprocess":
                self.train_postprocess()
            else:
                raise ValueError(f"unknown mode {mode!r}")
        except KeyboardInterrupt:
            self.logger.info("interrupted — saving checkpoint")
            self.save_checkpoint()
        except Exception:
            self.logger.exception("training crashed — saving checkpoint")
            self.save_checkpoint()
            raise

    def train(self):
        cfg = self.cfg
        for epoch in range(self.current_epoch, cfg.max_epoch):
            self.current_epoch = epoch
            self.train_one_epoch(epoch)
            if (epoch + 1) % cfg.validate_every == 0:
                valid_loss = self.validate()
                is_best = valid_loss < self.best_valid_loss
                self.best_valid_loss = min(valid_loss, self.best_valid_loss)
                self.save_checkpoint(is_best=is_best)
            elif cfg.save_every_epochs > 0 \
                    and (epoch + 1) % cfg.save_every_epochs == 0:
                # crash insurance between (or instead of) validations: a
                # transport drop then costs minutes, not the whole run
                self.save_checkpoint()

    def _profile_tick(self):
        """Device-trace window: steps [1, 1+profile_steps) of the run
        (step 0 pays compile and would dominate the trace)."""
        cfg = self.cfg
        if cfg.profile_steps <= 0:
            return
        if not self._trace_on and self.current_iteration == 1:
            trace_dir = os.path.join(cfg.log_dir or ".", "trace")
            jax.profiler.start_trace(trace_dir)
            self._trace_on = True
            self.logger.info(f"profiler trace started -> {trace_dir}")
        elif self._trace_on and (self.current_iteration
                                 >= 1 + cfg.profile_steps):
            jax.profiler.stop_trace()
            self._trace_on = False
            self.logger.info("profiler trace stopped")

    def _chunk_size(self, steps: int) -> int:
        """Effective ``steps_per_call``: chunking must align with the
        ``loss_prnt_iters`` window (the loss switch may only flip rate_w at
        a chunk boundary — rate_w is constant inside a scanned chunk) and
        with the epoch length. Misaligned configs fall back to per-step
        dispatch rather than changing semantics."""
        k = self.cfg.steps_per_call
        if k <= 1:
            return 1
        if steps % k or self.cfg.loss_prnt_iters % k:
            self.logger.warning(
                f"steps_per_call={k} does not divide steps_per_epoch="
                f"{steps} and loss_prnt_iters={self.cfg.loss_prnt_iters}; "
                f"using per-step dispatch")
            return 1
        return k

    def train_one_epoch(self, epoch: int):
        cfg = self.cfg
        steps = self.data.steps_per_epoch()
        lr = jnp.asarray(self.scheduler.lr, jnp.float32)
        k = self._chunk_size(steps)
        batches = iter(self.data.train_batches(steps, seed=epoch, chunk=k))
        while True:
            with self.timers.phase("data"):
                batch = next(batches, None)
            if batch is None:
                break
            self._profile_tick()
            rate_w = jnp.asarray(self.loss_switch.rate_weight(), jnp.float32)
            if k > 1:
                keys = jax.random.split(self.rng, k + 1)
                self.rng = keys[0]
                with self.timers.phase("step"):
                    self.state, ms = self.chained_step(
                        self.state, jnp.asarray(batch), keys[1:], lr,
                        rate_w)
                    # ONE (k, 4) readback syncs the whole chunk
                    rows = [tuple(map(float, r)) for r in np.asarray(ms)]
            else:
                self.rng, step_rng = jax.random.split(self.rng)
                with self.timers.phase("step"):
                    self.state, out, aux = self.train_step(
                        self.state, jnp.asarray(batch), step_rng, lr,
                        rate_w)
                    # readback is the device sync point: step time includes
                    # the device work, not just the async enqueue
                    rows = [(float(out.loss), float(out.mse),
                             float(out.rate1), float(out.rate2))]
            self.heartbeat.beat()
            for vals in rows:
                self.current_iteration += 1
                self.train_logger(*vals)
                self.trnit_logger(*vals)
                # trigger exactly at multiples of loss_prnt_iters: with
                # chunked dispatch (k | loss_prnt_iters) this is a chunk
                # boundary, so rate_w flips before the next dispatch and the
                # chunked path matches the unchunked one step-for-step
                if self.current_iteration % cfg.loss_prnt_iters == 0:
                    _, it_mse, _, _ = self.trnit_logger.display(
                        lr=self.scheduler.lr, typ="it",
                        step=self.current_iteration)
                    was_off = not self.loss_switch.rate_on
                    self.loss_switch.observe_window_mse(it_mse)
                    if was_off and self.loss_switch.rate_on:
                        self.logger.info(
                            "loss switch: D-only -> Rate + lambda*Distortion")
        rd, _, _, _ = self.train_logger.display(
            lr=self.scheduler.lr, typ="tr", step=self.current_iteration)
        self.scheduler.step(rd)
        if self._trace_on:  # epoch shorter than the requested window
            jax.profiler.stop_trace()
            self._trace_on = False
        if cfg.phase_timers:
            self.logger.info("phase timers:\n" + self.timers.report())

    def _save_wavelet_pyramid(self, batch) -> None:
        """``imshow_validation``: save the nested wavelet-pyramid montage of
        the first validation image (reference ``show_wavelet_coeff``,
        ``lifting_dwt_nets.py:393-410``, drawn when ``imshow_validation``)."""
        from ..models.codec import LiftingDWTCodec
        from ..ops import color as color_ops
        from ..utils.image_plots import wavelet_pyramid

        if not hasattr(self, "_imshow_enc"):
            codec = LiftingDWTCodec(self.cfg)
            self._imshow_enc = jax.jit(lambda p, x: codec.apply(
                {"params": p}, x,
                method=lambda m, v: m.transform.encode(v)))
        if self.cfg.clrch == 3:
            tree = self.state.params["codec"]
            x = jnp.asarray(batch) - 0.5
        else:  # per-channel models: draw the Y plane's pyramid
            y = color_ops.shift_ycbcr(
                color_ops.rgb_to_ycbcr(jnp.asarray(batch)))
            tree, x = self.state.params["codecs_0"], y[..., :1]
        xe, xo_list = self._imshow_enc(tree, x)
        out = os.path.join(self.cfg.out_dir or self.cfg.log_dir or ".",
                           f"wavelet_pyramid_it{self.current_iteration}.png")
        wavelet_pyramid(np.asarray(xe), [np.asarray(t) for t in xo_list],
                        out_path=out)
        self.logger.info(f"wavelet pyramid montage -> {out}")

    def validate(self) -> float:
        psnrs, r1s, r2s = [], [], []
        shown = not self.cfg.imshow_validation
        for batch in self.data.valid_batches():
            if not shown:
                self._save_wavelet_pyramid(batch)
                shown = True
            out = self.eval_step(self.state.params, jnp.asarray(batch))
            self.heartbeat.beat()
            self.valid_logger(float(out.loss), float(out.mse),
                              float(out.rate1), float(out.rate2))
            psnrs.append(-10.0 * np.log10(max(float(out.mse), 1e-12)))
            r1s.append(float(out.rate1))
            r2s.append(float(out.rate2))
        rd, _, _, _ = self.valid_logger.display(
            lr=0.0, typ="va", step=self.current_iteration)
        self.logger.info(
            f" avg_psnr = {np.mean(psnrs):.2f}, rate_1 = {np.mean(r1s):.4f},"
            f" rate_2 = {np.mean(r2s):.4f},"
            f" total_rate = {np.mean(r1s) + np.mean(r2s):.4f}")
        return rd

    def validate_recu_reco(self):
        """Recursive-reconstruction validation — stub in the reference too
        (``agents/liftingDWT_agent.py:254-258``)."""
        self.logger.info("validate_recu_reco: not implemented (stub parity)")

    def test(self):
        """Real encode+decode with the bitstream path (reference
        ``agents/liftingDWT_agent.py:262-311``). ``cfg.tile_size > 0``
        switches to per-tile streams (high-res images; SURVEY.md section 5
        resolution scaling) — tiles whose height divides the image."""
        from ..coding.codec_coder import CodecCoder

        coder = CodecCoder(self.cfg, self.model, self.state.params)
        tiled_cache = {}

        def run_one(img: np.ndarray):
            h = img.shape[1]
            if self.cfg.tile_size and h > self.cfg.tile_size \
                    and h % self.cfg.tile_size == 0:
                n = h // self.cfg.tile_size
                if n not in tiled_cache:
                    from ..coding.tiled_coder import TiledCodecCoder
                    tiled_cache[n] = TiledCodecCoder(
                        self.cfg, self.model, self.state.params, n_tiles=n)
                return tiled_cache[n].compress_decompress(img)
            return coder.compress_decompress(img)

        from ..utils.heartbeat import HeartbeatLease

        psnrs, bpps = [], []
        # lease: a single image's round trip can exceed the supervisor
        # timeout while it pays fresh coding-graph compiles (test progress
        # is not checkpointable, so a mid-test kill restarts the WHOLE
        # test — livelock); the lease is bounded, so a wedged readback
        # still goes stale eventually
        with HeartbeatLease(self.heartbeat):
            for batch in self.data.test_batches():
                res = run_one(np.asarray(batch))
                self.heartbeat.beat()
                psnrs.append(res.psnr)
                bpps.append(res.bpp)
                self.test_logger(0.0, 10 ** (-res.psnr / 10), res.bpp, 0.0)
        # per-image operating points, for spread reporting (BD-rate inputs
        # on small eval sets are fragile — the spread is part of the result)
        self.last_test_per_image = [
            {"psnr": round(float(p), 3), "bpp": round(float(b), 5)}
            for p, b in zip(psnrs, bpps)]
        self.logger.info(
            f" avg_psnr = {np.mean(psnrs):.2f} (std {np.std(psnrs):.2f}), "
            f"total_rate = {np.mean(bpps):.4f} bpp "
            f"(std {np.std(bpps):.4f}, real bitstream)")
        return float(np.mean(psnrs)), float(np.mean(bpps))

    def train_postprocess(self):
        from .postprocess_loop import train_postprocess
        train_postprocess(self)

    # ------------------------------------------------------------------
    def save_checkpoint(self, is_best: bool = False):
        if not self.cfg.checkpoint_dir:
            return
        payload = {
            "epoch": self.current_epoch,
            "iteration": self.current_iteration,
            "best_valid_loss": self.best_valid_loss,
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
            "scheduler": self.scheduler.state_dict(),
            "loss_switch": self.loss_switch.state_dict(),
            "train_logger": self.train_logger.state_dict(),
            "valid_logger": self.valid_logger.state_dict(),
        }
        ckpt.save_checkpoint(self.cfg.checkpoint_dir, payload, is_best,
                             name=self.cfg.checkpoint_file)
        self.heartbeat.beat(force=True)

    def load_checkpoint(self, name: str):
        template = {
            "epoch": 0, "iteration": 0, "best_valid_loss": 0.0,
            "params": self.state.params, "opt_state": self.state.opt_state,
            "step": self.state.step,
            "scheduler": self.scheduler.state_dict(),
            "loss_switch": self.loss_switch.state_dict(),
            "train_logger": self.train_logger.state_dict(),
            "valid_logger": self.valid_logger.state_dict(),
        }
        # The template restores the pytree with its original node types
        # (optax opt_state namedtuples, TrainState) — a raw restore would
        # come back as plain dicts and break train_step's
        # ``opt_state.hyperparams`` access after resume.
        payload = ckpt.load_checkpoint(self.cfg.checkpoint_dir, name,
                                       template=template)
        if payload is None and name != "model_best":
            # the rolling checkpoint can be lost to a crashed save (flaky
            # transport mid-readback); model_best is written atomically too
            # and is the best surviving state
            self.logger.warning(
                f"no checkpoint {name!r} — falling back to 'model_best'")
            name = "model_best"
            payload = ckpt.load_checkpoint(self.cfg.checkpoint_dir, name,
                                           template=template)
        if payload is None:
            self.logger.warning(f"no checkpoint {name!r} found — fresh init")
            return
        self.current_epoch = int(payload["epoch"])
        self.current_iteration = int(payload["iteration"])
        self.best_valid_loss = float(payload["best_valid_loss"])
        self.state = TrainState(payload["params"], payload["opt_state"],
                                jnp.asarray(payload["step"]))
        self.scheduler.load_state_dict(payload["scheduler"])
        self.loss_switch.load_state_dict(payload["loss_switch"])
        self.train_logger.load_state_dict(payload["train_logger"])
        self.valid_logger.load_state_dict(payload["valid_logger"])
        self.logger.info(f"restored checkpoint {name!r} at epoch "
                         f"{self.current_epoch}")

    def finalize(self):
        self.save_checkpoint()

    def model_size_estimation(self):
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(self.state.params))
        mb = n_params * 4 / 1024 ** 2
        self.logger.info(f"model params: {n_params:,} ({mb:.2f} MB fp32)")
        return mb
