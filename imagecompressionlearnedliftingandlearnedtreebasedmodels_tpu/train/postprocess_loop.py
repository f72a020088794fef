"""Post-processing training stage (reference ``train_one_epoch_postprocess``,
``agents/liftingDWT_agent.py:113-152`` + ``agents/base.py:170-182``).

The codec is frozen (stop_gradient around its forward); only the restoration
net trains, on MSE against the original image, with its own Adam +
ReduceLROnPlateau(mse) pair. BatchNorm stats live in a mutable
``batch_stats`` collection threaded through the step.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..models.postprocess import make_postprocess
from .loss import rd_loss3
from .state import PlateauScheduler, apply_color_forward


def make_postprocess_train_step(cfg: Config, codec_model, pp_model, tx):
    @jax.jit
    def step(codec_params, pp_variables, opt_state, batch, rng, lr):
        def loss_fn(pp_params):
            xs, xhat, info_xe, info_xo, _ = apply_color_forward(
                cfg, codec_model, codec_params, batch, True, rng)
            xhat = jax.lax.stop_gradient(xhat)  # codec frozen
            restored, updates = pp_model.apply(
                {"params": pp_params,
                 "batch_stats": pp_variables.get("batch_stats", {})},
                xhat + 0.5, True, mutable=["batch_stats"])
            restored = restored - 0.5
            out = rd_loss3(xs, restored, info_xe, info_xo, cfg.lambda_, 1.0)
            return out.mse, (out, updates)

        grads, (out, bn_updates) = jax.grad(loss_fn, has_aux=True)(
            pp_variables["params"])
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, opt_state,
                                       pp_variables["params"])
        params = optax.apply_updates(pp_variables["params"], updates)
        new_vars = {"params": params,
                    "batch_stats": bn_updates.get("batch_stats", {})}
        return new_vars, opt_state, out

    return step


def make_postprocess_eval_step(cfg: Config, codec_model, pp_model):
    @jax.jit
    def step(codec_params, pp_variables, batch):
        xs, xhat, info_xe, info_xo, _ = apply_color_forward(
            cfg, codec_model, codec_params, batch, False, None)
        restored = pp_model.apply(pp_variables, xhat + 0.5, False) - 0.5
        restored = jnp.clip(restored, -0.5, 0.5)
        return rd_loss3(xs, restored, info_xe, info_xo, cfg.lambda_, 1.0)

    return step


def train_postprocess(agent) -> None:
    """Drive the postprocess stage on an initialized LiftingDWTAgent."""
    cfg = agent.cfg
    pp_model = make_postprocess(cfg)
    rng = jax.random.PRNGKey(cfg.seed + 11)
    sample = jnp.zeros((1, max(cfg.patch_size, 32), max(cfg.patch_size, 32), 3))
    pp_variables = pp_model.init(rng, sample, True)
    pp_variables = dict(pp_variables)
    pp_variables.setdefault("batch_stats", {})
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=1e-4)
    opt_state = tx.init(pp_variables["params"])
    scheduler = PlateauScheduler(lr=1e-4)

    train_step = make_postprocess_train_step(cfg, agent.model, pp_model, tx)
    eval_step = make_postprocess_eval_step(cfg, agent.model, pp_model)

    for epoch in range(cfg.max_epoch):
        steps = agent.data.steps_per_epoch()
        mses = []
        for batch in agent.data.train_batches(steps, seed=epoch):
            agent.rng, srng = jax.random.split(agent.rng)
            pp_variables, opt_state, out = train_step(
                agent.state.params, pp_variables, opt_state,
                jnp.asarray(batch), srng, jnp.asarray(scheduler.lr))
            mses.append(float(out.mse))
            agent.heartbeat.beat()  # liveness for supervised runs
            agent.train_logger(float(out.loss), float(out.mse),
                               float(out.rate1), float(out.rate2))
        agent.train_logger.display(lr=scheduler.lr, typ="tr")
        scheduler.step(float(np.mean(mses)))
        # validation with restoration applied
        for batch in agent.data.valid_batches():
            out = eval_step(agent.state.params, pp_variables,
                            jnp.asarray(batch))
            agent.heartbeat.beat()
            agent.valid_logger(float(out.loss), float(out.mse),
                               float(out.rate1), float(out.rate2))
        agent.valid_logger.display(lr=0.0, typ="va")
    agent.pp_variables = pp_variables
