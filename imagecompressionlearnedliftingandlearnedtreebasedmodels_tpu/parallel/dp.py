"""Data-parallel training step over a device mesh.

Params are replicated, batches are sharded over the ``data`` axis; XLA
inserts the gradient psum over ICI. This is the TPU-native replacement for
the DDP the reference never had (SURVEY.md section 2.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..config import Config
from ..train.state import TrainState, make_train_step
from . import mesh as mesh_lib


def make_dp_train_step(cfg: Config, model, tx, mesh: Mesh):
    """Wrap the single-chip train step with mesh shardings."""
    base_step = make_train_step(cfg, model, tx)
    repl = mesh_lib.replicated(mesh)
    bsh = mesh_lib.batch_sharding(mesh)

    def dp_step(state: TrainState, batch, rng, lr, rate_weight):
        batch = jax.device_put(batch, bsh)
        return base_step(state, batch, rng, lr, rate_weight)

    def shard_state(state: TrainState) -> TrainState:
        return jax.device_put(state, repl)

    return dp_step, shard_state
