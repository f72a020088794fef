"""Data-parallel training over a device mesh.

TPU-native replacement for the DDP the reference never had (SURVEY.md
section 2.4). Two interchangeable step builders:

- :func:`make_dp_train_step` — GSPMD form: the single-chip jitted step is
  fed a batch sharded over the ``data`` axis with replicated params; XLA
  partitions the program and inserts the gradient all-reduce over ICI.
  Bitwise-identical to single-chip execution (same program, same rng).
- :func:`make_shardmap_train_step` — explicit shard_map form: each device
  runs the per-shard loss/grad with its own fold_in'd noise rng, grads and
  metrics are combined with named ``psum``/``pmean`` collectives, and the
  (replicated) optimizer update is computed identically on every device.
  This is the production path used by ``train/loop.py`` when
  ``cfg.mesh_shape`` spans more than one device: per-device rng gives
  independent quantization noise per shard (better SNR than one broadcast
  noise tensor), and the collectives are explicit in the program.

Both keep params replicated — the models are <100 MB (SURVEY.md section
2.4: no TP/PP warranted); scaling axes are batch and image tiles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..train.loss import rd_loss3
from ..train.state import TrainState, apply_color_forward
from . import mesh as mesh_lib


def make_dp_train_step(cfg: Config, model, tx, mesh: Mesh):
    """GSPMD data parallelism: shard the batch, let XLA insert the psum."""
    from ..train.state import make_train_step

    base_step = make_train_step(cfg, model, tx)
    repl = mesh_lib.replicated(mesh)
    bsh = mesh_lib.batch_sharding(mesh)

    def dp_step(state: TrainState, batch, rng, lr, rate_weight, lam=None):
        batch = jax.device_put(batch, bsh)
        return base_step(state, batch, rng, lr, rate_weight, lam)

    def shard_state(state: TrainState) -> TrainState:
        return jax.device_put(state, repl)

    return dp_step, shard_state


def make_shardmap_train_step(cfg: Config, model, tx, mesh: Mesh,
                             axis: str = "data"):
    """Explicit shard_map data parallelism with named collectives.

    Per device: forward/backward on the local batch shard with an
    independent noise rng (``fold_in(rng, axis_index)``), then
    ``pmean(grads)`` over ICI; the optimizer update runs redundantly on
    every device over the replicated params (standard DP replication —
    cheaper than a scatter/gather for <100 MB models). Loss metrics are
    pmean'd so the host sees global-batch values.

    Returns ``(dp_step, shard_state)`` with the same call signature as the
    single-chip ``make_train_step`` step.
    """
    loss_scale = 1.0 / max(cfg.grad_acc_iters, 1)
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(axis))

    def per_device_step(state: TrainState, batch, rng, lr, rate_weight,
                        lam):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def loss_fn(params):
            xs, xhat, info_xe, info_xo, aux = apply_color_forward(
                cfg, model, params, batch, True, rng)
            out = rd_loss3(xs, xhat, info_xe, info_xo, lam, rate_weight)
            return (out.loss + aux) * loss_scale, (out, aux)

        grads, (out, aux) = jax.grad(loss_fn, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, axis)
        out = jax.tree_util.tree_map(lambda v: jax.lax.pmean(v, axis), out)
        aux = jax.lax.pmean(aux, axis)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), out, aux

    sharded = jax.shard_map(
        per_device_step, mesh=mesh,
        in_specs=(P(), P(axis), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False)

    @jax.jit
    def jitted(state: TrainState, batch, rng, lr, rate_weight, lam):
        return sharded(state, batch, jnp.asarray(rng), jnp.asarray(lr),
                       jnp.asarray(rate_weight), lam)

    def dp_step(state, batch, rng, lr, rate_weight, lam=None):
        if lam is None:
            lam = cfg.lambda_
        return jitted(state, batch, rng, lr, rate_weight,
                      jnp.asarray(lam, jnp.float32))

    def shard_state(state: TrainState) -> TrainState:
        return jax.device_put(state, repl)

    def shard_batch(batch):
        return jax.device_put(batch, bsh)

    dp_step.shard_batch = shard_batch
    dp_step.lower = jitted.lower  # AOT trace+lower (flagship-scale evidence)
    return dp_step, shard_state


def make_chained_shardmap_train_step(cfg: Config, model, tx, mesh: Mesh,
                                     axis: str = "data"):
    """``k = cfg.steps_per_call`` optimizer steps per dispatch ON THE MESH.

    The single-chip chunked scan (``train/state.py::make_chained_train_step``)
    killed the ~25-40 ms per-dispatch RTT of tunneled backends (5 -> 26.6
    steps/s measured); this is the same ``lax.scan`` inside the shard_map
    body so multi-chip training gets the identical amortization: batches
    arrive as ``(k, B, ...)`` (uint8 ok) sharded over the batch axis, grads
    are ``pmean``'d per scanned step, and ONE ``(k, 4)`` metrics array comes
    back per chunk. Step-for-step equivalent to k sequential
    :func:`make_shardmap_train_step` calls with the same per-step rngs
    (verified in ``tests/test_parallel.py``).
    """
    loss_scale = 1.0 / max(cfg.grad_acc_iters, 1)
    repl = NamedSharding(mesh, P())

    def per_device_chunk(state: TrainState, batches, rngs, lr, rate_weight,
                         lam):
        ai = jax.lax.axis_index(axis)

        def body(st, xs):
            batch, rng = xs
            if batch.dtype == jnp.uint8:
                batch = batch.astype(jnp.float32) / 255.0
            rng = jax.random.fold_in(rng, ai)

            def loss_fn(params):
                xsh, xhat, info_xe, info_xo, aux = apply_color_forward(
                    cfg, model, params, batch, True, rng)
                out = rd_loss3(xsh, xhat, info_xe, info_xo, lam, rate_weight)
                return (out.loss + aux) * loss_scale, out

            grads, out = jax.grad(loss_fn, has_aux=True)(st.params)
            grads = jax.lax.pmean(grads, axis)
            metrics = jax.lax.pmean(
                jnp.stack([out.loss, out.mse, out.rate1, out.rate2]), axis)
            opt_state = st.opt_state
            opt_state.hyperparams["learning_rate"] = lr
            updates, opt_state = tx.update(grads, opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            return TrainState(params, opt_state, st.step + 1), metrics

        return jax.lax.scan(body, state, (batches, rngs))

    sharded = jax.shard_map(
        per_device_chunk, mesh=mesh,
        in_specs=(P(), P(None, axis), P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)

    @jax.jit
    def jitted(state, batches, rngs, lr, rate_weight, lam):
        return sharded(state, batches, jnp.asarray(rngs), jnp.asarray(lr),
                       jnp.asarray(rate_weight), lam)

    def chained_step(state, batches, rngs, lr, rate_weight, lam=None):
        if lam is None:
            lam = cfg.lambda_
        return jitted(state, batches, rngs, lr, rate_weight,
                      jnp.asarray(lam, jnp.float32))

    chained_step.replicated_sharding = repl
    chained_step.lower = jitted.lower
    return chained_step


def make_dp_eval_step(cfg: Config, model, mesh: Mesh, axis: str = "data"):
    """Evaluation over the mesh: batch sharded over ``data`` when its size
    divides the mesh, replicated otherwise (the reference validates/tests at
    batch 1 — ``agents/base.py`` split policy — which cannot shard)."""
    from ..train.state import make_eval_step

    base = make_eval_step(cfg, model)
    n_dev = mesh.devices.size
    bsh = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def eval_step(params, batch):
        sh = bsh if batch.shape[0] % n_dev == 0 else repl
        return base(params, jax.device_put(batch, sh))

    return eval_step
