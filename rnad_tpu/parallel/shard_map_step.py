"""Explicit-collective data-parallel train step via jax.shard_map.

The default sharded path (parallel/runtime.py) lets GSPMD infer the gradient
reduction from sharding annotations.  This module is the explicit-SPMD
formulation of the same computation: each device runs the per-shard program
on its slice of the lanes and the gradients/metrics are combined with a
hand-placed ``jax.lax.psum`` over the data axis — the formulation to reach
for when the automatic partitioner's choices need to be overridden (custom
overlap, pipelining, or mixing in Pallas remote-DMA collectives).

Numerically equivalent to the GSPMD path up to reduction order (verified in
tests/test_sharding.py); the EMA/optimizer update runs replicated from the
psum-reduced gradients, so parameters stay bitwise identical across devices.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from ..config import RNaDConfig
from ..env import engine
from ..env.tree import GameTree
from ..learn import rnad as rnad_lib
from ..models import nets
from ..ops import stepping
from . import mesh as mesh_lib


def make_shard_map_train_step(net, tree: GameTree, cfg: RNaDConfig,
                              mesh: jax.sharding.Mesh):
    """Returns train_step(state, alpha) running one explicit-SPMD update."""
    n_data = mesh.shape[mesh_lib.DATA_AXIS]
    if cfg.batch_size % n_data != 0:
        raise ValueError("batch_size must divide the data axis")
    local_batch = cfg.batch_size // n_data
    actor_fn = lambda variables, obs: nets.apply_eval(net, variables, obs)
    tx = rnad_lib.make_optimizer(cfg)

    def per_shard(tree, packed, state: rnad_lib.TrainState,
                  alpha: jax.Array):
        # Per-lane RNG: fold the device's data-axis index into the key so
        # every shard rolls out distinct episodes from one replicated key.
        axis = jax.lax.axis_index(mesh_lib.DATA_AXIS)
        key, k_roll = jax.random.split(state.key)
        k_roll = jax.random.fold_in(k_roll, axis)
        init = jnp.ones((local_batch,), jnp.int32)
        traj = engine.rollout_from(tree, actor_fn, state.variables, k_roll,
                                   init, tree.max_depth, packed)

        aux = {k: v for k, v in state.variables.items() if k != "params"}
        grad_fn = jax.value_and_grad(rnad_lib.learn_loss, has_aux=True)
        (loss, (mutated, metrics)), grads = grad_fn(
            state.variables["params"], aux, net, state.variables_target,
            state.variables_reg, state.variables_reg_, packed, traj, alpha,
            cfg)

        # EXPLICIT gradient/metric reduction over the data axis.
        grads = jax.lax.pmean(grads, mesh_lib.DATA_AXIS)
        metrics = jax.lax.pmean(metrics, mesh_lib.DATA_AXIS)
        metrics["gradient_norm"] = optax.global_norm(grads)

        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.variables["params"])
        params = optax.apply_updates(state.variables["params"], updates)
        variables = dict(mutated, params=params)
        for k, v in state.variables.items():
            variables.setdefault(k, v)
        g = cfg.gamma_averaging
        variables_target = jax.tree.map(lambda p, t: g * p + (1.0 - g) * t,
                                        variables, state.variables_target)
        new_state = state.replace(
            variables=variables, variables_target=variables_target,
            opt_state=opt_state, key=key,
            total_steps=state.total_steps + 1)
        return new_state, metrics

    packed = stepping.make_packed_tables(tree)
    rep = P()
    shard_fn = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(rep, rep, rep, rep),
        out_specs=(rep, rep),
        check_vma=False)
    jitted = jax.jit(shard_fn)

    def train_step(state: rnad_lib.TrainState, alpha
                   ) -> Tuple[rnad_lib.TrainState, dict]:
        return jitted(tree, packed, state, jnp.float32(alpha))

    return train_step
