"""Explicit-collective data-parallel train step via jax.shard_map.

The default sharded path (parallel/runtime.py) lets GSPMD infer the gradient
reduction from sharding annotations.  This module is the explicit-SPMD
formulation of the same computation: each device runs the per-shard program
on its slice of the lanes and the loss normalizations / gradients / metrics
are combined with hand-placed ``jax.lax.psum``/``pmax`` collectives over the
data axis — the formulation to reach for when the automatic partitioner's
choices need to be overridden (custom overlap, pipelining, or mixing in
Pallas remote-DMA collectives).

Numerical relationship to the GSPMD path, precisely:

  * The **learner update given a fixed trajectory**
    (:func:`make_shard_map_learn_step`) is equivalent to the unsharded
    ``learn_fn`` up to float reduction order: every masked-mean inside the
    loss psums its numerator and valid count across the axis before
    dividing (``learn_loss(axis_name=...)``), and the per-shard gradients
    are psum-combined — verified against the single-device update in
    tests/test_sharding.py::test_shard_map_learn_matches_single_device.
  * The **full fused step** (:func:`make_shard_map_train_step`) rolls out
    *different episodes* than the GSPMD path by construction: the rollout
    key is folded with the device's axis index (one independent stream per
    shard), whereas the GSPMD path samples one global-batch stream.  Both
    are unbiased samples of the same on-policy distribution; they are not
    step-for-step identical.

The EMA/optimizer update runs replicated from the psum-reduced gradients, so
parameters stay bitwise identical across devices.  ConvNet BatchNorm is the
one deliberate semantic difference: batch statistics normalize over each
shard's lanes (non-sync BN, the standard data-parallel choice), while the
GSPMD path normalizes over the global batch; the running-stat EMAs are
pmean-combined so the stored variables remain identical across devices.
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


def _per_shard_learn(net, tx, cfg: RNaDConfig, packed,
                     state: rnad_lib.TrainState, traj: engine.Trajectory,
                     alpha: jax.Array):
    """One learner update on this device's lane shard; loss normalizations
    are global (psum inside learn_loss) and gradients are psum-combined, so
    the update equals the unsharded one up to reduction order."""
    aux = {k: v for k, v in state.variables.items() if k != "params"}
    grad_fn = jax.value_and_grad(rnad_lib.learn_loss, has_aux=True)
    (loss, (mutated, metrics)), grads = grad_fn(
        state.variables["params"], aux, net, state.variables_target,
        state.variables_reg, state.variables_reg_, packed, traj, alpha,
        cfg, axis_name=mesh_lib.DATA_AXIS,
        neurd_scale=rnad_lib.neurd_scale_for(cfg, state.total_steps))

    # EXPLICIT gradient reduction.  Under shard_map's unreplicated-AD
    # convention (check_vma=False) the transpose of an in-loss psum is
    # itself a psum, so each shard's grad is n_data x (its lanes'
    # contribution to the globally-normalized loss); pmean cancels the
    # factor and sums the contributions — exactly the unsharded gradient.
    # Metrics come out of learn_loss already psum-combined (identical on
    # every shard).
    grads = jax.lax.pmean(grads, mesh_lib.DATA_AXIS)
    metrics["gradient_norm"] = optax.global_norm(grads)

    # Mutated collections (ConvNet BatchNorm running stats) are computed
    # from each shard's local lanes — batch *normalization* inside the
    # forward is per-shard (the standard non-sync-BN data-parallel
    # semantic; the GSPMD path normalizes over the global batch instead).
    # The running-stat EMAs must still be combined, or every device would
    # carry different variables and the replicated out_spec would stitch
    # garbage: pmean is exact for the means and the standard within-shard
    # approximation for the variances.
    if mutated:
        mutated = jax.lax.pmean(mutated, mesh_lib.DATA_AXIS)

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
        opt_state=opt_state, total_steps=state.total_steps + 1)
    return new_state, metrics


def _traj_specs(traj: engine.Trajectory | None = None) -> engine.Trajectory:
    """PartitionSpecs sharding a time-major Trajectory's lane axis.  The
    spec pytree must mirror the trajectory's structure, so the optional
    stored-observation fields get specs only when present."""
    lane2 = P(None, mesh_lib.DATA_AXIS)
    lane3 = P(None, mesh_lib.DATA_AXIS, None)
    has_obs = traj is not None and traj.obs is not None
    return engine.Trajectory(
        indices=lane2, policy=lane3, actions=lane2, rewards=lane2,
        values=lane2,
        obs=P(None, mesh_lib.DATA_AXIS, None, None, None) if has_obs
        else None)


def make_shard_map_train_step(net, tree: GameTree, cfg: RNaDConfig,
                              mesh: jax.sharding.Mesh):
    """Returns train_step(state, alpha) running one explicit-SPMD update
    (independent per-shard rollout streams; see module docstring)."""
    n_data = mesh.shape[mesh_lib.DATA_AXIS]
    if cfg.batch_size % n_data != 0:
        raise ValueError("batch_size must divide the data axis")
    local_batch = cfg.batch_size // n_data
    actor_fn = lambda variables, obs: nets.apply_eval(net, variables, obs)
    obs_tf = rnad_lib.resolve_obs_transform(net, tree, cfg)
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
                                   init, tree.max_depth, packed,
                                   store_obs=cfg.store_rollout_obs,
                                   obs_dtype=rnad_lib.obs_storage_dtype(
                                       net, cfg),
                                   obs_transform=obs_tf)
        # Materialization point between rollout and learner — mirrors the
        # verified program shape of make_rnad_fns._train_step (XLA:TPU
        # miscompiled other shapes of the large fused program; see the
        # comment there and tools/check_fused_consistency.py).
        traj = jax.lax.optimization_barrier(traj)
        new_state, metrics = _per_shard_learn(net, tx, cfg, packed,
                                              state, traj, alpha)
        return new_state.replace(key=key), metrics

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


def make_shard_map_learn_step(net, tree: GameTree, cfg: RNaDConfig,
                              mesh: jax.sharding.Mesh):
    """Returns learn(state, traj, alpha): one explicit-SPMD learner update
    on a given global trajectory, lane-sharded over the data axis.

    This is the piece of the shard_map path that is numerically equivalent
    to the unsharded ``learn_fn`` (up to reduction order) — the equivalence
    test target, and the entry point for off-policy/buffered training under
    explicit SPMD."""
    tx = rnad_lib.make_optimizer(cfg)
    packed = stepping.make_packed_tables(tree)
    rep = P()

    def per_shard(packed, state, traj, alpha):
        return _per_shard_learn(net, tx, cfg, packed, state, traj, alpha)

    # in_specs must mirror the trajectory pytree, whose optional
    # stored-observation fields vary by producer — build one jitted
    # shard_map per trajectory structure (two at most).
    jitted_by_structure = {}

    def learn(state: rnad_lib.TrainState, traj: engine.Trajectory, alpha
              ) -> Tuple[rnad_lib.TrainState, dict]:
        key = traj.obs is not None
        if key not in jitted_by_structure:
            shard_fn = jax.shard_map(
                per_shard, mesh=mesh,
                in_specs=(rep, rep, _traj_specs(traj), rep),
                out_specs=(rep, rep),
                check_vma=False)
            jitted_by_structure[key] = jax.jit(shard_fn)
        return jitted_by_structure[key](packed, state, traj,
                                        jnp.float32(alpha))

    return learn
