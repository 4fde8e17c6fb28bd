"""Jitted batched rollout engine.

Replaces the reference's Python while-loop actor (reference
environment/episode.py:175-230) with a fixed-length ``lax.scan`` over full
turns.  The absorbing-state convention (terminated lanes self-loop at index 0
with reward 0, reference tree.py:29-32) means no masking or compaction is
needed mid-rollout; validity is recovered afterwards as ``indices != 0``.

The emitted ``Trajectory`` is time-major with the reference's exact half-step
record layout (episode.py:218-227): per half-step state index, mover id,
observation, behavior policy mu, one-hot action, reward, value estimate and
legal-action mask — two half-steps (row then column mover) per tree level.
The scan emits both half-step records per turn from a single (2B)-batched
net forward (see ops/stepping.observe).
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..models import common
from ..ops import stepping
from .tree import GameTree


@struct.dataclass
class Trajectory:
    """Time-major batch of rollout trajectories; T = 2 * tree.max_depth."""

    indices: jax.Array  # (T, B) int32 — state id at each half-step
    turns: jax.Array  # (T, B) int32 — mover: 0 row, 1 col
    observations: jax.Array  # (T, B, 2, A, A) f32
    policy: jax.Array  # (T, B, A) f32 — behavior policy mu
    actions_oh: jax.Array  # (T, B, A) f32 — one-hot sampled actions
    rewards: jax.Array  # (T, B) f32 — row-player reward (zero-sum)
    values: jax.Array  # (T, B) f32 — actor value estimates
    masks: jax.Array  # (T, B, A) f32 — mover's legal actions

    @property
    def num_half_steps(self) -> int:
        return self.indices.shape[0]

    @property
    def batch_size(self) -> int:
        return self.indices.shape[1]

    def valid(self) -> jax.Array:
        """(T, B) 1.0 where the half-step belongs to a live episode."""
        return (self.indices != 0).astype(jnp.float32)


# Actor signature: variables, obs (N, 2, A, A) -> (logits (N, A), value (N,))
ActorFn = Callable[[dict, jax.Array], Tuple[jax.Array, jax.Array]]


def _stack_halves(row: jax.Array, col: jax.Array) -> jax.Array:
    return jnp.stack([row, col], axis=0)


def rollout(tree: GameTree, actor_fn: ActorFn, variables, key: jax.Array,
            batch_size: int, num_turns: int | None = None) -> Trajectory:
    """Plays ``batch_size`` episodes to completion under the actor policy.

    Pure function of (tree, variables, key); jit/shard-map friendly.  One
    scan iteration = one full turn = two emitted half-step records.
    """
    init = jnp.ones((batch_size,), jnp.int32)
    return rollout_from(tree, actor_fn, variables, key, init, num_turns)


def rollout_from(tree: GameTree, actor_fn: ActorFn, variables,
                 key: jax.Array, init_indices: jax.Array,
                 num_turns: int | None = None) -> Trajectory:
    """Rollout starting from an explicit per-lane state vector.

    Passing the initial indices lets callers attach a sharding constraint to
    the lane axis so GSPMD shards the entire rollout over a device mesh.
    """
    if num_turns is None:
        num_turns = tree.max_depth
    tables = stepping.make_step_tables(tree)
    B = init_indices.shape[0]

    def turn_fn(indices, key_t):
        k_act, k_ch = jax.random.split(key_t)
        row_obs, col_obs = stepping.observe(tree, indices)
        obs2 = jnp.concatenate([row_obs, col_obs], axis=0)  # (2B, 2, A, A)
        logits, value = actor_fn(variables, obs2)
        legal = obs2[:, 1, :, 0]
        policy = common.masked_policy(logits, legal)
        actions = common.sample_actions(k_act, logits, legal)  # (2B,)
        row_actions, col_actions = actions[:B], actions[B:]
        new_indices, rewards = stepping.transition(
            tables, indices, row_actions, col_actions, k_ch)
        A = tree.max_actions
        actions_oh = jax.nn.one_hot(actions, A, dtype=policy.dtype)
        record = Trajectory(
            indices=_stack_halves(indices, indices),
            turns=_stack_halves(jnp.zeros((B,), jnp.int32),
                                jnp.ones((B,), jnp.int32)),
            observations=_stack_halves(row_obs, col_obs),
            policy=policy.reshape(2, B, A),
            actions_oh=actions_oh.reshape(2, B, A),
            rewards=_stack_halves(jnp.zeros((B,), rewards.dtype), rewards),
            values=value.reshape(2, B),
            masks=legal.reshape(2, B, A),
        )
        return new_indices, record

    keys = jax.random.split(key, num_turns)
    _, records = jax.lax.scan(turn_fn, init_indices, keys)
    # (num_turns, 2, B, ...) -> (2 * num_turns, B, ...)
    return jax.tree.map(
        lambda x: x.reshape((2 * num_turns,) + x.shape[2:]), records)


def rollout_tabular(tree: GameTree, joint_policy: jax.Array, key: jax.Array,
                    batch_size: int, num_turns: int | None = None
                    ) -> Trajectory:
    """Rollout under a tabular per-node joint policy (S, 2A); value estimates
    are the stored exact node values."""
    if num_turns is None:
        num_turns = tree.max_depth
    tables = stepping.make_step_tables(tree)
    B = batch_size
    A = tree.max_actions

    def turn_fn(indices, key_t):
        k_row, k_col, k_ch = jax.random.split(key_t, 3)
        row_obs, col_obs = stepping.observe(tree, indices)
        pi = joint_policy[indices]  # (B, 2A)
        legal_row = row_obs[:, 1, :, 0]
        legal_col = col_obs[:, 1, :, 0]
        pi_row = jnp.where(legal_row > 0, pi[:, :A], 0.0)
        pi_col = jnp.where(legal_col > 0, pi[:, A:], 0.0)
        logp = lambda p: jnp.where(p > 0, jnp.log(jnp.maximum(p, 1e-30)),
                                   -1e30)
        row_actions = jax.random.categorical(k_row, logp(pi_row), axis=-1)
        col_actions = jax.random.categorical(k_col, logp(pi_col), axis=-1)
        new_indices, rewards = stepping.transition(
            tables, indices, row_actions, col_actions, k_ch)
        value = tree.root_value[indices, 0]
        record = Trajectory(
            indices=_stack_halves(indices, indices),
            turns=_stack_halves(jnp.zeros((B,), jnp.int32),
                                jnp.ones((B,), jnp.int32)),
            observations=_stack_halves(row_obs, col_obs),
            policy=_stack_halves(
                pi_row / jnp.maximum(pi_row.sum(-1, keepdims=True), 1e-30),
                pi_col / jnp.maximum(pi_col.sum(-1, keepdims=True), 1e-30)),
            actions_oh=_stack_halves(
                jax.nn.one_hot(row_actions, A),
                jax.nn.one_hot(col_actions, A)),
            rewards=_stack_halves(jnp.zeros((B,), rewards.dtype), rewards),
            values=_stack_halves(value, -value),
            masks=_stack_halves(legal_row, legal_col),
        )
        return new_indices, record

    init = jnp.ones((B,), jnp.int32)
    keys = jax.random.split(key, num_turns)
    _, records = jax.lax.scan(turn_fn, init, keys)
    return jax.tree.map(
        lambda x: x.reshape((2 * num_turns,) + x.shape[2:]), records)


def episode_returns(traj: Trajectory) -> jax.Array:
    """(B,) row-player terminal reward of each episode."""
    return traj.rewards.sum(axis=0)


@functools.partial(jax.jit, static_argnames=("batch_size", "num_turns"))
def _jit_rollout_tabular(tree, joint_policy, key, batch_size, num_turns):
    return rollout_tabular(tree, joint_policy, key, batch_size, num_turns)
