"""Batched environment stepping primitives.

The reference steps a batch of states with two ``torch.index_select`` gathers
of full (B, T, A, A) blocks plus a per-lane ``torch.multinomial``
(reference environment/episode.py:106-121).  On TPU that layout wastes HBM
bandwidth: only one (row, col) cell of each gathered block is ever used.

Here the three step tables are flattened once per rollout into
``(S * A * A, T)`` row-major layout so that a full transition is exactly one
row-gather per table — the minimal number of bytes the step can touch — and
the chance draw is a Gumbel-max/categorical over the gathered log-chance row,
fused by XLA into the same kernel.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..env.tree import GameTree

_NEG_INF = -1e30


@struct.dataclass
class StepTables:
    """Transition tables in gather-friendly (S*A*A, T) layout."""

    index: jax.Array  # (S*A*A, T) int32
    value: jax.Array  # (S*A*A, T) f32
    log_chance: jax.Array  # (S*A*A, T) f32, -inf on zero-probability entries
    max_actions: int = struct.field(pytree_node=False)


def make_step_tables(tree: GameTree) -> StepTables:
    A, T = tree.max_actions, tree.max_transitions
    flat = lambda x: x.transpose(0, 2, 3, 1).reshape(-1, T)
    chance = flat(tree.chance)
    log_chance = jnp.where(chance > 0, jnp.log(jnp.maximum(chance, 1e-30)),
                           _NEG_INF)
    return StepTables(index=flat(tree.index), value=flat(tree.value),
                      log_chance=log_chance, max_actions=A)


def transition(tables: StepTables, indices: jax.Array, row_actions: jax.Array,
               col_actions: jax.Array, key: jax.Array
               ) -> Tuple[jax.Array, jax.Array]:
    """One full joint transition for a batch of lanes.

    Fuses the reference's row/col half-step bookkeeping into a single gather
    + chance draw (reference episode.py:106-121).  Rewards are emitted only
    on transitions into the absorbing state (episode.py:121); lanes already
    absorbed self-loop at index 0 with reward 0.

    Returns (new_indices (B,), rewards (B,)).
    """
    A = tables.max_actions
    cell = (indices * A + row_actions) * A + col_actions  # (B,)
    logc = tables.log_chance[cell]  # (B, T)
    chance_actions = jax.random.categorical(key, logc, axis=-1)  # (B,)
    take = lambda t: jnp.take_along_axis(t[cell], chance_actions[:, None],
                                         axis=-1)[:, 0]
    new_indices = take(tables.index)
    rewards = take(tables.value) * (new_indices == 0)
    return new_indices, rewards


def observe(tree: GameTree, indices: jax.Array
            ) -> Tuple[jax.Array, jax.Array]:
    """Observations for both seats of a batch of states.

    Row player sees [expected_value, legal]; column player sees the negated,
    transposed matrix (reference episode.py:62-68).  Both are available
    simultaneously because observations depend only on the state index — this
    is what lets the rollout run one (2B)-batched net forward per full turn
    instead of two B-batched forwards.
    """
    ev = tree.expected_value[indices]  # (B, 1, A, A)
    lg = tree.legal[indices]
    row_obs = jnp.concatenate([ev, lg], axis=1)
    col_obs = jnp.concatenate([-ev, lg], axis=1).swapaxes(2, 3)
    return row_obs, col_obs
