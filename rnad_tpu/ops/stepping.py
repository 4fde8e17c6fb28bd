"""Batched environment stepping primitives.

The reference steps a batch of states with ``torch.index_select`` gathers of
full (B, T, A, A) blocks plus a per-lane ``torch.multinomial`` (reference
environment/episode.py:106-121), and separately gathers observation blocks
(episode.py:62-68).  On TPU, many narrow gathers from tiny tables are the
bottleneck: each gathered row is a handful of floats against a 128-lane
memory system.

Here everything a turn needs is packed into ONE ``(S, D)`` float32 table —
both seats' flattened observations plus, for every (row, col) action cell,
the chance log-probabilities, child indices and child values:

    row layout (AA = A*A, T = max_transitions):
      [0    : 2AA)   row seat observation  [expected_value | legal]
      [2AA  : 4AA)   col seat observation  [-expected_value^T | legal^T]
      [4AA : 4AA+A)  row seat legal-action mask
      [4AA+A : 4AA+2A)  col seat legal-action mask
      [4AA + 2A + n*3T : ...)  per cell n = r*A + c:
                     [log_chance | child | value]

so a full turn is exactly one wide row-gather per lane (~128+ lanes wide,
the efficient shape for TPU HBM), the actions of both seats come from one
(2B)-batched net forward, and the chance draw + transition are a tiny
select over the already-gathered row.  Child indices ride in the f32
table (exact for S < 2^24).

Crucial TPU layout rule applied throughout: every intermediate whose
trailing dimension would be tiny (A, A*A or T — all far below the 128-lane
tile) is kept in **batch-minor** form (leading small dim, trailing B), so
nothing gets padded 16-40x to hardware tiles.  The cell/chance selects are
one-hot reductions over (AA, B)/(T, B) arrays rather than gathers.

Observations are NOT stored in trajectories: they are a pure function of the
state index, so the learner re-derives them with one gather instead of the
rollout writing (T, B, 2, A, A) tensors (see env/engine.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..env.tree import GameTree

_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def seat_observations(expected_value: jax.Array, legal: jax.Array
                      ) -> Tuple[jax.Array, jax.Array]:
    """THE observation convention, defined once (reference episode.py:62-68).

    Row player sees [expected_value | legal]; column player the negated,
    transposed matrix with transposed legality.  Inputs are (N, 1, A, A);
    outputs (N, 2, A, A) per seat.
    """
    row_obs = jnp.concatenate([expected_value, legal], axis=1)
    col_obs = jnp.concatenate([-expected_value, legal], axis=1).swapaxes(2, 3)
    return row_obs, col_obs


@struct.dataclass
class PackedTables:
    """One-gather-per-turn state table (see module docstring)."""

    rows: jax.Array  # (S, D_pad) float32
    max_actions: int = struct.field(pytree_node=False)
    max_transitions: int = struct.field(pytree_node=False)

    @property
    def obs_width(self) -> int:
        return 2 * self.max_actions * self.max_actions

    @property
    def mask_offset(self) -> int:
        return 2 * self.obs_width

    @property
    def trans_offset(self) -> int:
        return 2 * self.obs_width + 2 * self.max_actions


def make_packed_tables(tree: GameTree) -> PackedTables:
    A, T = tree.max_actions, tree.max_transitions
    S = tree.index.shape[0]
    if S >= 1 << 24:
        raise ValueError("packed tables require S < 2^24 (f32-exact indices)")
    AA = A * A

    row_obs4, col_obs4 = seat_observations(tree.expected_value, tree.legal)
    row_obs = row_obs4.reshape(S, 2 * AA)
    col_obs = col_obs4.reshape(S, 2 * AA)
    lg = tree.legal[:, 0]

    row_mask = lg[:, :, 0]  # (S, A): legal row actions
    col_mask = lg[:, 0, :]  # (S, A): legal col actions

    chance = tree.chance.transpose(0, 2, 3, 1).reshape(S, AA, T)
    log_chance = jnp.where(chance > 0,
                           jnp.log(jnp.maximum(chance, 1e-30)), _NEG_INF)
    child = tree.index.transpose(0, 2, 3, 1).reshape(S, AA, T)
    value = tree.value.transpose(0, 2, 3, 1).reshape(S, AA, T)
    trans = jnp.concatenate(
        [log_chance, child.astype(jnp.float32), value], -1)  # (S, AA, 3T)

    rows = jnp.concatenate([row_obs, col_obs, row_mask, col_mask,
                            trans.reshape(S, AA * 3 * T)], -1)
    D = rows.shape[-1]
    D_pad = _round_up(D, 128)
    if D_pad != D:
        rows = jnp.pad(rows, ((0, 0), (0, D_pad - D)))
    return PackedTables(rows=rows, max_actions=A, max_transitions=T)


def lookup(packed: PackedTables, indices: jax.Array) -> jax.Array:
    """(B,) state ids -> (B, D_pad) packed rows.

    Default: one wide XLA gather (works at any table size).  When the table
    fits in VMEM, the Pallas one-hot MXU kernel (ops/pallas_lookup.py) can
    take over via ``set_lookup_mode("pallas")`` — bit-exact (verified) and
    free of HBM table traffic.
    """
    if _LOOKUP_MODE[0] == "pallas":
        from . import pallas_lookup

        if pallas_lookup.table_fits_vmem(packed.rows):
            return pallas_lookup.onehot_lookup(packed.rows, indices)
    return packed.rows[indices]


_LOOKUP_MODE = ["gather"]


def set_lookup_mode(mode: str) -> None:
    """Selects the packed-row lookup implementation: 'gather' | 'pallas'."""
    if mode not in ("gather", "pallas"):
        raise ValueError(mode)
    _LOOKUP_MODE[0] = mode


def slice_observations(packed: PackedTables, rows: jax.Array
                       ) -> Tuple[jax.Array, jax.Array]:
    """Packed rows -> (row_obs, col_obs), each (B, 2, A, A).

    Row player sees [expected_value, legal]; column player the negated,
    transposed matrix (reference episode.py:62-68) — both precomputed in the
    table, so this is a pure slice."""
    A = packed.max_actions
    W = packed.obs_width
    B = rows.shape[0]
    row_obs = rows[:, :W].reshape(B, 2, A, A)
    col_obs = rows[:, W:2 * W].reshape(B, 2, A, A)
    return row_obs, col_obs


def slice_action_masks(packed: PackedTables, rows: jax.Array
                       ) -> Tuple[jax.Array, jax.Array]:
    """Mover's legal-action vectors for both seats: (B, A) each.

    The mover's mask is column 0 of their legal matrix (reference
    episode.py:208: ``observations[:, 1, :, 0]``); both are precomputed as
    dedicated table lanes."""
    A = packed.max_actions
    off = packed.mask_offset
    return rows[:, off:off + A], rows[:, off + A:off + 2 * A]


def _one_hot_minor(ids: jax.Array, n: int, dtype) -> jax.Array:
    """(n, B) one-hot with the batch minor — tile-friendly on TPU."""
    return (jnp.arange(n, dtype=ids.dtype)[:, None] == ids[None, :]
            ).astype(dtype)


def select_transition(packed: PackedTables, rows: jax.Array,
                      row_actions: jax.Array, col_actions: jax.Array,
                      key: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Joint transition from already-gathered packed rows.

    Selects the (row, col) cell's [log_chance | child | value] triple with a
    batch-minor one-hot reduction over the A*A cells (cheap VPU work — no
    second gather and no tile-padded intermediates), samples the chance
    action, and emits the reward only on transitions into the absorbing
    state (reference episode.py:106-121).
    """
    A, T = packed.max_actions, packed.max_transitions
    AA = A * A
    B = rows.shape[0]
    trans = rows[:, packed.trans_offset:packed.trans_offset + AA * 3 * T]
    # (B, AA*3T) -> (AA, 3T, B): every small dim leads, B stays minor.
    trans_t = trans.T.reshape(AA, 3 * T, B)
    cell_oh = _one_hot_minor(row_actions * A + col_actions, AA, rows.dtype)
    sel = jnp.einsum("nb,nkb->kb", cell_oh, trans_t)  # (3T, B)
    chance_actions = jax.random.categorical(key, sel[:T], axis=0)  # (B,)
    chance_oh = _one_hot_minor(chance_actions, T, rows.dtype)
    new_indices = (chance_oh * sel[T:2 * T]).sum(0).astype(jnp.int32)
    rewards = (chance_oh * sel[2 * T:3 * T]).sum(0) * (new_indices == 0)
    return new_indices, rewards


# ---------------------------------------------------------------------------
# Legacy narrow-table API (kept for the tabular rollout and as the reference
# semantics in tests; the packed path above is the production fast path).
# ---------------------------------------------------------------------------


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
    """One full joint transition for a batch of lanes (narrow-gather path)."""
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
    """Observations for both seats of a batch of states (narrow path)."""
    return seat_observations(tree.expected_value[indices],
                             tree.legal[indices])
