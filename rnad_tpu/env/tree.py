"""The stochastic matrix-tree game as an immutable array pytree.

Reference semantics (environment/tree.py:14-63): a game is seven aligned
tensors over states ``s``, chance actions ``t`` and row/column actions
``r, c``.  State 0 is a self-looping absorbing state standing in for every
terminal simultaneously (tree.py:29-32) — the trick that makes a fixed-length
``lax.scan`` rollout maskless — and state 1 is the root.  ``value`` holds the
child's exact Nash value (or the terminal reward), so the tree is its own
ground-truth oracle.

Differences from the reference, by design:
  * Generation is level-synchronous instead of recursive (one batched
    Dirichlet draw + one batched LP solve per level) — the reference solves
    node-by-node through pygambit (tree.py:199-234, 236-366).
  * Node ids are assigned in BFS order (root=1, then level by level), which
    satisfies the same topology invariant the reference asserts
    (``assert_index_is_tree``, tree.py:368-383): child ids strictly greater
    than parent ids and one-to-one with [2, size).
  * RNG is a single seeded ``numpy.random.Generator`` (the reference mixes
    four unseeded RNG sources), so trees are reproducible from (config, seed).
  * A ``depth`` array (longest distance to a terminal, absorbing state = 0)
    is stored to drive level-synchronous NashConv on device.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import TreeConfig
from . import solver


@struct.dataclass
class GameTree:
    """Immutable pytree of the seven game tensors (+ depth index)."""

    index: jax.Array  # (S, T, A, A) int32 — child state id, 0 = terminal
    value: jax.Array  # (S, T, A, A) f32 — child NE value / terminal reward
    chance: jax.Array  # (S, T, A, A) f32 — chance strategy, sums to 1 over T
    expected_value: jax.Array  # (S, 1, A, A) f32 — sum_t chance * value
    legal: jax.Array  # (S, 1, A, A) f32 — joint legality mask
    solution: jax.Array  # (S, 2A) f32 — exact NE (row || col strategies)
    root_value: jax.Array  # (S, 1) f32 — exact NE value of each node
    depth: jax.Array  # (S,) int32 — longest distance to a terminal

    max_actions: int = struct.field(pytree_node=False)
    max_transitions: int = struct.field(pytree_node=False)
    max_depth: int = struct.field(pytree_node=False)  # == depth at the root
    hash: int = struct.field(pytree_node=False, default=0)

    @property
    def size(self) -> int:
        return self.index.shape[0]

    def num_half_steps(self) -> int:
        """Static rollout length: two half-steps per level of the tree."""
        return 2 * self.max_depth


# ---------------------------------------------------------------------------
# Generation (host-side, numpy; batched LP solves per level)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class _Level:
    ids: np.ndarray  # (n,) node ids of this level
    rows: np.ndarray  # (n,) active row action counts
    cols: np.ndarray  # (n,)
    chance: np.ndarray  # (n, T, A, A)
    legal: np.ndarray  # (n, 1, A, A)
    index: np.ndarray  # (n, T, A, A) child ids (0 = terminal)
    term_value: np.ndarray  # (n, T, A, A) terminal rewards where index == 0


def _sample_chance(rng: np.random.Generator, n: int, A: int, T: int,
                   threshold: float) -> np.ndarray:
    """Dirichlet(1/T) chance profiles with thresholding, in (n, A, A, T) layout.

    Mirrors reference ``_transition_probs`` (tree.py:182-197): entries below
    the threshold are zeroed and the rest L1-renormalized.  Unlike the
    reference we guard the all-below-threshold case by keeping the argmax.
    """
    if T == 1:
        return np.ones((n, A, A, 1))
    raw = rng.dirichlet((1.0 / T,) * T, size=(n, A, A))  # (n, A, A, T)
    ch = np.where(raw < threshold, 0.0, raw)
    dead = ch.sum(axis=-1) == 0.0
    if dead.any():
        # Keep the largest original entry where thresholding killed the row.
        mx = np.zeros_like(ch)
        np.put_along_axis(mx, raw.argmax(axis=-1, keepdims=True), 1.0, axis=-1)
        ch = np.where(dead[..., None], mx, ch)
    ch = ch / ch.sum(axis=-1, keepdims=True)
    return ch


def generate_tree(config: TreeConfig, seed: int = 0,
                  dtype=jnp.float32, max_nodes: int = 1 << 24) -> GameTree:
    """Generates and exactly solves a random matrix-tree game.

    Topology is built top-down one level at a time; values are solved
    bottom-up with one batched zero-sum LP call per level (the pygambit
    replacement, see env/solver.py).  ``max_nodes`` bounds runaway configs
    (e.g. a depth rule that never decrements).
    """
    A, T = config.max_actions, config.max_transitions
    if config.depth_bound < 1:
        raise ValueError("depth_bound must be >= 1")
    rng = np.random.default_rng(seed)
    terminal_values = np.asarray(config.terminal_values, dtype=np.float64)

    levels: List[_Level] = []
    frontier_rows = np.array([config.root_row_actions()], dtype=np.int64)
    frontier_cols = np.array([config.root_col_actions()], dtype=np.int64)
    frontier_depth = np.array([config.depth_bound], dtype=np.int64)
    frontier_ids = np.array([1], dtype=np.int64)
    next_id = 2

    while frontier_ids.size:
        n = frontier_ids.size
        ch = _sample_chance(rng, n, A, T, config.transition_threshold)
        r_idx = np.arange(A)
        legal2d = ((r_idx[None, :, None] < frontier_rows[:, None, None])
                   & (r_idx[None, None, :] < frontier_cols[:, None, None]))
        ch = ch * legal2d[..., None]

        # Children in (node, row, col, chance) lexicographic order — the same
        # visit order as the reference's nested loops (tree.py:253-258).
        mask = ch > 0.0
        ci, cr, cc, ct = np.nonzero(mask)
        n_children = ci.size
        child_rows = np.clip(
            config.row_actions_rule.apply(frontier_rows[ci],
                                          rng.random(n_children)), 1, A)
        child_cols = np.clip(
            config.col_actions_rule.apply(frontier_cols[ci],
                                          rng.random(n_children)), 1, A)
        child_depth = np.maximum(
            0, config.depth_bound_rule.apply(frontier_depth[ci],
                                             rng.random(n_children)))
        internal = child_depth > 0
        n_internal = int(internal.sum())
        child_ids = np.zeros(n_children, dtype=np.int64)
        child_ids[internal] = next_id + np.arange(n_internal)
        next_id += n_internal
        if next_id > max_nodes:
            raise ValueError(
                f"tree exceeded max_nodes={max_nodes}; check the shaping "
                "rules (a non-decrementing depth rule never terminates)")

        term_draw = rng.choice(terminal_values, size=n_children)

        index = np.zeros((n, T, A, A), dtype=np.int64)
        index[ci, ct, cr, cc] = child_ids
        term_value = np.zeros((n, T, A, A), dtype=np.float64)
        term_value[ci[~internal], ct[~internal], cr[~internal],
                   cc[~internal]] = term_draw[~internal]

        levels.append(_Level(
            ids=frontier_ids, rows=frontier_rows, cols=frontier_cols,
            chance=np.moveaxis(ch, 3, 1), legal=legal2d[:, None].astype(np.float64),
            index=index, term_value=term_value))

        frontier_rows = child_rows[internal].astype(np.int64)
        frontier_cols = child_cols[internal].astype(np.int64)
        frontier_depth = child_depth[internal].astype(np.int64)
        frontier_ids = child_ids[internal]

    S = next_id
    node_value = np.zeros(S, dtype=np.float64)
    node_depth = np.zeros(S, dtype=np.int64)
    solution = np.zeros((S, 2 * A), dtype=np.float64)

    full_index = np.zeros((S, T, A, A), dtype=np.int64)
    full_value = np.zeros((S, T, A, A), dtype=np.float64)
    full_chance = np.zeros((S, T, A, A), dtype=np.float64)
    full_ev = np.zeros((S, 1, A, A), dtype=np.float64)
    full_legal = np.zeros((S, 1, A, A), dtype=np.float64)

    # Bottom-up: solve all nodes of each level in one batched LP call.
    for level in reversed(levels):
        is_internal = level.index > 0
        value = np.where(is_internal, node_value[level.index], level.term_value)
        ev = (level.chance * value).sum(axis=1)  # (n, A, A)
        x, y, v = solver.solve_zero_sum_batch(ev, level.rows, level.cols)
        node_value[level.ids] = v
        solution[level.ids, :A] = x
        solution[level.ids, A:] = y
        child_depth = np.where(is_internal, node_depth[level.index], 0)
        child_depth = child_depth * (level.chance > 0)
        node_depth[level.ids] = 1 + child_depth.max(axis=(1, 2, 3))

        full_index[level.ids] = level.index
        full_value[level.ids] = value
        full_chance[level.ids] = level.chance
        full_ev[level.ids, 0] = ev
        full_legal[level.ids] = level.legal

    # Absorbing state at id 0: one legal joint action self-looping with
    # certainty (reference tree.py:336-349).
    full_chance[0, 0, 0, 0] = 1.0
    full_legal[0, 0, 0, 0] = 1.0

    if config.equilibrium_selection != "vertex":
        # Re-select which equilibrium is stored on degenerate nodes
        # (values are selection-invariant, so this cannot change the game
        # or the hash; see env/solver.py module docstring).
        node_rows = full_legal[:, 0, :, 0].sum(axis=1).astype(np.int64)
        node_cols = full_legal[:, 0, 0, :].sum(axis=1).astype(np.int64)
        x, y = solver.refine_equilibrium_batch(
            full_ev[:, 0], node_rows, node_cols,
            solution[:, :A], solution[:, A:], node_value,
            config.equilibrium_selection)
        solution = np.concatenate([x, y], axis=1)

    digest = hashlib.blake2b(digest_size=8)
    cfg_json = config.to_json()
    # The hash identifies the GAME: equilibrium selection changes only
    # which of a degenerate node's equilibria is stored, never the game
    # tensors training consumes, so it is excluded — which also keeps
    # hashes of pre-selection-option trees valid.
    cfg_json.pop("equilibrium_selection", None)
    digest.update(json.dumps(cfg_json, sort_keys=True).encode())
    digest.update(np.int64(seed).tobytes())
    digest.update(full_index.tobytes())
    digest.update(full_value.astype(np.float32).tobytes())
    tree_hash = int.from_bytes(digest.digest(), "little", signed=True)

    return GameTree(
        index=jnp.asarray(full_index, dtype=jnp.int32),
        value=jnp.asarray(full_value, dtype=dtype),
        chance=jnp.asarray(full_chance, dtype=dtype),
        expected_value=jnp.asarray(full_ev, dtype=dtype),
        legal=jnp.asarray(full_legal, dtype=dtype),
        solution=jnp.asarray(solution, dtype=dtype),
        root_value=jnp.asarray(node_value[:, None], dtype=dtype),
        depth=jnp.asarray(node_depth, dtype=jnp.int32),
        max_actions=A,
        max_transitions=T,
        max_depth=int(node_depth[1]),
        hash=tree_hash,
    )


def select_equilibria(tree: GameTree, mode: str,
                      tol: float = 3e-6) -> GameTree:
    """Post-pass re-selection of the stored per-node equilibria.

    Works on any tree (native-generated or loaded from disk) from the
    stored tensors alone: each node's ``expected_value`` matrix IS the game
    whose equilibrium the node's ``solution`` row stores.  The default
    ``tol`` is sized for float32-stored tensors (the generation-time path
    inside :func:`generate_tree` refines on float64 with a tighter one).
    Values, topology and the content hash are unchanged — only which
    optimal strategy degenerate nodes store.
    """
    if mode == "vertex":
        return tree
    A = tree.max_actions
    legal = np.asarray(tree.legal, np.float64)
    ev = np.asarray(tree.expected_value[:, 0], np.float64)
    sol = np.asarray(tree.solution, np.float64)
    values = np.asarray(tree.root_value[:, 0], np.float64)
    node_rows = legal[:, 0, :, 0].sum(axis=1).astype(np.int64)
    node_cols = legal[:, 0, 0, :].sum(axis=1).astype(np.int64)
    x, y = solver.refine_equilibrium_batch(
        ev, node_rows, node_cols, sol[:, :A], sol[:, A:], values, mode,
        tol=tol)
    solution = jnp.asarray(np.concatenate([x, y], axis=1),
                           dtype=tree.solution.dtype)
    return tree.replace(solution=solution)


def generate_tree_native(config: TreeConfig, seed: int = 0,
                         max_nodes: int = 1 << 24) -> GameTree:
    """Generates a tree with the native C++ level-synchronous generator
    (csrc/treegen.cpp) — same game semantics and tensor conventions as
    :func:`generate_tree`, ~10x faster for large trees.

    The C++ generator uses its own RNG stream, so for a given seed it
    produces a *different* (but deterministic) tree than the numpy path;
    trees are identified by their content hash either way.
    """
    from .. import native

    rules = tuple(
        (r.delta, r.stochastic_delta, r.stochastic_prob)
        for r in (config.row_actions_rule, config.col_actions_rule,
                  config.depth_bound_rule))
    arrays = native.generate_tree_native_arrays(
        seed, config.max_actions, config.max_transitions, config.depth_bound,
        config.root_row_actions(), config.root_col_actions(),
        config.transition_threshold, config.terminal_values, rules,
        max_nodes)

    digest = hashlib.blake2b(digest_size=8)
    cfg_json = config.to_json()
    # The hash identifies the GAME: equilibrium selection changes only
    # which of a degenerate node's equilibria is stored, never the game
    # tensors training consumes, so it is excluded — which also keeps
    # hashes of pre-selection-option trees valid.
    cfg_json.pop("equilibrium_selection", None)
    digest.update(json.dumps(cfg_json, sort_keys=True).encode())
    digest.update(np.int64(seed).tobytes())
    digest.update(arrays["index"].tobytes())
    digest.update(arrays["value"].tobytes())
    tree_hash = int.from_bytes(digest.digest(), "little", signed=True)

    depth = arrays.pop("depth")
    tree = GameTree(
        index=jnp.asarray(arrays["index"]),
        value=jnp.asarray(arrays["value"]),
        chance=jnp.asarray(arrays["chance"]),
        expected_value=jnp.asarray(arrays["expected_value"]),
        legal=jnp.asarray(arrays["legal"]),
        solution=jnp.asarray(arrays["solution"]),
        root_value=jnp.asarray(arrays["root_value"]),
        depth=jnp.asarray(depth, dtype=jnp.int32),
        max_actions=config.max_actions,
        max_transitions=config.max_transitions,
        max_depth=int(depth[1]),
        hash=tree_hash,
    )
    return select_equilibria(tree, config.equilibrium_selection)


def depth_from_index(index: np.ndarray, chance: np.ndarray) -> np.ndarray:
    """Longest distance to a terminal for every node, from the index tensor
    alone (the reference does not persist a depth index).

    Matches the generator's convention (see ``generate_tree``): children
    reachable with zero chance probability do not count, every node is at
    least depth 1, the absorbing node 0 is depth 0.  Child ids are strictly
    greater than parent ids, so iterating the gather-max to a fixpoint
    converges in max_depth passes.
    """
    index = np.asarray(index)
    reachable = (index > 0) & (np.asarray(chance) > 0)
    depth = np.zeros(index.shape[0], dtype=np.int64)
    # A well-formed index (child id > parent id) reaches the fixpoint in
    # max_depth <= size passes; a cyclic one — e.g. a malformed imported
    # tree.tar — never would, so bound the loop instead of hanging.
    for _ in range(index.shape[0] + 1):
        child = np.where(reachable, depth[index], 0)
        new = 1 + child.max(axis=(1, 2, 3))
        new[0] = 0
        if np.array_equal(new, depth):
            return depth
        depth = new
    raise ValueError("index tensor contains a cycle (not a tree)")


# ---------------------------------------------------------------------------
# Invariants (reference tree.py:368-383)
# ---------------------------------------------------------------------------


def assert_index_is_tree(tree: GameTree) -> None:
    """The index tensor describes a tree iff its nonzero entries are strictly
    increasing (child id > parent id) and one-to-one with [2, size)."""
    assert_index_array_is_tree(np.asarray(tree.index))


def assert_index_array_is_tree(index: np.ndarray) -> None:
    """Raw-array form of :func:`assert_index_is_tree` — usable before a
    GameTree is constructed (e.g. on imported reference tensors, where the
    depth computation requires acyclicity first)."""
    index = np.asarray(index)
    nonzero = np.sort(index[index != 0].ravel())
    expected = np.arange(2, 2 + nonzero.size)
    if not np.array_equal(nonzero, expected):
        raise AssertionError("index entries are not one-to-one with [2, size)")
    size = index.shape[0]
    ids = np.arange(size).reshape(size, 1, 1, 1)
    ok = (index == 0) | (index > ids)
    if not ok.all():
        raise AssertionError("index tensor contains non-increasing edges")


def validate(tree: GameTree, atol: float = 1e-5) -> None:
    """Structural self-checks beyond the reference's single invariant."""
    assert_index_is_tree(tree)
    chance = np.asarray(tree.chance, dtype=np.float64)
    legal = np.asarray(tree.legal, dtype=np.float64)
    psum = chance.sum(axis=1, keepdims=True)
    if not np.allclose(psum * legal, legal, atol=atol):
        raise AssertionError("chance does not sum to 1 over legal cells")
    ev = (chance * np.asarray(tree.value, dtype=np.float64)).sum(
        axis=1, keepdims=True)
    if not np.allclose(ev, np.asarray(tree.expected_value), atol=atol):
        raise AssertionError("expected_value inconsistent with chance * value")
    depth = np.asarray(tree.depth)
    if depth[0] != 0 or (tree.size > 1 and depth[1] != tree.max_depth):
        raise AssertionError("depth index inconsistent")


# ---------------------------------------------------------------------------
# Serialization — array payload + JSON metadata (see utils/checkpoint.py for
# the saved_trees/<name>/ + recent/ store mirroring reference tree.py:385-433)
# ---------------------------------------------------------------------------

_ARRAY_FIELDS = ("index", "value", "chance", "expected_value", "legal",
                 "solution", "root_value", "depth")


def tree_to_arrays(tree: GameTree) -> dict:
    return {k: np.asarray(getattr(tree, k)) for k in _ARRAY_FIELDS}


def tree_meta(tree: GameTree) -> dict:
    return {
        "max_actions": tree.max_actions,
        "max_transitions": tree.max_transitions,
        "max_depth": tree.max_depth,
        "hash": tree.hash,
    }


def tree_from_arrays(arrays: dict, meta: dict) -> GameTree:
    kwargs = {k: jnp.asarray(arrays[k]) for k in _ARRAY_FIELDS}
    kwargs["index"] = kwargs["index"].astype(jnp.int32)
    kwargs["depth"] = kwargs["depth"].astype(jnp.int32)
    return GameTree(max_actions=int(meta["max_actions"]),
                    max_transitions=int(meta["max_transitions"]),
                    max_depth=int(meta["max_depth"]),
                    hash=int(meta["hash"]), **kwargs)
