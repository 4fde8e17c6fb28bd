"""Exact exploitability (NashConv) of a joint policy on a game tree.

The reference computes NashConv with a per-node recursive Python DFS on the
CPU (reference util/metric.py:93-175) — the biggest host bottleneck at scale.
Here the same computation is expressed as **level-synchronous backward
induction** on device: every node's best-response values are recomputed in
parallel each pass from its children's values, and after ``max_depth`` passes
the root values are exact (nodes at depth d are correct after pass d, since
every child of a depth-d node has depth < d).  Each pass is one batched
gather + chance-weighted reduction + masked max over the whole node table.

NashConv(root) = row_best[1] + col_best[1] (reference learn/rnad.py:351);
it is 0 iff the joint policy is a Nash equilibrium — which the generator's
stored solution must satisfy (reference tests/test_nashconv.py:28).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..env.tree import GameTree

_NEG_INF = -1e30


@struct.dataclass
class NashConvResult:
    row_best: jax.Array  # (S,) row player's best-response value vs pi_col
    col_best: jax.Array  # (S,) column player's best-response value vs pi_row
    reach_probability: jax.Array  # (S,) reach under the joint policy

    def nashconv(self) -> jax.Array:
        return self.row_best[1] + self.col_best[1]


def nashconv_pure(tree: GameTree, joint_policy: jax.Array,
                  num_passes: int | None = None,
                  compute_reach: bool = True) -> NashConvResult:
    """Jit-safe body: call inside an enclosing jit, or use nashconv().

    All per-pass tensors use the **node-minor** (T, A, A, S) layout: on TPU
    the natural (S, T, A, A) form pads its tiny minor dims to (8, 128) tiles
    — a 41x memory blowup at A=5 that OOMs million-node trees — while with
    S minor every array is compact.  The transposes happen once per call.
    """
    if num_passes is None:
        num_passes = tree.max_depth
    A = tree.max_actions
    S = tree.index.shape[0]

    chance_t = jnp.transpose(tree.chance, (1, 2, 3, 0))  # (T, A, A, S)
    value_t = jnp.transpose(tree.value, (1, 2, 3, 0))
    index_t = jnp.transpose(tree.index, (1, 2, 3, 0))
    internal_t = index_t > 0
    legal_r = tree.legal[:, 0, :, 0].T  # (A, S)
    legal_c = tree.legal[:, 0, 0, :].T
    pi_row = jnp.where(legal_r > 0, joint_policy[:, :A].T, 0.0)  # (A, S)
    pi_col = jnp.where(legal_c > 0, joint_policy[:, A:].T, 0.0)

    # Child-value propagation runs as a SCATTER of S node values to their
    # unique parent cells rather than a gather of T*A*A*S random scalars —
    # every internal node has exactly one incoming edge (tree property), and
    # the scatter moves ~T*A*A fewer random bytes (10x faster at 786k
    # nodes).  parent_cell[s] = flat cell position pointing at s; absorbing
    # state and root go to a dump slot at position N.
    N = index_t.size
    flat_idx = index_t.reshape(-1)
    parent_cell = (jnp.full((S,), N, jnp.int32)
                   .at[flat_idx].set(jnp.arange(N, dtype=jnp.int32))
                   .at[0].set(N))
    shape_t = index_t.shape
    base_row = jnp.where(internal_t, 0.0, value_t).reshape(-1)
    base_row = jnp.concatenate([base_row, jnp.zeros((1,), base_row.dtype)])
    base_col = jnp.where(internal_t, 0.0, -value_t).reshape(-1)
    base_col = jnp.concatenate([base_col, jnp.zeros((1,), base_col.dtype)])

    def backward(_, carry):
        row_best, col_best = carry  # (S,)
        child_row = base_row.at[parent_cell].set(row_best)[:N].reshape(shape_t)
        child_col = base_col.at[parent_cell].set(col_best)[:N].reshape(shape_t)
        row_mat = (chance_t * child_row).sum(axis=0)  # (A, A, S) [r, c, s]
        col_mat = (chance_t * child_col).sum(axis=0)
        row_resp = jnp.einsum("rcs,cs->rs", row_mat, pi_col)
        col_resp = jnp.einsum("rs,rcs->cs", pi_row, col_mat)
        rb = jnp.where(legal_r > 0, row_resp, _NEG_INF).max(axis=0)
        cb = jnp.where(legal_c > 0, col_resp, _NEG_INF).max(axis=0)
        # Absorbing state: value 0 by convention.
        rb = rb.at[0].set(0.0)
        cb = cb.at[0].set(0.0)
        return rb, cb

    zeros = jnp.zeros((S,), tree.value.dtype)
    row_best, col_best = jax.lax.fori_loop(0, num_passes, backward,
                                           (zeros, zeros))

    def forward(_, reach):
        contrib = (reach[None, None, None, :]
                   * pi_row[None, :, None, :]
                   * pi_col[None, None, :, :]
                   * chance_t)  # (T, A, A, S)
        # each node's reach is exactly its unique parent cell's contribution
        # — one S-element gather, no scatter-add over all cells
        cf = jnp.concatenate([contrib.reshape(-1),
                              jnp.zeros((1,), contrib.dtype)])
        new = cf[parent_cell]
        return new.at[1].set(1.0)

    reach0 = jnp.zeros((S,), tree.value.dtype).at[1].set(1.0)
    # The reach scatter-add dominates large-tree eval time; callers that
    # only need the root NashConv (the trainer hook) skip it.
    reach = (jax.lax.fori_loop(0, num_passes, forward, reach0)
             if compute_reach else reach0)

    return NashConvResult(row_best=row_best, col_best=col_best,
                          reach_probability=reach)


@functools.partial(jax.jit,
                   static_argnames=("num_passes", "compute_reach"))
def _nashconv_jit(tree: GameTree, joint_policy: jax.Array,
                  num_passes: int,
                  compute_reach: bool = True) -> NashConvResult:
    return nashconv_pure(tree, joint_policy, num_passes, compute_reach)


def nashconv(tree: GameTree, joint_policy: jax.Array) -> NashConvResult:
    """Exact best-response values and reach probabilities for every node."""
    return _nashconv_jit(tree, joint_policy, tree.max_depth)


def nashconv_root(tree: GameTree, joint_policy: jax.Array) -> NashConvResult:
    """Best-response values only (reach skipped) — the trainer-hook variant
    for a precomputed joint policy (e.g. chunked large-tree inference)."""
    return _nashconv_jit(tree, joint_policy, tree.max_depth,
                         compute_reach=False)


def joint_policy_all_nodes(tree: GameTree, apply_fn, variables) -> jax.Array:
    """Whole-tree both-seat policy in one pass — jit-safe, no chunking.

    Prefer this inside an enclosing jitted evaluation (e.g. the trainer's
    NashConv hook); use joint_policy_from_net for host-driven chunked
    inference over very large trees."""
    from ..models import common  # local import to avoid cycle
    from ..ops.stepping import seat_observations

    row_obs, col_obs = seat_observations(tree.expected_value, tree.legal)
    obs = jnp.concatenate([row_obs, col_obs], axis=0)
    logits, _ = apply_fn(variables, obs)
    legal = obs[:, 1, :, 0]
    p = common.masked_policy(logits, legal)
    n = tree.expected_value.shape[0]
    return jnp.concatenate([p[:n], p[n:]], axis=-1)  # (S, 2A)


def mean_nashconv_by_depth(tree: GameTree,
                           result: NashConvResult) -> Dict[int, float]:
    """Per-depth mean exploitability (reference util/metric.py:178-190).
    Depth here is the longest distance to a terminal; the root has the
    maximum depth."""
    from ..parallel.mesh import host_array

    depth = np.asarray(tree.depth)
    total = host_array(result.row_best + result.col_best)
    means: Dict[int, float] = {}
    for d in range(1, tree.max_depth + 1):
        sel = depth == d
        if sel.any():
            means[d] = float(total[sel].mean())
    return means


def joint_policy_from_net(tree: GameTree, apply_fn, variables,
                          inference_batch_size: int = 100_000) -> jax.Array:
    """Policy of both seats for every tree node (reference metric.py:51-82).

    ``apply_fn(variables, obs) -> (logits, value)``; masking follows the
    models.common semantics.  Chunked so very large trees fit in HBM; chunks
    are zero-padded to a fixed shape so only one program is compiled.
    """
    from ..models import common  # local import to avoid cycle

    S = tree.index.shape[0]
    A = tree.max_actions
    chunk = min(inference_batch_size, S)

    from ..ops.stepping import seat_observations

    def infer_impl(variables, ev, lg):
        row_obs, col_obs = seat_observations(ev, lg)
        obs = jnp.concatenate([row_obs, col_obs], axis=0)
        logits, _ = apply_fn(variables, obs)
        legal = obs[:, 1, :, 0]
        p = common.masked_policy(logits, legal)
        n = ev.shape[0]
        return jnp.concatenate([p[:n], p[n:]], axis=-1)  # (n, 2A)

    # cache the jitted program on the apply_fn so repeated evaluations do
    # not re-trace (a fresh jit per call would recompile every time)
    jitted = getattr(apply_fn, "_rnad_infer_jit", None)
    if jitted is None:
        jitted = jax.jit(infer_impl)
        try:
            apply_fn._rnad_infer_jit = jitted
        except AttributeError:
            pass
    infer = lambda ev, lg: jitted(variables, ev, lg)

    outs = []
    for start in range(0, S, chunk):
        stop = min(start + chunk, S)
        ev = tree.expected_value[start:stop]
        lg = tree.legal[start:stop]
        if stop - start < chunk:  # pad the tail chunk to the compiled shape
            pad = chunk - (stop - start)
            ev = jnp.pad(ev, ((0, pad), (0, 0), (0, 0), (0, 0)))
            lg = jnp.pad(lg, ((0, pad), (0, 0), (0, 0), (0, 0)))
            lg = lg.at[stop - start:, 0, 0, 0].set(1.0)  # keep softmax sane
            outs.append(infer(ev, lg)[: stop - start])
        else:
            outs.append(infer(ev, lg))
    return jnp.concatenate(outs, axis=0)


def kld(p: jax.Array, q: jax.Array, valid: jax.Array,
        legal_actions: jax.Array, global_sum=None,
        action_axis: int = -1) -> jax.Array:
    """Masked KL divergence diagnostic (reference util/metric.py:193-211).

    ``global_sum`` (e.g. a psum over the data axis) makes the valid-count
    normalization global when the batch is sharded over devices.
    ``action_axis=-2`` accepts batch-minor (T, A, B) policies (see
    learn/vtrace.py's batch-minor section); the reduction is over the same
    elements either way, so the value is layout-independent."""
    sel = (jnp.expand_dims(valid, action_axis) * legal_actions) > 0
    safe = lambda x: jnp.log(jnp.maximum(x, 1e-30))
    terms = jnp.where(sel, p * (safe(p) - safe(q)), 0.0)
    total, count = terms.sum(), valid.sum()
    if global_sum is not None:
        total, count = global_sum(total), global_sum(count)
    return total / jnp.maximum(count, 1.0)
