"""Mesh-sharded exact NashConv: the backward induction of
``nashconv.nashconv_pure`` with the node axis sharded over a device mesh.

Single-device NashConv holds the whole (T, A, A, S) node-minor table plus
the policy and value vectors in one chip's HBM — fine to a few million
nodes, the binding constraint beyond (SURVEY §5's "pod-scale NashConv").
Here every per-node tensor is sharded over the mesh's data axis
(``shard_map``), each induction pass computes the shard's best-response
values locally, and one tiled ``all_gather`` of the two (S,) value vectors
per pass (the only cross-shard dependency — children live on arbitrary
shards) rides the ICI.  Per-pass comms are 2*S*4 bytes per device; at 100M
nodes that is ~0.8 GB/pass against >100 GB/s ICI — induction stays
compute-bound.

The scatter trick of the single-device pass survives sharding: each node
has exactly ONE parent cell (tree property), so the pass scatters the
gathered global value vector through a per-shard ``local parent cell``
table (cells owned by other shards dump into a spare slot) instead of
gathering T*A*A random scalars per node.

Replaces the recursion of reference util/metric.py:93-175 at scales the
reference cannot touch; equivalence vs the single-device pass is tested on
the 8-virtual-device CPU mesh (tests/test_sharding.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..env.tree import GameTree
from ..parallel import mesh as mesh_lib
from .nashconv import NashConvResult, _NEG_INF


def _pad_nodes(x: np.ndarray, s_pad: int) -> np.ndarray:
    """Pads the leading node axis with zero nodes (no legal actions — the
    induction's no-legal guard pins their values to 0)."""
    S = x.shape[0]
    if S == s_pad:
        return x
    return np.concatenate(
        [x, np.zeros((s_pad - S,) + x.shape[1:], x.dtype)], axis=0)


def nashconv_sharded(tree: GameTree, joint_policy,
                     mesh: jax.sharding.Mesh,
                     num_passes: Optional[int] = None,
                     axis: str = mesh_lib.DATA_AXIS) -> NashConvResult:
    """Best-response values for every node, node axis sharded over ``axis``.

    Equal to ``nashconv.nashconv_pure(..., compute_reach=False)`` up to
    reduction order.  Host-side table preparation is numpy (the unsharded
    node-minor tables never touch a device); every device array is created
    already sharded, so peak per-device memory is the shard, not the tree.
    """
    if num_passes is None:
        num_passes = tree.max_depth
    n = mesh.shape[axis]
    A = tree.max_actions
    S = int(tree.index.shape[0])
    s_pad = ((S + n - 1) // n) * n
    sd = s_pad // n

    # -- host-side (numpy) preparation, sharded placement ------------------
    chance = _pad_nodes(np.asarray(tree.chance), s_pad)
    value = _pad_nodes(np.asarray(tree.value), s_pad)
    index = _pad_nodes(np.asarray(tree.index), s_pad)
    legal = _pad_nodes(np.asarray(tree.legal), s_pad)
    jp = _pad_nodes(np.asarray(joint_policy), s_pad)

    nm = lambda x: np.ascontiguousarray(np.transpose(x, (1, 2, 3, 0)))
    chance_t = nm(chance)  # (T, A, A, S_pad) node-minor
    value_t = nm(value)
    index_t = nm(index)
    legal_r = np.ascontiguousarray(legal[:, 0, :, 0].T)  # (A, S_pad)
    legal_c = np.ascontiguousarray(legal[:, 0, 0, :].T)
    pi_row = np.where(legal_r > 0, jp[:, :A].T, 0.0).astype(np.float32)
    pi_col = np.where(legal_c > 0, jp[:, A:].T, 0.0).astype(np.float32)

    # Global parent cell (see nashconv_pure), then per-shard local tables:
    # the flat (T, A, A, S_pad) layout is node-minor, so a cell's owner is
    # its column's shard and the local cell keeps the leading (T*A*A) part.
    N = index_t.size
    n_loc = N // n
    flat_idx = index_t.reshape(-1).astype(np.int64)
    parent_cell = np.full((s_pad,), N, np.int64)
    parent_cell[flat_idx] = np.arange(N, dtype=np.int64)
    parent_cell[0] = N  # root/absorbing convention of nashconv_pure
    col = parent_cell % s_pad
    cell3 = parent_cell // s_pad  # leading (t, r, c) part
    owner = col // sd
    local = cell3 * sd + (col - owner * sd)
    local_pc = np.full((n, s_pad), n_loc, np.int32)  # default: dump slot
    valid = parent_cell < N
    local_pc[owner[valid], np.nonzero(valid)[0]] = local[valid]

    shard_last = NamedSharding(mesh, P(None, None, None, axis))
    shard_mat = NamedSharding(mesh, P(None, axis))
    shard_first = NamedSharding(mesh, P(axis, None))
    put = jax.device_put
    args = (put(chance_t, shard_last), put(value_t, shard_last),
            put(index_t > 0, shard_last),
            put(legal_r, shard_mat), put(legal_c, shard_mat),
            put(pi_row, shard_mat), put(pi_col, shard_mat),
            put(local_pc, shard_first))

    def per_shard(chance_l, value_l, internal_l, legal_r_l, legal_c_l,
                  pi_row_l, pi_col_l, local_pc_l):
        local_pc1 = local_pc_l[0]  # (S_pad,) this shard's table
        base_row = jnp.where(internal_l, 0.0, value_l).reshape(-1)
        base_row = jnp.concatenate([base_row,
                                    jnp.zeros((1,), base_row.dtype)])
        base_col = jnp.where(internal_l, 0.0, -value_l).reshape(-1)
        base_col = jnp.concatenate([base_col,
                                    jnp.zeros((1,), base_col.dtype)])
        shape_l = internal_l.shape
        has_r = legal_r_l.sum(axis=0) > 0  # guards pad nodes + absorbing
        has_c = legal_c_l.sum(axis=0) > 0

        def backward(_, carry):
            row_best, col_best = carry  # (S_pad,) replicated
            child_row = (base_row.at[local_pc1].set(row_best)[:n_loc]
                         .reshape(shape_l))
            child_col = (base_col.at[local_pc1].set(col_best)[:n_loc]
                         .reshape(shape_l))
            row_mat = (chance_l * child_row).sum(axis=0)  # (A, A, Sd)
            col_mat = (chance_l * child_col).sum(axis=0)
            row_resp = jnp.einsum("rcs,cs->rs", row_mat, pi_col_l)
            col_resp = jnp.einsum("rs,rcs->cs", pi_row_l, col_mat)
            rb = jnp.where(legal_r_l > 0, row_resp, _NEG_INF).max(axis=0)
            cb = jnp.where(legal_c_l > 0, col_resp, _NEG_INF).max(axis=0)
            rb = jnp.where(has_r, rb, 0.0)
            cb = jnp.where(has_c, cb, 0.0)
            rb = jax.lax.all_gather(rb, axis, tiled=True)  # -> (S_pad,)
            cb = jax.lax.all_gather(cb, axis, tiled=True)
            # absorbing state: value 0 by convention (nashconv_pure)
            return rb.at[0].set(0.0), cb.at[0].set(0.0)

        zeros = jnp.zeros((s_pad,), value_l.dtype)
        return jax.lax.fori_loop(0, num_passes, backward, (zeros, zeros))

    spec_last = P(None, None, None, axis)
    spec_mat = P(None, axis)
    shard_fn = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(spec_last, spec_last, spec_last, spec_mat, spec_mat,
                  spec_mat, spec_mat, P(axis, None)),
        out_specs=(P(), P()),
        check_vma=False)
    row_best, col_best = jax.jit(shard_fn)(*args)
    reach0 = jnp.zeros((S,), row_best.dtype).at[1].set(1.0)
    return NashConvResult(row_best=row_best[:S], col_best=col_best[:S],
                          reach_probability=reach0)
