"""Pallas TPU kernel: one ENTIRE rollout turn fused in VMEM.

The gather-path turn (env/engine.py::rollout_from) round-trips HBM several
times per turn: packed-row gather out, observation tensor in/out of the net
(with f32->bf16 conversion copies around every matmul), logits, masks,
transition selects.  For MLP actors on trees whose packed table fits VMEM
(S*D*4B <= ~8 MB — hundreds of thousands of nodes), all of it fuses into
ONE kernel per turn:

    one-hot MXU row lookup  ->  both seats' observations (VMEM slices)
    -> fused two-head MLP (weights VMEM-resident, W0=(din,2W), W1=(2W,A+1))
    -> masked softmax + Gumbel-max action sampling
    -> joint-cell transition select + Gumbel-max chance draw + reward mask

HBM traffic per turn drops from ~(D_pad + 5 activations) * 4B per lane to
the trajectory record plus 3 small noise vectors per lane.

Randomness: the Gumbel noise is computed OUTSIDE the kernel with the same
`jax.random` calls (and key-split order) as the gather path —
`jax.random.categorical` is definitionally `argmax(logits + gumbel(key))`
(jax/_src/random.py::categorical) — so given bit-identical logits this
path rolls the SAME episodes as env/engine.py::rollout_from, verified in
tests/test_pallas_turn.py.  (A matmul-precision difference between the
in-kernel MXU dots and XLA's could flip an argmax on a near-tie; the draw
law is identical regardless.)

Turn semantics mirror reference environment/episode.py:106-121 (transition
+ absorbing-state rewards) and nn/net.py:49 (multinomial sampling), same
as the gather path.

Measured verdict (v5e, demo tree S=306, docs/PERF.md): the fused turn
sustains ~40M env half-steps/s vs the gather path's 160-198M, so the
gather path stays the default.  The loss is structural, not a tuning gap:
(a) the exact one-hot row lookup is a (tile, S) x (S, D) matmul whose work
grows with tree size and must run at 6-pass f32 precision to reproduce
child indices bit-exactly, while XLA's dynamic gather moves only the 512
bytes per row it needs at ~50% HBM bandwidth; and (b) at the reference's
action spaces (A=3 => din=18, A+1=4 outputs) every MXU operand pads its
contraction/lane dims to 128, wasting >85% of each systolic pass — the
same matmuls inside the XLA rollout amortize that padding over the whole
(2B)-row batch instead of per 1024-lane tile.  The kernel remains
supported (and equivalence-tested) as the VMEM-resident option for small
trees and as the template for wider-action games where the padding waste
vanishes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import stepping

# XLA lays 1-D 4-byte arrays out in 1024-element tiles ({0:T(1024)}), and
# Mosaic requires the lane block of a rank-1 operand to match that tiling —
# a 512 block fails layout verification on real TPUs (fine in interpret).
_LANE_TILE = 1024
_NEG = -1e30


from ..models.nets import mlp_fused_weights  # shared with the learner


def _argmax_rows(x: jax.Array) -> jax.Array:
    """(N, K) -> (N,) int32 argmax, lowest index on ties (jnp.argmax
    semantics)."""
    n, k = x.shape
    m = jnp.max(x, axis=1, keepdims=True)
    ids = jax.lax.broadcasted_iota(jnp.int32, (n, k), 1)
    big = jnp.where(x >= m, ids, k)
    return jnp.min(big, axis=1).astype(jnp.int32)


def _turn_kernel(idx_ref, table_ref, w0_ref, b0_ref, w1_ref, b1_ref,
                 grow_ref, gcol_ref, gch_ref,
                 newidx_ref, polr_ref, polc_ref, actr_ref, actc_ref,
                 rew_ref, valr_ref, valc_ref, *, A: int, T: int, S: int):
    tile = idx_ref.shape[0]
    AA = A * A
    obs_w = 2 * AA
    mask_off = 2 * obs_w
    trans_off = mask_off + 2 * A
    span = AA * 3 * T

    idx = idx_ref[:]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (tile, S), 1)
              == idx[:, None]).astype(jnp.float32)
    # bit-exact f32 row reconstruction (0/1 multipliers, HIGHEST precision)
    rows = jax.lax.dot_general(
        onehot, table_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    def seat(obs, mask, g):
        """Two-matmul head + masked softmax + Gumbel-max sampling for one
        seat.  (Seats run separately: Mosaic cannot concatenate along the
        sublane axis at these shapes.)"""
        h = jnp.maximum(
            jax.lax.dot_general(obs, w0_ref[:],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
            + b0_ref[:][None, :], 0.0)
        out = jax.lax.dot_general(h, w1_ref[:],
                                  dimension_numbers=(((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST) \
            + b1_ref[:][None, :]
        logits = out[:, :A]
        value = out[:, A]
        ml = jnp.where(mask > 0, logits, _NEG)
        mx = jnp.max(ml, axis=1, keepdims=True)
        e = jnp.exp(ml - mx)
        pol = jnp.where(mask > 0, e / jnp.sum(e, axis=1, keepdims=True),
                        0.0)
        act = _argmax_rows(ml + g)  # == jax.random.categorical w/ this noise
        return act, pol, value

    act_row, pol_row, val_row = seat(rows[:, :obs_w],
                                     rows[:, mask_off:mask_off + A],
                                     grow_ref[:])
    act_col, pol_col, val_col = seat(rows[:, obs_w:2 * obs_w],
                                     rows[:, mask_off + A:mask_off + 2 * A],
                                     gcol_ref[:])
    cell = act_row * A + act_col  # (tile,)

    # transition select: mask the chosen cell's 3T-wide group, then a
    # constant (span, 3T) comb matmul (0/1, HIGHEST: exact) extracts it
    trans = rows[:, trans_off:trans_off + span]  # (tile, span)
    j = jax.lax.broadcasted_iota(jnp.int32, (tile, span), 1)
    cell_mask = (j // (3 * T) == cell[:, None]).astype(jnp.float32)
    comb_rows = jax.lax.broadcasted_iota(jnp.int32, (span, 3 * T), 0)
    comb_cols = jax.lax.broadcasted_iota(jnp.int32, (span, 3 * T), 1)
    comb = (comb_rows % (3 * T) == comb_cols).astype(jnp.float32)
    sel = jax.lax.dot_general(
        trans * cell_mask, comb,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # (tile, 3T)

    t_choice = _argmax_rows(sel[:, :T] + gch_ref[:])  # chance draw
    t_oh = (jax.lax.broadcasted_iota(jnp.int32, (tile, T), 1)
            == t_choice[:, None]).astype(jnp.float32)
    child = jnp.sum(t_oh * sel[:, T:2 * T], axis=1)
    val_t = jnp.sum(t_oh * sel[:, 2 * T:3 * T], axis=1)
    new_idx = child.astype(jnp.int32)

    newidx_ref[:] = new_idx
    polr_ref[:] = pol_row
    polc_ref[:] = pol_col
    actr_ref[:] = act_row
    actc_ref[:] = act_col
    rew_ref[:] = jnp.where(new_idx == 0, val_t, 0.0)
    valr_ref[:] = val_row
    valc_ref[:] = val_col


@functools.partial(jax.jit,
                   static_argnames=("A", "T", "interpret", "tile"))
def fused_turn(table: jax.Array, w0: jax.Array, b0: jax.Array,
               w1: jax.Array, b1: jax.Array, indices: jax.Array,
               g_act: jax.Array, g_chance: jax.Array, *, A: int, T: int,
               interpret: bool = False, tile: int = _LANE_TILE):
    """One full turn for all lanes.

    ``g_act`` (2B, A) and ``g_chance`` (B, T) are Gumbel noise (see
    rollout_fused for the key discipline).  Returns (new_indices,
    policy (2,B,A), actions (2,B), rewards (B,), values (2,B))."""
    B = indices.shape[0]
    S, D = table.shape
    if B % tile:
        raise ValueError(f"batch {B} must divide the lane tile {tile}")
    grid = (B // tile,)
    kernel = functools.partial(_turn_kernel, A=A, T=T, S=S)
    out_shape = [
        jax.ShapeDtypeStruct((B,), jnp.int32),       # new indices
        jax.ShapeDtypeStruct((B, A), jnp.float32),   # policy row
        jax.ShapeDtypeStruct((B, A), jnp.float32),   # policy col
        jax.ShapeDtypeStruct((B,), jnp.int32),       # actions row
        jax.ShapeDtypeStruct((B,), jnp.int32),       # actions col
        jax.ShapeDtypeStruct((B,), jnp.float32),     # rewards
        jax.ShapeDtypeStruct((B,), jnp.float32),     # values row
        jax.ShapeDtypeStruct((B,), jnp.float32),     # values col
    ]
    lane = lambda: pl.BlockSpec((tile,), lambda i: (i,),
                                memory_space=pltpu.VMEM)
    lane2 = lambda w: pl.BlockSpec((tile, w), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    whole = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((n,), lambda i: (0,),
                                 memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            lane(),                                   # indices
            whole(S, D),                              # table (VMEM-resident)
            whole(*w0.shape), vec(b0.shape[0]),
            whole(*w1.shape), vec(b1.shape[0]),
            lane2(A), lane2(A),                       # action gumbel
            lane2(T),                                 # chance gumbel
        ],
        out_specs=[lane(), lane2(A), lane2(A), lane(), lane(), lane(),
                   lane(), lane()],
        out_shape=out_shape,
        # the TPU-semantics interpreter (not the generic one), for CPU tests
        interpret=pltpu.InterpretParams() if interpret else False,
    )(indices, table, w0, b0, w1, b1, g_act[:B], g_act[B:], g_chance)
    new_idx, pr, pc, ar, ac, rew, vr, vc = outs
    policy = jnp.stack([pr, pc])
    actions = jnp.stack([ar, ac])
    values = jnp.stack([vr, vc])
    return new_idx, policy, actions, rew, values


def rollout_fused(packed: stepping.PackedTables, params: dict,
                  key: jax.Array, init_indices: jax.Array,
                  num_turns: int, interpret: bool = False,
                  tile: int = _LANE_TILE):
    """Full fixed-length rollout where every turn is one fused kernel.

    Key discipline mirrors env/engine.py::rollout_from exactly — split the
    run key into per-turn keys, then (k_act, k_ch) per turn, gumbel shapes
    (2B, A) / (T, B) — so this path rolls the gather path's episodes."""
    from ..env.engine import Trajectory

    A = packed.max_actions
    T = packed.max_transitions
    w0, b0, w1, b1 = mlp_fused_weights(params, A)
    table = packed.rows
    B = init_indices.shape[0]

    def turn_fn(indices, key_t):
        k_act, k_ch = jax.random.split(key_t)
        g_act = jax.random.gumbel(k_act, (2 * B, A), jnp.float32)
        g_ch = jax.random.gumbel(k_ch, (T, B), jnp.float32).T
        new_idx, policy, actions, rewards, values = fused_turn(
            table, w0, b0, w1, b1, indices, g_act, g_ch, A=A, T=T,
            interpret=interpret, tile=tile)
        rec = Trajectory(
            indices=jnp.stack([indices, indices]),
            policy=policy,
            actions=actions,
            rewards=jnp.stack([jnp.zeros((B,), rewards.dtype), rewards]),
            values=values,
        )
        return new_idx, rec

    keys = jax.random.split(key, num_turns)
    _, records = jax.lax.scan(turn_fn, init_indices, keys)
    return jax.tree.map(
        lambda x: x.reshape((2 * num_turns,) + x.shape[2:]), records)
