"""Jitted batched rollout engine.

Replaces the reference's Python while-loop actor (reference
environment/episode.py:175-230) with a fixed-length ``lax.scan`` over full
turns.  The absorbing-state convention (terminated lanes self-loop at index 0
with reward 0, reference tree.py:29-32) means no masking or compaction is
needed mid-rollout; validity is recovered afterwards as ``indices != 0``.

TPU-native trajectory layout: the reference stores per-half-step
observations, one-hot actions, mover ids and legal masks
(episode.py:218-227).  All of those are pure functions of the state index
and the half-step parity, so the ``Trajectory`` stores only the irreducible
data — state indices, the mover's behavior policy, sampled action ids,
rewards and value estimates — and everything else is re-derived on demand
(``trajectory_observations``, ``Trajectory.turns``, ``.actions_oh``).  This
cuts rollout HBM writes by an order of magnitude and keeps every stored
array in a TPU-friendly shape.

Each scan turn runs ONE (2B)-batched net forward for both seats (both
observations depend only on the state index, see ops/stepping.py) and one
wide row-gather of the packed state table.
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

# Unroll factor of the rollout turn scan (see learn/vtrace.py: the same
# trade — few, short iterations — applies, though each turn here is heavy,
# so the benefit is mostly turning the per-turn dynamic-update-slice record
# writes into static stores).
SCAN_UNROLL = 1


@struct.dataclass
class Trajectory:
    """Time-major batch of rollout trajectories; T = 2 * tree.max_depth.

    Half-step t has mover t % 2 (0 = row, 1 = col); both half-steps of a
    turn share the state index.  Rewards are from the row player's
    perspective and nonzero only on col half-steps that enter the absorbing
    state."""

    indices: jax.Array  # (T, B) int32 — state id at each half-step
    # Mover's behavior policy mu.  Layout per ``policy_layout``:
    #   "bma" — (T, B, A), the reference shape (default);
    #   "amb" — (T, A, B), batch-minor: A (3-5) is far below the 128-lane
    #           TPU tile, so as a scan output the (T, B, A) buffer pads
    #           ~128/A-fold in HBM; B-minor stores it unpadded (the same
    #           layout rule as ops/stepping.py).  Use ``policy_bma()`` /
    #           ``policy_amb()`` rather than reading the field raw.
    policy: jax.Array  # (T, B, A) | (T, A, B) f32, see policy_layout
    actions: jax.Array  # (T, B) int32 — sampled action ids
    rewards: jax.Array  # (T, B) f32 — row-player reward (zero-sum)
    values: jax.Array  # (T, B) f32 — actor value estimates (mover's POV)
    # Optional stored per-half-step views (``rollout_from(store_obs=True)``).
    # Observations are pure functions of ``indices`` so they CAN always be
    # re-derived via the packed-table gather — but the learner only needs
    # ~84 of the 512 bytes of each packed row, so at training batch sizes
    # storing the slim views during rollout (where the rows are already in
    # registers) and skipping the learner's re-gather moves ~6x less HBM
    # traffic.  ``obs`` is stored in a dtype wide enough that every
    # learner-side consumer sees the same bits after its own entry cast as
    # it would from the re-derived f32 path (see make_rnad_fns).
    #
    # The mover's legal mask is NOT stored separately: channel 1 of the
    # mover's observation is their legal matrix, so the mask is exactly
    # ``obs[..., 1, :, 0]`` (the reference reads it the same way,
    # episode.py:208).  Besides being free, this matters for correctness:
    # a dedicated (T, B, A) f32 mask buffer — a scan output with a
    # far-below-tile trailing dim — was deterministically misread by
    # XLA:TPU when consumed inside the large fused train-step program
    # (785k-node tree, T=12, A=5, B=131072 on v5e; first symptom -inf
    # NeuRD loss).  See tools/check_fused_consistency.py.
    # (T, B, C, A, A) mover's view per half-step; C = 2 raw, or
    # obs_transform channels + 1 (channel 1 is the legal matrix in BOTH
    # conventions, so the mask slice above is layout-independent).
    obs: jax.Array | None = None
    policy_layout: str = struct.field(pytree_node=False, default="bma")

    @property
    def num_half_steps(self) -> int:
        return self.indices.shape[0]

    @property
    def batch_size(self) -> int:
        return self.indices.shape[1]

    @property
    def num_actions(self) -> int:
        return self.policy.shape[-1 if self.policy_layout == "bma" else -2]

    def policy_bma(self) -> jax.Array:
        """Behavior policy as (T, B, A) regardless of stored layout."""
        return (self.policy if self.policy_layout == "bma"
                else jnp.moveaxis(self.policy, -2, -1))

    def policy_amb(self) -> jax.Array:
        """Behavior policy as batch-minor (T, A, B)."""
        return (self.policy if self.policy_layout == "amb"
                else jnp.moveaxis(self.policy, -1, -2))

    @property
    def turns(self) -> jax.Array:
        """(T, B) mover ids — derived from half-step parity (the engine
        alternates strictly, reference episode.py:96-104)."""
        T, B = self.indices.shape
        t = (jnp.arange(T, dtype=jnp.int32) % 2)[:, None]
        return jnp.broadcast_to(t, (T, B))

    def actions_oh(self) -> jax.Array:
        return jax.nn.one_hot(self.actions, self.num_actions,
                              dtype=self.policy.dtype)

    def valid(self) -> jax.Array:
        """(T, B) 1.0 where the half-step belongs to a live episode."""
        return (self.indices != 0).astype(jnp.float32)


def trajectory_observations(packed: stepping.PackedTables, traj: Trajectory
                            ) -> Tuple[jax.Array, jax.Array]:
    """Re-derives per-half-step observations and mover legal masks.

    Returns (observations (T, B, 2, A, A), masks (T, B, A)).  Both
    half-steps of a turn share the state index (the engine emits them in
    pairs, see ``rollout_from``), so only the even half-steps' rows are
    gathered — one wide gather over (T/2)*B rows, half the HBM traffic of
    a per-half-step gather — and the two seats' views are interleaved back
    with a reshape.
    """
    if traj.obs is not None:
        # Mover's legal mask = column 0 of their legal matrix, stored as
        # observation channel 1 (see the Trajectory.obs comment).  Exact in
        # any stored dtype (legality is 0/1).
        return traj.obs, traj.obs[..., 1, :, 0].astype(jnp.float32)
    T, B = traj.indices.shape
    A = packed.max_actions
    n_turns = T // 2
    rows = stepping.lookup(packed, traj.indices[0::2].reshape(-1))
    row_obs, col_obs = stepping.slice_observations(packed, rows)
    row_mask, col_mask = stepping.slice_action_masks(packed, rows)
    # (n_turns, 1, B, ...) pairs -> (n_turns, 2, B, ...) -> (T, B, ...):
    # even t gets the row seat's view, odd t the col seat's.
    pair = lambda r, c: jnp.stack(
        [r.reshape((n_turns, B) + r.shape[1:]),
         c.reshape((n_turns, B) + c.shape[1:])], axis=1
    ).reshape((T, B) + r.shape[1:])
    return pair(row_obs, col_obs), pair(row_mask, col_mask)


# Actor signature: variables, obs (N, 2, A, A) -> (logits (N, A), value (N,))
ActorFn = Callable[[dict, jax.Array], Tuple[jax.Array, jax.Array]]


def make_mlp_rows_actor(net, packed: stepping.PackedTables,
                        compute_dtype=None):
    """Seat-fused fast actor for depth-1 f32 MLPs: both seats' two towers as
    ONE matmul pair straight off the gathered packed rows.

    ``compute_dtype=jnp.bfloat16`` feeds the two matmuls bfloat16 OPERANDS
    with float32 accumulation: the kernels are cast once at ``prepare``
    (outside the turn scan) and the gathered f32 row's cast fuses into the
    MXU operand feed, so — unlike the generic-path bf16 probe of round 4,
    which lost to conversion copies — there is no extra HBM traffic, and
    the matmul runs at the doubled bf16 MXU rate.  The rollout is
    PADDED-MATMUL-bound, not HBM-bound (tools/roofline.py round-5 model:
    ~74-86%% of the tile-padded MXU wall vs ~15%% of wire), so this halves
    the binding term.  Logits differ from the f32 path by bf16 rounding;
    the stored behavior policy stays the exact policy the actor sampled
    from, and the learner's v-trace is off-policy-correct by construction,
    so training semantics are unchanged (opt-in:
    ``RNaDConfig.rollout_actor_dtype``).

    The generic turn materializes two obs slices and a (2B, 2, A, A) seat
    concat before the net forward — pure HBM copies.  Here the packed row
    feeds the (D_pad, 4W) kernel of ``nets.mlp_seat_fused_weights``
    directly (dead table lanes hit zero kernel rows, which is exact in
    floating point), eliminating those copies; measured +18% rollout
    throughput at 131k lanes on v5e (docs/PERF_ANALYSIS.md).  Equivalent to
    the generic path up to matmul reduction order (<=1 ulp on logits;
    sampling shapes unchanged, so episodes coincide except at measure-zero
    sampling ties — tests/test_engine.py::test_rows_actor_rollout_equivalent).

    Returns ``prepare(variables) -> apply(rows) -> (logits (2, B, A),
    values (2, B))`` so the kernel packing traces once, outside the turn
    scan.
    """
    from ..models import nets as nets_lib
    from ..models.nets import MLP

    # Validate up front what the fused-kernel packing silently assumes: a
    # depth-1 f32 MLP.  A bfloat16 MLP would compute in f32 here (the raw
    # params feed the matmul directly, diverging from the generic actor
    # path), and a non-MLP net would fail later with an opaque KeyError.
    if not isinstance(net, MLP):
        raise ValueError(
            f"make_mlp_rows_actor requires an MLP net, got "
            f"{type(net).__name__}; use the generic actor_fn path")
    if net.depth != 1:
        raise ValueError(
            f"make_mlp_rows_actor supports depth=1 MLPs only (got depth="
            f"{net.depth}); mlp_seat_fused_weights cannot express hidden "
            f"layers")
    if jnp.dtype(net.dtype) != jnp.float32:
        raise ValueError(
            f"make_mlp_rows_actor computes in float32 (measured no gain "
            f"from bf16 at rollout shapes, docs/PERF_ANALYSIS.md); net "
            f"dtype {jnp.dtype(net.dtype).name} would silently diverge "
            f"from the generic actor path")

    A = packed.max_actions
    if compute_dtype is not None and jnp.dtype(compute_dtype) not in (
            jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        raise ValueError(f"rows-actor compute_dtype must be float32 or "
                         f"bfloat16, got {jnp.dtype(compute_dtype).name}")
    bf16 = (compute_dtype is not None
            and jnp.dtype(compute_dtype) == jnp.dtype(jnp.bfloat16))

    def prepare(variables):
        W0, b0, W1, b1 = nets_lib.mlp_seat_fused_weights(
            variables["params"], A, packed.rows.shape[-1], packed.obs_width)
        if bf16:
            W0c, W1c = W0.astype(jnp.bfloat16), W1.astype(jnp.bfloat16)

            def dot(x, w):
                return jax.lax.dot(x.astype(jnp.bfloat16), w,
                                   preferred_element_type=jnp.float32)
        else:
            W0c, W1c = W0, W1
            dot = jnp.dot

        def apply(rows: jax.Array):
            h = jax.nn.relu(dot(rows, W0c) + b0)
            out = dot(h, W1c) + b1  # (B, 2*(A+1)) f32
            logits = jnp.stack([out[:, :A], out[:, A + 1:2 * A + 1]])
            value = jnp.stack([out[:, A], out[:, 2 * A + 1]])
            return logits, value

        return apply

    return prepare


def rollout(tree: GameTree, actor_fn: ActorFn, variables, key: jax.Array,
            batch_size: int, num_turns: int | None = None,
            packed: stepping.PackedTables | None = None,
            store_obs: bool = False, obs_dtype=None,
            lane_chunks: int = 1, rows_actor=None,
            policy_minor: bool = False, obs_transform=None) -> Trajectory:
    """Plays ``batch_size`` episodes to completion under the actor policy."""
    init = jnp.ones((batch_size,), jnp.int32)
    return rollout_from(tree, actor_fn, variables, key, init, num_turns,
                        packed, store_obs=store_obs, obs_dtype=obs_dtype,
                        lane_chunks=lane_chunks, rows_actor=rows_actor,
                        policy_minor=policy_minor,
                        obs_transform=obs_transform)


def rollout_from(tree: GameTree, actor_fn: ActorFn, variables,
                 key: jax.Array, init_indices: jax.Array,
                 num_turns: int | None = None,
                 packed: stepping.PackedTables | None = None,
                 store_obs: bool = False, obs_dtype=None,
                 lane_chunks: int = 1, rows_actor=None,
                 policy_minor: bool = False, obs_transform=None
                 ) -> Trajectory:
    """Rollout starting from an explicit per-lane state vector.

    Passing the initial indices lets callers attach a sharding constraint to
    the lane axis so GSPMD shards the entire rollout over a device mesh.
    Pure function of (tree/packed, variables, key); one scan iteration = one
    full turn = two emitted half-step records.

    ``store_obs`` additionally records each half-step's observation (cast to
    ``obs_dtype``, e.g. the actor net's compute dtype) in the trajectory,
    sparing the learner the packed-row re-gather; the mover's legal mask is
    a slice of it (see ``Trajectory.obs``).

    ``lane_chunks > 1`` rolls the lanes out as that many sequential
    sub-batches (``lax.map``) and restitches the trajectory along the lane
    axis.  Above ~131k lanes per chip the per-turn (B, 128) gather/repack
    intermediates exceed XLA:TPU's scoped-memory budget and every stage of
    the obs chain round-trips HBM at poor tilings (measured 35%+ rollout
    regression at 262k — docs/PERF_ANALYSIS.md); chunking keeps each
    sub-batch at the proven-fast shape.  Single-chip knob only: under GSPMD
    sharding the per-device batch is what matters, so sharded callers keep
    the default 1.  Chunked runs split the RNG per chunk, so they roll
    different (equally valid) episodes than the unchunked program.

    ``rows_actor`` (see ``make_mlp_rows_actor``) replaces ``actor_fn`` with
    a fast path that consumes the gathered packed rows directly, skipping
    the per-turn obs slice/concat copies; same math as the generic path up
    to matmul reduction order.

    ``obs_transform`` (ops/obs_transform.py) maps each half-step's raw
    (2, A, A) observation to the high-dimensional noisy view before the
    actor forward, with fresh per-turn noise keys; stored observations are
    the TRANSFORMED ones the actor saw (the learner must consume identical
    bits, and per-step noise cannot be re-derived from state indices).
    Mutually exclusive with ``rows_actor`` (which bypasses the obs slice).
    """
    if obs_transform is not None and rows_actor is not None:
        raise ValueError("obs_transform and rows_actor are mutually "
                         "exclusive (the rows-actor consumes raw packed "
                         "rows, bypassing the observation path)")
    if num_turns is None:
        num_turns = tree.max_depth
    if packed is None:
        packed = stepping.make_packed_tables(tree)
    B = init_indices.shape[0]
    A = packed.max_actions
    if lane_chunks < 1:
        # Silently running the unchunked one-program path here would defeat
        # the exact purpose of the knob (miscompile avoidance above ~131k
        # lanes, docs/PERF_ANALYSIS.md).
        raise ValueError(f"lane_chunks must be >= 1, got {lane_chunks}")
    if lane_chunks > 1:
        if B % lane_chunks:
            raise ValueError(f"batch {B} not divisible by {lane_chunks}")
        sub = functools.partial(
            rollout_from, tree, actor_fn, variables,
            num_turns=num_turns, packed=packed, store_obs=store_obs,
            obs_dtype=obs_dtype, rows_actor=rows_actor,
            policy_minor=policy_minor, obs_transform=obs_transform)
        records = jax.lax.map(
            lambda args: sub(args[0], args[1]),
            (jax.random.split(key, lane_chunks),
             init_indices.reshape(lane_chunks, B // lane_chunks)))

        def restitch(x, lane_axis):
            # (k, ...) with the chunk's lanes at ``lane_axis`` of the
            # trajectory -> the trajectory with the full lane axis, lanes
            # ordered chunk-major (== k manual sub-rollouts concatenated).
            x = jnp.moveaxis(x, 0, lane_axis)
            return x.reshape(x.shape[:lane_axis]
                             + (x.shape[lane_axis] * x.shape[lane_axis + 1],)
                             + x.shape[lane_axis + 2:])

        pol_axis = 2 if policy_minor else 1
        return Trajectory(
            indices=restitch(records.indices, 1),
            policy=restitch(records.policy, pol_axis),
            actions=restitch(records.actions, 1),
            rewards=restitch(records.rewards, 1),
            values=restitch(records.values, 1),
            obs=(restitch(records.obs, 1) if store_obs else None),
            policy_layout="amb" if policy_minor else "bma")

    rows_apply = rows_actor(variables) if rows_actor is not None else None

    # NOTE: the generic (rows_apply is None) branch below reproduces the
    # pre-rows-actor turn byte for byte — same ops at the same shapes.  The
    # fused train step embeds this code, and XLA:TPU's large-program
    # miscompiles are an unstable function of program SHAPE (docs/
    # PERF_ANALYSIS.md), so the hardware-verified form must not be
    # perturbed even in mathematically-equivalent ways.
    def turn_fn(indices, key_t):
        if obs_transform is None:
            k_act, k_ch = jax.random.split(key_t)
            k_noise = None
        else:
            # 3-way split ONLY in transform mode: the verified no-transform
            # program (and its episode stream) must stay byte-identical.
            k_act, k_ch, k_noise = jax.random.split(key_t, 3)
        rows = stepping.lookup(packed, indices)
        if rows_apply is not None:
            logits2, value2 = rows_apply(rows)  # (2, B, A), (2, B)
            row_mask, col_mask = stepping.slice_action_masks(packed, rows)
            legal2 = jnp.stack([row_mask, col_mask])  # (2, B, A)
            policy = common.masked_policy(logits2, legal2)
            actions = common.sample_actions(
                k_act, logits2.reshape(2 * B, A), legal2.reshape(2 * B, A))
            obs2 = None
            if store_obs:
                row_obs, col_obs = stepping.slice_observations(packed, rows)
                obs2 = jnp.concatenate([row_obs, col_obs], axis=0)
        else:
            row_obs, col_obs = stepping.slice_observations(packed, rows)
            obs2 = jnp.concatenate([row_obs, col_obs], axis=0)  # (2B,2,A,A)
            if obs_transform is not None:
                # fresh noise per half-step per lane; the actor and the
                # stored record see the SAME transformed bits
                obs2 = obs_transform(obs2, k_noise)
            logits, value = actor_fn(variables, obs2)
            row_mask, col_mask = stepping.slice_action_masks(packed, rows)
            legal = jnp.concatenate([row_mask, col_mask], axis=0)  # (2B, A)
            policy = common.masked_policy(logits, legal).reshape(2, B, A)
            actions = common.sample_actions(k_act, logits, legal)  # (2B,)
            value2 = value.reshape(2, B)
        new_indices, rewards = stepping.select_transition(
            packed, rows, actions[:B], actions[B:], k_ch)
        record = Trajectory(
            indices=jnp.stack([indices, indices]),
            # "amb": the transpose fuses into the elementwise policy chain,
            # so the record write is the unpadded (2, A, B) buffer instead
            # of the ~128/A-padded (2, B, A) one (see Trajectory.policy).
            policy=(jnp.moveaxis(policy, -1, -2) if policy_minor
                    else policy),
            actions=actions.reshape(2, B).astype(jnp.int32),
            rewards=jnp.stack([jnp.zeros((B,), rewards.dtype), rewards]),
            values=value2,
            obs=((obs2 if obs_dtype is None else obs2.astype(obs_dtype))
                 .reshape((2, B) + obs2.shape[1:])
                 if store_obs else None),
            policy_layout="amb" if policy_minor else "bma",
        )
        return new_indices, record

    keys = jax.random.split(key, num_turns)
    _, records = jax.lax.scan(turn_fn, init_indices, keys,
                              unroll=min(num_turns, SCAN_UNROLL))
    # (num_turns, 2, B, ...) -> (2 * num_turns, B, ...)
    return jax.tree.map(
        lambda x: x.reshape((2 * num_turns,) + x.shape[2:]), records)


def rollout_tabular(tree: GameTree, joint_policy: jax.Array, key: jax.Array,
                    batch_size: int, num_turns: int | None = None
                    ) -> Trajectory:
    """Rollout under a tabular per-node joint policy (S, 2A).

    Used by tests and oracles: rolling out the generator's stored exact
    solution must yield expected payoff equal to the stored root value
    (SURVEY.md §4).  Value estimates are the stored exact node values."""
    if num_turns is None:
        num_turns = tree.max_depth
    tables = stepping.make_step_tables(tree)
    B = batch_size
    A = tree.max_actions

    def turn_fn(indices, key_t):
        k_row, k_col, k_ch = jax.random.split(key_t, 3)
        legal_row = tree.legal[indices, 0, :, 0]
        legal_col = tree.legal[indices, 0, 0, :]
        pi = joint_policy[indices]  # (B, 2A)
        pi_row = jnp.where(legal_row > 0, pi[:, :A], 0.0)
        pi_col = jnp.where(legal_col > 0, pi[:, A:], 0.0)
        logp = lambda p: jnp.where(p > 0, jnp.log(jnp.maximum(p, 1e-30)),
                                   -1e30)
        row_actions = jax.random.categorical(k_row, logp(pi_row), axis=-1)
        col_actions = jax.random.categorical(k_col, logp(pi_col), axis=-1)
        new_indices, rewards = stepping.transition(
            tables, indices, row_actions, col_actions, k_ch)
        value = tree.root_value[indices, 0]
        norm = lambda p: p / jnp.maximum(p.sum(-1, keepdims=True), 1e-30)
        record = Trajectory(
            indices=jnp.stack([indices, indices]),
            policy=jnp.stack([norm(pi_row), norm(pi_col)]),
            actions=jnp.stack([row_actions, col_actions]).astype(jnp.int32),
            rewards=jnp.stack([jnp.zeros((B,), rewards.dtype), rewards]),
            values=jnp.stack([value, -value]),
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
