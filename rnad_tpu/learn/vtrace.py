"""Two-player V-trace with the R-NaD reward transformation, plus the NeuRD
and critic losses.

The math follows DeepMind's R-NaD (arXiv:2206.15378) as realized in the
reference's torch port of the OpenSpiel code (reference learn/vtrace.py).
That file emulates ``jax.lax.scan`` and pytree-``where`` with hand-written
Python loops (vtrace.py:90-138); here the reverse scan is native, runs on
device, and is fully fused into the jitted train step.

Semantics mirrored exactly (reference file:line):
  * reward transform: ``-eta * sum(pi * log(pi/pi_reg))`` into the reward and
    ``-eta * log(pi/pi_reg)`` into the Q target, signed +1 for the acting
    player and -1 for the opponent (vtrace.py:70-87, 234-239);
  * the 5-field scan carry and its player/opponent/reset selection
    (vtrace.py:58-67, 249-333);
  * IS ratios clipped at rho_bar (v target) and c_bar (trace) (266-282);
  * policy post-processing: epsilon-threshold then greedy discretization onto
    an n_disc grid in descending-probability order (vtrace.py:24-55) — here
    as a closed-form clipped-cumsum instead of a Python loop over actions;
  * NeuRD loss with advantage clipping and the logit-threshold gradient gate
    (vtrace.py:355-367, 396-431); critic loss (377-393).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

# Unroll factor of the reverse scans.  Trajectories are short (T = 2 *
# max_depth, typically 8-12) and each scan iteration touches only a few
# (B,)-sized rows, so the per-iteration while-loop overhead dominates;
# unrolling lets XLA fuse across time steps.  Full unroll is capped so very
# deep trees don't blow up compile time.
SCAN_UNROLL_CAP = 16


def _unroll(length: int) -> int:
    return min(int(length), SCAN_UNROLL_CAP)


class VTraceCarry(NamedTuple):
    """Carry of the reverse v-trace scan (reference vtrace.py:58-67)."""

    reward: jax.Array  # (B,) discounted reward until end of episode
    reward_uncorrected: jax.Array  # (B,) incl. eta entropy regularization
    next_value: jax.Array  # (B, 1)
    next_v_target: jax.Array  # (B, 1)
    importance_sampling: jax.Array  # (B,)


def _select(pred: jax.Array, on_true, on_false):
    """Pytree jnp.where with ``pred`` broadcast as a shape prefix
    (the reference's ``_where``, vtrace.py:90-114)."""

    def one(t, f):
        p = pred.reshape(pred.shape + (1,) * (t.ndim - pred.ndim))
        return jnp.where(p, t, f)

    return jax.tree.map(one, on_true, on_false)


def player_others(player_ids: jax.Array, valid: jax.Array,
                  player: int) -> jax.Array:
    """+1 for the acting player's steps, -1 for others, 0 on invalid steps;
    trailing singleton dim (reference vtrace.py:70-87)."""
    res = (2 * (player_ids == player) - 1) * valid
    return res[..., None].astype(jnp.float32)


def has_played(valid: jax.Array, player_id: jax.Array,
               player: int) -> jax.Array:
    """Mask of the player's own valid steps (reference vtrace.py:141-177).

    The reference (and the OpenSpiel original it ports) computes this with
    a reverse scan whose carry is dead given the all-zeros init: the body's
    new carry is ``where(valid, carry, 0)`` — it never absorbs a 1 — so the
    recursion collapses to the closed form ``valid & (player_id ==
    player)`` exactly (verified elementwise against the scan in
    tests/test_vtrace_assoc.py::test_has_played_closed_form).  The closed
    form is O(1) depth: no sequential dependency, nothing to unroll, and
    the time axis stays shardable in the associative-scan learner path."""
    return jnp.where((valid > 0) & (player_id == player),
                     jnp.ones_like(player_id), jnp.zeros_like(player_id))


def policy_ratio(pi: jax.Array, mu: jax.Array, actions_oh: jax.Array,
                 valid: jax.Array) -> jax.Array:
    """pi/mu of the chosen action; 1 on invalid steps (vtrace.py:180-204).

    The denominator is floored at 1e-30: at large batch sizes the sampler
    occasionally draws an action whose f32 softmax probability rounds to
    exactly 0, and 0/0 would seed NaNs through the whole scan (the ratio
    caps in v_trace bound the resulting large-but-finite ratio instead)."""
    prob = lambda p: (actions_oh * p).sum(-1) * valid + (1 - valid)
    return prob(pi) / jnp.maximum(prob(mu), 1e-30)


def v_trace(
    v: jax.Array,  # (T, B, 1) critic values
    valid: jax.Array,  # (T, B)
    player_id: jax.Array,  # (T, B)
    acting_policy: jax.Array,  # (T, B, A) behavior policy mu
    merged_policy: jax.Array,  # (T, B, A) post-processed learner policy
    merged_log_policy: jax.Array,  # (T, B, A) regularized log policy
    p_others: jax.Array,  # (T, B, 1) from player_others()
    actions_oh: jax.Array,  # (T, B, A)
    reward: jax.Array,  # (T, B) from this player's perspective
    player: int,
    *,
    eta: float,
    lambda_: float = 1.0,
    c: float = 1.0,
    rho: float = 1.0,
    gamma: float = 1.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Custom V-trace over mixed-player trajectories (vtrace.py:207-352).

    Returns (v_target (T,B,1), has_played (T,B), learning_output (T,B,A)).
    """
    played = has_played(valid, player_id, player)

    ratio = policy_ratio(merged_policy, acting_policy, actions_oh, valid)
    inv_mu = policy_ratio(jnp.ones_like(merged_policy), acting_policy,
                          actions_oh, valid)
    # f32 overflow guard, exact elsewhere: at very large batches the tail of
    # the behavior policy produces mu ~ 1e-7 samples, and the multiplicative
    # importance-sampling carry across opponent segments can overflow f32 to
    # inf, which turns into NaN in the NeuRD advantage (inf - inf).  Values
    # this large are clipped to neurd_clip (1e3) downstream anyway, so
    # capping at 1e15 (products stay < f32 max) does not change any
    # non-degenerate result.  The reference has the same overflow at this
    # scale; it simply never ran batches big enough to sample the tail.
    _IS_CAP = 1e15
    inv_mu = jnp.minimum(inv_mu, _IS_CAP)
    ratio = jnp.minimum(ratio, _IS_CAP)

    eta_reg_entropy = (-eta
                       * (merged_policy * merged_log_policy).sum(-1)
                       * jnp.squeeze(p_others, -1))
    eta_log_policy = -eta * merged_log_policy * p_others

    init = VTraceCarry(
        reward=jnp.zeros_like(reward[-1]),
        reward_uncorrected=jnp.zeros_like(reward[-1]),
        next_value=jnp.zeros_like(v[-1]),
        next_v_target=jnp.zeros_like(v[-1]),
        importance_sampling=jnp.ones_like(ratio[-1]),
    )

    def loop(carry: VTraceCarry, x):
        (cs, mine_t, v_t, r_t, ent_t, valid_t, inv_mu_t, aoh_t, elp_t) = x

        reward_uncorrected = r_t + gamma * carry.reward_uncorrected + ent_t
        discounted_reward = r_t + gamma * carry.reward

        our_v_target = (
            v_t
            + jnp.minimum(cs * carry.importance_sampling, rho)[..., None]
            * (reward_uncorrected[..., None] + gamma * carry.next_value - v_t)
            + lambda_
            * jnp.minimum(cs * carry.importance_sampling, c)[..., None]
            * gamma * (carry.next_v_target - carry.next_value))

        our_learning_output = (
            v_t + elp_t
            + aoh_t * inv_mu_t[..., None]
            * (discounted_reward[..., None]
               + gamma * carry.importance_sampling[..., None]
               * carry.next_v_target
               - v_t))

        our_carry = VTraceCarry(
            reward=jnp.zeros_like(carry.reward),
            reward_uncorrected=jnp.zeros_like(carry.reward_uncorrected),
            next_value=v_t,
            next_v_target=our_v_target,
            importance_sampling=jnp.ones_like(carry.importance_sampling))
        # The opponent reward chain multiplies cs across consecutive
        # opponent steps; with tail ratios near the cap it can straddle the
        # f32 overflow boundary (whether it tips to inf then depends on the
        # compiler's fusion order), so it is clipped like the IS carry.
        opp_carry = VTraceCarry(
            reward=jnp.clip(ent_t + cs * discounted_reward,
                            -_IS_CAP, _IS_CAP),
            reward_uncorrected=reward_uncorrected,
            next_value=gamma * carry.next_value,
            next_v_target=gamma * carry.next_v_target,
            importance_sampling=jnp.minimum(
                cs * carry.importance_sampling, _IS_CAP))

        zero_out = (jnp.zeros_like(our_v_target),
                    jnp.zeros_like(our_learning_output))
        carry_out, y = _select(
            valid_t,
            _select(mine_t,
                    (our_carry, (our_v_target, our_learning_output)),
                    (opp_carry, zero_out)),
            (init, zero_out))
        return carry_out, y

    # The acting-player comparison is hoisted out of the scan (see
    # has_played): scanning the raw ids materializes and re-slices an
    # (T, players, B) s32 buffer under v_trace_both's vmap.
    xs = (ratio, player_id == player, v, reward, eta_reg_entropy, valid,
          inv_mu, actions_oh, eta_log_policy)
    _, (v_target, learning_output) = jax.lax.scan(
        loop, init, xs, reverse=True, unroll=_unroll(valid.shape[0]))
    return v_target, played, learning_output


def v_trace_both(
    v: jax.Array,  # (T, B, 1)
    valid: jax.Array,  # (T, B)
    player_id: jax.Array,  # (T, B)
    acting_policy: jax.Array,  # (T, B, A)
    merged_policy: jax.Array,  # (T, B, A)
    merged_log_policy: jax.Array,  # (T, B, A)
    actions_oh: jax.Array,  # (T, B, A)
    reward: jax.Array,  # (T, B) row-player perspective
    *,
    eta: float,
    lambda_: float = 1.0,
    c: float = 1.0,
    rho: float = 1.0,
    gamma: float = 1.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Both players' v-trace as ONE vmapped scan.

    ``v_trace`` is called once per player (reference vtrace.py:234-239 runs
    the whole recursion twice); the only player-dependent inputs are the
    reward sign, the ±1 ``player_others`` field and the ``pid == player``
    selects, so vmapping over a stacked player axis fuses the two reverse
    scans (plus the two ``has_played`` scans) into one at double width —
    halving the sequential-step count, the scan-overhead-bound cost on
    shallow trees.  Outputs are stacked on a leading player axis and
    bit-identical to the per-player calls (tests/test_vtrace_parity.py).
    """
    players = jnp.arange(2, dtype=player_id.dtype)
    rewards2 = jnp.stack([reward, -reward])
    p_others2 = jnp.stack([player_others(player_id, valid, 0),
                           player_others(player_id, valid, 1)])

    def one(p_others_p, reward_p, player_p):
        return v_trace(v, valid, player_id, acting_policy, merged_policy,
                       merged_log_policy, p_others_p, actions_oh, reward_p,
                       player_p, eta=eta, lambda_=lambda_, c=c, rho=rho,
                       gamma=gamma)

    return jax.vmap(one)(p_others2, rewards2, players)


def process_policy(policy: jax.Array, mask: jax.Array, n_disc: int,
                   epsilon_threshold: float = 0.03) -> jax.Array:
    """Epsilon-threshold + grid discretization of the learner policy
    (reference vtrace.py:24-55), loop-free.

    Probabilities below the threshold are zeroed (unless all are below it),
    the rest renormalized, then each probability is rounded up to blocks of
    1/n_disc and blocks are granted greedily in descending-probability order
    until n_disc blocks are spent — expressed here as a clipped exclusive
    cumulative sum over the sorted blocks.
    """
    keep = mask * ((policy >= epsilon_threshold)
                   + (policy.max(-1, keepdims=True) < epsilon_threshold))
    keep = jnp.minimum(keep, 1.0)
    p = keep * policy
    p = p / jnp.maximum(p.sum(-1, keepdims=True), 1e-30)

    blocks = jnp.ceil(n_disc * p).astype(jnp.float32)
    n_actions = p.shape[-1]
    if n_actions <= 16:
        # Branchless pairwise-rank formulation: an argsort + scatter on a
        # tiny trailing dim lowers to serialized flat gathers on TPU (the
        # dominant cost of the whole train step before this rewrite).  The
        # exclusive sorted-order prefix sum of j's blocks before i is
        #   sum_j blocks_j * [j sorts before i],
        # with "before" = (p_j > p_i) or (p_j == p_i and j < i) — exactly
        # the stable descending order the sort-based path uses.
        ps = [p[..., i] for i in range(n_actions)]
        bs = [blocks[..., i] for i in range(n_actions)]
        granted = []
        for i in range(n_actions):
            excl = jnp.zeros_like(ps[i])
            for j in range(n_actions):
                if j == i:
                    continue
                before = (ps[j] > ps[i]) if j > i else (ps[j] >= ps[i])
                excl = excl + bs[j] * before
            granted.append(jnp.clip(n_disc - excl, 0.0, bs[i]))
        result = jnp.stack(granted, axis=-1)
    else:
        order = jnp.argsort(-p, axis=-1)  # stable: ties break by index
        sorted_blocks = jnp.take_along_axis(blocks, order, axis=-1)
        excl = jnp.cumsum(sorted_blocks, axis=-1) - sorted_blocks
        granted = jnp.clip(n_disc - excl, 0.0, sorted_blocks)
        result = jnp.zeros_like(p)
        result = jnp.put_along_axis(result, order, granted, axis=-1,
                                    inplace=False)
    return result / n_disc


def apply_force_with_threshold(decision_outputs: jax.Array, force: jax.Array,
                               threshold: float,
                               threshold_center: jax.Array) -> jax.Array:
    """NeuRD gradient gate: forces only apply while the logit stays inside
    [-threshold, threshold] in the force's direction (vtrace.py:355-367)."""
    can_decrease = decision_outputs - threshold_center > -threshold
    can_increase = decision_outputs - threshold_center < threshold
    force_negative = jnp.minimum(force, 0.0)
    force_positive = jnp.maximum(force, 0.0)
    clipped = can_decrease * force_negative + can_increase * force_positive
    return decision_outputs * jax.lax.stop_gradient(clipped)


def renormalize(loss: jax.Array, mask: jax.Array,
                global_sum=None) -> jax.Array:
    """Masked mean.  ``global_sum`` (e.g. a psum over the data axis) makes
    the normalization global when the batch is sharded over devices — the
    per-shard valid counts differ, so a local mean followed by a cross-shard
    mean would weight shards unevenly."""
    loss = (loss * mask).sum()
    n = mask.sum()
    if global_sum is not None:
        loss, n = global_sum(loss), global_sum(n)
    return loss / (n + (n == 0.0))


def get_loss_v(v_list: Sequence[jax.Array],
               v_target_list: Sequence[jax.Array],
               mask_list: Sequence[jax.Array],
               global_sum=None) -> jax.Array:
    """Masked MSE critic loss against detached targets (vtrace.py:377-393)."""
    total = 0.0
    for v_n, v_target, mask in zip(v_list, v_target_list, mask_list):
        err = mask[..., None] * (
            v_n - jax.lax.stop_gradient(v_target)) ** 2
        err, n = err.sum(), mask.sum()
        if global_sum is not None:
            err, n = global_sum(err), global_sum(n)
        total = total + err / (n + (n == 0.0))
    return total


def get_loss_nerd(logit_list: Sequence[jax.Array],
                  policy_list: Sequence[jax.Array],
                  q_vr_list: Sequence[jax.Array],
                  valid: jax.Array,
                  player_ids: jax.Array,
                  legal_actions: jax.Array,
                  importance_sampling_correction: Sequence[jax.Array],
                  clip: float = 100.0,
                  threshold: float = 2.0,
                  global_sum=None) -> jax.Array:
    """NeuRD policy loss (vtrace.py:396-431)."""
    total = 0.0
    for k, (logit_pi, pi, q_vr, is_c) in enumerate(
            zip(logit_list, policy_list, q_vr_list,
                importance_sampling_correction)):
        adv_pi = q_vr - (pi * q_vr).sum(-1, keepdims=True)
        adv_pi = is_c * adv_pi
        adv_pi = jnp.clip(adv_pi, -clip, clip)
        adv_pi = jax.lax.stop_gradient(adv_pi)

        logits = logit_pi - (logit_pi * legal_actions).mean(-1, keepdims=True)
        nerd = (legal_actions
                * apply_force_with_threshold(
                    logits, adv_pi, threshold,
                    jnp.zeros_like(logits))).sum(-1)
        total = total - renormalize(nerd, valid * (player_ids == k),
                                    global_sum)
    return total


# ---------------------------------------------------------------------------
# Batch-minor ("amb") layout variants.
#
# Every array above whose trailing dim is the action count A lives in
# (T, B, A) form — and A (3-5) is far below the 128-lane TPU tile, so each
# one that materializes at a fusion boundary (the scan xs/ys especially:
# actions_oh, eta_log_policy, learning_output) is padded ~A/128-fold in HBM
# (the repo-wide layout rule, ops/stepping.py module docstring; the same
# buffer class XLA:TPU was observed to MISREAD inside very large fused
# programs, docs/PERF_ANALYSIS.md).  The *_minor functions below compute
# the identical math with those arrays in (T, A, B) form — B minor, tile-
# friendly — and (T, B, 1) value columns flattened to (T, B).  Same
# elementwise ops, same per-A reduction order, so results are bit-identical
# to the reference-parity path (tests/test_vtrace_minor.py).
# ---------------------------------------------------------------------------


def _select_suffix(pred: jax.Array, on_true, on_false):
    """Pytree jnp.where with ``pred`` broadcast as a shape SUFFIX (the
    batch axis is minor in this layout)."""

    def one(t, f):
        p = pred.reshape((1,) * (t.ndim - pred.ndim) + pred.shape)
        return jnp.where(p, t, f)

    return jax.tree.map(one, on_true, on_false)


def policy_ratio_minor(pi: jax.Array, mu: jax.Array, actions_oh: jax.Array,
                       valid: jax.Array) -> jax.Array:
    """``policy_ratio`` for (T, A, B) policies; returns (T, B)."""
    prob = lambda p: (actions_oh * p).sum(-2) * valid + (1 - valid)
    return prob(pi) / jnp.maximum(prob(mu), 1e-30)


def v_trace_minor(
    v: jax.Array,  # (T, B) critic values
    valid: jax.Array,  # (T, B)
    player_id: jax.Array,  # (T, B)
    acting_policy: jax.Array,  # (T, A, B)
    merged_policy: jax.Array,  # (T, A, B)
    merged_log_policy: jax.Array,  # (T, A, B)
    p_others: jax.Array,  # (T, B): player_others without the trailing 1
    actions_oh: jax.Array,  # (T, A, B)
    reward: jax.Array,  # (T, B)
    player: int,
    *,
    eta: float,
    lambda_: float = 1.0,
    c: float = 1.0,
    rho: float = 1.0,
    gamma: float = 1.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """``v_trace`` in the batch-minor layout.

    Returns (v_target (T, B), has_played (T, B), learning_output
    (T, A, B)) — identical values to ``v_trace`` up to layout."""
    played = has_played(valid, player_id, player)

    ratio = policy_ratio_minor(merged_policy, acting_policy, actions_oh,
                               valid)
    inv_mu = policy_ratio_minor(jnp.ones_like(merged_policy), acting_policy,
                                actions_oh, valid)
    _IS_CAP = 1e15  # same overflow guard as v_trace
    inv_mu = jnp.minimum(inv_mu, _IS_CAP)
    ratio = jnp.minimum(ratio, _IS_CAP)

    eta_reg_entropy = (-eta
                       * (merged_policy * merged_log_policy).sum(-2)
                       * p_others)
    eta_log_policy = -eta * merged_log_policy * p_others[:, None, :]

    init = VTraceCarry(
        reward=jnp.zeros_like(reward[-1]),
        reward_uncorrected=jnp.zeros_like(reward[-1]),
        next_value=jnp.zeros_like(v[-1]),
        next_v_target=jnp.zeros_like(v[-1]),
        importance_sampling=jnp.ones_like(ratio[-1]),
    )

    def loop(carry: VTraceCarry, x):
        (cs, mine_t, v_t, r_t, ent_t, valid_t, inv_mu_t, aoh_t, elp_t) = x

        reward_uncorrected = r_t + gamma * carry.reward_uncorrected + ent_t
        discounted_reward = r_t + gamma * carry.reward

        our_v_target = (
            v_t
            + jnp.minimum(cs * carry.importance_sampling, rho)
            * (reward_uncorrected + gamma * carry.next_value - v_t)
            + lambda_
            * jnp.minimum(cs * carry.importance_sampling, c)
            * gamma * (carry.next_v_target - carry.next_value))

        our_learning_output = (
            v_t[None, :] + elp_t
            + aoh_t * inv_mu_t[None, :]
            * (discounted_reward[None, :]
               + (gamma * carry.importance_sampling
                  * carry.next_v_target)[None, :]
               - v_t[None, :]))

        our_carry = VTraceCarry(
            reward=jnp.zeros_like(carry.reward),
            reward_uncorrected=jnp.zeros_like(carry.reward_uncorrected),
            next_value=v_t,
            next_v_target=our_v_target,
            importance_sampling=jnp.ones_like(carry.importance_sampling))
        opp_carry = VTraceCarry(
            reward=jnp.clip(ent_t + cs * discounted_reward,
                            -_IS_CAP, _IS_CAP),
            reward_uncorrected=reward_uncorrected,
            next_value=gamma * carry.next_value,
            next_v_target=gamma * carry.next_v_target,
            importance_sampling=jnp.minimum(
                cs * carry.importance_sampling, _IS_CAP))

        zero_out = (jnp.zeros_like(our_v_target),
                    jnp.zeros_like(our_learning_output))
        carry_out, y = _select_suffix(
            valid_t,
            _select_suffix(mine_t,
                           (our_carry, (our_v_target, our_learning_output)),
                           (opp_carry, zero_out)),
            (init, zero_out))
        return carry_out, y

    xs = (ratio, player_id == player, v, reward, eta_reg_entropy, valid,
          inv_mu, actions_oh, eta_log_policy)
    _, (v_target, learning_output) = jax.lax.scan(
        loop, init, xs, reverse=True, unroll=_unroll(valid.shape[0]))
    return v_target, played, learning_output


def v_trace_both_minor(
    v: jax.Array,  # (T, B)
    valid: jax.Array,  # (T, B)
    player_id: jax.Array,  # (T, B)
    acting_policy: jax.Array,  # (T, A, B)
    merged_policy: jax.Array,  # (T, A, B)
    merged_log_policy: jax.Array,  # (T, A, B)
    actions_oh: jax.Array,  # (T, A, B)
    reward: jax.Array,  # (T, B) row-player perspective
    *,
    eta: float,
    lambda_: float = 1.0,
    c: float = 1.0,
    rho: float = 1.0,
    gamma: float = 1.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """``v_trace_both`` in the batch-minor layout (one vmapped scan)."""
    players = jnp.arange(2, dtype=player_id.dtype)
    rewards2 = jnp.stack([reward, -reward])
    po = lambda p: ((2 * (player_id == p) - 1) * valid).astype(jnp.float32)
    p_others2 = jnp.stack([po(0), po(1)])

    def one(p_others_p, reward_p, player_p):
        return v_trace_minor(v, valid, player_id, acting_policy,
                             merged_policy, merged_log_policy, p_others_p,
                             actions_oh, reward_p, player_p, eta=eta,
                             lambda_=lambda_, c=c, rho=rho, gamma=gamma)

    return jax.vmap(one)(p_others2, rewards2, players)


def process_policy_minor(policy: jax.Array, mask: jax.Array, n_disc: int,
                         epsilon_threshold: float = 0.03) -> jax.Array:
    """``process_policy`` for (..., A, B) policies (action axis -2)."""
    keep = mask * ((policy >= epsilon_threshold)
                   + (policy.max(-2, keepdims=True) < epsilon_threshold))
    keep = jnp.minimum(keep, 1.0)
    p = keep * policy
    p = p / jnp.maximum(p.sum(-2, keepdims=True), 1e-30)

    blocks = jnp.ceil(n_disc * p).astype(jnp.float32)
    n_actions = p.shape[-2]
    if n_actions > 16:
        raise NotImplementedError(
            "process_policy_minor covers the branchless pairwise form only "
            "(A <= 16); use the (T, B, A) path for wider action spaces")
    ps = [p[..., i, :] for i in range(n_actions)]
    bs = [blocks[..., i, :] for i in range(n_actions)]
    granted = []
    for i in range(n_actions):
        excl = jnp.zeros_like(ps[i])
        for j in range(n_actions):
            if j == i:
                continue
            before = (ps[j] > ps[i]) if j > i else (ps[j] >= ps[i])
            excl = excl + bs[j] * before
        granted.append(jnp.clip(n_disc - excl, 0.0, bs[i]))
    return jnp.stack(granted, axis=-2) / n_disc


def get_loss_v_minor(v_list: Sequence[jax.Array],
                     v_target_list: Sequence[jax.Array],
                     mask_list: Sequence[jax.Array],
                     global_sum=None) -> jax.Array:
    """``get_loss_v`` with (T, B) values (no trailing singleton)."""
    total = 0.0
    for v_n, v_target, mask in zip(v_list, v_target_list, mask_list):
        err = mask * (v_n - jax.lax.stop_gradient(v_target)) ** 2
        err, n = err.sum(), mask.sum()
        if global_sum is not None:
            err, n = global_sum(err), global_sum(n)
        total = total + err / (n + (n == 0.0))
    return total


def get_loss_nerd_minor(logit_list: Sequence[jax.Array],
                        policy_list: Sequence[jax.Array],
                        q_vr_list: Sequence[jax.Array],
                        valid: jax.Array,
                        player_ids: jax.Array,
                        legal_actions: jax.Array,
                        importance_sampling_correction: Sequence[jax.Array],
                        clip: float = 100.0,
                        threshold: float = 2.0,
                        global_sum=None) -> jax.Array:
    """``get_loss_nerd`` for (T, A, B) logits/policies/targets; the
    importance-sampling corrections are (T, B) (broadcast over actions)."""
    total = 0.0
    for k, (logit_pi, pi, q_vr, is_c) in enumerate(
            zip(logit_list, policy_list, q_vr_list,
                importance_sampling_correction)):
        adv_pi = q_vr - (pi * q_vr).sum(-2, keepdims=True)
        adv_pi = is_c[:, None, :] * adv_pi
        adv_pi = jnp.clip(adv_pi, -clip, clip)
        adv_pi = jax.lax.stop_gradient(adv_pi)

        logits = logit_pi - (logit_pi * legal_actions).mean(-2, keepdims=True)
        nerd = (legal_actions
                * apply_force_with_threshold(
                    logits, adv_pi, threshold,
                    jnp.zeros_like(logits))).sum(-2)
        total = total - renormalize(nerd, valid * (player_ids == k),
                                    global_sum)
    return total
