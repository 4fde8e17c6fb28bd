"""Associative-scan (parallel-in-time) form of the two-player V-trace.

``vtrace.v_trace`` walks the trajectory with a sequential ``lax.scan``
(reference vtrace.py:117-138 does the same with a Python loop).  That is
the right shape for the reference's shallow trees (T = 2*depth = 8-12
half-steps), but the sequential dependency makes very deep games latency-
bound and prevents sharding the time axis — the framework's analog of
sequence parallelism (SURVEY.md section 2.3: "associative-scan formulation
of v-trace").

This module computes the identical recursion in O(log T) parallel depth.
The key observation: the v-trace carry (reference vtrace.py:58-67) is only
*piecewise* affine in itself because the importance-sampling chain enters
through ``min(cs * IS, rho/c)`` — but the IS chain itself is a segmented
product of behavior ratios that never reads the other carry fields.  So:

  round 1 — four independent segmented affine recurrences, evaluated as ONE
    ``lax.associative_scan`` over stacked (a, b) coefficient pairs, where a
    step's map is C_t = a_t + b_t * C_{t+1} and segments reset at the
    player's own steps / invalid steps:
      IS   product of opponent ratios since the player's next own step
      RU   eta-entropy-corrected reward accumulated across opponent steps
      R    ratio-weighted discounted reward chain (opponent segments)
      NV   the player's next critic value, discounted through the gap
  round 2 — with ``min(cs*IS, rho)`` / ``min(cs*IS, c)`` now plain data,
    the v-target recursion itself is a single affine chain in the scalar
    ``next_v_target`` carry: one more associative scan.

Affine maps compose associatively ((f.g)(x) = a_f + b_f*(a_g + b_g*x)),
so both rounds are exact reassociations of the sequential recursion; for
fixed inputs the results differ from ``vtrace.v_trace`` only by float
reassociation of the products/sums (tests/test_vtrace_assoc.py pins the
tolerance).  One documented divergence: the sequential form clamps the IS
and opponent-reward carries to +/-1e15 at EVERY opponent step
(vtrace.py's overflow guards); here the clamp is applied once to the final
chain values, which can differ only in the degenerate already-clipped tail
(|product| > 1e15 mid-segment).

Semantics mirrored from the reference port otherwise: reward transform and
per-player signing (reference vtrace.py:70-87, 234-239), carry
player/opponent/reset selection (vtrace.py:249-333), rho/c clipping
(vtrace.py:266-282).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from . import vtrace

_IS_CAP = 1e15


def affine_suffix_scan(a: jax.Array, b: jax.Array, init
                       ) -> Tuple[jax.Array, jax.Array]:
    """Evaluate C_t = a_t + b_t * C_{t+1} (C_T = init) for all t in
    O(log T) depth.

    ``a``/``b`` are (T, ...) with the recursion along axis 0; ``init`` is a
    scalar or an array broadcastable to one time slice.  Returns
    (C, C_next) where C[t] is the value AFTER absorbing step t and
    C_next[t] = C[t+1] is the carry ENTERING step t (what the sequential
    reverse scan's loop body sees).
    """

    def compose(later, earlier):
        # associative_scan(reverse=True) folds from t=T-1 downward, calling
        # the op with the already-accumulated LATER suffix first; composing
        # "earlier applied after later" keeps C_t = a_t + b_t * C_{t+1}.
        a_l, b_l = later
        a_e, b_e = earlier
        return a_e + b_e * a_l, b_e * b_l

    A, B = jax.lax.associative_scan(compose, (a, b), reverse=True, axis=0)
    C = A + B * init
    C_next = jnp.concatenate(
        [C[1:], jnp.broadcast_to(jnp.asarray(init, C.dtype), C[:1].shape)],
        axis=0)
    return C, C_next


def v_trace_assoc(
    v: jax.Array,  # (T, B, 1) critic values
    valid: jax.Array,  # (T, B)
    player_id: jax.Array,  # (T, B)
    acting_policy: jax.Array,  # (T, B, A) behavior policy mu
    merged_policy: jax.Array,  # (T, B, A) post-processed learner policy
    merged_log_policy: jax.Array,  # (T, B, A) regularized log policy
    p_others: jax.Array,  # (T, B, 1) from vtrace.player_others()
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
    """Drop-in replacement for ``vtrace.v_trace`` (same signature/outputs),
    parallel in time."""
    played = vtrace.has_played(valid, player_id, player)

    ratio = vtrace.policy_ratio(merged_policy, acting_policy, actions_oh,
                                valid)
    inv_mu = vtrace.policy_ratio(jnp.ones_like(merged_policy),
                                 acting_policy, actions_oh, valid)
    ratio = jnp.minimum(ratio, _IS_CAP)
    inv_mu = jnp.minimum(inv_mu, _IS_CAP)

    eta_reg_entropy = (-eta
                       * (merged_policy * merged_log_policy).sum(-1)
                       * jnp.squeeze(p_others, -1))
    eta_log_policy = -eta * merged_log_policy * p_others

    mine = (player_id == player) & (valid > 0)
    opp = (player_id != player) & (valid > 0)
    v_sq = jnp.squeeze(v, -1)  # (T, B)
    r = reward
    ent = eta_reg_entropy
    zero = jnp.zeros_like(r)
    one = jnp.ones_like(r)

    # Round 1: the four carry chains that never read each other.  Segments
    # reset at the player's own steps (our_carry, vtrace.py loop) and at
    # invalid steps (reset to init: IS=1, rest 0).
    a4 = jnp.stack([
        jnp.where(opp, zero, one),           # IS: own/invalid -> 1
        jnp.where(opp, r + ent, zero),       # RU: own/invalid -> 0
        jnp.where(opp, ent + ratio * r, zero),   # R
        jnp.where(mine, v_sq, zero),         # NV: own -> v_t
    ], axis=-1)
    b4 = jnp.stack([
        jnp.where(opp, ratio, zero),
        jnp.where(opp, gamma, zero),
        jnp.where(opp, ratio * gamma, zero),
        jnp.where(opp, gamma, zero),
    ], axis=-1)
    init4 = jnp.array([1.0, 0.0, 0.0, 0.0], dtype=a4.dtype)  # per-chain
    _, C4_next = affine_suffix_scan(a4, b4, init4)

    is_next = jnp.minimum(C4_next[..., 0], _IS_CAP)
    ru_next = C4_next[..., 1]
    r_next = jnp.clip(C4_next[..., 2], -_IS_CAP, _IS_CAP)
    nv_next = C4_next[..., 3]

    ru_used = r + gamma * ru_next + ent          # reward_uncorrected at t
    dr_used = r + gamma * r_next                 # discounted_reward at t
    rho_hat = jnp.minimum(ratio * is_next, rho)
    c_hat = jnp.minimum(ratio * is_next, c)

    # Round 2: the v-target chain, now affine: at own steps
    #   vt_t = a + b * vt_next with b = lambda * c_hat * gamma,
    # at opponent steps vt decays by gamma, invalid resets to 0.
    a_vt = jnp.where(
        mine,
        v_sq + rho_hat * (ru_used + gamma * nv_next - v_sq)
        - lambda_ * c_hat * gamma * nv_next,
        zero)
    b_vt = jnp.where(mine, lambda_ * c_hat * gamma,
                     jnp.where(opp, gamma, zero))
    nvt, nvt_next = affine_suffix_scan(a_vt, b_vt, 0.0)

    mine_f = mine.astype(v.dtype)
    v_target = (nvt * mine_f)[..., None]

    learning_output = (
        v + eta_log_policy
        + actions_oh * inv_mu[..., None]
        * (dr_used[..., None]
           + gamma * is_next[..., None] * nvt_next[..., None]
           - v)) * mine_f[..., None]

    return v_target, played, learning_output


def v_trace_both_assoc(
    v: jax.Array, valid: jax.Array, player_id: jax.Array,
    acting_policy: jax.Array, merged_policy: jax.Array,
    merged_log_policy: jax.Array, actions_oh: jax.Array, reward: jax.Array,
    *, eta: float, lambda_: float = 1.0, c: float = 1.0, rho: float = 1.0,
    gamma: float = 1.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Both players' associative v-trace, stacked on a leading player axis
    (same contract as ``vtrace.v_trace_both``)."""
    players = jnp.arange(2, dtype=player_id.dtype)
    rewards2 = jnp.stack([reward, -reward])
    p_others2 = jnp.stack([vtrace.player_others(player_id, valid, 0),
                           vtrace.player_others(player_id, valid, 1)])

    def one(p_others_p, reward_p, player_p):
        return v_trace_assoc(
            v, valid, player_id, acting_policy, merged_policy,
            merged_log_policy, p_others_p, actions_oh, reward_p, player_p,
            eta=eta, lambda_=lambda_, c=c, rho=rho, gamma=gamma)

    return jax.vmap(one)(p_others2, rewards2, players)
