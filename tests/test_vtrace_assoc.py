"""Associative-scan v-trace == sequential-scan v-trace.

The parallel-in-time form (learn/vtrace_assoc.py) is an exact
reassociation of the sequential recursion, so results must match the
lax.scan implementation up to float reassociation of the segmented
products/sums.  The sequential implementation is itself golden-parity
tested against the reference torch code (test_vtrace_parity.py), so
equality here chains back to the reference.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnad_tpu.learn import vtrace as sv
from rnad_tpu.learn import vtrace_assoc as av


def make_batch(seed, T=9, B=7, A=3, alternate=True):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(1, T + 1, B)
    valid = (np.arange(T)[:, None] < lengths[None, :]).astype(np.float32)
    if alternate:
        player_id = np.tile((np.arange(T) % 2)[:, None],
                            (1, B)).astype(np.int64)
    else:  # arbitrary interleavings: long opponent runs stress the chains
        player_id = rng.integers(0, 2, (T, B)).astype(np.int64)
    legal = (rng.random((T, B, A)) < 0.7)
    legal[..., 0] |= ~legal.any(-1)
    legal = legal.astype(np.float32)

    def rand_policy():
        p = rng.random((T, B, A)).astype(np.float32) * legal + 1e-3 * legal
        return p / p.sum(-1, keepdims=True)

    mu = rand_policy()
    pi = rand_policy()
    cum = np.cumsum(mu, axis=-1)
    u = rng.random((T, B, 1)).astype(np.float32) * cum[..., -1:]
    a = (u > cum).sum(-1)
    actions_oh = np.eye(A, dtype=np.float32)[a]
    reward = (rng.normal(size=(T, B)).astype(np.float32)
              * valid * (player_id == 1))
    v = rng.normal(size=(T, B, 1)).astype(np.float32)
    log_pi_reg = rng.normal(size=(T, B, A)).astype(np.float32) * legal
    return dict(valid=valid, player_id=player_id, mu=mu, pi=pi,
                actions_oh=actions_oh, reward=reward, v=v,
                log_pi_reg=log_pi_reg)


def test_affine_suffix_scan_matches_sequential():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(13, 5)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(13, 5)).astype(np.float32))
    init = 0.7

    def loop(carry, ab):
        out = ab[0] + ab[1] * carry
        return out, out

    _, ref = jax.lax.scan(loop, jnp.full((5,), init), (a, b), reverse=True)
    got, got_next = av.affine_suffix_scan(a, b, init)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_next[:-1]),
                               np.asarray(ref[1:]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_next[-1]), init)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("player", [0, 1])
@pytest.mark.parametrize("eta", [0.0, 0.2, 1.0])
def test_v_trace_assoc_matches_scan(seed, player, eta):
    d = make_batch(seed)
    args = (jnp.asarray(d["v"]), jnp.asarray(d["valid"]),
            jnp.asarray(d["player_id"]), jnp.asarray(d["mu"]),
            jnp.asarray(d["pi"]), jnp.asarray(d["log_pi_reg"]),
            sv.player_others(jnp.asarray(d["player_id"]),
                             jnp.asarray(d["valid"]), player),
            jnp.asarray(d["actions_oh"]), jnp.asarray(d["reward"]), player)
    kw = dict(eta=eta, lambda_=1.0, c=1.0, rho=1.0, gamma=1.0)
    ref_vt, ref_hp, ref_lo = sv.v_trace(*args, **kw)
    got_vt, got_hp, got_lo = av.v_trace_assoc(*args, **kw)
    np.testing.assert_allclose(np.asarray(got_vt), np.asarray(ref_vt),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(got_hp), np.asarray(ref_hp))
    np.testing.assert_allclose(np.asarray(got_lo), np.asarray(ref_lo),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("alternate", [True, False])
def test_v_trace_assoc_deep_trajectories(seed, alternate):
    """T far beyond the scan-unroll cap, including arbitrary player
    interleavings (long opponent segments stress the IS/reward chains)."""
    d = make_batch(seed, T=64, B=5, alternate=alternate)
    kw = dict(eta=0.2, lambda_=1.0, c=1.0, rho=1.0, gamma=1.0)
    for player in (0, 1):
        args = (jnp.asarray(d["v"]), jnp.asarray(d["valid"]),
                jnp.asarray(d["player_id"]), jnp.asarray(d["mu"]),
                jnp.asarray(d["pi"]), jnp.asarray(d["log_pi_reg"]),
                sv.player_others(jnp.asarray(d["player_id"]),
                                 jnp.asarray(d["valid"]), player),
                jnp.asarray(d["actions_oh"]), jnp.asarray(d["reward"]),
                player)
        ref_vt, _, ref_lo = sv.v_trace(*args, **kw)
        got_vt, _, got_lo = av.v_trace_assoc(*args, **kw)
        np.testing.assert_allclose(np.asarray(got_vt), np.asarray(ref_vt),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_lo), np.asarray(ref_lo),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("eta", [0.0, 0.5])
def test_v_trace_both_assoc_matches_scan(eta):
    d = make_batch(7, T=12, B=6)
    args = (jnp.asarray(d["v"]), jnp.asarray(d["valid"]),
            jnp.asarray(d["player_id"]), jnp.asarray(d["mu"]),
            jnp.asarray(d["pi"]), jnp.asarray(d["log_pi_reg"]))
    aoh, reward = jnp.asarray(d["actions_oh"]), jnp.asarray(d["reward"])
    kw = dict(eta=eta, lambda_=1.0, c=1.0, rho=1.0, gamma=1.0)
    ref = sv.v_trace_both(*args, aoh, reward, **kw)
    got = av.v_trace_both_assoc(*args, aoh, reward, **kw)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)


def test_v_trace_assoc_extreme_is_ratios_stay_finite():
    """Mirror of test_vtrace_extreme_is_ratios_stay_finite: near-zero
    behavior probabilities on sampled actions must not NaN the outputs."""
    d = make_batch(11, T=16, B=4)
    mu = np.asarray(d["mu"]).copy()
    chosen = np.asarray(d["actions_oh"]).astype(bool)
    mu[chosen] = 1e-30  # pathological behavior policy on sampled actions
    mu = mu / mu.sum(-1, keepdims=True)
    for player in (0, 1):
        args = (jnp.asarray(d["v"]), jnp.asarray(d["valid"]),
                jnp.asarray(d["player_id"]), jnp.asarray(mu),
                jnp.asarray(d["pi"]), jnp.asarray(d["log_pi_reg"]),
                sv.player_others(jnp.asarray(d["player_id"]),
                                 jnp.asarray(d["valid"]), player),
                jnp.asarray(d["actions_oh"]), jnp.asarray(d["reward"]),
                player)
        vt, hp, lo = av.v_trace_assoc(*args, eta=0.2)
        assert np.isfinite(np.asarray(vt)).all()
        assert np.isfinite(np.asarray(lo)).all()


def test_learner_update_assoc_mode_matches_scan(small_tree):
    """End-to-end: the full learner update (losses AND resulting params)
    with vtrace_mode='associative' matches the 'scan' mode on the same
    trajectory, up to float reassociation."""
    from rnad_tpu.config import NetConfig, RNaDConfig
    from rnad_tpu.learn import rnad as rnad_lib
    from rnad_tpu.models import nets

    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=32))
    outs = {}
    for mode in ("scan", "associative"):
        cfg = RNaDConfig(batch_size=64, eta=0.2, bounds=(2,), delta_m=(4,),
                         lr=1e-3, gamma_averaging=0.01, logit_clip=2.0,
                         vtrace_mode=mode)
        _, rollout_jit, learn_jit, _ = rnad_lib.make_rnad_fns(
            net, small_tree, cfg)
        state = rnad_lib.init_train_state(net, jax.random.PRNGKey(0), 3, cfg)
        state, traj = rollout_jit(state)
        state, metrics = learn_jit(state, traj, jnp.float32(0.5))
        outs[mode] = (metrics, state.variables["params"])

    for k in ("loss", "loss_v", "loss_nerd"):
        np.testing.assert_allclose(float(outs["associative"][0][k]),
                                   float(outs["scan"][0][k]),
                                   rtol=2e-5, atol=2e-6)
    ref = jax.tree.leaves(outs["scan"][1])
    got = jax.tree.leaves(outs["associative"][1])
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-6)


def test_v_trace_assoc_time_sharded():
    """Sequence parallelism (SURVEY.md section 2.3): the associative form
    admits sharding the TIME axis over the device mesh — XLA turns the
    associative_scan's log-depth combine tree into cross-device collectives.
    Results must match the single-device run."""
    import functools
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    d = make_batch(5, T=64, B=4)
    player = 0
    args = (jnp.asarray(d["v"]), jnp.asarray(d["valid"]),
            jnp.asarray(d["player_id"]), jnp.asarray(d["mu"]),
            jnp.asarray(d["pi"]), jnp.asarray(d["log_pi_reg"]),
            sv.player_others(jnp.asarray(d["player_id"]),
                             jnp.asarray(d["valid"]), player),
            jnp.asarray(d["actions_oh"]), jnp.asarray(d["reward"]))
    fn = functools.partial(av.v_trace_assoc, player=player, eta=0.2)
    ref = fn(*args)

    mesh = Mesh(np.array(jax.devices()[:8]), ("time",))
    shard = NamedSharding(mesh, P("time"))
    sharded_args = [jax.device_put(a, shard) for a in args]
    got = jax.jit(fn)(*sharded_args)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)


def test_has_played_closed_form():
    """has_played's reference recursion (reverse scan, zero init) is
    exactly valid & (player_id == player): the scan body's carry is
    where(valid, carry, 0), which never absorbs a 1 from a zero init.
    Pin the equivalence against a literal transcription of the scan."""
    rng = np.random.default_rng(3)
    T, B = 16, 7
    valid = jnp.asarray((rng.random((T, B)) < 0.7).astype(np.float32))
    pid = jnp.asarray(rng.integers(0, 2, (T, B)).astype(np.int32))

    for player in (0, 1):
        carry = np.zeros(B, dtype=np.int32)
        outs = np.zeros((T, B), dtype=np.int32)
        for t in range(T - 1, -1, -1):
            v = np.asarray(valid[t]) > 0
            mine = np.asarray(pid[t]) == player
            outs[t] = np.where(v, np.where(mine, 1, carry), 0)
            carry = np.where(v, carry, 0)
        got = np.asarray(sv.has_played(valid, pid, player))
        np.testing.assert_array_equal(got, outs)
