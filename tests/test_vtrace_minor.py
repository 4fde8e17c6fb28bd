"""Bit-exactness of the batch-minor (T, A, B) v-trace/loss variants against
the reference-parity (T, B, A) implementations (learn/vtrace.py's batch-
minor section): same elementwise ops and per-A reduction order, so every
output must be bit-identical up to layout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnad_tpu.learn import vtrace
from rnad_tpu.models import common


def _random_inputs(key, T=6, B=17, A=3):
    ks = jax.random.split(key, 8)
    logits = jax.random.normal(ks[0], (T, B, A))
    legal = (jax.random.uniform(ks[1], (T, B, A)) > 0.25).astype(jnp.float32)
    legal = legal.at[..., 0].set(1.0)  # at least one legal action
    mu = common.masked_policy(jax.random.normal(ks[2], (T, B, A)), legal)
    pi = common.masked_policy(logits, legal)
    log_pi_reg = common.masked_log_policy(
        jax.random.normal(ks[3], (T, B, A)), legal)
    actions = jax.random.categorical(
        ks[4], common.masked_logits(jnp.log(jnp.maximum(mu, 1e-9)), legal))
    actions_oh = jax.nn.one_hot(actions, A, dtype=jnp.float32)
    valid = (jax.random.uniform(ks[5], (T, B)) > 0.2).astype(jnp.float32)
    player_id = (jnp.arange(T, dtype=jnp.int32) % 2)[:, None] * jnp.ones(
        (T, B), jnp.int32)
    reward = jax.random.normal(ks[6], (T, B)) * valid
    v = jax.random.normal(ks[7], (T, B))
    return dict(logits=logits, legal=legal, mu=mu, pi=pi,
                log_pi_reg=log_pi_reg, actions_oh=actions_oh, valid=valid,
                player_id=player_id, reward=reward, v=v)


def _amb(x):  # (T, B, A) -> (T, A, B)
    return jnp.moveaxis(x, -1, -2)


def test_v_trace_both_minor_bit_exact():
    d = _random_inputs(jax.random.PRNGKey(0))
    vt, played, out = vtrace.v_trace_both(
        d["v"][..., None], d["valid"], d["player_id"], d["mu"], d["pi"],
        d["log_pi_reg"], d["actions_oh"], d["reward"], eta=0.2)
    vt_m, played_m, out_m = vtrace.v_trace_both_minor(
        d["v"], d["valid"], d["player_id"], _amb(d["mu"]), _amb(d["pi"]),
        _amb(d["log_pi_reg"]), _amb(d["actions_oh"]), d["reward"], eta=0.2)
    assert np.array_equal(np.asarray(vt[..., 0]), np.asarray(vt_m))
    assert np.array_equal(np.asarray(played), np.asarray(played_m))
    assert np.array_equal(np.asarray(jnp.moveaxis(out, -1, -2)),
                          np.asarray(out_m))


def test_process_policy_minor_bit_exact():
    d = _random_inputs(jax.random.PRNGKey(1), T=4, B=33, A=5)
    ref = vtrace.process_policy(d["pi"], d["legal"], 32, 0.03)
    minor = vtrace.process_policy_minor(_amb(d["pi"]), _amb(d["legal"]),
                                        32, 0.03)
    assert np.array_equal(np.asarray(_amb(ref)), np.asarray(minor))


def test_masked_policy_minor_bit_exact():
    d = _random_inputs(jax.random.PRNGKey(2), A=5)
    p = common.masked_policy(d["logits"], d["legal"])
    lp = common.masked_log_policy(d["logits"], d["legal"])
    p_m = common.masked_policy_minor(_amb(d["logits"]), _amb(d["legal"]))
    lp_m = common.masked_log_policy_minor(_amb(d["logits"]),
                                          _amb(d["legal"]))
    assert np.array_equal(np.asarray(_amb(p)), np.asarray(p_m))
    assert np.array_equal(np.asarray(_amb(lp)), np.asarray(lp_m))


def test_losses_minor_bit_exact_with_grads():
    d = _random_inputs(jax.random.PRNGKey(3))
    vt, played, out = vtrace.v_trace_both(
        d["v"][..., None], d["valid"], d["player_id"], d["mu"], d["pi"],
        d["log_pi_reg"], d["actions_oh"], d["reward"], eta=0.2)
    vt_l = [vt[p] for p in range(2)]
    hp_l = [played[p] for p in range(2)]
    out_l = [out[p] for p in range(2)]
    is_vec = jnp.ones_like(d["valid"])[..., None]

    def loss_ref(logits):
        v = d["v"][..., None]
        pi = common.masked_policy(logits, d["legal"])
        lv = vtrace.get_loss_v([v, v], vt_l, hp_l)
        ln = vtrace.get_loss_nerd([logits, logits], [pi, pi], out_l,
                                  d["valid"], d["player_id"], d["legal"],
                                  [is_vec, is_vec], clip=1e3, threshold=2.0)
        return lv + ln

    def loss_minor(logits):
        logits_m = _amb(logits)
        legal_m = _amb(d["legal"])
        pi_m = common.masked_policy_minor(logits_m, legal_m)
        lv = vtrace.get_loss_v_minor([d["v"], d["v"]],
                                     [x[..., 0] for x in vt_l], hp_l)
        ln = vtrace.get_loss_nerd_minor(
            [logits_m, logits_m], [pi_m, pi_m], [_amb(x) for x in out_l],
            d["valid"], d["player_id"], legal_m,
            [jnp.ones_like(d["valid"])] * 2, clip=1e3, threshold=2.0)
        return lv + ln

    l_ref, g_ref = jax.value_and_grad(loss_ref)(d["logits"])
    l_m, g_m = jax.value_and_grad(loss_minor)(d["logits"])
    assert np.array_equal(np.asarray(l_ref), np.asarray(l_m))
    assert np.array_equal(np.asarray(g_ref), np.asarray(g_m))
