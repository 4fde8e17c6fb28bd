"""Golden parity of the learning math against the reference torch
implementation (loaded read-only from /root/reference).

One sign error in the reward transform or carry handling silently destroys
convergence (SURVEY.md §7 hard part 3), so every function is checked
numerically — including gradients through the NeuRD logit gate.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnad_tpu.learn import vtrace as jv

REF = "/root/reference"
torch = pytest.importorskip("torch")
if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference unavailable", allow_module_level=True)
sys.path.insert(0, REF)
import learn.vtrace as tv  # noqa: E402  (reference torch implementation)


def make_batch(seed, T=9, B=7, A=3):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(1, T + 1, B)
    valid = (np.arange(T)[:, None] < lengths[None, :]).astype(np.float32)
    player_id = np.tile((np.arange(T) % 2)[:, None], (1, B)).astype(np.int64)
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
    return dict(valid=valid, player_id=player_id, legal=legal, mu=mu, pi=pi,
                actions_oh=actions_oh, reward=reward, v=v,
                log_pi_reg=log_pi_reg)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("player", [0, 1])
@pytest.mark.parametrize("eta", [0.0, 0.2, 1.0])
def test_v_trace_parity(seed, player, eta):
    d = make_batch(seed)
    tt = {k: torch.tensor(v) for k, v in d.items()}
    c, rho, gamma, lam = 1.0, 1.0, 1.0, 1.0

    ref_vt, ref_hp, ref_lo = tv.v_trace(
        tt["v"], torch.tensor(d["valid"]), tt["player_id"], tt["mu"],
        tt["pi"], tt["log_pi_reg"],
        tv._player_others(tt["player_id"], torch.tensor(d["valid"]), player),
        tt["actions_oh"], tt["reward"], player,
        eta=eta, lambda_=lam, c=c, rho=rho, gamma=gamma)

    out_vt, out_hp, out_lo = jv.v_trace(
        jnp.asarray(d["v"]), jnp.asarray(d["valid"]),
        jnp.asarray(d["player_id"]), jnp.asarray(d["mu"]),
        jnp.asarray(d["pi"]), jnp.asarray(d["log_pi_reg"]),
        jv.player_others(jnp.asarray(d["player_id"]),
                         jnp.asarray(d["valid"]), player),
        jnp.asarray(d["actions_oh"]), jnp.asarray(d["reward"]), player,
        eta=eta, lambda_=lam, c=c, rho=rho, gamma=gamma)

    np.testing.assert_allclose(np.asarray(out_vt), ref_vt.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_hp),
                               ref_hp.numpy().astype(np.float32), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_lo), ref_lo.numpy(), atol=2e-5)


@pytest.mark.parametrize("seed", [0, 4])
@pytest.mark.parametrize("eta", [0.0, 0.2])
def test_v_trace_both_matches_per_player(seed, eta):
    """The single-scan two-player form is bit-identical to two v_trace
    calls (the trainer's fused path, learn/rnad.py)."""
    d = make_batch(seed)
    kw = dict(eta=eta, lambda_=1.0, c=1.0, rho=1.0, gamma=1.0)
    args = (jnp.asarray(d["v"]), jnp.asarray(d["valid"]),
            jnp.asarray(d["player_id"]), jnp.asarray(d["mu"]),
            jnp.asarray(d["pi"]), jnp.asarray(d["log_pi_reg"]))
    aoh = jnp.asarray(d["actions_oh"])
    reward = jnp.asarray(d["reward"])

    vt2, hp2, lo2 = jv.v_trace_both(*args, aoh, reward, **kw)
    for player in range(2):
        r_p = reward if player == 0 else -reward
        vt, hp, lo = jv.v_trace(
            *args, jv.player_others(args[2], args[1], player),
            aoh, r_p, player, **kw)
        np.testing.assert_array_equal(np.asarray(vt2[player]),
                                      np.asarray(vt))
        np.testing.assert_array_equal(np.asarray(hp2[player]),
                                      np.asarray(hp))
        np.testing.assert_array_equal(np.asarray(lo2[player]),
                                      np.asarray(lo))


@pytest.mark.parametrize("seed", [0, 3])
def test_process_policy_parity(seed):
    d = make_batch(seed)
    ref = tv.process_policy(torch.tensor(d["pi"]), torch.tensor(d["legal"]),
                            32, 0.03)
    out = jv.process_policy(jnp.asarray(d["pi"]), jnp.asarray(d["legal"]),
                            32, 0.03)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-6)


def test_loss_v_parity_and_grad():
    d = make_batch(4)
    v_t = torch.tensor(d["v"], requires_grad=True)
    tgt = torch.tensor(np.random.default_rng(5).normal(
        size=d["v"].shape).astype(np.float32))
    mask = torch.tensor(d["valid"] * (d["player_id"] == 0))
    ref = tv.get_loss_v([v_t], [tgt], [mask])
    ref.backward()

    def jloss(v):
        return jv.get_loss_v([v], [jnp.asarray(tgt.numpy())],
                             [jnp.asarray(mask.numpy())])

    val, grad = jax.value_and_grad(jloss)(jnp.asarray(d["v"]))
    np.testing.assert_allclose(float(val), float(ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(grad), v_t.grad.numpy(), atol=1e-6)


def test_loss_nerd_parity_and_grad():
    d = make_batch(6)
    rng = np.random.default_rng(7)
    logits_np = rng.normal(size=d["pi"].shape).astype(np.float32)
    q_vr = [rng.normal(size=d["pi"].shape).astype(np.float32)
            for _ in range(2)]
    is_c = np.ones_like(d["valid"])[..., None]

    lt = torch.tensor(logits_np, requires_grad=True)
    ref = tv.get_loss_nerd(
        [lt, lt], [torch.tensor(d["pi"])] * 2,
        [torch.tensor(q) for q in q_vr], torch.tensor(d["valid"]),
        torch.tensor(d["player_id"]), torch.tensor(d["legal"]),
        [torch.tensor(is_c)] * 2, clip=100.0, threshold=2.0)
    ref.backward()

    def jloss(logits):
        return jv.get_loss_nerd(
            [logits, logits], [jnp.asarray(d["pi"])] * 2,
            [jnp.asarray(q) for q in q_vr], jnp.asarray(d["valid"]),
            jnp.asarray(d["player_id"]), jnp.asarray(d["legal"]),
            [jnp.asarray(is_c)] * 2, clip=100.0, threshold=2.0)

    val, grad = jax.value_and_grad(jloss)(jnp.asarray(logits_np))
    np.testing.assert_allclose(float(val), float(ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(grad), lt.grad.numpy(), atol=1e-6)


def test_has_played_parity():
    d = make_batch(8)
    for player in (0, 1):
        ref = tv._has_played(torch.tensor(d["valid"]),
                             torch.tensor(d["player_id"]), player)
        out = jv.has_played(jnp.asarray(d["valid"]),
                            jnp.asarray(d["player_id"]), player)
        np.testing.assert_allclose(np.asarray(out),
                                   ref.numpy().astype(np.float32), atol=0)


def test_vtrace_extreme_is_ratios_stay_finite():
    """f32 overflow guard: huge pi/mu tail ratios across several opponent
    steps must not produce inf/NaN in the learning outputs (observed at
    131k-lane batches on million-node trees)."""
    T, B, A = 9, 4, 3
    valid = np.ones((T, B), np.float32)
    player_id = np.tile((np.arange(T) % 2)[:, None], (1, B)).astype(np.int64)
    legal = np.ones((T, B, A), np.float32)
    mu = np.full((T, B, A), 1e-8, np.float32)
    mu[..., 0] = 1.0 - 2e-8
    actions_oh = np.zeros((T, B, A), np.float32)
    actions_oh[..., 1] = 1.0  # always the 1e-8-probability action
    pi = np.full((T, B, A), 1.0 / 3, np.float32)
    reward = np.ones((T, B), np.float32)
    v = np.ones((T, B, 1), np.float32)
    log_pi_reg = np.zeros((T, B, A), np.float32)

    for player in (0, 1):
        v_t, played, lo = jv.v_trace(
            jnp.asarray(v), jnp.asarray(valid), jnp.asarray(player_id),
            jnp.asarray(mu), jnp.asarray(pi), jnp.asarray(log_pi_reg),
            jv.player_others(jnp.asarray(player_id), jnp.asarray(valid),
                             player),
            jnp.asarray(actions_oh), jnp.asarray(reward), player,
            eta=0.2)
        assert np.isfinite(np.asarray(v_t)).all()
        assert np.isfinite(np.asarray(lo)).all()
        loss = jv.get_loss_nerd(
            [jnp.zeros((T, B, A))] * 2, [jnp.asarray(pi)] * 2,
            [lo, lo], jnp.asarray(valid), jnp.asarray(player_id),
            jnp.asarray(legal), [jnp.ones((T, B, 1))] * 2)
        assert np.isfinite(float(loss))
