"""Rollout engine tests: reward placement, trajectory structure, determinism,
and the oracle pair — expected payoff of the stored exact solution equals the
stored root value (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnad_tpu.config import NetConfig
from rnad_tpu.env import engine
from rnad_tpu.models import nets


def test_solution_rollout_matches_root_value(small_tree):
    t = small_tree
    traj = engine._jit_rollout_tabular(t, t.solution, jax.random.PRNGKey(0),
                                       100_000, t.max_depth)
    returns = engine.episode_returns(traj)
    mc = float(returns.mean())
    se = float(returns.std() / np.sqrt(returns.shape[0]))
    assert abs(mc - float(t.root_value[1, 0])) < max(5 * se, 1e-3)


def test_trajectory_structure(small_tree):
    from rnad_tpu.ops import stepping

    t = small_tree
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=32))
    variables = nets.init_variables(net, jax.random.PRNGKey(1), 3)
    actor = lambda vs, obs: nets.apply_eval(net, vs, obs)
    traj = engine.rollout(t, actor, variables, jax.random.PRNGKey(2), 256)
    T = traj.num_half_steps
    assert T == 2 * t.max_depth

    turns = np.asarray(traj.turns)
    assert (turns[0::2] == 0).all() and (turns[1::2] == 1).all()

    # row half-steps carry no reward (reference episode.py:96-101)
    rewards = np.asarray(traj.rewards)
    assert (rewards[0::2] == 0).all()

    # all lanes start at the root
    indices = np.asarray(traj.indices)
    assert (indices[0] == 1).all()
    # row/col half-steps of a turn share the state index
    assert (indices[0::2] == indices[1::2]).all()

    # validity never resurrects: once invalid, stays invalid
    valid = np.asarray(traj.valid())
    assert (np.diff(valid, axis=0) <= 1e-6).all()

    # re-derived observations and masks match the tree tensors
    packed = stepping.make_packed_tables(t)
    obs, masks_j = engine.trajectory_observations(packed, traj)
    obs, masks = np.asarray(obs), np.asarray(masks_j)
    ev = np.asarray(t.expected_value)
    lg = np.asarray(t.legal)
    # even half-steps: row seat sees [expected_value, legal]
    np.testing.assert_allclose(obs[0, :, 0], ev[indices[0], 0], atol=0)
    np.testing.assert_allclose(obs[0, :, 1], lg[indices[0], 0], atol=0)
    # odd half-steps: col seat sees the negated transpose
    np.testing.assert_allclose(obs[1, :, 0],
                               -ev[indices[1], 0].transpose(0, 2, 1), atol=0)
    np.testing.assert_allclose(masks[0], lg[indices[0], 0, :, 0], atol=0)
    np.testing.assert_allclose(masks[1], lg[indices[1], 0, 0, :], atol=0)

    # behavior policy is a distribution over legal actions on valid steps
    pol = np.asarray(traj.policy)
    v = valid > 0
    assert np.abs(pol.sum(-1)[v] - 1).max() < 1e-5
    assert (pol[~(masks > 0)] == 0).all()

    # sampled actions are legal
    acts = np.asarray(traj.actions_oh())
    assert ((acts * masks).sum(-1)[v] == 1).all()

    # rewards appear exactly on transitions into the absorbing state:
    # a nonzero reward at t implies the lane is invalid at t+1
    nz = np.abs(rewards[:-1]) > 0
    assert (valid[1:][nz] == 0).all()


def test_rollout_determinism(small_tree):
    t = small_tree
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=32))
    variables = nets.init_variables(net, jax.random.PRNGKey(1), 3)
    actor = lambda vs, obs: nets.apply_eval(net, vs, obs)
    f = jax.jit(lambda k: engine.rollout(t, actor, variables, k, 64))
    t1 = f(jax.random.PRNGKey(5))
    t2 = f(jax.random.PRNGKey(5))
    t3 = f(jax.random.PRNGKey(6))
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool((a == b).all()), t1, t2))
    assert not bool((t1.actions == t3.actions).all())


def test_observation_seats(small_tree):
    """Column player sees the negated, transposed matrix
    (reference episode.py:62-68)."""
    t = small_tree
    from rnad_tpu.ops import stepping

    idx = jnp.array([1, 1, 2], jnp.int32)
    row_obs, col_obs = stepping.observe(t, idx)
    np.testing.assert_allclose(np.asarray(col_obs[0, 0]),
                               -np.asarray(row_obs[0, 0]).T, atol=0)
    np.testing.assert_allclose(np.asarray(col_obs[0, 1]),
                               np.asarray(row_obs[0, 1]).T, atol=0)


def test_terminal_lanes_idle_at_absorbing(tiny_tree):
    t = tiny_tree
    traj = engine._jit_rollout_tabular(t, t.solution, jax.random.PRNGKey(0),
                                       512, t.max_depth + 3)
    indices = np.asarray(traj.indices)
    # after max_depth turns every lane must be absorbed
    assert (indices[2 * t.max_depth:] == 0).all()
    # absorbed lanes yield zero rewards forever
    rewards = np.asarray(traj.rewards)
    assert (rewards[2 * t.max_depth:] == 0).all()


@pytest.mark.parametrize("A,T,depth", [(4, 4, 2), (8, 1, 2), (2, 3, 3)])
def test_engine_across_game_shapes(A, T, depth):
    """Rollout + learner consistency on wider/narrower action and chance
    spaces than the demo tree."""
    from rnad_tpu.config import NetConfig, RNaDConfig, TreeConfig
    from rnad_tpu.env import tree as tree_lib
    from rnad_tpu.learn import rnad as rnad_lib
    from rnad_tpu.metrics import nashconv as nc

    cfg = TreeConfig(max_actions=A, max_transitions=T,
                     transition_threshold=0.1, depth_bound=depth)
    t = tree_lib.generate_tree(cfg, seed=1)
    tree_lib.validate(t)
    assert abs(float(nc.nashconv(t, t.solution).nashconv())) < 1e-4

    traj = engine._jit_rollout_tabular(t, t.solution, jax.random.PRNGKey(0),
                                       20_000, t.max_depth)
    mc = float(engine.episode_returns(traj).mean())
    assert abs(mc - float(t.root_value[1, 0])) < 0.05

    rcfg = RNaDConfig(batch_size=32, eta=0.2, bounds=(1,), delta_m=(1,),
                      lr=1e-3, gamma_averaging=0.01, logit_clip=2.0)
    net_ = nets.build_net(NetConfig(type="MLP", max_actions=A, width=16))
    step, _, _, _ = rnad_lib.make_rnad_fns(net_, t, rcfg)
    state = rnad_lib.init_train_state(net_, jax.random.PRNGKey(0), A, rcfg)
    state, metrics = step(state, jnp.float32(0.5))
    assert np.isfinite(float(metrics["loss"]))


def test_rows_actor_rollout_equivalent(small_tree):
    """The seat-fused rows-actor (one matmul pair off the packed rows) must
    compute the same policy/value math as the generic obs-slice path up to
    matmul reduction order (zero kernel rows contribute exact x*0 terms,
    but the wider contraction may sum in a different order — observed <=1
    ulp on CPU), and the sampling shapes are unchanged, so the rolled
    episodes coincide except at measure-zero sampling ties (none at this
    seed)."""
    from rnad_tpu.ops import stepping

    t = small_tree
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=32))
    variables = nets.init_variables(net, jax.random.PRNGKey(1), 3)
    actor = lambda vs, obs: nets.apply_eval(net, vs, obs)
    packed = stepping.make_packed_tables(t)
    rows_actor = engine.make_mlp_rows_actor(net, packed)
    key = jax.random.PRNGKey(7)
    base = engine.rollout(t, actor, variables, key, 128, packed=packed)
    fast = engine.rollout(t, actor, variables, key, 128, packed=packed,
                          rows_actor=rows_actor)
    for name in ("indices", "actions", "rewards"):
        np.testing.assert_array_equal(np.asarray(getattr(fast, name)),
                                      np.asarray(getattr(base, name)),
                                      err_msg=name)
    np.testing.assert_allclose(np.asarray(fast.policy),
                               np.asarray(base.policy), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fast.values),
                               np.asarray(base.values),
                               rtol=1e-5, atol=1e-6)


def test_rows_actor_rejects_deep_mlp(small_tree):
    from rnad_tpu.ops import stepping

    t = small_tree
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=32,
                                   depth=2))
    packed = stepping.make_packed_tables(t)
    with pytest.raises(ValueError, match="depth=1"):
        engine.make_mlp_rows_actor(net, packed)


def test_rows_actor_rejects_non_mlp_and_bf16(small_tree):
    """The fast path encodes depth-1 f32 MLP assumptions; anything else
    must fail up front with a clear message, not an opaque KeyError or a
    silent f32 computation for a bf16 net."""
    from rnad_tpu.ops import stepping

    t = small_tree
    packed = stepping.make_packed_tables(t)
    conv = nets.build_net(NetConfig(type="ConvNet", max_actions=3,
                                    channels=4))
    with pytest.raises(ValueError, match="MLP"):
        engine.make_mlp_rows_actor(conv, packed)
    bf16 = nets.build_net(NetConfig(type="MLP", max_actions=3, width=32,
                                    compute_dtype="bfloat16"))
    with pytest.raises(ValueError, match="float32"):
        engine.make_mlp_rows_actor(bf16, packed)


def test_rollout_rejects_nonpositive_lane_chunks(small_tree):
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=32))
    variables = nets.init_variables(net, jax.random.PRNGKey(1), 3)
    actor = lambda vs, obs: nets.apply_eval(net, vs, obs)
    with pytest.raises(ValueError, match="lane_chunks"):
        engine.rollout(small_tree, actor, variables, jax.random.PRNGKey(0),
                       16, lane_chunks=0)


def test_lane_chunked_rollout_matches_manual_stitch(small_tree):
    """lane_chunks=k must equal k sequential sub-rollouts with the split
    keys, concatenated along lanes (the single-chip big-batch mode that
    keeps per-turn intermediates inside scoped memory, docs/PERF_ANALYSIS)."""
    t = small_tree
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=32))
    variables = nets.init_variables(net, jax.random.PRNGKey(1), 3)
    actor = lambda vs, obs: nets.apply_eval(net, vs, obs)
    key = jax.random.PRNGKey(9)
    chunked = engine.rollout(t, actor, variables, key, 128, lane_chunks=4)
    subkeys = jax.random.split(key, 4)
    parts = [engine.rollout_from(t, actor, variables, k,
                                 jnp.ones((32,), jnp.int32))
             for k in subkeys]
    manual = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=1), *parts)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool((a == b).all()), chunked, manual))


def test_stored_obs_matches_rederived(small_tree):
    """rollout(store_obs=True) must store exactly the observations/masks the
    packed-table re-derivation would produce, and the same episodes."""
    from rnad_tpu.ops import stepping

    t = small_tree
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=32))
    variables = nets.init_variables(net, jax.random.PRNGKey(1), 3)
    actor = lambda vs, obs: nets.apply_eval(net, vs, obs)
    packed = stepping.make_packed_tables(t)
    key = jax.random.PRNGKey(5)
    plain = engine.rollout(t, actor, variables, key, 128, packed=packed)
    stored = engine.rollout(t, actor, variables, key, 128, packed=packed,
                            store_obs=True)
    assert stored.obs is not None
    np.testing.assert_array_equal(np.asarray(stored.indices),
                                  np.asarray(plain.indices))
    np.testing.assert_array_equal(np.asarray(stored.actions),
                                  np.asarray(plain.actions))
    obs_re, masks_re = engine.trajectory_observations(packed, plain)
    obs_st, masks_st = engine.trajectory_observations(packed, stored)
    np.testing.assert_array_equal(np.asarray(obs_st), np.asarray(obs_re))
    np.testing.assert_array_equal(np.asarray(masks_st), np.asarray(masks_re))


def test_policy_minor_rollout_bit_exact(small_tree):
    """policy_minor=True stores the identical behavior policy transposed
    (T, A, B); everything else in the trajectory is bit-identical (the
    record layout cannot affect the episode dynamics), including through
    the lane-chunked restitch path."""
    from rnad_tpu.ops import stepping

    t = small_tree
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=32))
    variables = nets.init_variables(net, jax.random.PRNGKey(1), 3)
    actor = lambda vs, obs: nets.apply_eval(net, vs, obs)
    packed = stepping.make_packed_tables(t)
    key = jax.random.PRNGKey(11)
    for chunks in (1, 2):
        base = engine.rollout(t, actor, variables, key, 128, packed=packed,
                              store_obs=True, lane_chunks=chunks)
        minor = engine.rollout(t, actor, variables, key, 128, packed=packed,
                               store_obs=True, lane_chunks=chunks,
                               policy_minor=True)
        assert minor.policy_layout == "amb"
        assert minor.policy.shape == (base.policy.shape[0],
                                      base.policy.shape[2],
                                      base.policy.shape[1])
        assert minor.num_actions == 3
        np.testing.assert_array_equal(np.asarray(minor.policy_bma()),
                                      np.asarray(base.policy))
        np.testing.assert_array_equal(np.asarray(base.policy_amb()),
                                      np.asarray(minor.policy))
        for name in ("indices", "actions", "rewards", "values", "obs"):
            np.testing.assert_array_equal(np.asarray(getattr(minor, name)),
                                          np.asarray(getattr(base, name)),
                                          err_msg=f"{name} chunks={chunks}")


def test_policy_minor_lane_chunked_and_rows_actor(small_tree):
    """policy_minor composes with lane_chunks and the rows-actor: the
    batch-minor (T, A, B) policy record is the moveaxis of the (T, B, A)
    one, every other field is bitwise identical, and the chunked restitch
    places the lane axis correctly (axis 2 for the policy).  Guards the
    bench.py / bench_suite headline path flipped to policy_minor=True in
    round 4 (tools/rollout_probe.py measured +5.5%)."""
    from rnad_tpu.ops import stepping

    t = small_tree
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=32))
    variables = nets.init_variables(net, jax.random.PRNGKey(1), 3)
    actor = lambda vs, obs: nets.apply_eval(net, vs, obs)
    packed = stepping.make_packed_tables(t)
    ra = engine.make_mlp_rows_actor(net, packed)
    key = jax.random.PRNGKey(11)
    for chunks in (1, 4):
        pmin = engine.rollout(t, actor, variables, key, 128, packed=packed,
                              rows_actor=ra, policy_minor=True,
                              lane_chunks=chunks)
        base = engine.rollout(t, actor, variables, key, 128, packed=packed,
                              rows_actor=ra, policy_minor=False,
                              lane_chunks=chunks)
        assert pmin.policy_layout == "amb" and base.policy_layout == "bma"
        assert bool((jnp.moveaxis(pmin.policy, -1, -2)
                     == base.policy).all()), chunks
        for field in ("indices", "actions", "rewards", "values"):
            assert bool((getattr(pmin, field)
                         == getattr(base, field)).all()), (chunks, field)


def test_rows_actor_bf16_operands(small_tree):
    """The bf16-operand rows-actor (RNaDConfig.rollout_actor_dtype):
    logits equal the f32 path to bf16 rounding, the rolled trajectory is
    structurally valid, the stored policy is normalized over legal
    actions, and a default train step under the mode stays finite."""
    import jax.numpy as jnp

    from rnad_tpu.config import NetConfig, RNaDConfig
    from rnad_tpu.learn import rnad as rnad_lib
    from rnad_tpu.models import nets
    from rnad_tpu.ops import stepping

    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=32))
    packed = stepping.make_packed_tables(small_tree)
    variables = nets.init_variables(net, jax.random.PRNGKey(0), 3)
    rows = stepping.lookup(packed, jnp.arange(1, 33, dtype=jnp.int32))

    apply_f32 = engine.make_mlp_rows_actor(net, packed)(variables)
    apply_bf16 = engine.make_mlp_rows_actor(
        net, packed, compute_dtype=jnp.bfloat16)(variables)
    lg32, v32 = apply_f32(rows)
    lg16, v16 = apply_bf16(rows)
    assert lg16.dtype == jnp.float32  # f32 accumulation/outputs
    np.testing.assert_allclose(np.asarray(lg16), np.asarray(lg32),
                               atol=0.05, rtol=0.02)
    np.testing.assert_allclose(np.asarray(v16), np.asarray(v32), atol=0.05)

    cfg = RNaDConfig(batch_size=64, eta=0.2, bounds=(1,), delta_m=(2,),
                     lr=1e-3, gamma_averaging=0.01, logit_clip=2.0,
                     rollout_actor_dtype="bfloat16")
    train_step, rollout_jit, _, _ = rnad_lib.make_rnad_fns(
        net, small_tree, cfg)
    state = rnad_lib.init_train_state(net, jax.random.PRNGKey(0), 3, cfg)
    _, traj = rollout_jit(state)
    pol = np.asarray(traj.policy_bma())
    valid = np.asarray(traj.valid()) > 0
    np.testing.assert_allclose(pol[valid].sum(-1), 1.0, atol=1e-5)
    state, metrics = train_step(state, jnp.float32(0.5))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k

    with pytest.raises(ValueError, match="compute_dtype"):
        engine.make_mlp_rows_actor(net, packed, compute_dtype=jnp.float16)
