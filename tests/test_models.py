"""Model tests: shapes, masking semantics, init distribution, and the
equivalence of batched trajectory inference with per-step inference."""

import jax
import jax.numpy as jnp
import numpy as np

from rnad_tpu.config import NetConfig
from rnad_tpu.models import common, nets


def rand_obs(key, n, A=3):
    k1, k2 = jax.random.split(key)
    ev = jax.random.normal(k1, (n, 1, A, A))
    legal = (jax.random.uniform(k2, (n, 1, A, A)) < 0.8).astype(jnp.float32)
    legal = legal.at[:, :, 0, 0].set(1.0)
    return jnp.concatenate([ev, legal], axis=1)


def test_mlp_shapes_and_masking():
    A = 3
    net = nets.build_net(NetConfig(type="MLP", max_actions=A, width=64))
    variables = nets.init_variables(net, jax.random.PRNGKey(0), A)
    obs = rand_obs(jax.random.PRNGKey(1), 17, A)
    logits, value = nets.apply_eval(net, variables, obs)
    assert logits.shape == (17, A) and value.shape == (17,)
    legal = obs[:, 1, :, 0]
    pol = common.masked_policy(logits, legal)
    assert np.allclose(np.asarray(pol.sum(-1)), 1.0, atol=1e-6)
    assert (np.asarray(pol)[np.asarray(legal) == 0] == 0).all()
    logp = common.masked_log_policy(logits, legal)
    # log-policy is 0 (not -inf) on illegal actions (reference net.py:77)
    assert (np.asarray(logp)[np.asarray(legal) == 0] == 0).all()
    sel = np.asarray(legal) > 0
    np.testing.assert_allclose(np.asarray(jnp.exp(logp))[sel],
                               np.asarray(pol)[sel], atol=1e-4)


def test_convnet_shapes():
    A = 3
    net = nets.build_net(NetConfig(type="ConvNet", max_actions=A, channels=8,
                                   depth=2, batch_norm=True))
    variables = nets.init_variables(net, jax.random.PRNGKey(0), A)
    obs = rand_obs(jax.random.PRNGKey(1), 9, A)
    logits, value = nets.apply_eval(net, variables, obs)
    assert logits.shape == (9, A) and value.shape == (9,)
    (logits2, value2), mutated = nets.apply_train(net, variables, obs)
    assert "batch_stats" in mutated


import pytest


@pytest.mark.parametrize("solver_iters,solver_prime",
                         [(0, False), (16, False), (16, True)])
def test_equinet_equivariance(solver_iters, solver_prime):
    """EquiNet encodes the NE map's symmetry by construction: permuting the
    mover's actions (obs rows) by sigma and the opponent's (obs cols) by tau
    permutes the policy logits by sigma and leaves the value unchanged —
    including the RM+ solver-iterate input features, which are themselves
    equivariant."""
    A = 5
    net = nets.build_net(NetConfig(type="EquiNet", max_actions=A,
                                   channels=16, depth=3,
                                   solver_iters=solver_iters,
                                   solver_prime=solver_prime))
    variables = nets.init_variables(net, jax.random.PRNGKey(0), A)
    obs = rand_obs(jax.random.PRNGKey(1), 11, A)
    logits, value = nets.apply_eval(net, variables, obs)
    assert logits.shape == (11, A) and value.shape == (11,)

    rng = np.random.default_rng(3)
    sigma = jnp.asarray(rng.permutation(A))
    tau = jnp.asarray(rng.permutation(A))
    obs_p = obs[:, :, sigma, :][:, :, :, tau]
    logits_p, value_p = nets.apply_eval(net, variables, obs_p)
    np.testing.assert_allclose(np.asarray(logits_p),
                               np.asarray(logits[:, sigma]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(value_p), np.asarray(value),
                               atol=1e-5)


def test_equinet_primed_starts_at_solver():
    """With solver_prime, the heads are zero-initialized and the RM+ solve
    enters through unit gates, so the step-0 policy IS the solver's
    epsilon-Nash of the observed matrix and the step-0 value is its game
    value (models/nets.py::EquiNet primed heads)."""
    from rnad_tpu.env.solver_device import solve_zero_sum_rmplus
    from rnad_tpu.models import common

    A = 5
    net = nets.build_net(NetConfig(type="EquiNet", max_actions=A,
                                   channels=16, depth=2,
                                   solver_iters=32, solver_prime=True))
    variables = nets.init_variables(net, jax.random.PRNGKey(0), A)
    obs = rand_obs(jax.random.PRNGKey(1), 9, A)
    logits, value = nets.apply_eval(net, variables, obs)

    M = obs[:, 0]
    legal = obs[:, 1]
    lr, lc = legal.max(axis=2), legal.max(axis=1)
    xs, _, v = solve_zero_sum_rmplus(M, lr, lc, iters=32)
    policy = common.masked_policy(logits, lr)
    np.testing.assert_allclose(np.asarray(policy), np.asarray(xs), atol=1e-5)
    np.testing.assert_allclose(np.asarray(value), np.asarray(v), atol=1e-5)


def test_equinet_shared_solver_features_bitwise():
    """Precomputed solver_feats (nets.equinet_solver_features, shared by
    the learner's four net passes) must reproduce the in-forward solve
    bitwise — it is the SAME function on the same observations, just
    hoisted out."""
    A = 4
    net = nets.build_net(NetConfig(type="EquiNet", max_actions=A,
                                   channels=8, depth=2,
                                   solver_iters=24, solver_prime=True))
    variables = nets.init_variables(net, jax.random.PRNGKey(0), A)
    obs = rand_obs(jax.random.PRNGKey(2), 13, A)
    logits, value = nets.apply_eval(net, variables, obs)
    feats = nets.equinet_solver_features(net, obs)
    logits_s, value_s = nets.apply_eval(net, variables, obs,
                                        solver_feats=feats)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(logits_s))
    np.testing.assert_array_equal(np.asarray(value), np.asarray(value_s))


def test_crossconv_receptive_field():
    """A CrossConv output at (i, j) depends only on row i and column j of the
    input (the defining property, reference net.py:88-143)."""
    A = 3
    net = nets.CrossConv(max_actions=A, features=1)
    x = jnp.zeros((1, A, A, 1))
    variables = net.init(jax.random.PRNGKey(0), x)
    base = net.apply(variables, x)
    # perturb a cell off row 1 / col 1: output at (1, 1) must not change
    x2 = x.at[0, 0, 2, 0].set(5.0)
    out2 = net.apply(variables, x2)
    assert float(jnp.abs(out2[0, 1, 1, 0] - base[0, 1, 1, 0])) < 1e-6
    # perturb within row 1: output at (1, 1) must change
    x3 = x.at[0, 1, 2, 0].set(5.0)
    out3 = net.apply(variables, x3)
    assert float(jnp.abs(out3[0, 1, 1, 0] - base[0, 1, 1, 0])) > 1e-6


def test_torch_style_init_bounds():
    A = 3
    net = nets.build_net(NetConfig(type="MLP", max_actions=A, width=4096))
    variables = nets.init_variables(net, jax.random.PRNGKey(0), A)
    k = np.asarray(variables["params"]["policy_fc0"]["kernel"])
    bound = 1.0 / np.sqrt(2 * A * A)
    assert k.min() >= -bound and k.max() <= bound
    assert abs(k.mean()) < bound / 10  # roughly centered
    k1 = np.asarray(variables["params"]["policy_fc1"]["kernel"])
    bound1 = 1.0 / np.sqrt(4096)
    assert k1.min() >= -bound1 and k1.max() <= bound1


def test_trajectory_inference_matches_per_step(small_tree):
    """One batched (T*B) forward == per-timestep forwards (replaces the
    reference's Python time loop, net.py:64-85)."""
    from rnad_tpu.env import engine
    from rnad_tpu.learn.rnad import _forward_trajectory
    from rnad_tpu.ops import stepping

    t = small_tree
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=32))
    variables = nets.init_variables(net, jax.random.PRNGKey(0), 3)
    actor = lambda vs, obs: nets.apply_eval(net, vs, obs)
    traj = engine.rollout(t, actor, variables, jax.random.PRNGKey(1), 32)
    packed = stepping.make_packed_tables(t)
    observations, _ = engine.trajectory_observations(packed, traj)

    logits, v, _ = _forward_trajectory(net, variables, observations,
                                       train=False)
    for step in (0, 3, traj.num_half_steps - 1):
        l_s, v_s = nets.apply_eval(net, variables, observations[step])
        np.testing.assert_allclose(np.asarray(logits[step]), np.asarray(l_s),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(v[step]), np.asarray(v_s),
                                   atol=1e-6)


def test_bfloat16_compute_mode(small_tree):
    """Mixed precision: bf16 internals, f32 params and f32 head outputs;
    the fused train step stays finite."""
    import jax.numpy as jnp
    from rnad_tpu.config import RNaDConfig
    from rnad_tpu.learn import rnad as rnad_lib

    A = 3
    net = nets.build_net(NetConfig(type="MLP", max_actions=A, width=32,
                                   compute_dtype="bfloat16"))
    variables = nets.init_variables(net, jax.random.PRNGKey(0), A)
    assert variables["params"]["policy_fc0"]["kernel"].dtype == jnp.float32
    obs = rand_obs(jax.random.PRNGKey(1), 8, A)
    logits, value = nets.apply_eval(net, variables, obs)
    assert logits.dtype == jnp.float32 and value.dtype == jnp.float32

    cfg = RNaDConfig(batch_size=32, eta=0.2, bounds=(1,), delta_m=(1,),
                     lr=1e-3, gamma_averaging=0.01, logit_clip=2.0)
    train_step, _, _, _ = rnad_lib.make_rnad_fns(net, small_tree, cfg)
    state = rnad_lib.init_train_state(net, jax.random.PRNGKey(0), A, cfg)
    state, metrics = train_step(state, jnp.float32(0.5))
    assert np.isfinite(float(metrics["loss"]))


def test_masked_batchnorm_excludes_padding_rows():
    """MaskedBatchNorm: (a) with an all-ones mask it equals flax
    nn.BatchNorm bit-for-bit (same variable names: checkpoints
    interchangeable); (b) garbage in masked-out rows must not perturb the
    statistics applied to valid rows (the ADVICE round-1 BatchNorm
    contamination finding — fixed-length trajectories pad with
    absorbing-state rows)."""
    import flax.linen as nn
    from rnad_tpu.models.nets import MaskedBatchNorm

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (8, 3, 3, 4))

    ours = MaskedBatchNorm()
    ref = nn.BatchNorm(use_running_average=False, momentum=0.99,
                       epsilon=1e-5)
    v_ours = ours.init(rng, x, use_running_average=False)
    v_ref = ref.init(rng, x)
    y_ours, m_ours = ours.apply(v_ours, x, use_running_average=False,
                                mask=jnp.ones((8,)),
                                mutable=["batch_stats"])
    y_ref, m_ref = ref.apply(v_ref, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_ours), np.asarray(y_ref),
                               atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(m_ours["batch_stats"]["mean"]),
        np.asarray(m_ref["batch_stats"]["mean"]), atol=1e-6)

    # (b) poison the masked-out rows: valid-row outputs and the updated
    # running stats must be bit-identical to the clean-batch result
    mask = jnp.array([1, 1, 1, 1, 0, 0, 0, 0], jnp.float32)
    poisoned = x.at[4:].set(1e6)
    y_clean, m_clean = ours.apply(v_ours, x, use_running_average=False,
                                  mask=mask, mutable=["batch_stats"])
    y_pois, m_pois = ours.apply(v_ours, poisoned,
                                use_running_average=False, mask=mask,
                                mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(y_clean[:4]),
                                  np.asarray(y_pois[:4]))
    np.testing.assert_array_equal(
        np.asarray(m_clean["batch_stats"]["var"]),
        np.asarray(m_pois["batch_stats"]["var"]))


def test_convnet_masked_bn_step_changes_stats_correctly(small_tree):
    """The ConvNet trainer path feeds the valid mask through to BatchNorm:
    a batch whose padding rows are perturbed must produce identical
    batch_stats updates."""
    from rnad_tpu.config import RNaDConfig
    from rnad_tpu.learn import rnad as rnad_lib

    cfg = RNaDConfig(batch_size=16, eta=0.2, bounds=(1,), delta_m=(2,),
                     lr=1e-3, gamma_averaging=0.01, logit_clip=2.0)
    net = nets.build_net(NetConfig(type="ConvNet", max_actions=3,
                                   channels=4, depth=1, batch_norm=True))
    _, rollout_jit, learn_jit, _ = rnad_lib.make_rnad_fns(net, small_tree,
                                                          cfg)
    state = rnad_lib.init_train_state(net, jax.random.PRNGKey(0), 3, cfg)
    state, traj = rollout_jit(state)
    new_state, metrics = learn_jit(state, traj, jnp.float32(0.5))
    assert np.isfinite(float(metrics["loss"]))
    # stats moved away from init (mean 0 / var 1)
    bs = jax.tree.leaves(new_state.variables["batch_stats"])
    assert any(np.abs(np.asarray(b)).sum() > 0 for b in bs)


def test_mlp_multi_net_forward_matches_separate_applies():
    """The two-matmul 4-net forward (learner-step fast path) must equal
    four separate MLP applies: the block structure keeps heads and nets
    independent, so it is the same math."""
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=32))
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    params = [nets.init_variables(net, k, 3)["params"] for k in keys]
    obs = jax.random.normal(jax.random.PRNGKey(9), (64, 2, 3, 3))

    logits4, values4 = nets.mlp_multi_net_forward(net, params, obs)
    for i, p in enumerate(params):
        want_l, want_v = nets.apply_eval(net, {"params": p}, obs)
        np.testing.assert_allclose(np.asarray(logits4[:, i]),
                                   np.asarray(want_l), atol=1e-5)
        np.testing.assert_allclose(np.asarray(values4[:, i]),
                                   np.asarray(want_v), atol=1e-5)


def test_mlp_depth_extension():
    """depth=1 keeps the reference parameter names (checkpoint-compatible);
    deeper heads stack width-x-width hidden layers and stay masked."""
    A = 3
    shallow = nets.build_net(NetConfig(type="MLP", max_actions=A, width=32))
    v1 = nets.init_variables(shallow, jax.random.PRNGKey(0), A)
    assert sorted(v1["params"]) == ["policy_fc0", "policy_fc1",
                                    "value_fc0", "value_fc1"]

    deep = nets.build_net(NetConfig(type="MLP", max_actions=A, width=32,
                                    depth=3))
    v3 = nets.init_variables(deep, jax.random.PRNGKey(0), A)
    assert "policy_hidden2" in v3["params"] and "value_hidden2" in v3["params"]
    assert v3["params"]["policy_hidden1"]["kernel"].shape == (32, 32)

    obs = rand_obs(jax.random.PRNGKey(1), 9, A)
    logits, value = nets.apply_eval(deep, v3, obs)
    assert logits.shape == (9, A) and value.shape == (9,)
    assert np.isfinite(np.asarray(logits)).all()


def test_fused_weights_reject_deep_mlp():
    """mlp_fused_weights packs only the depth-1 reference MLP; deeper
    params must raise rather than silently compute a shallower net."""
    import pytest

    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=16,
                                   depth=2))
    v = nets.init_variables(net, jax.random.PRNGKey(0), 3)
    with pytest.raises(ValueError, match="depth=1"):
        nets.mlp_fused_weights(v["params"], 3)
