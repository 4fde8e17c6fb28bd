"""Tests of the high-dimensional noisy observation transform — the
capability the reference's ``observations_noisy`` stub promises and never
implements (reference environment/episode.py:70-82; ops/obs_transform.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnad_tpu.config import NetConfig, ObsTransformConfig, RNaDConfig
from rnad_tpu.env import engine
from rnad_tpu.learn import rnad as rnad_lib
from rnad_tpu.models import nets
from rnad_tpu.ops import obs_transform as otf
from rnad_tpu.ops import stepping


def lift_cfg(**kw):
    base = dict(kind="lift", channels=4, sigma=0.25, bias_scale=1.0, seed=3)
    base.update(kw)
    return ObsTransformConfig(**base)


def rnad_cfg(**kw):
    base = dict(batch_size=64, eta=0.2, bounds=(2,), delta_m=(4,), lr=1e-3,
                gamma_averaging=0.01, logit_clip=2.0,
                obs_transform=lift_cfg())
    base.update(kw)
    return RNaDConfig(**base)


def test_lift_shape_legal_channel_and_determinism(small_tree):
    cfg = lift_cfg()
    tf = otf.make_obs_transform(cfg, small_tree.max_actions)
    row_obs, col_obs = stepping.seat_observations(
        small_tree.expected_value, small_tree.legal)
    obs = jnp.concatenate([row_obs, col_obs], axis=0)  # (2S, 2, A, A)

    out = tf(obs, None)
    A = small_tree.max_actions
    assert out.shape == (obs.shape[0], cfg.channels + 1, A, A)
    assert otf.out_channels(cfg) == cfg.channels + 1
    # channel 1 is the raw legal matrix — the framework-wide mask-slice
    # convention (Trajectory.obs; reference episode.py:208) survives
    np.testing.assert_array_equal(np.asarray(out[:, 1]),
                                  np.asarray(obs[:, 1]))
    # noise-free apply is deterministic; the raw payoff never appears
    np.testing.assert_array_equal(np.asarray(tf(obs, None)), np.asarray(out))
    lifted = np.asarray(out[:, [0] + list(range(2, cfg.channels + 1))])
    ev = np.asarray(obs[:, 0])
    assert not any(
        np.allclose(lifted[:, c], ev) for c in range(cfg.channels))

    # keyed apply adds noise to lifted channels only, fresh per key
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    n1, n2 = tf(obs, k1), tf(obs, k2)
    np.testing.assert_array_equal(np.asarray(n1[:, 1]), np.asarray(obs[:, 1]))
    assert not np.allclose(np.asarray(n1[:, 0]), np.asarray(n2[:, 0]))
    assert not np.allclose(np.asarray(n1[:, 0]), np.asarray(out[:, 0]))


def test_lift_is_information_preserving(small_tree):
    """Given the (public, seeded) transform parameters, the clean expected
    -value matrix is recoverable from the noise-free lift by least squares
    — the task the transform poses is well-posed, only harder."""
    cfg = lift_cfg(sigma=0.0)
    tf = otf.make_obs_transform(cfg, small_tree.max_actions)
    mix, bias = otf.transform_params(cfg, small_tree.max_actions)
    row_obs, _ = stepping.seat_observations(
        small_tree.expected_value, small_tree.legal)
    out = np.asarray(tf(row_obs, None))
    lifted = out[:, [0] + list(range(2, cfg.channels + 1))]  # (S, C, A, A)
    legal = out[:, 1]

    # per cell: lifted = mix @ [ev, legal] + bias  ->  solve for [ev, legal]
    rhs = (lifted - np.asarray(bias)).transpose(0, 2, 3, 1)[..., None]
    sol = np.linalg.lstsq(np.asarray(mix), rhs.reshape(-1, cfg.channels).T,
                          rcond=None)[0].T.reshape(out.shape[0],
                                                   *out.shape[2:], 2)
    np.testing.assert_allclose(sol[..., 0], np.asarray(row_obs[:, 0]),
                               atol=1e-4)
    np.testing.assert_allclose(sol[..., 1], legal, atol=1e-4)


def test_rollout_stores_transformed_obs(small_tree):
    """The stored trajectory obs are exactly the transformed view the actor
    saw: with sigma=0 they equal the noise-free transform of the re-derived
    raw observations; with sigma>0 the legal channel is still exact."""
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=16))
    packed = stepping.make_packed_tables(small_tree)

    for sigma in (0.0, 0.5):
        cfg = rnad_cfg(obs_transform=lift_cfg(sigma=sigma))
        _, rollout_jit, _, _ = rnad_lib.make_rnad_fns(net, small_tree, cfg)
        state = rnad_lib.init_train_state(net, jax.random.PRNGKey(0), 3, cfg)
        _, traj = rollout_jit(state)
        C = cfg.obs_transform.channels + 1
        assert traj.obs.shape[2] == C

        raw_traj = traj.replace(obs=None)
        raw_obs, raw_masks = engine.trajectory_observations(packed, raw_traj)
        obs, masks = engine.trajectory_observations(packed, traj)
        # mask slice of transformed stored obs == packed-table masks, exact
        np.testing.assert_array_equal(np.asarray(masks),
                                      np.asarray(raw_masks))
        if sigma == 0.0:
            tf = otf.make_obs_transform(cfg.obs_transform, 3)
            np.testing.assert_allclose(np.asarray(obs),
                                       np.asarray(tf(raw_obs, None)),
                                       rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("net_cfg", [
    NetConfig(type="MLP", max_actions=3, width=32),
    NetConfig(type="ConvNet", max_actions=3, channels=8, depth=1),
    NetConfig(type="EquiNet", max_actions=3, channels=8, depth=1),
])
def test_train_step_and_eval_under_noise(small_tree, net_cfg):
    """One default-config train step under the noisy transform for each
    compatible family, and the exact eval on the noise-free lift."""
    cfg = rnad_cfg()
    net = nets.build_net(net_cfg)
    train_step, _, _, nashconv_fn = rnad_lib.make_rnad_fns(
        net, small_tree, cfg)
    state = rnad_lib.init_train_state(net, jax.random.PRNGKey(0), 3, cfg)
    state, metrics = train_step(state, jnp.float32(0.5))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    val = float(nashconv_fn(state.variables_target).nashconv())
    assert np.isfinite(val) and val >= 0.0


def test_transform_gates(small_tree):
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=16))
    with pytest.raises(ValueError, match="store_rollout_obs"):
        rnad_lib.make_rnad_fns(net, small_tree,
                               rnad_cfg(store_rollout_obs=False))
    with pytest.raises(ValueError, match="rows_actor"):
        rnad_lib.make_rnad_fns(net, small_tree,
                               rnad_cfg(rollout_rows_actor="on"))
    equi = nets.build_net(NetConfig(type="EquiNet", max_actions=3,
                                    channels=8, solver_iters=16))
    with pytest.raises(ValueError, match="solver"):
        rnad_lib.make_rnad_fns(equi, small_tree, rnad_cfg())
    with pytest.raises(ValueError, match="kind"):
        otf.make_obs_transform(ObsTransformConfig(kind="wat"), 3)
    # config serialization round-trips through JSON (run params.json)
    cfg = rnad_cfg()
    back = RNaDConfig.from_json(cfg.to_json())
    assert back == cfg and back.obs_transform == cfg.obs_transform


def test_training_descends_under_noise(small_tree, tmp_path):
    """R-NaD still learns when the net never sees the raw payoff matrix:
    a short run on the small tree under the noisy lift must beat its own
    initial NashConv by a clear margin (the reference's stated purpose for
    observations_noisy — robustness to the credit-assignment problem)."""
    cfg = rnad_cfg(batch_size=256, bounds=(4,), delta_m=(80,), lr=2e-3,
                   gamma_averaging=0.05,
                   obs_transform=lift_cfg(sigma=0.15, channels=4))
    ncfg = NetConfig(type="MLP", max_actions=3, width=64)
    t = rnad_lib.RNaD(small_tree, cfg, ncfg, directory_name="noisyrun",
                      runs_root=str(tmp_path), seed=0)
    t.initialize()
    start = t.nashconv()
    t.run(max_updates=4, checkpoint_mod=10**9, expl_mod=1, log_mod=10**9)
    t.final_eval()
    # best-checkpoint semantics: the served policy is the curve's minimum
    # (short constant-lr schedules are U-shaped on the raw obs too)
    best = t.store.load_best_meta()["nashconv"]
    assert best < 0.75 * start, (start, best)
