"""Fused Pallas rollout turn (ops/pallas_turn.py) — TPU-interpret mode on
CPU.

The kernel must honor the exact turn semantics of the gather path
(env/engine.py::rollout_from): same policy math, same transition/reward
convention, and — because the Gumbel noise is generated with the same
jax.random calls and key discipline — the same episodes bit-for-bit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnad_tpu.config import NetConfig
from rnad_tpu.env import engine
from rnad_tpu.models import common, nets
from rnad_tpu.ops import pallas_turn, stepping


@pytest.fixture(scope="module")
def setup(request):
    tree = request.getfixturevalue("small_tree")
    packed = stepping.make_packed_tables(tree)
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=32))
    variables = nets.init_variables(net, jax.random.PRNGKey(0), 3)
    return tree, packed, net, variables


def test_fused_turn_policy_matches_gather_path(setup):
    tree, packed, net, variables = setup
    B = 256
    indices = jnp.ones((B,), jnp.int32)
    k_act, k_ch = jax.random.split(jax.random.PRNGKey(7))
    g_act = jax.random.gumbel(k_act, (2 * B, 3), jnp.float32)
    g_ch = jax.random.gumbel(k_ch, (2, B), jnp.float32).T
    new_idx, policy, actions, rewards, values = pallas_turn.fused_turn(
        packed.rows, *pallas_turn.mlp_fused_weights(variables["params"], 3),
        indices, g_act, g_ch, A=3, T=2, interpret=True, tile=128)

    # reference policy/value via the gather path's own ops
    rows = stepping.lookup(packed, indices)
    row_obs, col_obs = stepping.slice_observations(packed, rows)
    obs2 = jnp.concatenate([row_obs, col_obs], axis=0)
    logits, value = nets.apply_eval(net, variables, obs2)
    row_mask, col_mask = stepping.slice_action_masks(packed, rows)
    legal = jnp.concatenate([row_mask, col_mask], axis=0)
    want_policy = common.masked_policy(logits, legal).reshape(2, B, 3)

    np.testing.assert_allclose(np.asarray(policy), np.asarray(want_policy),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(values),
                               np.asarray(value.reshape(2, B)), atol=1e-5)
    # sampled actions are legal
    legal2 = np.asarray(legal.reshape(2, B, 3))
    a = np.asarray(actions)
    assert (np.take_along_axis(legal2, a[..., None], -1) > 0).all()
    # transitions are tree-consistent: child of (root, a_r, a_c) cell
    idx_np = np.asarray(tree.index)[1]  # (T, A, A) children of the root
    for b in range(B):
        allowed = idx_np[:, a[0, b], a[1, b]]
        assert int(new_idx[b]) in set(int(x) for x in allowed)


def test_fused_rollout_bit_identical_to_gather_path(setup):
    """Same key => same episodes as env/engine.py::rollout_from (the noise
    enters through identical jax.random calls; categorical IS gumbel
    argmax).  In interpret mode both paths compute f32 on CPU, so even the
    stored float policy matches bitwise."""
    tree, packed, net, variables = setup
    B = 256
    key = jax.random.PRNGKey(3)
    init = jnp.ones((B,), jnp.int32)
    actor = lambda vs, obs: nets.apply_eval(net, vs, obs)

    want = engine.rollout_from(tree, actor, variables, key, init,
                               tree.max_depth, packed)
    got = pallas_turn.rollout_fused(packed, variables["params"], key, init,
                                    tree.max_depth, interpret=True,
                                    tile=128)
    for f in ("indices", "actions", "rewards"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f)), np.asarray(getattr(want, f)),
            err_msg=f)
    # float records agree to reduction order (the fused W0 matmul
    # associates differently than the net's separate dots)
    for f in ("values", "policy"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, f)), np.asarray(getattr(want, f)),
            rtol=1e-5, atol=1e-6, err_msg=f)


def test_fused_rollout_trajectory_contract(setup):
    tree, packed, net, variables = setup
    B = 256
    traj = pallas_turn.rollout_fused(
        packed, variables["params"], jax.random.PRNGKey(3),
        jnp.ones((B,), jnp.int32), tree.max_depth, interpret=True, tile=128)
    assert traj.num_half_steps == 2 * tree.max_depth
    assert traj.batch_size == B

    valid = np.asarray(traj.valid())
    rewards = np.asarray(traj.rewards)
    indices = np.asarray(traj.indices)
    assert (rewards[0::2] == 0).all()  # rewards only on col half-steps
    for t in range(2, traj.num_half_steps, 2):
        dead = indices[t - 1] == 0
        assert (indices[t][dead] == 0).all()  # absorbing stays absorbed
    assert (np.abs(rewards) <= 1.0 + 1e-6).all()
    assert ((rewards != 0) <= (valid > 0)).all()
