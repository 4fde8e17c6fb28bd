"""NashConv tests.

Cornerstone invariant (reference tests/test_nashconv.py): the generator's
stored exact solution must have NashConv 0.  Additional checks: agreement
with an independent recursive best-response oracle, reach-probability
conservation, and exploitability of the uniform policy.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rnad_tpu.config import ShapingRule, TreeConfig
from rnad_tpu.env import tree as tree_lib
from rnad_tpu.metrics import nashconv as nc


def recursive_best_response(tree, joint_policy):
    """Independent oracle: plain numpy DFS computing per-node best-response
    values (same contract as reference util/metric.py:93-175)."""
    A = tree.max_actions
    index = np.asarray(tree.index)
    value = np.asarray(tree.value, dtype=np.float64)
    chance = np.asarray(tree.chance, dtype=np.float64)
    legal = np.asarray(tree.legal, dtype=np.float64)
    pol = np.asarray(joint_policy, dtype=np.float64)
    S = index.shape[0]
    row_best = np.zeros(S)
    col_best = np.zeros(S)

    def visit(s):
        pr = pol[s, :A] * legal[s, 0, :, 0]
        pc = pol[s, A:] * legal[s, 0, 0, :]
        rb_mat = np.zeros((A, A))
        cb_mat = np.zeros((A, A))
        for t in range(chance.shape[1]):
            for r in range(A):
                for c in range(A):
                    p = chance[s, t, r, c]
                    if p <= 0:
                        continue
                    child = index[s, t, r, c]
                    if child == 0:
                        rb, cb = value[s, t, r, c], -value[s, t, r, c]
                    else:
                        visit(child)
                        rb, cb = row_best[child], col_best[child]
                    rb_mat[r, c] += p * rb
                    cb_mat[r, c] += p * cb
        lr = legal[s, 0, :, 0] > 0
        lc = legal[s, 0, 0, :] > 0
        row_best[s] = (rb_mat @ pc)[lr].max()
        col_best[s] = (pr @ cb_mat)[lc].max()

    visit(1)
    return row_best, col_best


def test_solution_nashconv_zero(small_tree):
    res = nc.nashconv(small_tree, small_tree.solution)
    assert abs(float(res.nashconv())) < 1e-5


def test_solution_nashconv_zero_stochastic():
    cfg = TreeConfig(max_actions=3, max_transitions=2,
                     transition_threshold=0.3, depth_bound=4,
                     depth_bound_rule=ShapingRule(delta=-1,
                                                  stochastic_delta=-2,
                                                  stochastic_prob=0.5))
    t = tree_lib.generate_tree(cfg, seed=2)
    res = nc.nashconv(t, t.solution)
    assert abs(float(res.nashconv())) < 1e-5


def test_matches_recursive_oracle(tiny_tree):
    t = tiny_tree
    rng = np.random.default_rng(0)
    legal_r = np.asarray(t.legal)[:, 0, :, 0]
    legal_c = np.asarray(t.legal)[:, 0, 0, :]
    pr = rng.random((t.size, t.max_actions)) * legal_r + 1e-3 * legal_r
    pc = rng.random((t.size, t.max_actions)) * legal_c + 1e-3 * legal_c
    pr /= np.maximum(pr.sum(-1, keepdims=True), 1e-30)
    pc /= np.maximum(pc.sum(-1, keepdims=True), 1e-30)
    joint = jnp.asarray(np.concatenate([pr, pc], -1), jnp.float32)

    res = nc.nashconv(t, joint)
    rb_ref, cb_ref = recursive_best_response(t, joint)
    live = np.asarray(t.depth) > 0
    np.testing.assert_allclose(np.asarray(res.row_best)[live], rb_ref[live],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.col_best)[live], cb_ref[live],
                               atol=1e-5)


def test_reach_probability_conservation(small_tree):
    """Each internal level's reach mass sums to the joint probability of
    reaching any internal node of that level; the root level is exactly 1 and
    level sums never exceed 1."""
    t = small_tree
    res = nc.nashconv(t, t.solution)
    reach = np.asarray(res.reach_probability)
    depth = np.asarray(t.depth)
    assert reach[1] == pytest.approx(1.0)
    for d in range(1, t.max_depth + 1):
        level_sum = reach[depth == d].sum()
        assert level_sum <= 1.0 + 1e-4
    # a regular tree (no stochastic depth) has every path hit every level
    level_sums = [reach[depth == d].sum() for d in range(1, t.max_depth + 1)]
    np.testing.assert_allclose(level_sums, 1.0, atol=1e-4)


def test_uniform_policy_is_exploitable(small_tree):
    t = small_tree
    lr = t.legal[:, 0, :, 0]
    lc = t.legal[:, 0, 0, :]
    uni = jnp.concatenate(
        [lr / jnp.maximum(lr.sum(-1, keepdims=True), 1.0),
         lc / jnp.maximum(lc.sum(-1, keepdims=True), 1.0)], -1)
    res = nc.nashconv(t, uni)
    assert float(res.nashconv()) > 0.05


def test_mean_nashconv_by_depth(small_tree):
    res = nc.nashconv(small_tree, small_tree.solution)
    means = nc.mean_nashconv_by_depth(small_tree, res)
    assert set(means) == set(range(1, small_tree.max_depth + 1))
    assert all(abs(v) < 1e-5 for v in means.values())


def test_matches_recursive_oracle_stochastic_depth():
    """Stochastic depth rules create edges that skip levels; the
    level-synchronous induction must still match the recursive oracle."""
    cfg = TreeConfig(max_actions=2, max_transitions=2,
                     transition_threshold=0.2, depth_bound=4,
                     depth_bound_rule=ShapingRule(delta=-1,
                                                  stochastic_delta=-2,
                                                  stochastic_prob=0.5))
    t = tree_lib.generate_tree(cfg, seed=4)
    rng = np.random.default_rng(1)
    legal_r = np.asarray(t.legal)[:, 0, :, 0]
    legal_c = np.asarray(t.legal)[:, 0, 0, :]
    pr = rng.random((t.size, t.max_actions)) * legal_r + 1e-3 * legal_r
    pc = rng.random((t.size, t.max_actions)) * legal_c + 1e-3 * legal_c
    pr /= np.maximum(pr.sum(-1, keepdims=True), 1e-30)
    pc /= np.maximum(pc.sum(-1, keepdims=True), 1e-30)
    joint = jnp.asarray(np.concatenate([pr, pc], -1), jnp.float32)

    res = nc.nashconv(t, joint)
    rb_ref, cb_ref = recursive_best_response(t, joint)
    live = np.asarray(t.depth) > 0
    np.testing.assert_allclose(np.asarray(res.row_best)[live], rb_ref[live],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.col_best)[live], cb_ref[live],
                               atol=1e-4)
