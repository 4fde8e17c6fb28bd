"""Tree generation tests: topology invariant, self-verifying solution
(the cornerstone invariant, reference tests/test_nashconv.py), determinism
and serialization round-trips."""

import numpy as np
import pytest

from rnad_tpu.config import ShapingRule, TreeConfig
from rnad_tpu.env import solver, tree as tree_lib


STOCHASTIC_CFG = TreeConfig(
    max_actions=3, max_transitions=2, transition_threshold=0.3,
    depth_bound=4,
    depth_bound_rule=ShapingRule(delta=-1, stochastic_delta=-2,
                                 stochastic_prob=0.5))


def test_invariants_regular(small_tree):
    tree_lib.validate(small_tree)


def test_invariants_stochastic():
    t = tree_lib.generate_tree(STOCHASTIC_CFG, seed=0)
    tree_lib.validate(t)
    assert t.max_depth == 4


def test_solution_is_node_equilibrium(small_tree):
    """Every stored per-node solution must be an exact NE of that node's own
    expected-value matrix."""
    t = small_tree
    A = t.max_actions
    sol = np.asarray(t.solution, dtype=np.float64)
    ev = np.asarray(t.expected_value, dtype=np.float64)[:, 0]
    lg = np.asarray(t.legal)[:, 0]
    for s in range(1, t.size):
        rows = int(lg[s, :, 0].sum())
        cols = int(lg[s, 0, :].sum())
        e = solver.exploitability(ev[s], sol[s, :A], sol[s, A:], rows, cols)
        assert abs(e) < 1e-5
        bil = sol[s, :rows] @ ev[s, :rows, :cols] @ sol[s, A:A + cols]
        assert abs(bil - float(t.root_value[s, 0])) < 1e-5


def test_determinism_and_hash():
    t1 = tree_lib.generate_tree(STOCHASTIC_CFG, seed=11)
    t2 = tree_lib.generate_tree(STOCHASTIC_CFG, seed=11)
    t3 = tree_lib.generate_tree(STOCHASTIC_CFG, seed=12)
    assert t1.hash == t2.hash
    assert t1.hash != t3.hash
    np.testing.assert_array_equal(np.asarray(t1.index), np.asarray(t2.index))
    np.testing.assert_array_equal(np.asarray(t1.value), np.asarray(t2.value))


def test_save_load_roundtrip(tmp_path, small_tree):
    from rnad_tpu.utils import checkpoint

    checkpoint.save_tree(small_tree, "unit", root=str(tmp_path))
    loaded = checkpoint.load_tree("unit", root=str(tmp_path))
    assert loaded.hash == small_tree.hash
    assert loaded.max_depth == small_tree.max_depth
    for k in tree_lib._ARRAY_FIELDS:
        np.testing.assert_array_equal(np.asarray(getattr(loaded, k)),
                                      np.asarray(getattr(small_tree, k)))
    recent = checkpoint.load_tree("recent", root=str(tmp_path))
    assert recent.hash == small_tree.hash


def test_absorbing_state_convention(small_tree):
    t = small_tree
    assert int(t.index[0].sum()) == 0
    assert float(t.chance[0, 0, 0, 0]) == 1.0
    assert float(t.legal[0, 0, 0, 0]) == 1.0
    assert int(t.depth[0]) == 0
    assert float(np.abs(np.asarray(t.value[0])).sum()) == 0.0


def test_shaping_rules_control_branching():
    cfg = TreeConfig(max_actions=4, max_transitions=1, depth_bound=3,
                     row_actions_rule=ShapingRule(delta=-1),
                     col_actions_rule=ShapingRule(delta=-1))
    t = tree_lib.generate_tree(cfg, seed=0)
    tree_lib.validate(t)
    lg = np.asarray(t.legal)[:, 0]
    depth = np.asarray(t.depth)
    # depth-2 nodes (children of the root) must have 3 legal actions each
    sel = depth == 2
    assert sel.any()
    assert (lg[sel].sum(axis=(1, 2)) == 9).all()


def test_native_treegen():
    """C++ level-synchronous generator: same invariants + exact solutions."""
    from rnad_tpu import native
    from rnad_tpu.metrics import nashconv as nc

    if native.get_solver_lib() is None:
        pytest.skip("native library unavailable")
    t = tree_lib.generate_tree_native(STOCHASTIC_CFG, seed=5)
    tree_lib.validate(t)
    res = nc.nashconv(t, t.solution)
    assert abs(float(res.nashconv())) < 1e-5
    t2 = tree_lib.generate_tree_native(STOCHASTIC_CFG, seed=5)
    assert t2.hash == t.hash
    t3 = tree_lib.generate_tree_native(STOCHASTIC_CFG, seed=6)
    assert t3.hash != t.hash


def test_index_cycle_rejected_before_depth():
    """A cyclic index tensor (possible only in malformed imported data) is
    rejected by the structural check — which the tree.tar importer runs
    BEFORE the depth fixpoint, so a bad tar raises instead of grinding."""
    import pytest

    # node 2 points back at node 1: a non-increasing edge (cycle enabler)
    index = np.zeros((3, 1, 2, 2), dtype=np.int32)
    index[1, 0, 0, 0] = 2
    index[2, 0, 0, 0] = 1
    with pytest.raises(AssertionError):
        tree_lib.assert_index_array_is_tree(index)


def test_equilibrium_selection_tree_oracle():
    """Trees generated with equilibrium_selection != 'vertex' must keep the
    exact-oracle invariants (stored solution is an NE at every node, values
    and hash unchanged) while actually changing the stored pick on
    degenerate nodes."""
    from rnad_tpu.config import ShapingRule
    from rnad_tpu.env import solver

    cfg = dict(max_actions=3, max_transitions=2, depth_bound=3,
               transition_threshold=0.3,
               depth_bound_rule=ShapingRule(delta=-1))
    base = tree_lib.generate_tree(TreeConfig(**cfg), seed=5)
    mixed = tree_lib.generate_tree(
        TreeConfig(equilibrium_selection="mixed", **cfg), seed=5)
    pure = tree_lib.generate_tree(
        TreeConfig(equilibrium_selection="pure", **cfg), seed=5)
    enum = tree_lib.generate_tree(
        TreeConfig(equilibrium_selection="enummixed", **cfg), seed=5)
    assert mixed.hash == base.hash == pure.hash == enum.hash
    np.testing.assert_array_equal(np.asarray(mixed.root_value),
                                  np.asarray(base.root_value))
    for t in (mixed, pure, enum):
        tree_lib.validate(t)
        # every stored solution is still an exact equilibrium of its node
        A = t.max_actions
        ev = np.asarray(t.expected_value[:, 0], np.float64)
        legal = np.asarray(t.legal)
        sol = np.asarray(t.solution, np.float64)
        for s in range(1, t.size):
            r = int(legal[s, 0, :, 0].sum())
            c = int(legal[s, 0, 0, :].sum())
            expl = solver.exploitability(ev[s], sol[s, :A], sol[s, A:], r, c)
            assert abs(expl) < 1e-5, s


def test_select_equilibria_postpass():
    """The f32 post-pass (for native/loaded trees) must keep every stored
    solution an exact equilibrium of its node, leave values/topology/hash
    untouched, and actually grow support on degenerate nodes (borderline
    degeneracy flags may differ from the f64 generation-time refinement, so
    per-entry equality with it is NOT required)."""
    cfg = TreeConfig(max_actions=3, max_transitions=2, depth_bound=3,
                     transition_threshold=0.3)
    base = tree_lib.generate_tree(cfg, seed=5)
    post = tree_lib.select_equilibria(base, "mixed")
    assert post.hash == base.hash
    np.testing.assert_array_equal(np.asarray(post.root_value),
                                  np.asarray(base.root_value))
    A = base.max_actions
    ev = np.asarray(base.expected_value[:, 0], np.float64)
    legal = np.asarray(base.legal)
    sol_b = np.asarray(base.solution, np.float64)
    sol_p = np.asarray(post.solution, np.float64)
    grew = 0
    for s in range(1, base.size):
        r = int(legal[s, 0, :, 0].sum())
        c = int(legal[s, 0, 0, :].sum())
        expl = solver.exploitability(ev[s], sol_p[s, :A], sol_p[s, A:], r, c)
        assert abs(expl) < 1e-4, s
        grew += int((sol_p[s] > 1e-3).sum() > (sol_b[s] > 1e-3).sum())
    assert grew > 0  # the pass did something on this (degenerate-rich) tree
