"""Exact zero-sum solver tests: known games, batch exploitability, and
native/numpy path agreement."""

import numpy as np
import pytest

from rnad_tpu.env import solver


def test_matching_pennies():
    M = np.array([[[1.0, -1.0], [-1.0, 1.0]]])
    x, y, v = solver.solve_zero_sum_batch(M, [2], [2])
    np.testing.assert_allclose(x[0], [0.5, 0.5], atol=1e-9)
    np.testing.assert_allclose(y[0], [0.5, 0.5], atol=1e-9)
    assert abs(v[0]) < 1e-9


def test_rock_paper_scissors():
    M = np.array([[[0.0, -1, 1], [1, 0, -1], [-1, 1, 0]]])
    x, y, v = solver.solve_zero_sum_batch(M, [3], [3])
    np.testing.assert_allclose(x[0], [1 / 3] * 3, atol=1e-9)
    np.testing.assert_allclose(y[0], [1 / 3] * 3, atol=1e-9)
    assert abs(v[0]) < 1e-9


def test_pure_saddle_point():
    M = np.array([[[2.0, 1.0], [0.0, -1.0]]])
    x, y, v = solver.solve_zero_sum_batch(M, [2], [2])
    np.testing.assert_allclose(x[0], [1.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(y[0], [0.0, 1.0], atol=1e-9)
    assert abs(v[0] - 1.0) < 1e-9


def test_degenerate_1x1_and_vectors():
    M = np.zeros((3, 3, 3))
    M[0, 0, 0] = 0.7
    M[1, 0, :3] = [0.5, -0.2, 0.9]  # 1x3: column player minimizes
    M[2, :3, 0] = [0.5, -0.2, 0.9]  # 3x1: row player maximizes
    x, y, v = solver.solve_zero_sum_batch(M, [1, 1, 3], [1, 3, 1])
    assert abs(v[0] - 0.7) < 1e-9
    assert abs(v[1] - (-0.2)) < 1e-9 and y[1][1] == pytest.approx(1.0)
    assert abs(v[2] - 0.9) < 1e-9 and x[2][2] == pytest.approx(1.0)


def test_random_batch_is_equilibrium():
    rng = np.random.default_rng(0)
    batch = 300
    M = rng.normal(size=(batch, 5, 5))
    rows = rng.integers(1, 6, batch)
    cols = rng.integers(1, 6, batch)
    x, y, v = solver.solve_zero_sum_batch(M, rows, cols)
    for b in range(batch):
        e = solver.exploitability(M[b], x[b], y[b], rows[b], cols[b])
        assert abs(e) < 1e-8
        # bilinear value consistency
        bil = x[b, : rows[b]] @ M[b, : rows[b], : cols[b]] @ y[b, : cols[b]]
        assert abs(bil - v[b]) < 1e-9
        # simplex membership
        assert abs(x[b].sum() - 1) < 1e-12 and (x[b] >= 0).all()
        assert abs(y[b].sum() - 1) < 1e-12 and (y[b] >= 0).all()


def test_native_matches_numpy_fallback():
    if solver.native.get_solver_lib() is None:
        pytest.skip("native solver unavailable")
    rng = np.random.default_rng(1)
    M = rng.normal(size=(50, 4, 4))
    rows = rng.integers(1, 5, 50)
    cols = rng.integers(1, 5, 50)
    xn, yn, vn = solver.native.solve_zero_sum_batch_native(
        M, rows.astype(np.int32), cols.astype(np.int32))
    xp, yp, vp = solver._solve_batch_numpy(M, rows, cols)
    np.testing.assert_allclose(vn, vp, atol=1e-9)
    np.testing.assert_allclose(xn, xp, atol=1e-9)
    np.testing.assert_allclose(yn, yp, atol=1e-9)


def test_degenerate_tie_break_documented_divergence():
    """Equilibrium SELECTION on degenerate games diverges from the
    reference by design (documented in env/solver.py and PARITY.md 1d'):
    the reference stores the most-mixed enummixed solution (reference
    tree.py:226-231); the LP simplex returns one optimal vertex, typically
    pure.  This test pins both halves of the claim: the returned solution
    on a fully degenerate game IS pure (the divergence is real), and it is
    still an exact equilibrium of the correct value (the divergence is
    harmless)."""
    # all-zero game: EVERY strategy pair is an equilibrium; the reference
    # would store the uniform (most mixed) one
    M = np.zeros((1, 3, 3))
    x, y, v = solver.solve_zero_sum_batch(M, np.array([3]), np.array([3]))
    assert abs(v[0]) < 1e-12
    assert abs(solver.exploitability(M[0], x[0], y[0], 3, 3)) < 1e-8
    # vertex selection: a pure strategy for at least one seat (reference
    # would return mixed here) — if this ever starts failing, the solver
    # gained a tie-break and PARITY.md 1d' should be updated
    assert (np.isclose(x[0], 1.0).any() or np.isclose(y[0], 1.0).any())

    # degenerate but non-trivial: duplicated rows (battle of attrition on
    # identical options) — still exact, value preserved
    rng = np.random.default_rng(5)
    base = rng.normal(size=(1, 4))
    M2 = np.repeat(base, 4, axis=0)[None]  # rank-1: all rows identical
    x2, y2, v2 = solver.solve_zero_sum_batch(M2, np.array([4]), np.array([4]))
    assert abs(solver.exploitability(M2[0], x2[0], y2[0], 4, 4)) < 1e-8
    assert abs(v2[0] - base.min()) < 1e-9  # column player picks min column


def test_dual_degenerate_matrix_regression():
    """Regression: this 5x5 near-degenerate matrix (found by treegen on a
    1.4M-node generation run) used to fail the native solver with status 5
    — the optimal tableau is dual-degenerate, so the row strategy cannot be
    read off the reduced costs.  Both paths must now solve it exactly and
    bit-identically (division-form pivots + -ffp-contract=off keep the
    pivot sequences in lockstep; transposed-game recovery reads the row
    strategy when the duals vanish)."""
    M = np.array([
        [-1, 1, -1, -1, 1],
        [-1.0000000298023224, 1, -1, -1, -1.0000000298023224],
        [-1, 1, 1, -1, 1],
        [-1, -1, 1, -1, 1.0000000298023224],
        [1, -1, -1, -1, -0.17467156052589417]])[None]
    rows = np.array([5])
    cols = np.array([5])
    x, y, v = solver._solve_batch_numpy(M, rows, cols)
    assert abs(solver.exploitability(M[0], x[0], y[0], 5, 5)) < 1e-8
    assert abs(v[0] + 1.0) < 1e-9
    if solver.native.get_solver_lib() is not None:
        xn, yn, vn = solver.native.solve_zero_sum_batch_native(
            M, rows.astype(np.int32), cols.astype(np.int32))
        np.testing.assert_array_equal(x, xn)
        np.testing.assert_array_equal(y, yn)
        np.testing.assert_array_equal(v, vn)


def test_degenerate_integer_games_pivot_identical():
    """Ternary {-1,0,1} payoff games are maximally degenerate (massive
    equilibrium polytopes, constant ratio-test ties): 200 of them must
    solve exactly on both paths with bit-identical strategies."""
    if solver.native.get_solver_lib() is None:
        pytest.skip("native solver unavailable")
    rng = np.random.default_rng(3)
    for trial in range(200):
        A = int(rng.integers(2, 6))
        M = rng.integers(-1, 2, size=(1, A, A)).astype(float)
        r, c = np.array([A]), np.array([A])
        x1, y1, v1 = solver._solve_batch_numpy(M, r, c)
        x2, y2, v2 = solver.native.solve_zero_sum_batch_native(
            M, r.astype(np.int32), c.astype(np.int32))
        np.testing.assert_array_equal(x1, x2, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(y1, y2, err_msg=f"trial {trial}")
        assert abs(solver.exploitability(M[0], x1[0], y1[0], A, A)) < 1e-8


def test_equilibrium_selection_mixed_max_support():
    """'mixed' must return the maximal-support point of the optimal face
    (the reference comment's "favor mixed over pure" intent).  On the
    all-zero game every strategy is optimal, so the refined pick must have
    full support; on a game with a unique equilibrium it must not move."""
    M = np.zeros((2, 3, 3))
    M[1] = [[0.0, -1.0, 1.0], [1.0, 0.0, -1.0], [-1.0, 1.0, 0.0]]  # RPS
    rows = np.array([3, 3])
    cols = np.array([3, 3])
    x, y, v = solver.solve_zero_sum_batch(M, rows, cols)
    xm, ym = solver.refine_equilibrium_batch(M, rows, cols, x, y, v, "mixed")
    for s in range(2):
        assert abs(solver.exploitability(M[s], xm[s], ym[s], 3, 3)) < 1e-6, s
    # all-zero game: full support both sides (the vertex pick was pure)
    assert (xm[0] > 0.01).all() and (ym[0] > 0.01).all()
    # RPS: unique equilibrium, selection is a no-op
    np.testing.assert_allclose(xm[1], x[1], atol=1e-9)
    np.testing.assert_allclose(ym[1], y[1], atol=1e-9)


def test_equilibrium_selection_pure_prefers_saddle():
    """'pure' must store the first pure saddle point when one exists (the
    reference CODE's purity sort puts pure solutions first) and keep the
    vertex when none does."""
    # row 1 dominates: saddle at (1, 1) (0-indexed); value 1 at M[1,1]=1?
    M = np.zeros((2, 3, 3))
    M[0] = [[0.0, -1.0, 2.0], [3.0, 1.0, 2.0], [-2.0, -1.0, 0.0]]
    M[1] = [[0.0, -1.0, 1.0], [1.0, 0.0, -1.0], [-1.0, 1.0, 0.0]]  # RPS
    rows = np.array([3, 3])
    cols = np.array([3, 3])
    x, y, v = solver.solve_zero_sum_batch(M, rows, cols)
    xp, yp = solver.refine_equilibrium_batch(M, rows, cols, x, y, v, "pure")
    assert abs(v[0] - 1.0) < 1e-9
    np.testing.assert_allclose(xp[0], [0.0, 1.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(yp[0], [0.0, 1.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(xp[1], x[1], atol=1e-12)  # RPS: no saddle


def test_equilibrium_selection_random_batch_still_equilibria():
    """Both selection modes must return exact equilibria of the unchanged
    game value on random (often degenerate) integer games."""
    rng = np.random.default_rng(11)
    B, A = 200, 4
    M = rng.integers(-2, 3, size=(B, A, A)).astype(np.float64)
    rows = rng.integers(1, A + 1, size=B)
    cols = rng.integers(1, A + 1, size=B)
    x, y, v = solver.solve_zero_sum_batch(M, rows, cols)
    for mode in ("pure", "mixed"):
        xr, yr = solver.refine_equilibrium_batch(M, rows, cols, x, y, v,
                                                 mode)
        for b in range(B):
            r, c = int(rows[b]), int(cols[b])
            expl = solver.exploitability(M[b], xr[b], yr[b], r, c)
            assert abs(expl) < 1e-6, (mode, b, expl)
            vv = xr[b, :r] @ M[b, :r, :c] @ yr[b, :c]
            assert abs(vv - v[b]) < 1e-6, (mode, b)
            # padding stays zero
            assert np.all(xr[b, r:] == 0) and np.all(yr[b, c:] == 0)


def test_enumerate_equilibria_known_games():
    """enumerate_equilibria (pygambit enummixed_solve's zero-sum
    equivalent, reference tree.py:211-224): every ext(X*) x ext(Y*) pair
    is an exact equilibrium; known games give the known vertex sets."""
    # all-zero 2x2: every strategy optimal -> vertices are the corners
    xs, ys, v = solver.enumerate_equilibria(np.zeros((2, 2)))
    assert abs(v) < 1e-12 and len(xs) == 2 and len(ys) == 2
    got = sorted(tuple(np.round(x, 6)) for x in xs)
    assert got == [(0.0, 1.0), (1.0, 0.0)]

    # matching pennies: unique fully-mixed equilibrium
    xs, ys, v = solver.enumerate_equilibria(
        np.array([[1.0, -1.0], [-1.0, 1.0]]))
    assert len(xs) == 1 and len(ys) == 1
    np.testing.assert_allclose(xs[0], [0.5, 0.5], atol=1e-9)
    np.testing.assert_allclose(ys[0], [0.5, 0.5], atol=1e-9)

    # row player has a dominant strategy but the column face is an edge:
    # M = [[1, 1], [0, 2]]: x* = e1 unique, every y optimal
    xs, ys, v = solver.enumerate_equilibria(
        np.array([[1.0, 1.0], [0.0, 2.0]]))
    assert abs(v - 1.0) < 1e-12
    assert len(xs) == 1 and len(ys) == 2
    np.testing.assert_allclose(xs[0], [1.0, 0.0], atol=1e-9)


def test_enumerate_equilibria_random_all_pairs_exact():
    """On random degenerate-prone integer games, every enumerated pair is
    an exact equilibrium of the LP value, and the list is deterministic."""
    rng = np.random.default_rng(5)
    for trial in range(60):
        A = int(rng.integers(2, 5))
        M = rng.integers(-1, 2, size=(A, A)).astype(np.float64)
        xs, ys, v = solver.enumerate_equilibria(M)
        assert xs and ys
        for x in xs:
            for y in ys:
                assert abs(solver.exploitability(M, x, y, A, A)) < 1e-7, \
                    (trial, M)
        xs2, ys2, _ = solver.enumerate_equilibria(M)
        assert len(xs) == len(xs2) and len(ys) == len(ys2)
        for a, b in zip(xs, xs2):
            np.testing.assert_array_equal(a, b)


def test_equilibrium_selection_enummixed_purity_pick():
    """'enummixed' reproduces the reference's stored pick semantics: the
    purity sort places the purest enumerated equilibrium first
    (reference tree.py:226-234), and every refined node remains an exact
    equilibrium of the unchanged value."""
    rng = np.random.default_rng(7)
    B, A = 120, 4
    M = rng.integers(-1, 2, size=(B, A, A)).astype(np.float64)
    rows = rng.integers(2, A + 1, size=B)
    cols = rng.integers(2, A + 1, size=B)
    x, y, v = solver.solve_zero_sum_batch(M, rows, cols)
    xr, yr = solver.refine_equilibrium_batch(M, rows, cols, x, y, v,
                                             "enummixed")
    pure = lambda z: z.max() > 1.0 - 1e-9
    for b in range(B):
        r, c = int(rows[b]), int(cols[b])
        assert abs(solver.exploitability(M[b], xr[b], yr[b], r, c)) < 1e-6
        assert abs(xr[b, :r] @ M[b, :r, :c] @ yr[b, :c] - v[b]) < 1e-6
        # purity maximality: if the enumeration contains a both-pure
        # equilibrium, the stored pick must be both-pure
        xs, ys, _ = solver.enumerate_equilibria(M[b], r, c)
        if any(pure(xx) for xx in xs) and any(pure(yy) for yy in ys):
            # both-pure pairs exist only if SOME pure x pairs with SOME
            # pure y; in zero-sum every pairing is an equilibrium, so
            # this is exactly that condition
            assert pure(xr[b, :r]) and pure(yr[b, :c]), b
