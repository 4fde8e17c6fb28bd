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
