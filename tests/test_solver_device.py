"""On-device RM+ solver: epsilon-Nash quality vs the exact LP solver."""

import numpy as np

from rnad_tpu.env import solver, solver_device


def test_rmplus_approximates_lp():
    rng = np.random.default_rng(0)
    B, R, C = 64, 4, 4
    M = rng.normal(size=(B, R, C))
    rows = rng.integers(1, R + 1, B)
    cols = rng.integers(1, C + 1, B)
    lr = (np.arange(R)[None, :] < rows[:, None]).astype(np.float32)
    lc = (np.arange(C)[None, :] < cols[:, None]).astype(np.float32)

    x, y, v = solver_device.solve_zero_sum_rmplus(
        M.astype(np.float32), lr, lc, iters=4000)
    expl = np.asarray(solver_device.exploitability_batch(
        M.astype(np.float32), x, y, lr, lc))
    assert expl.max() < 2e-2

    _, _, v_exact = solver.solve_zero_sum_batch(M, rows, cols)
    np.testing.assert_allclose(np.asarray(v), v_exact, atol=2e-2)

    # strategies are distributions over legal actions
    xs = np.asarray(x)
    assert np.abs(xs.sum(-1) - 1).max() < 1e-5
    assert (xs * (1 - lr) == 0).all()


def test_rmplus_known_games():
    M = np.array([
        [[0.0, -1, 1], [1, 0, -1], [-1, 1, 0]],  # RPS
        [[2.0, 1, 0], [0, -1, 0], [0, 0, 0]],  # saddle value 0 (row0/col2)
    ], dtype=np.float32)
    lr = np.ones((2, 3), np.float32)
    lc = np.ones((2, 3), np.float32)
    x, y, v = solver_device.solve_zero_sum_rmplus(M, lr, lc, iters=6000)
    np.testing.assert_allclose(np.asarray(x)[0], [1 / 3] * 3, atol=5e-3)
    assert abs(float(v[0])) < 5e-3
    assert abs(float(v[1])) < 5e-3


def test_rmplus_joint_policy_near_nash(small_tree):
    """Playing the RM+ solution of each node's observed matrix is a
    near-exact whole-tree equilibrium (the net-free skyline of
    tools/distill_floor.py); per-node epsilons compound at most linearly
    with depth."""
    from rnad_tpu.metrics import nashconv as nashconv_lib

    joint = solver_device.joint_policy_rmplus(small_tree, iters=2000)
    result = nashconv_lib.nashconv_root(small_tree, joint)
    assert float(result.nashconv()) < 2e-2
