"""Pallas RM+ kernel (ops/pallas_rmplus.py) vs the XLA core — interpret
mode on CPU; the real-hardware win is recorded in docs/PERF_ANALYSIS.md."""

import jax
import jax.numpy as jnp
import numpy as np

from rnad_tpu.env import solver_device
from rnad_tpu.ops import pallas_rmplus


def _random_games(key, B, A):
    km, kr, kc = jax.random.split(key, 3)
    M = jax.random.uniform(km, (B, A, A), minval=-1.0, maxval=1.0)
    lr = (jax.random.uniform(kr, (B, A)) > 0.2).astype(jnp.float32)
    lc = (jax.random.uniform(kc, (B, A)) > 0.2).astype(jnp.float32)
    # at least one legal action per seat
    lr = lr.at[:, 0].set(1.0)
    lc = lc.at[:, 0].set(1.0)
    return M, lr, lc


def test_pallas_rmplus_matches_core():
    B, A, iters = 300, 5, 64  # non-multiple of the lane tile: exercises pad
    M, lrm, lcm = _random_games(jax.random.PRNGKey(0), B, A)
    Mz = (M * lrm[:, :, None] * lcm[:, None, :]).transpose(1, 2, 0)
    lr, lc = lrm.T, lcm.T
    x0, y0, v0 = solver_device.rmplus_core(Mz, lr, lc, iters)
    x1, y1, v1 = pallas_rmplus.rmplus(Mz, lr, lc, iters, interpret=True)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), atol=1e-6)


def test_pallas_rmplus_solution_quality():
    """The kernel's averaged strategies are an epsilon-Nash of each game
    (independent check through the exploitability oracle, not just parity
    with the core)."""
    B, A, iters = 128, 4, 512
    M, lrm, lcm = _random_games(jax.random.PRNGKey(7), B, A)
    Mz = (M * lrm[:, :, None] * lcm[:, None, :]).transpose(1, 2, 0)
    x, y, _ = pallas_rmplus.rmplus(Mz, lrm.T, lcm.T, iters, interpret=True)
    expl = solver_device.exploitability_batch(
        Mz.transpose(2, 0, 1), x.T, y.T, lrm, lcm)
    assert float(jnp.max(expl)) < 0.05


def test_rmplus_mode_switch_dispatches():
    """set_rmplus_mode('pallas') routes solve_zero_sum_rmplus through the
    kernel (interpret-compatible CPU run) and returns the XLA path's
    results within tolerance."""
    B, A, iters = 64, 3, 128
    M, lrm, lcm = _random_games(jax.random.PRNGKey(3), B, A)
    xs0, ys0, v0 = solver_device.solve_zero_sum_rmplus(M, lrm, lcm,
                                                       iters=iters)
    solver_device.set_rmplus_mode("pallas")
    try:
        xs1, ys1, v1 = solver_device.solve_zero_sum_rmplus(M, lrm, lcm,
                                                           iters=iters)
    finally:
        solver_device.set_rmplus_mode("auto")
    np.testing.assert_allclose(np.asarray(xs1), np.asarray(xs0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ys1), np.asarray(ys0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), atol=1e-6)
