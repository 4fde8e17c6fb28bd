"""Exact zero-sum matrix-game solving (batched).

Replaces the reference's per-node pygambit calls (reference
environment/tree.py:199-234) with a batched LP formulation.  Primary path is
the native C++ batched simplex (``csrc/solver.cpp``); the numpy fallback
implements the identical algorithm so results match across paths.

Because the games are zero-sum, any pair of LP-optimal strategies is a Nash
equilibrium (equilibrium exchangeability), and its bilinear value is the game
value — which is what makes the generator's stored solution an exact oracle
(NashConv == 0, reference tests/test_nashconv.py:28).

Documented divergence — equilibrium selection on degenerate games: when a
game has multiple equilibria the reference sorts its enummixed/lcp solution
list mixed-first and stores the most-mixed one (reference tree.py:226-231);
the simplex here returns a single optimal *vertex* of the LP polytope, which
for degenerate games is typically pure.  Both picks are exact equilibria of
the same value (exchangeability), so everything derived from the solution —
oracle payoffs, root values, NashConv==0 self-checks, best-response metrics
— is identical; only the stored strategy on degenerate nodes differs.  See
tests/test_solver.py::test_degenerate_tie_break_documented_divergence.
"""

from __future__ import annotations

import logging

import numpy as np

from .. import native

_EPS = 1e-11
_BLAND_AFTER = 256
_MAX_ITERS = 4096


def _solve_one_numpy(payoff: np.ndarray, rows: int, cols: int,
                     need_dual: bool = True):
    """Single-game simplex, mirroring csrc/solver.cpp exactly (including
    the division-form pivot, so both paths take identical pivot sequences,
    and the transposed-game recovery for dual-degenerate optima)."""
    M = payoff[:rows, :cols].astype(np.float64)
    if rows == 1 and cols == 1:
        return np.array([1.0]), np.array([1.0]), float(M[0, 0])
    k = 1.0 - M.min()
    m, n = rows, cols
    T = np.zeros((m + 1, n + m + 1))
    T[:m, :n] = M + k
    T[:m, n:n + m] = np.eye(m)
    T[:m, -1] = 1.0
    T[m, :n] = -1.0
    basis = list(range(n, n + m))

    iters = 0
    while True:
        iters += 1
        if iters > _MAX_ITERS:
            raise RuntimeError("simplex iteration limit")
        obj = T[m, : n + m].copy()
        bland = iters > _BLAND_AFTER
        # Entering column + ratio test; numerically "unbounded" columns
        # (possible only through degeneracy, since the shifted game is
        # bounded) are skipped, mirroring csrc/solver.cpp.
        enter = leave = -1
        while True:
            cand = np.nonzero(obj < -_EPS)[0]
            if cand.size == 0:
                enter = -1
                break
            enter = int(cand[0] if bland else cand[np.argmin(obj[cand])])
            col = T[:m, enter]
            pos = col > _EPS
            if pos.any():
                ratios = np.where(pos, T[:m, -1] / np.where(pos, col, 1.0),
                                  np.inf)
                best = ratios.min()
                ties = np.nonzero(ratios < best + _EPS)[0]
                leave = int(min(ties, key=lambda i: basis[i]))
                break
            obj[enter] = 0.0  # ban this column
        if enter < 0:
            break  # optimal
        piv = T[leave, enter]
        T[leave] /= piv
        for i in range(m + 1):
            if i != leave and T[i, enter] != 0.0:
                T[i] -= T[i, enter] * T[leave]
        basis[leave] = enter

    S = T[m, -1]
    if not S > _EPS:
        raise RuntimeError("degenerate game value")
    vprime = 1.0 / S
    y = np.zeros(cols)
    for i in range(m):
        if basis[i] < n:
            y[basis[i]] = T[i, -1] * vprime
    x = T[m, n:n + m] * vprime
    x = np.clip(x, 0.0, None)
    y = np.clip(y, 0.0, None)
    if y.sum() <= 0.0:
        raise RuntimeError("degenerate game value")
    y /= y.sum()
    if x.sum() <= 0.0:
        if need_dual:
            # Dual-degenerate optimum: the duals are unreadable but the
            # primal (basic) read-out always is, so solve the TRANSPOSED
            # game, whose primal side is our row player (csrc/solver.cpp
            # does the same).
            _, x, _ = _solve_one_numpy(
                np.ascontiguousarray(-M.T), cols, rows, need_dual=False)
        else:
            x = np.zeros(rows)
            x[0] = 1.0  # primal-only caller never reads this side
    x /= x.sum()
    v = float(x @ M @ y)
    return x, y, v


def _solve_batch_numpy(payoff, rows, cols):
    batch, max_r, max_c = payoff.shape
    row_strat = np.zeros((batch, max_r))
    col_strat = np.zeros((batch, max_c))
    values = np.zeros((batch,))
    for b in range(batch):
        x, y, v = _solve_one_numpy(payoff[b], int(rows[b]), int(cols[b]))
        row_strat[b, : x.size] = x
        col_strat[b, : y.size] = y
        values[b] = v
    return row_strat, col_strat, values


_warned = False


def solve_zero_sum_batch(payoff: np.ndarray, rows: np.ndarray,
                         cols: np.ndarray):
    """Solves a batch of zero-sum games exactly.

    Args:
      payoff: (batch, max_rows, max_cols) float array, row-player payoffs;
        entries beyond the active (rows[b], cols[b]) block are ignored.
      rows, cols: (batch,) int arrays of active sizes.

    Returns:
      (row_strat (batch, max_rows), col_strat (batch, max_cols),
       values (batch,)) as float64 arrays; strategies zero-padded.
    """
    global _warned
    payoff = np.asarray(payoff, dtype=np.float64)
    rows = np.asarray(rows, dtype=np.int32)
    cols = np.asarray(cols, dtype=np.int32)
    if payoff.ndim != 3:
        raise ValueError(f"payoff must be 3D, got {payoff.shape}")
    try:
        return native.solve_zero_sum_batch_native(payoff, rows, cols)
    except RuntimeError:
        if not _warned:
            logging.warning("falling back to numpy zero-sum solver")
            _warned = True
        return _solve_batch_numpy(payoff, rows, cols)


def exploitability(payoff: np.ndarray, x: np.ndarray, y: np.ndarray,
                   rows: int, cols: int) -> float:
    """max_r (M y)_r - min_c (x M)_c : zero iff (x, y) is a Nash equilibrium."""
    M = np.asarray(payoff, dtype=np.float64)[:rows, :cols]
    return float((M @ y[:cols]).max() - (x[:rows] @ M).min())
