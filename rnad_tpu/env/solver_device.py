"""On-device batched approximate zero-sum solver (Regret Matching+).

The exact LP solver (env/solver.py, C++) runs on the host during tree
generation.  At pod scale — millions of nodes per level, or generation runs
colocated with training — an on-device solver avoids the host round-trip
entirely: RM+ with linear averaging converges to an epsilon-Nash of a matrix
game at O(1/T), entirely in batched XLA ops (one jit for a whole level).

This is the optional fast path envisioned in SURVEY.md §2.2; the exact-LP
path remains the default because the generator's stored solution doubles as
the test oracle (NashConv == 0 requires exactness).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("iters",))
def solve_zero_sum_rmplus(payoffs: jax.Array, legal_rows: jax.Array,
                          legal_cols: jax.Array, iters: int = 2000
                          ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched RM+ for zero-sum matrix games.

    Args:
      payoffs: (B, R, C) row-player payoffs.
      legal_rows: (B, R) {0,1} mask of active rows.
      legal_cols: (B, C) mask of active columns.
      iters: RM+ iterations (epsilon ~ O(1/iters)).

    Returns:
      (x (B, R), y (B, C), v (B,)): linear-averaged strategies (zero on
      illegal actions, summing to 1) and their bilinear value.
    """
    B, R, C = payoffs.shape
    lr = legal_rows.astype(payoffs.dtype)
    lc = legal_cols.astype(payoffs.dtype)
    # Zero out illegal cells so they never contribute utility.
    M = payoffs * lr[:, :, None] * lc[:, None, :]

    def normalize(q, legal):
        q = q * legal
        s = q.sum(-1, keepdims=True)
        uniform = legal / jnp.maximum(legal.sum(-1, keepdims=True), 1.0)
        return jnp.where(s > 0, q / jnp.maximum(s, 1e-30), uniform)

    def body(i, carry):
        qr, qc, xsum, ysum = carry
        x = normalize(qr, lr)
        y = normalize(qc, lc)
        u_r = jnp.einsum("brc,bc->br", M, y)  # row action utilities
        u_c = -jnp.einsum("br,brc->bc", x, M)  # col action utilities
        v_r = (x * u_r).sum(-1, keepdims=True)
        v_c = (y * u_c).sum(-1, keepdims=True)
        qr = jnp.maximum(qr + (u_r - v_r) * lr, 0.0)
        qc = jnp.maximum(qc + (u_c - v_c) * lc, 0.0)
        w = (i + 1).astype(M.dtype)  # linear averaging
        return qr, qc, xsum + w * x, ysum + w * y

    init = (jnp.zeros((B, R), M.dtype), jnp.zeros((B, C), M.dtype),
            jnp.zeros((B, R), M.dtype), jnp.zeros((B, C), M.dtype))
    _, _, xsum, ysum = jax.lax.fori_loop(0, iters, body, init)

    x = normalize(xsum, lr)
    y = normalize(ysum, lc)
    v = jnp.einsum("br,brc,bc->b", x, M, y)
    return x, y, v


def exploitability_batch(payoffs: jax.Array, x: jax.Array, y: jax.Array,
                         legal_rows: jax.Array, legal_cols: jax.Array
                         ) -> jax.Array:
    """(B,) max_r (M y)_r - min_c (x M)_c restricted to legal actions."""
    M = payoffs
    lr = legal_rows > 0
    lc = legal_cols > 0
    best_row = jnp.where(lr, jnp.einsum("brc,bc->br", M, y), -1e30).max(-1)
    worst_col = jnp.where(lc, jnp.einsum("br,brc->bc", x, M), 1e30).min(-1)
    return best_row - worst_col
