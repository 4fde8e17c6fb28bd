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


def rmplus_core(M: jax.Array, lr: jax.Array, lc: jax.Array, iters: int
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batch-minor RM+ core: M (R, C, B) payoffs with illegal cells already
    zeroed, lr (R, B) / lc (C, B) masks -> (x (R, B), y (C, B), v (B,)).

    Pure jnp ops on batch-minor arrays, so the same function body runs as
    the XLA path here AND as the Pallas kernel body
    (ops/pallas_rmplus.py), which keeps the loop carries in VMEM across
    all iterations instead of round-tripping HBM each one.
    """

    def normalize(q, legal):
        q = q * legal
        s = q.sum(0, keepdims=True)
        uniform = legal / jnp.maximum(legal.sum(0, keepdims=True), 1.0)
        return jnp.where(s > 0, q / jnp.maximum(s, 1e-30), uniform)

    def body(i, carry):
        qr, qc, xsum, ysum = carry
        # Alternating updates (the CFR+ schedule): the column player best
        # responds to the row player's *updated* strategy — empirically an
        # order of magnitude tighter than simultaneous updates at equal
        # iteration count (tests/test_solver_device.py).
        y = normalize(qc, lc)
        u_r = (M * y[None, :, :]).sum(1)      # (R, B) row action utilities
        v_r = (normalize(qr, lr) * u_r).sum(0, keepdims=True)
        qr = jnp.maximum(qr + (u_r - v_r) * lr, 0.0)
        x = normalize(qr, lr)
        u_c = -(M * x[:, None, :]).sum(0)     # (C, B) col action utilities
        v_c = (y * u_c).sum(0, keepdims=True)
        qc = jnp.maximum(qc + (u_c - v_c) * lc, 0.0)
        y = normalize(qc, lc)
        w = (i + 1).astype(M.dtype)  # linear averaging
        return qr, qc, xsum + w * x, ysum + w * y

    R, C, B = M.shape
    init = (jnp.zeros((R, B), M.dtype), jnp.zeros((C, B), M.dtype),
            jnp.zeros((R, B), M.dtype), jnp.zeros((C, B), M.dtype))
    _, _, xsum, ysum = jax.lax.fori_loop(0, iters, body, init)

    x = normalize(xsum, lr)
    y = normalize(ysum, lc)
    v = (x[:, None, :] * M * y[None, :, :]).sum((0, 1))
    return x, y, v


# RM+ execution path: "xla" | "pallas" | "auto" (Pallas on TPU — measured
# faster; XLA elsewhere).  See ops/pallas_rmplus.py.
_RMPLUS_MODE = ["auto"]


def set_rmplus_mode(mode: str) -> None:
    if mode not in ("xla", "pallas", "auto"):
        raise ValueError(mode)
    _RMPLUS_MODE[0] = mode


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

    The loop runs BATCH-MINOR: carries (R, B)/(C, B) and payoffs
    (R, C, B).  In the natural (B, R) layout every carry pads its tiny
    trailing action dim to the 128-lane tile (~25x memory blowup at A=5),
    and the fori_loop round-trips four such carries through HBM every
    iteration — at 128 iterations over a learner-sized batch that padded
    traffic dominated the whole EquiNet train step.  Batch-minor, the
    minor dim is the large B and the action dims ride the sublane axis.
    On TPU the loop additionally runs as a Pallas kernel whose carries
    never leave VMEM (ops/pallas_rmplus.py).
    """
    # Mode resolves at trace time (Python level), so it is a static part
    # of any enclosing jitted program; switching the mode after a program
    # is compiled does not retrace that program.
    mode = _RMPLUS_MODE[0]
    B, R, C = payoffs.shape
    on_tpu = jax.default_backend() == "tpu"
    if mode == "auto":
        # Measured crossover on v5e (tools/rmplus_probe.py, A=5, 128
        # iters): the XLA loop is LATENCY-bound — flat ~26 ms at any
        # batch (a ~0.2 ms/iteration floor from its sequential fused
        # kernels + HBM carry round-trips) — while the Pallas kernel is
        # work-bound (7.1 ms at 65k, 11.9 at 131k, 22.2 at 262k, 32.6 at
        # 393k).  Pallas wins below ~300k lanes (2-4x at rollout sizes);
        # above, the latency-bound XLA path is flat and cheaper.
        mode = ("pallas" if (on_tpu and max(R, C) <= 16
                             and 8 <= B <= 262_144)
                else "xla")
    return _solve_jit(payoffs, legal_rows, legal_cols, iters=iters,
                      mode=mode, interpret=not on_tpu)


@functools.partial(jax.jit,
                   static_argnames=("iters", "mode", "interpret"))
def _solve_jit(payoffs, legal_rows, legal_cols, iters: int, mode: str,
               interpret: bool):
    lr = legal_rows.astype(payoffs.dtype).T            # (R, B)
    lc = legal_cols.astype(payoffs.dtype).T            # (C, B)
    # Zero out illegal cells so they never contribute utility.
    M = (payoffs * legal_rows.astype(payoffs.dtype)[:, :, None]
         * legal_cols.astype(payoffs.dtype)[:, None, :]
         ).transpose(1, 2, 0)                          # (R, C, B)
    if mode == "pallas":
        from ..ops import pallas_rmplus

        x, y, v = pallas_rmplus.rmplus(M, lr, lc, iters,
                                       interpret=interpret)
    else:
        x, y, v = rmplus_core(M, lr, lc, iters)
    return x.T, y.T, v


def joint_policy_rmplus(tree, iters: int = 2000,
                        chunk: int = 200_000) -> jax.Array:
    """Both-seat joint policy (S, 2A) that plays the RM+ epsilon-Nash of
    each node's OBSERVED payoff matrix.

    The observation (ops/stepping.py::seat_observations, reference
    episode.py:62-68) is exactly the matrix whose Nash equilibrium is the
    node's stored solution, so this is the "just solve the observed game"
    policy — a net-free skyline for the capacity-floor table
    (tools/distill_floor.py): any architecture's floor is lower-bounded by
    ~0 only if it can implement an iterative solver; this shows what that
    limit is worth on a given tree.
    """
    S = tree.index.shape[0]
    outs = []
    n = min(chunk, S)
    for start in range(0, S, n):
        stop = min(start + n, S)
        ev = tree.expected_value[start:stop, 0]
        lg_r = tree.legal[start:stop, 0, :, 0]
        lg_c = tree.legal[start:stop, 0, 0, :]
        if stop - start < n:  # pad tail to the compiled shape
            pad = n - (stop - start)
            ev = jnp.pad(ev, ((0, pad), (0, 0), (0, 0)))
            lg_r = jnp.pad(lg_r, ((0, pad), (0, 0)))
            lg_c = jnp.pad(lg_c, ((0, pad), (0, 0)))
        x, y, _ = solve_zero_sum_rmplus(ev, lg_r, lg_c, iters=iters)
        outs.append(jnp.concatenate([x, y], axis=-1)[: stop - start])
    return jnp.concatenate(outs, axis=0)


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
