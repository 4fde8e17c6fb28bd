"""Pallas TPU kernel: the RM+ matrix-game solver loop with VMEM-resident
carries.

The batched RM+ solve (env/solver_device.py) is an iterative fixed-point
loop: four (action, B) carries updated ``iters`` times from a constant
(R, C, B) payoff block.  Lowered through XLA, a ``lax.fori_loop``'s carry
buffers live in HBM — every iteration re-reads and re-writes all four
(plus the payoff reads), so at solver-in-the-loop sizes (EquiNet
``solver_iters=128`` over a learner batch of T*B ~ 400k matrices) the
loop's HBM round-trips dominate its cost even after the batch-minor
layout fix.  The arithmetic itself is tiny.

This kernel tiles the batch axis on the grid and runs the ENTIRE loop for
each tile with all carries held in VMEM/registers: HBM traffic collapses
to one read of the payoff block and one write of the solution — i.e.
traffic is independent of ``iters``.  The kernel body calls the SAME
``rmplus_core`` the XLA path runs (pure jnp ops on batch-minor arrays),
so both paths are one source of truth; outputs match to float
reassociation (bitwise in interpret mode —
tests/test_solver_device.py::test_pallas_rmplus_matches_core).

Measured numbers live in docs/PERF_ANALYSIS.md (tools/rmplus_probe.py);
enabled by default on TPU via env/solver_device.py::solve_zero_sum_rmplus
mode="auto".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Lanes per grid step.  VMEM per step at A=5: payoff block 25*TILE*4B
# (~200 KB at 2048) plus eight (A, TILE) carries/temporaries — far below
# the ~16 MB/core budget; 2048 keeps the grid short at learner batches.
_LANE_TILE = 2048
# The action dims ride the sublane axis; 16 sublanes is plenty for every
# game this framework generates (A <= 8 in all configs) while keeping the
# blocks compact.
_MAX_ACTIONS = 16


def supported(M: jax.Array) -> bool:
    """(R, C, B) batch-minor payoffs the kernel handles."""
    R, C, B = M.shape
    return R <= _MAX_ACTIONS and C <= _MAX_ACTIONS and B >= 8


def _kernel(M_ref, lr_ref, lc_ref, x_ref, y_ref, v_ref, *, iters: int):
    from ..env.solver_device import rmplus_core

    x, y, v = rmplus_core(M_ref[:], lr_ref[:], lc_ref[:], iters)
    x_ref[:] = x
    y_ref[:] = y
    v_ref[:] = v[None, :]


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def rmplus(M: jax.Array, lr: jax.Array, lc: jax.Array, iters: int,
           interpret: bool = False):
    """Batch-minor RM+: M (R, C, B) with illegal cells zeroed, lr (R, B),
    lc (C, B) -> (x (R, B), y (C, B), v (B,)).

    The batch is padded up to the lane tile; padded lanes solve the
    all-zero matrix under all-zero masks (normalize() maps those to the
    uniform-over-nothing well-defined branch) and are sliced off.
    """
    R, C, B = M.shape
    tile = min(_LANE_TILE, ((B + 127) // 128) * 128)
    pad = (-B) % tile
    if pad:
        M = jnp.pad(M, ((0, 0), (0, 0), (0, pad)))
        lr = jnp.pad(lr, ((0, 0), (0, pad)))
        lc = jnp.pad(lc, ((0, 0), (0, pad)))
    Bp = B + pad
    grid = (Bp // tile,)
    x, y, v = pl.pallas_call(
        functools.partial(_kernel, iters=iters),
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, C, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((R, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, Bp), M.dtype),
            jax.ShapeDtypeStruct((C, Bp), M.dtype),
            jax.ShapeDtypeStruct((1, Bp), M.dtype),
        ),
        interpret=interpret,
    )(M, lr, lc)
    return x[:, :B], y[:, :B], v[0, :B]
