"""Pallas TPU kernel: fused one-hot row lookup from a VMEM-resident table.

The rollout's hot op is gathering one packed (D ~ 128-lane) row per lane
from the (S, D) state table (ops/stepping.py).  XLA's dynamic gather reaches
roughly half of HBM bandwidth; for the common case where the whole table
fits in VMEM (S·D·4B ≲ 8 MB — hundreds of thousands of cells), the gather
can instead be an MXU one-hot contraction with **zero HBM traffic for the
table** after the initial load:

    out[t, :] = sum_s [s == idx[t]] * table[s, :]

Exactness: the one-hot operand is exactly {0, 1} and the contraction is
performed at HIGHEST precision (bf16x3 on the MXU), which reconstructs f32
values bit-exactly for 0/1 multipliers — verified by
tests/test_pallas_lookup.py (interpret mode) and bit-exact on real TPU v5e
against the gather path, including the f32-encoded child-index lanes.

Measured on v5e (S=320, D=128, B=131072): the XLA dynamic gather reaches
~0.4 ms and this kernel ~0.7 ms — HIGHEST-precision MXU passes cost more
than the gather saves at these shapes, so the gather path remains the
default (ops/stepping.set_lookup_mode selects).  The kernel becomes
attractive when fused with downstream compute (future work) or on parts
where gather bandwidth collapses.

The kernel tiles the lane axis on the grid; the table block is broadcast to
every grid step (constant index map), so Mosaic keeps it resident in VMEM
across the whole grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Table sizes up to ~8 MB stay comfortably within the ~16 MB/core VMEM
# alongside the lane tiles.
VMEM_TABLE_BYTES_LIMIT = 8 * 1024 * 1024
_LANE_TILE = 1024


def _kernel(idx_ref, table_ref, out_ref):
    idx = idx_ref[:]  # (TILE,) int32
    tile, s = out_ref.shape[0], table_ref.shape[0]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (tile, s), 1)
              == idx[:, None]).astype(jnp.float32)
    out_ref[:] = jax.lax.dot_general(
        onehot, table_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("interpret",))
def onehot_lookup(table: jax.Array, indices: jax.Array,
                  interpret: bool = False) -> jax.Array:
    """(S, D) table, (B,) int32 indices -> (B, D) rows.

    B must be a multiple of 8; lanes are processed in tiles of up to 1024.
    """
    S, D = table.shape
    B = indices.shape[0]
    tile = min(_LANE_TILE, B)
    if B % tile != 0:
        # fall back to one tile covering everything padded
        tile = B
    grid = (B // tile,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D), table.dtype),
        interpret=interpret,
    )(indices, table)


def table_fits_vmem(table: jax.Array) -> bool:
    return table.size * table.dtype.itemsize <= VMEM_TABLE_BYTES_LIMIT
