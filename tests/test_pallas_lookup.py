"""Pallas one-hot lookup kernel: bit-exactness vs the gather path.

Runs in interpreter mode on CPU; on TPU the same kernel compiles to an MXU
one-hot contraction with the table resident in VMEM.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rnad_tpu.ops import pallas_lookup, stepping


def test_onehot_lookup_exact_random():
    rng = np.random.default_rng(0)
    S, D, B = 160, 128, 2048
    table = jnp.asarray(rng.normal(size=(S, D)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, S, B).astype(np.int32))
    out = pallas_lookup.onehot_lookup(table, idx, interpret=True)
    ref = table[idx]
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_onehot_lookup_packed_tables(small_tree):
    """The f32-encoded child-index lanes must survive bit-exactly."""
    packed = stepping.make_packed_tables(small_tree)
    rng = np.random.default_rng(1)
    idx = jnp.asarray(
        rng.integers(0, small_tree.size, 1024).astype(np.int32))
    out = pallas_lookup.onehot_lookup(packed.rows, idx, interpret=True)
    ref = stepping.lookup(packed, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert pallas_lookup.table_fits_vmem(packed.rows)
