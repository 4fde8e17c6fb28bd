"""Real multi-process distributed execution (not virtual devices).

Spawns actual OS processes that form a jax.distributed cluster over
localhost and run the GSPMD fused train step over the cross-process global
mesh (tools/mp_worker.py); asserts losses and the parameter checksum match
a single-process run of the same seed.  This is the process-boundary
counterpart of tests/test_sharding.py::test_gspmd_mesh_size_invariance.

The reference is strictly single-process (reference learn/rnad.py:37);
multi-host is a capability this framework adds (SURVEY.md §2.3).
"""

import numpy as np

from tools import multiprocess_check as mpc


def test_two_process_cluster_matches_single_process():
    multi = mpc.run_cluster(num_processes=2, devices_per_proc=2, steps=3,
                            batch_size=64, seed=7)
    single = mpc.run_single(steps=3, batch_size=64, seed=7)

    assert multi["num_processes"] == 2
    assert multi["global_devices"] == 4
    np.testing.assert_allclose(multi["losses"], single["losses"],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(multi["param_checksum"],
                               single["param_checksum"], rtol=1e-4)
