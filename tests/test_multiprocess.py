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


def test_resume_across_process_count_change():
    """A 2-process x 4-device cluster checkpoints mid-run; a 4-process x
    2-device cluster resumes it.  The continued losses must match an
    uninterrupted single-process run of the same seed — checkpoint/resume
    is cluster-shape independent (VERDICT r2 item 6)."""
    single = mpc.run_single(steps=4, batch_size=64, seed=7)
    phase1, phase2 = mpc.run_resume_across(
        procs_a=2, devs_a=4, steps_a=2,
        procs_b=4, devs_b=2, steps_b=2, batch_size=64, seed=7)
    assert phase1["global_devices"] == 8
    assert phase2["global_devices"] == 8
    assert phase1["num_processes"] == 2 and phase2["num_processes"] == 4
    np.testing.assert_allclose(phase1["losses"], single["losses"][:2],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(phase2["losses"], single["losses"][2:],
                               rtol=1e-4, atol=1e-6)
