"""tools/check_fused_consistency.py runs and passes in its CPU mode.

The tool's real job is re-verifying fused == split on TPU after any
restructuring of the train step (XLA:TPU miscompiled two earlier shapes of
the large fused program — docs/PERF_ANALYSIS.md); this test keeps the tool
itself healthy and asserts the equivalence holds on the CPU backend too.
Runs in a subprocess because the tool owns its backend selection.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))


def test_cpu_mode_passes():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "check_fused_consistency.py"),
         "--cpu", "--tree", "demo", "--batch", "512"],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PASS" in proc.stdout, proc.stdout
