"""Profiling helpers.

The reference's only instrumentation is a wall-clock counter around the
rollout loop (reference environment/episode.py:192-215).  Here:

  * ``PhaseTimer`` — named wall-clock phases with ``block_until_ready``
    semantics so device work is actually attributed to its phase;
  * ``trace`` — context manager around ``jax.profiler`` for on-demand TPU
    traces (view with TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class PhaseTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync: Optional[object] = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def timed(self, name: str, value):
        """Blocks on ``value`` and attributes the wait to ``name``."""
        with self.phase(name, sync=value):
            pass
        return value

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": self.totals[k], "count": self.counts[k],
                    "mean_s": self.totals[k] / max(self.counts[k], 1)}
                for k in self.totals}


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; open the result in TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
