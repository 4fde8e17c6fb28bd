"""Replay buffer of rollout batches.

Mirrors the reference ``Buffer`` (reference environment/episode.py:292-334):
a deque of whole rollout batches, sampled with a uniform multinomial split
across slots and collated along the lane axis.  The default configuration
(``n_batches_per_buffer=1, buffer_mod=1``) degenerates to pure on-policy
training (reference episode.py:294-305, rnad.py:66-67) — in that case the
trainer bypasses the buffer entirely and fuses rollout+learn in one jitted
step.

Because every trajectory of a given tree has the same static length
(2 * max_depth), collation is a plain concatenation along the batch axis —
no time padding is ever needed (the reference pads because its rollouts stop
at the last live lane, episode.py:258-290).
"""

from __future__ import annotations

from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..env.engine import Trajectory


def collate_slots(slots, lanes):
    """Gather ``lanes[i]`` lanes from each slot and concatenate along the
    lane axis — the collate body, shared by the standalone jitted program
    below and the fused sample+learn program (learn/rnad.py)."""
    return jax.tree.map(
        lambda *xs: jnp.concatenate(xs, axis=1),
        *[jax.tree.map(lambda x: x[:, l], t) for t, l in zip(slots, lanes)])


class TrajectoryBuffer:
    def __init__(self, max_size: int):
        self.max_size = max_size
        self.slots: deque = deque()
        # One jitted gather+concat program for the whole collate: the
        # host-driven per-leaf form costs ~4 device dispatches per slot per
        # step through the remote-TPU tunnel.  Shapes are step-invariant
        # (see sample), so this traces once per buffer fill level.
        self._collate = jax.jit(collate_slots)

    def __len__(self) -> int:
        return len(self.slots)

    def append(self, traj: Trajectory) -> None:
        """Appends and evicts oldest slots beyond ``max_size`` — which is
        honored dynamically (the trainer may adjust it between update
        periods, mirroring reference rnad.py:488)."""
        self.slots.append(traj)
        while len(self.slots) > self.max_size:
            self.slots.popleft()

    def clear(self) -> None:
        self.slots.clear()

    def sample(self, batch_size: int,
               rng: Optional[np.random.Generator] = None) -> Trajectory:
        """Collates exactly ``batch_size`` lanes (the reference asserts the
        exact split, episode.py:318; a smaller batch would also change the
        trajectory shape and force a learn_fn re-jit).

        TPU-critical: the per-slot allocation is the STATIC equal split
        (``batch_size // n`` each, the remainder spread deterministically),
        not the reference's per-step multinomial draw (episode.py:313-318).
        The multinomial's counts change every step, so every per-slot lane
        gather compiles at a fresh shape — measured ~6 s/step at 32k lanes
        on the 785k tree, a ~1000x slowdown from recompilation alone.  The
        equal split keeps each lane's marginal inclusion probability
        identical (the multinomial is uniform in expectation; this is its
        variance-reduced limit), randomness lives in the within-slot lane
        choice, and every shape is step-invariant, so the gather+concat
        compiles once.  Slots smaller than their static share contribute
        with-replacement draws for the deficit."""
        slots, lanes = self.plan(batch_size, rng)
        if lanes is None:
            return slots[0]  # on-policy fast path
        return self._collate(slots, lanes)

    def plan(self, batch_size: int,
             rng: Optional[np.random.Generator] = None):
        """The sampling decision alone: ``(slots, lanes)`` ready for
        ``collate_slots`` — or ``(slot,), None`` for the single-full-slot
        fast path.  Lets callers fuse the collate INTO a consumer program
        (the trainer's fused sample+learn step) instead of materializing
        the sampled trajectory through a separate dispatch."""
        n = len(self.slots)
        if n == 0:
            raise ValueError("sampling from an empty buffer")
        if n == 1 and self.slots[0].batch_size == batch_size:
            return (self.slots[0],), None
        rng = rng or np.random.default_rng()
        sizes = np.array([t.batch_size for t in self.slots], dtype=np.int64)
        counts = np.full((n,), batch_size // n, np.int64)
        counts[:batch_size % n] += 1
        used, lanes_list = [], []
        for traj, count, size in zip(self.slots, counts, sizes):
            if count == 0:
                continue
            take = min(int(count), int(size))
            lanes = rng.choice(size, size=take, replace=False)
            if take < count:  # slot smaller than its share: replacement
                lanes = np.concatenate(
                    [lanes, rng.choice(size, size=int(count) - take,
                                       replace=True)])
            used.append(traj)
            lanes_list.append(jnp.asarray(lanes))
        return tuple(used), tuple(lanes_list)
