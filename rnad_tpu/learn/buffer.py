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


class TrajectoryBuffer:
    def __init__(self, max_size: int):
        self.max_size = max_size
        self.slots: deque = deque()

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

        The multinomial allocation is clipped to each slot's lane count and
        the deficit redistributed to slots with spare lanes; if the whole
        buffer holds fewer than ``batch_size`` lanes, the remainder is drawn
        with replacement."""
        n = len(self.slots)
        if n == 0:
            raise ValueError("sampling from an empty buffer")
        if n == 1 and self.slots[0].batch_size == batch_size:
            return self.slots[0]  # on-policy fast path
        rng = rng or np.random.default_rng()
        sizes = np.array([t.batch_size for t in self.slots], dtype=np.int64)
        counts = np.minimum(rng.multinomial(batch_size, [1.0 / n] * n), sizes)
        while (deficit := batch_size - int(counts.sum())) > 0:
            room = sizes - counts
            total_room = int(room.sum())
            if total_room == 0:
                break  # buffer smaller than the batch: replacement below
            extra = rng.multinomial(min(deficit, total_room),
                                    room / total_room)
            counts = np.minimum(counts + extra, sizes)
        overflow = batch_size - int(counts.sum())  # > 0 only if buffer < batch
        if overflow > 0:
            # with-replacement remainder, spread lane-uniformly over the
            # whole buffer (not dumped on one slot, which would overweight
            # its episodes in the off-policy gradient)
            extras = rng.multinomial(overflow, sizes / sizes.sum())
        else:
            extras = np.zeros_like(counts)
        parts = []
        for traj, count, extra in zip(self.slots, counts, extras):
            if count + extra == 0:
                continue
            lanes = rng.choice(traj.batch_size, size=int(count),
                               replace=False)
            if extra:
                lanes = np.concatenate(
                    [lanes, rng.choice(traj.batch_size, size=int(extra),
                                       replace=True)])
            lanes = jnp.asarray(lanes)
            parts.append(jax.tree.map(lambda x: x[:, lanes], traj))
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=1), *parts)
