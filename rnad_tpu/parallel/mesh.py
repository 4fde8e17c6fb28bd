"""Device mesh and sharding layout.

The reference is strictly single-device (SURVEY.md §2.3).  Here parallelism
is first-class: a ``('data', 'model')`` mesh where

  * environment lanes, trajectories and all per-lane learner tensors shard
    over ``data`` (every rollout gather, categorical draw and v-trace scan is
    lane-parallel, so GSPMD splits them with zero communication);
  * network parameters optionally shard their hidden dimension over ``model``
    (tensor parallelism — unnecessary for the reference-sized nets but the
    layout must not preclude it);
  * gradients and metrics are combined with ``psum`` collectives inserted
    automatically by GSPMD from the output shardings (riding ICI within a
    slice, DCN across slices).

Everything goes through ``jax.jit`` with sharding constraints rather than
hand-written collectives; see parallel/runtime.py for multi-host init.
"""

from __future__ import annotations

from typing import Optional, Sequence

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def host_array(x) -> np.ndarray:
    """Host numpy from an array that may span processes.

    Under multi-controller SPMD an output can span devices this process
    cannot address, so ``np.asarray`` raises.  Replicated arrays are read
    from the local copy; sharded ones are all-gathered — a collective, so
    every process must make the same call."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        if x.is_fully_replicated:
            return np.asarray(x.addressable_data(0))
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def host_value(x) -> float:
    """Host float of a scalar that may be a cross-process replicated array."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return float(x.addressable_data(0))
    return float(x)


def make_mesh(devices: Optional[Sequence] = None,
              model_parallelism: int = 1) -> Mesh:
    """Builds a ('data', 'model') mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallelism != 0:
        raise ValueError(f"{n} devices not divisible by "
                         f"model_parallelism={model_parallelism}")
    arr = np.array(devices).reshape(n // model_parallelism, model_parallelism)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Lane-axis (leading dimension) sharding."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_constrainer(mesh: Mesh):
    """Returns a function pinning a per-lane vector to the data axis; GSPMD
    propagates the lane sharding through the entire rollout and learner."""

    sharding = data_sharding(mesh)

    def constrain(x):
        return jax.lax.with_sharding_constraint(x, sharding)

    return constrain


def mlp_param_spec(path: tuple, leaf) -> P:
    """Tensor-parallel layout for the MLP: hidden dimension over MODEL_AXIS.

    fc0 kernels are (in, width) -> shard width; fc1 kernels are (width, out)
    -> shard width on the input side; biases of fc0 shard too.  Deep MLPs
    (NetConfig.depth > 1) alternate Megatron-style: odd hidden layers are
    row-parallel (input sharded, psum output), even ones column-parallel —
    so consecutive layers chain without resharding.  Everything else
    replicates; GSPMD inserts collectives wherever a chain breaks, so any
    spec here is a layout hint, never a correctness requirement.
    """
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    flat = "/".join(str(n) for n in names)
    if flat.endswith("fc0/kernel"):
        return P(None, MODEL_AXIS)
    if flat.endswith("fc0/bias"):
        return P(MODEL_AXIS)
    if flat.endswith("fc1/kernel"):
        return P(MODEL_AXIS, None)
    m = re.search(r"hidden(\d+)/(kernel|bias)$", flat)
    if m is not None:
        i, kind = int(m.group(1)), m.group(2)
        if i % 2 == 1:  # row-parallel: (width_sharded, width)
            return P(MODEL_AXIS, None) if kind == "kernel" else P()
        return P(None, MODEL_AXIS) if kind == "kernel" else P(MODEL_AXIS)
    return P()


def conv_param_spec(path: tuple, leaf) -> P:
    """Tensor-parallel layout for the ConvNet: channels over MODEL_AXIS.

    Flax conv kernels are (kh, kw, cin, cout) -> shard cout; per-channel
    vectors (conv biases, BatchNorm scale/bias and running stats) shard
    their single channel dim.  The dense policy/value heads replicate (their
    flattened A*A*channels input mixes all channels anyway, so GSPMD
    all-gathers once at the tower exit).  Like mlp_param_spec, this is a
    layout hint — GSPMD inserts the collectives that keep any choice
    correct.
    """
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    flat = "/".join(str(n) for n in names)
    if flat.endswith("/kernel") and getattr(leaf, "ndim", 0) == 4:
        return P(None, None, None, MODEL_AXIS)
    if getattr(leaf, "ndim", 0) == 1 and ("conv" in flat or "bn" in flat):
        return P(MODEL_AXIS)
    return P()  # dense policy/value heads (and anything unrecognized)


def equinet_param_spec(path: tuple, leaf) -> P:
    """Tensor-parallel layout for the EquiNet: channels over MODEL_AXIS.

    Every exchangeable layer is a (6C, C) dense whose output channel dim
    shards; its pooling (row/col mean/max, global mean) reduces spatial axes
    only, so a channel-sharded activation passes through pooling with zero
    communication and GSPMD all-gathers once per layer at the 6C-input
    concat.  Heads (and the input-skip features) replicate.  A layout hint,
    like the other spec fns.
    """
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    flat = "/".join(str(n) for n in names)
    if re.search(r"ex\d+/kernel$", flat):
        return P(None, MODEL_AXIS)
    if re.search(r"ex\d+/bias$", flat):
        return P(MODEL_AXIS)
    return P()


def shard_variables(mesh: Mesh, variables, spec_fn=None):
    """Places a variables pytree on the mesh (replicated unless spec_fn says
    otherwise)."""

    def place(path, leaf):
        spec = spec_fn(path, leaf) if spec_fn is not None else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, variables)
