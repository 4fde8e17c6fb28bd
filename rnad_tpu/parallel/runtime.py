"""Multi-host runtime initialization and sharded trainer assembly.

Single-controller-per-host SPMD: every host runs the same program over its
local devices; ``jax.distributed.initialize`` wires the hosts into one global
device set, after which the ('data', 'model') mesh spans the pod slice and
GSPMD emits psum/all-gather collectives over ICI/DCN automatically.

Determinism across device/host counts: all hosts share the run seed; the
rollout key is replicated, and per-lane random bits are a pure function of
(key, global lane position) under partitionable threefry — so a 256k-lane
run samples the same episodes (bit-identical indices/actions/rewards)
regardless of how many devices serve it, verified over data-axis sizes
{1, 2, 4, 8} in tests/test_sharding.py::test_gspmd_mesh_size_invariance.
The stored float behavior policy matches only to float tolerance (softmax
reduction order depends on the compiled partitioning), so an action draw
sitting exactly on a last-ulp argmax boundary could in principle differ.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax

from ..config import RNaDConfig
from ..env.tree import GameTree
from ..learn import rnad as rnad_lib
from ..models import nets as nets_lib
from . import mesh as mesh_lib


host_value = mesh_lib.host_value


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Wires this host into a multi-host run.  No-op for single-host."""
    if num_processes is None or num_processes <= 1:
        logging.info("single-host run: %d local devices",
                     jax.local_device_count())
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    logging.info("distributed: process %d/%d, %d global devices",
                 jax.process_index(), num_processes, jax.device_count())


def make_sharded_rnad_fns(net, tree: GameTree, cfg: RNaDConfig,
                          mesh: Optional[jax.sharding.Mesh] = None,
                          model_parallel_mlp: bool = False):
    """Builds the train-step family with lane sharding over the mesh's data
    axis (and optional tensor parallelism over the model axis —
    ``model_parallel_mlp=True`` picks the layout matching the net family:
    hidden width for the MLP, channels for the ConvNet).

    Parameters stay replicated (or model-sharded); the per-lane batch shards
    over data; GSPMD inserts the gradient psum because the parameter update
    output must be replicated again.
    """
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    if cfg.batch_size % mesh.shape[mesh_lib.DATA_AXIS] != 0:
        raise ValueError(
            f"batch_size {cfg.batch_size} must divide over "
            f"{mesh.shape[mesh_lib.DATA_AXIS]} data-parallel devices")
    constrain = mesh_lib.batch_constrainer(mesh)
    fns = rnad_lib.make_rnad_fns(net, tree, cfg, constrain_batch=constrain,
                                 eval_mesh=mesh)

    def place_state(state: rnad_lib.TrainState) -> rnad_lib.TrainState:
        if not model_parallel_mlp:
            spec_fn = None
        elif isinstance(net, nets_lib.ConvNet):
            spec_fn = mesh_lib.conv_param_spec
        elif isinstance(net, nets_lib.EquiNet):
            spec_fn = mesh_lib.equinet_param_spec
        else:
            spec_fn = mesh_lib.mlp_param_spec
        place_params = lambda vs: mesh_lib.shard_variables(mesh, vs, spec_fn)
        return state.replace(
            variables=place_params(state.variables),
            variables_target=place_params(state.variables_target),
            variables_reg=place_params(state.variables_reg),
            variables_reg_=place_params(state.variables_reg_),
            opt_state=mesh_lib.shard_variables(mesh, state.opt_state, spec_fn),
            key=jax.device_put(state.key, mesh_lib.replicated(mesh)),
            total_steps=jax.device_put(state.total_steps,
                                       mesh_lib.replicated(mesh)),
        )

    return fns, mesh, place_state
