"""Worker process for real multi-process (multi-controller) training.

Each process runs this same program: it joins the cluster via
``runtime.initialize_distributed`` (jax.distributed -> Gloo collectives on
CPU, ICI/DCN on TPU pods), builds the identical game tree and config from
the shared seed, assembles the GSPMD-sharded step over the *global* mesh
(spanning every process's devices), and executes fused train steps.  All
inter-process communication is the XLA collectives the partitioner inserts
— there is no hand-written host networking.

Process 0 writes a JSON result (per-step losses + a parameter checksum)
that tools/multiprocess_check.py compares against a single-process run of
the same seed: the GSPMD program is device-count- and process-count-
invariant (see parallel/runtime.py), so the numbers must match.

Spawned by tools/multiprocess_check.py and tests/test_multiprocess.py:

    XLA_FLAGS=--xla_force_host_platform_device_count=K \
      python tools/mp_worker.py --process-id I --num-processes N \
        --port P --out result.json [--steps S] [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.realpath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--port", type=int, required=True)
    p.add_argument("--out", default=None, help="process 0 result JSON path")
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--tree-depth", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--run-dir", default=None,
                   help="checkpoint directory (utils.checkpoint.RunStore); "
                        "enables --save / --resume")
    p.add_argument("--save", action="store_true",
                   help="save a checkpoint at the end of the run")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in --run-dir "
                        "(the cluster shape may differ from the one that "
                        "saved it: checkpoints hold global host arrays)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from rnad_tpu.parallel import runtime
    runtime.initialize_distributed(f"localhost:{args.port}",
                                   args.num_processes, args.process_id)

    import jax.numpy as jnp
    from rnad_tpu.config import NetConfig, RNaDConfig, TreeConfig
    from rnad_tpu.env import tree as tree_lib
    from rnad_tpu.learn import rnad as rnad_lib
    from rnad_tpu.models import nets
    from rnad_tpu.parallel import mesh as mesh_lib

    tree = tree_lib.generate_tree(
        TreeConfig(max_actions=3, max_transitions=2,
                   depth_bound=args.tree_depth), seed=1)
    cfg = RNaDConfig(batch_size=args.batch_size, eta=0.2, bounds=(10,),
                     delta_m=(100,), lr=1e-3, gamma_averaging=0.01,
                     logit_clip=2.0)
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=32))

    mesh = mesh_lib.make_mesh()  # spans ALL processes' devices
    (train_step, _, _, _), mesh, place_state = runtime.make_sharded_rnad_fns(
        net, tree, cfg, mesh=mesh)
    template = rnad_lib.init_train_state(
        net, jax.random.PRNGKey(args.seed), tree.max_actions, cfg)
    store = None
    if args.run_dir:
        from rnad_tpu.utils.checkpoint import RunStore
        root, name = os.path.split(os.path.normpath(args.run_dir))
        store = RunStore(name, root or None)
    if args.resume:
        latest = store.latest()
        assert latest is not None, f"no checkpoint to resume in {args.run_dir}"
        # every process reads the shared checkpoint, then shards it over its
        # own (possibly different-shaped) cluster mesh
        state = place_state(store.load_checkpoint(*latest, template))
    else:
        state = place_state(template)

    losses = []
    for i in range(args.steps):
        state, metrics = train_step(state, jnp.float32(0.5))
        losses.append(runtime.host_value(metrics["loss"]))

    if args.save:
        total = int(runtime.host_value(state.total_steps))
        store.save_checkpoint(0, total, state)

    checksum = runtime.host_value(jax.jit(
        lambda vs: jax.tree.reduce(
            lambda a, x: a + jnp.abs(x).sum(), vs, jnp.float32(0.0)),
        out_shardings=mesh_lib.replicated(mesh))(state.variables["params"]))

    result = {"process_id": jax.process_index(),
              "num_processes": jax.process_count(),
              "global_devices": jax.device_count(),
              "local_devices": jax.local_device_count(),
              "losses": losses, "param_checksum": checksum}
    print(json.dumps(result), flush=True)
    if args.out and jax.process_index() == 0:
        with open(args.out, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
