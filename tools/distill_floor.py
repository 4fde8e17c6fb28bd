"""Architecture approximation floor: distill the exact solution into a net.

For a saved tree, trains each requested net by supervised regression onto
the generator's exact per-node NE policies/values (the oracle the reference
stores as ``solution_tensor``, reference environment/tree.py:269-301) and
reports the distilled policy's exact NashConv.  That number is the
architecture's *capacity floor* on this tree: no R-NaD run with the same
net can be expected to land below it, so it separates "the algorithm is
underperforming" from "the net cannot represent the solution map".

Usage:
  python tools/distill_floor.py --tree bigtree-probe \
      --net MLP:256 --net MLP:1024 --net ConvNet:24x2 \
      --steps 20000 --node-batch 65536 [--cpu]

Net specs: ``MLP:<width>[x<depth>]``, ``ConvNet:<channels>x<depth>`` or
``EquiNet:<channels>x<depth>[s<solver_iters>[p]]`` (p = primed heads:
step-0 policy is the RM+ solve); ``RM+[:<iters>]`` evaluates the net-free
regret-matching skyline (no training — solves the observed matrix).
Prints one JSON line per net (machine-readable, like bench_suite.py).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.realpath(__file__))))


def parse_net(spec: str, max_actions: int):
    from rnad_tpu.config import NetConfig

    kind, _, shape = spec.partition(":")
    if kind == "MLP":
        w, _, d = (shape or "256").partition("x")
        return NetConfig(type="MLP", max_actions=max_actions,
                         width=int(w), depth=int(d or 1))
    if kind == "ConvNet":
        ch, _, depth = (shape or "16x2").partition("x")
        return NetConfig(type="ConvNet", max_actions=max_actions,
                         channels=int(ch), depth=int(depth or 2),
                         batch_norm=False)
    if kind == "EquiNet":
        ch, _, depth = (shape or "128x4").partition("x")
        depth, _, solver = (depth or "4").partition("s")
        prime = solver.endswith("p")
        return NetConfig(type="EquiNet", max_actions=max_actions,
                         channels=int(ch), depth=int(depth or 4),
                         solver_iters=int(solver.rstrip("p") or 0),
                         solver_prime=prime)
    raise SystemExit(f"unknown net spec {spec!r} "
                     "(MLP:<w>[x<d>] | ConvNet:<c>x<d> | EquiNet:<c>x<d>)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree", default="recent")
    ap.add_argument("--net", action="append", default=[],
                    help="MLP:<width> or ConvNet:<channels>x<depth>; repeatable")
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--node-batch", type=int, default=65536,
                    help="node-seat rows per SGD step (0 = full batch)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from rnad_tpu.learn import supervised
    from rnad_tpu.models import nets
    from rnad_tpu.utils import checkpoint

    tree = checkpoint.load_tree(args.tree)
    print(json.dumps({"tree": args.tree, "size": tree.size,
                      "depth": tree.max_depth}), flush=True)
    for spec in args.net or ["MLP:256"]:
        if spec.startswith("RM+"):
            # Net-free skyline: play the RM+ epsilon-Nash of each node's
            # observed matrix (see env/solver_device.py::joint_policy_rmplus).
            from rnad_tpu.env import solver_device
            from rnad_tpu.metrics import nashconv as nashconv_lib
            iters = int(spec.partition(":")[2] or 2000)
            t0 = time.time()
            joint = solver_device.joint_policy_rmplus(tree, iters=iters)
            result = nashconv_lib.nashconv_root(tree, joint)
            print(json.dumps({
                "net": spec,
                "floor_nashconv": round(float(result.nashconv()), 6),
                "iters": iters,
                "seconds": round(time.time() - t0, 1),
            }), flush=True)
            continue
        cfg = parse_net(spec, tree.max_actions)
        net = nets.build_net(cfg)
        t0 = time.time()
        _, metrics = supervised.train_oracle_net(
            tree, net, jax.random.PRNGKey(args.seed), steps=args.steps,
            lr=args.lr, node_batch=args.node_batch or None)
        print(json.dumps({
            "net": spec,
            "floor_nashconv": round(metrics["nashconv"], 6),
            "final_loss": round(metrics["final_loss"], 6),
            "steps": args.steps,
            "node_batch": args.node_batch,
            "seconds": round(time.time() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
