"""Learner-step throughput matrix: fuse_net_passes x dtype at one batch.

Measures the full fused train step (rollout + 4-net inference + v-trace +
losses + Adam + EMA) for every combination of the net-pass fusion mode
(RNaDConfig.fuse_net_passes) and compute/frozen dtypes, at a fixed batch on
the current backend.  The VERDICT r2 target: >= 1.5x the round-2 learner
numbers at 32k lanes (199 f32 / 261 bf16 updates/s).

    python tools/learner_probe.py [--batch 32768] [--iters 256] [--cpu]

Each measurement runs all iterations inside one jitted scan-of-steps and
SELF-CHECKS (finite losses, iteration 0 equal to the split-program
reference) because XLA:TPU miscompiles some scan-of-step shapes
(docs/PERF_ANALYSIS.md); failing configs fall back to chained per-step
dispatch, marked in the output.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.realpath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32768)
    p.add_argument("--iters", type=int, default=256)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--only", default=None,
                   help="comma-separated substrings; run only matching "
                        "configs (e.g. 'heads,off')")
    p.add_argument("--tree", default="demo",
                   help="'demo' or the name of a saved tree (e.g. "
                        "'deeptree-t36' for the T=36 associative-v-trace "
                        "shape)")
    p.add_argument("--vtrace", default=None,
                   help="comma list of vtrace modes to cross with every "
                        "selected config (scan,associative); default: the "
                        "config default ('auto')")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from rnad_tpu.config import (NetConfig, RNaDConfig, ShapingRule,
                                 TreeConfig)
    from rnad_tpu.env import tree as tree_lib
    from rnad_tpu.learn import rnad as rnad_lib
    from rnad_tpu.models import nets

    if args.tree == "demo":
        tcfg = TreeConfig(
            max_actions=3, max_transitions=2, transition_threshold=0.3,
            depth_bound=4,
            depth_bound_rule=ShapingRule(delta=-1, stochastic_delta=-2,
                                         stochastic_prob=0.5))
        tree = tree_lib.generate_tree(tcfg, seed=0)
    else:
        from rnad_tpu.utils import checkpoint
        tree = checkpoint.load_tree(args.tree)
    A = tree.max_actions
    B = args.batch
    print(f"tree={tree.size} depth={tree.max_depth} batch={B} "
          f"device={jax.devices()[0].device_kind}", flush=True)

    # (label, net compute dtype, frozen dtype, fuse mode)
    combos = [
        ("f32/off", "float32", "float32", "off"),
        ("f32/heads", "float32", "float32", "heads"),
        ("f32/frozen", "float32", "float32", "frozen"),
        ("f32/all", "float32", "float32", "all"),
        ("f32+frozenbf16/off", "float32", "bfloat16", "off"),
        ("f32+frozenbf16/heads", "float32", "bfloat16", "heads"),
        ("bf16/off", "bfloat16", "bfloat16", "off"),
        ("bf16/heads", "bfloat16", "bfloat16", "heads"),
        ("bf16/heads-light", "bfloat16", "bfloat16", "heads-light"),
        ("bf16/frozen", "bfloat16", "bfloat16", "frozen"),
        ("bf16/all", "bfloat16", "bfloat16", "all"),
        # Batch-minor learner layout (RNaDConfig.learner_layout="amb") and
        # the raveled clip+Adam+EMA tail (flat_optimizer) — round-4
        # candidates over the round-3 default ("heads").
        ("f32/heads-amb", "float32", "float32", "heads-amb"),
        ("f32/heads-amb-flat", "float32", "float32", "heads-amb-flat"),
        ("f32/heads-flat", "float32", "float32", "heads-flat"),
        ("bf16/heads-amb", "bfloat16", "bfloat16", "heads-amb"),
        ("bf16/heads-amb-flat", "bfloat16", "bfloat16", "heads-amb-flat"),
    ]
    if args.only:
        pats = args.only.split(",")
        match = lambda lbl: any((lbl == p[:-1]) if p.endswith("$")
                                else (p in lbl) for p in pats)
        combos = [c for c in combos if match(c[0])]
    if args.vtrace:
        combos = [(f"{label}@{vm}", nd, fd, fuse, vm)
                  for vm in args.vtrace.split(",")
                  for (label, nd, fd, fuse) in combos]
    else:
        combos = [c + ("auto",) for c in combos]
    results = {}
    for label, net_dtype, frozen_dtype, fuse, vtrace_mode in combos:
        parts = fuse.split("-")
        fuse, mods = parts[0], set(parts[1:])
        assert mods <= {"light", "amb", "flat"}, mods
        cfg = RNaDConfig(batch_size=B, eta=0.2, bounds=(1,), delta_m=(1,),
                         lr=1e-3, gamma_averaging=0.01, logit_clip=2.0,
                         frozen_net_dtype=frozen_dtype,
                         fuse_net_passes=fuse,
                         detailed_metrics="light" not in mods,
                         learner_layout="amb" if "amb" in mods else "bma",
                         flat_optimizer="flat" in mods,
                         vtrace_mode=vtrace_mode)
        net = nets.build_net(NetConfig(type="MLP", max_actions=A,
                                       width=args.width,
                                       compute_dtype=net_dtype))
        train_step, rollout_jit, learn_jit, _ = rnad_lib.make_rnad_fns(
            net, tree, cfg)
        state = rnad_lib.init_train_state(net, jax.random.PRNGKey(0), A, cfg)

        s_ref, traj_ref = rollout_jit(state)
        _, m_ref = learn_jit(s_ref, traj_ref, jnp.float32(0.5))
        loss_ref = float(np.asarray(m_ref["loss"]))

        @jax.jit
        def train_many(tr, pk, s0, n=args.iters):
            def body(s, _):
                s2, m = train_step.inner(tr, pk, s, jnp.float32(0.5))
                return s2, m["loss"]
            _, losses = jax.lax.scan(body, s0, None, length=n)
            return losses

        tr, pk = train_step.tables
        # Warm with a different-seed state: the axon tunnel can serve a
        # repeated identical-(program, args) execution from a result cache
        # (see tools/rmplus_probe.py), so the timed call must not repeat
        # the warm call's arguments.
        state_warm = rnad_lib.init_train_state(net, jax.random.PRNGKey(9),
                                               A, cfg)
        losses_w = np.asarray(train_many(tr, pk, state_warm))
        scan_ok = np.isfinite(losses_w).all()
        if scan_ok:
            t0 = time.perf_counter()
            losses = np.asarray(train_many(tr, pk, state))
            dt = (time.perf_counter() - t0) / args.iters
            scan_ok = (np.isfinite(losses).all()
                       and np.isclose(losses[0], loss_ref, rtol=1e-5,
                                      atol=1e-6))
        if scan_ok:
            method = "scan"
        else:
            alpha = jnp.float32(0.5)
            s, chain = state, []
            for _ in range(2):
                s, m = train_step(s, alpha)
            np.asarray(m["loss"])
            t0 = time.perf_counter()
            for _ in range(args.iters):
                s, m = train_step(s, alpha)
                chain.append(m["loss"])
            np.asarray(chain[-1])
            dt = (time.perf_counter() - t0) / args.iters
            final = np.asarray(jax.device_get(chain), dtype=np.float64)
            assert np.isfinite(final).all(), label
            assert np.isclose(final[0], loss_ref, rtol=1e-5, atol=1e-6), label
            method = "per-step"
        results[label] = 1.0 / dt
        print(json.dumps({"config": label, "updates_per_s": round(1.0 / dt, 1),
                          "ms_per_step": round(dt * 1e3, 3),
                          "method": method,
                          "loss0": round(loss_ref, 6)}), flush=True)

    base_f32 = results.get("f32/off")
    base_bf16 = results.get("bf16/off")
    for label, rate in results.items():
        base = base_bf16 if label.startswith("bf16") else base_f32
        if base:
            print(f"# {label}: {rate:8.1f}/s  ({rate / base:.3f}x vs off)")


if __name__ == "__main__":
    main()
