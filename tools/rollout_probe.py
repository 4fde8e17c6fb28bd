"""A/B probe: rollout engine variants at production shapes.

Variants (comma list via --variants):
  base        generic engine path (lookup -> obs slice/concat -> net.apply)
  fused       seat-fused rows-actor (engine.make_mlp_rows_actor): one
              (B, D_pad) x (D_pad, 4W) matmul pair straight off the packed
              rows — no per-turn obs slice/concat copies
  fused_chunkN  fused + lane_chunks=N (sequential sub-batches; the
              single-chip fix for the >131k scoped-memory spill,
              docs/PERF_ANALYSIS.md)
  chunkN      generic path + lane_chunks=N
  *_pmin      store the behavior-policy record batch-minor (T, A, B) —
              the (T, B, A) scan output pads its trailing A to the
              128-lane tile (env/engine.py::Trajectory.policy)

Method mirrors bench.py: ITERS rollouts inside one jitted scan so the
number is pure device throughput; per-lane episode-diversity self-check
inside the measured program.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.realpath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1 << 17)
    ap.add_argument("--iters", type=int, default=256)
    ap.add_argument("--variants", default="base,fused")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from rnad_tpu.config import NetConfig, ShapingRule, TreeConfig
    from rnad_tpu.env import engine, tree as tree_lib
    from rnad_tpu.models import nets
    from rnad_tpu.ops import stepping

    cfg = TreeConfig(
        max_actions=3, max_transitions=2, transition_threshold=0.3,
        depth_bound=4,
        depth_bound_rule=ShapingRule(delta=-1, stochastic_delta=-2,
                                     stochastic_prob=0.5))
    tree = tree_lib.generate_tree(cfg, seed=0)
    packed = stepping.make_packed_tables(tree)
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=256))
    variables = nets.init_variables(net, jax.random.PRNGKey(0), 3)
    actor = lambda vs, obs: nets.apply_eval(net, vs, obs)
    rows_actor = engine.make_mlp_rows_actor(net, packed)

    B = args.batch
    num_turns = tree.max_depth
    T = 2 * num_turns
    t_weights = jnp.arange(1.0, T + 1.0)[:, None]

    def parse(name):
        m = re.fullmatch(
            r"(base|fused)(_pmin)?(?:_chunk(\d+))?|chunk(\d+)", name)
        if not m:
            raise ValueError(f"unknown variant {name}")
        fused = m.group(1) == "fused"
        pmin = m.group(2) is not None
        chunks = int(m.group(3) or m.group(4) or 1)
        return fused, pmin, chunks

    results = {}
    for name in args.variants.split(","):
        use_fused, pmin, chunks = parse(name)

        def roll(vs, key, use_fused=use_fused, pmin=pmin, chunks=chunks):
            return engine.rollout(
                tree, actor, vs, key, B, num_turns, packed,
                lane_chunks=chunks,
                rows_actor=rows_actor if use_fused else None,
                policy_minor=pmin)

        @jax.jit
        def run_many(vs, key, roll=roll):
            def body(carry, k):
                traj = roll(vs, k)
                acc, min_std = carry
                sig = jnp.std((traj.rewards * t_weights).sum(0))
                return (acc + traj.rewards.sum(),
                        jnp.minimum(min_std, sig)), None
            return jax.lax.scan(body, (jnp.float32(0.0), jnp.float32(1e9)),
                                jax.random.split(key, args.iters))[0]

        key = jax.random.PRNGKey(1)
        np.asarray(run_many(variables, key)[0])  # compile + warm
        t0 = time.perf_counter()
        acc, min_std = run_many(variables, jax.random.fold_in(key, 1))
        acc = float(np.asarray(acc))
        dt = time.perf_counter() - t0
        assert float(np.asarray(min_std)) > 0.0, f"{name}: lane collapse"
        mean_return = acc / (B * args.iters)
        if abs(mean_return) > 1.0:
            print(f"# {name}: MISCOMPILED (mean return {mean_return:.3e} "
                  "outside [-1, 1]) — throughput reported for diagnosis "
                  "only")
        rate = T * B * args.iters / dt
        results[name] = rate
        print(json.dumps({"variant": name, "half_steps_per_s": round(rate),
                          "dt_s": round(dt, 3),
                          "mean_return": round(mean_return, 4)}))

    if "base" in results:
        for k, v in results.items():
            if k != "base":
                print(f"# {k}: {v / results['base']:.3f}x base")


if __name__ == "__main__":
    main()
