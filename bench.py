"""Benchmark: batched env throughput of the fused rollout on one chip.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: environment half-steps per second (the reference's unit of stepping,
one per player per tree level, reference environment/episode.py:194-212)
sustained by the jitted rollout — including actor-net inference and action
sampling, i.e. the full actor phase, not just the env transition.
Baseline target: 10M env-steps/s/chip (BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from rnad_tpu.config import NetConfig, ShapingRule, TreeConfig
    from rnad_tpu.env import engine, tree as tree_lib
    from rnad_tpu.models import nets

    # The reference demo tree shape (main.py:31-39).
    cfg = TreeConfig(
        max_actions=3, max_transitions=2, transition_threshold=0.3,
        depth_bound=4,
        depth_bound_rule=ShapingRule(delta=-1, stochastic_delta=-2,
                                     stochastic_prob=0.5))
    tree = tree_lib.generate_tree(cfg, seed=0)

    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=256))
    variables = nets.init_variables(net, jax.random.PRNGKey(0), 3)
    actor = lambda vs, obs: nets.apply_eval(net, vs, obs)

    batch = 1 << 17  # 131072 lanes
    num_turns = tree.max_depth

    @jax.jit
    def run(vs, key):
        traj = engine.rollout(tree, actor, vs, key, batch, num_turns)
        # reduce to a scalar so only 4 bytes come back per call
        return traj.rewards.sum()

    key = jax.random.PRNGKey(1)
    run(variables, key).block_until_ready()  # compile

    # pick an iteration count that runs ~3 seconds
    t0 = time.perf_counter()
    run(variables, key).block_until_ready()
    per_call = time.perf_counter() - t0
    iters = max(5, int(3.0 / max(per_call, 1e-4)))

    keys = [jax.random.fold_in(key, i) for i in range(iters)]
    # enqueue asynchronously; block once at the end (dispatch pipelines)
    t0 = time.perf_counter()
    outs = [run(variables, k) for k in keys]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    half_steps = 2 * num_turns * batch * iters
    rate = half_steps / dt
    print(json.dumps({
        "metric": "env_half_steps_per_s_per_chip",
        "value": round(rate, 1),
        "unit": "steps/s",
        "vs_baseline": round(rate / 1e7, 4),
    }))


if __name__ == "__main__":
    main()
