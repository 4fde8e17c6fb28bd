"""Benchmark: batched env throughput of the fused rollout on one chip.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "train_updates_per_s": N, "train_env_steps_per_s": N}

Headline metric: environment half-steps per second (the reference's unit of
stepping, one per player per tree level, reference episode.py:194-212)
sustained by the jitted rollout — including actor-net inference and action
sampling, i.e. the full actor phase, not just the env transition.
Baseline target: 10M env-steps/s/chip (BASELINE.md).

The extra ``train_*`` keys track the PRODUCT (the full fused R-NaD train
step — rollout + 4-net inference + v-trace + losses + Adam + EMA — at 32k
lanes in the production bfloat16 configuration), so a rollout-only
optimization cannot mask a train-step regression.
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

    import numpy as np
    from rnad_tpu.ops import stepping

    num_turns = tree.max_depth
    packed = stepping.make_packed_tables(tree)
    # Seat-fused rows-actor: both seats' MLP towers as one matmul pair
    # straight off the gathered packed rows — same math up to reduction
    # order, +18% at this shape (engine.make_mlp_rows_actor,
    # docs/PERF_ANALYSIS.md).
    rows_actor = engine.make_mlp_rows_actor(net, packed)

    # All ITERS rollouts run inside ONE jitted scan, so the measurement is
    # pure device throughput — per-call tunnel latency (~30 ms on this
    # sandbox) neither pollutes nor pipelines into the number.  The result
    # is fetched by value, which also surfaces any deferred async error.
    # Alongside the reward accumulator, every iteration records the std of
    # a per-lane episode signature (reward value x termination time — the
    # rewards buffer is nonzero exactly at the terminal transition).
    # XLA:TPU was observed to collapse the per-lane PRNG inside large fused
    # rollout programs (every lane rolls the identical episode — see
    # tools/check_fused_consistency.py); collapsed lanes all gather the
    # same table rows, which would silently inflate this benchmark, so the
    # measured program asserts its own lane diversity.  The signature reads
    # ONLY the rewards output the accumulator already keeps alive — deriving
    # it from trajectory indices instead forces a second (T, B) scan output
    # to materialize and costs ~25% at 131k lanes.
    t_weights = jnp.arange(1.0, 2 * num_turns + 1.0)[:, None]

    # Per-chip throughput is free to pick its batch: 32k lanes sits closer
    # to the tile-padded matmul floor than 131k (whose per-turn (B, 128)
    # gather intermediates start brushing scoped memory — the regime that
    # fully regresses and then miscompiles above 131k, lane-chunk
    # territory; docs/PERF_ANALYSIS.md).  Both shapes are measured and the
    # headline is the better one, with both rates recorded.
    def measure(batch):
        iters = (1 << 26) // batch  # ~2.3 s per timed program either way

        @jax.jit
        def run_many(tr, pk, vs, key):
            def body(carry, k):
                # policy_minor: the behavior-policy record writes as the
                # unpadded (T, A, B) buffer instead of the ~128/A-tile-
                # padded (T, B, A) one — +5.5% (tools/rollout_probe.py)
                traj = engine.rollout(tr, actor, vs, k, batch, num_turns,
                                      pk, rows_actor=rows_actor,
                                      policy_minor=True)
                acc, min_std = carry
                lane_sig_std = jnp.std((traj.rewards * t_weights).sum(0))
                return (acc + traj.rewards.sum(),
                        jnp.minimum(min_std, lane_sig_std)), None
            carry, _ = jax.lax.scan(body,
                                    (jnp.float32(0.0), jnp.float32(1e9)),
                                    jax.random.split(key, iters))
            return carry

        key = jax.random.PRNGKey(1)
        np.asarray(run_many(tree, packed, variables, key)[0])  # compile
        t0 = time.perf_counter()
        acc, min_std = run_many(tree, packed, variables,
                                jax.random.fold_in(key, 1))
        min_std = float(np.asarray(min_std))
        dt = time.perf_counter() - t0
        assert min_std > 0.0, "PRNG lane collapse in the measured program"
        # Terminal values are in [-1, 1]; outside means the program
        # computed garbage (the >131k one-program miscompile,
        # docs/PERF_ANALYSIS.md).
        mean_return = float(np.asarray(acc)) / (batch * iters)
        assert abs(mean_return) <= 1.0, \
            f"miscompiled rollout program: mean return {mean_return}"
        return 2 * num_turns * batch * iters / dt

    rates = {b: measure(b) for b in (1 << 15, 1 << 17)}
    best_batch = max(rates, key=rates.get)
    rate = rates[best_batch]

    # -- full train step at 32k lanes (the flagship training shape) --------
    from rnad_tpu.config import RNaDConfig
    from rnad_tpu.learn import rnad as rnad_lib

    train_batch = 1 << 15
    tcfg = RNaDConfig(batch_size=train_batch, eta=0.2, bounds=(10**9,),
                      delta_m=(10**9,), lr=5e-4, gamma_averaging=0.001,
                      logit_clip=2.0, fuse_net_passes="auto",
                      frozen_net_dtype="bfloat16")
    tnet = nets.build_net(NetConfig(type="MLP", max_actions=3, width=256,
                                    compute_dtype="bfloat16"))
    train_step, _, _, _ = rnad_lib.make_rnad_fns(tnet, tree, tcfg)
    state = rnad_lib.init_train_state(tnet, jax.random.PRNGKey(2), 3, tcfg)
    alpha = jnp.float32(0.5)
    for _ in range(3):  # compile + warm
        state, metrics = train_step(state, alpha)
    jax.block_until_ready(metrics["loss"])
    steps = 256
    t0 = time.perf_counter()
    # enqueue the whole run, block once: the device executes steps
    # back-to-back while the ~30 ms tunnel round trip is paid once
    for _ in range(steps):
        state, metrics = train_step(state, alpha)
    losses = np.asarray(metrics["loss"])
    train_dt = time.perf_counter() - t0
    assert np.isfinite(losses).all(), "non-finite train loss in bench"
    updates_per_s = steps / train_dt

    print(json.dumps({
        "metric": "env_half_steps_per_s_per_chip",
        "value": round(rate, 1),
        "unit": "steps/s",
        "vs_baseline": round(rate / 1e7, 4),
        "rollout_batch": best_batch,
        "rollout_rates": {str(b): round(r, 1) for b, r in rates.items()},
        "train_updates_per_s": round(updates_per_s, 1),
        "train_env_steps_per_s": round(
            updates_per_s * train_batch * 2 * num_turns, 1),
    }))


if __name__ == "__main__":
    main()
