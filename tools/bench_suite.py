"""Full benchmark suite: rollout, fused train step, and NashConv timings
across batch sizes (BASELINE.md configs 1-3 shapes, single chip).

Writes one JSON line per measurement to stdout and (optionally) a markdown
table to docs/PERF.md with --write-doc.

All measurements pipeline dispatch (enqueue N calls, block once) so they
report sustained device throughput, not per-call host latency.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.realpath(__file__))))

import jax
import jax.numpy as jnp


def sustained(fn, *args, warmup=1, iters=8, depth=2):
    """Sustained per-call time with a bounded dispatch pipeline.

    Keeps at most ``depth`` executions in flight: enough to hide the
    per-call tunnel latency, without queueing unbounded device temps (an
    unbounded queue OOMs large configs and defers async errors past the
    final sync on this platform).
    """
    from collections import deque

    import numpy as np

    def hard_sync(out):
        # A device->host fetch both waits for completion and RAISES deferred
        # async errors; plain block_until_ready on this platform can return
        # without surfacing a failed execution.
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf.ravel()[0:1])

    for _ in range(warmup):
        hard_sync(fn(*args))
    t0 = time.perf_counter()
    inflight = deque()
    for _ in range(iters):
        inflight.append(fn(*args))
        if len(inflight) > depth:
            hard_sync(inflight.popleft())
    while inflight:
        hard_sync(inflight.popleft())
    return (time.perf_counter() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--write-doc", action="store_true")
    parser.add_argument("--batches", type=int, nargs="+",
                        default=[4096, 32768, 131072])
    parser.add_argument("--tree", choices=["demo", "big"], default="demo",
                        help="demo = reference main.py tree; big = deep "
                             "high-branching ~1M-node tree (BASELINE cfg 3)")
    parser.add_argument("--lookup", choices=["gather", "pallas"],
                        default="gather")
    parser.add_argument("--net", choices=["mlp", "conv"], default="mlp",
                        help="actor/learner architecture: the default MLP "
                             "or the AlphaZero-style CrossConv ConvNet "
                             "(reference nn/net.py:88-227)")
    parser.add_argument("--fused-turn", action="store_true",
                        help="also bench the fully-fused Pallas rollout "
                             "turn (ops/pallas_turn.py; MLP + VMEM-table "
                             "trees only)")
    parser.add_argument("--actor-dtype", choices=["float32", "bfloat16"],
                        default="float32",
                        help="operand dtype of the rollout rows-actor "
                             "matmuls (bfloat16 halves the padded-MXU "
                             "wall the rollout is bound by; f32 "
                             "accumulation — see RNaDConfig."
                             "rollout_actor_dtype)")
    parser.add_argument("--max-lanes-per-chunk", type=int, default=1 << 17,
                        help="rollout batches above this run lane-chunked "
                             "(engine lane_chunks): above ~131k lanes per "
                             "chip the one-program rollout both regresses "
                             "(scoped-memory spill) and MISCOMPILES "
                             "(garbage reward sums) on XLA:TPU — "
                             "docs/PERF_ANALYSIS.md")
    args = parser.parse_args()

    from tools import roofline
    from rnad_tpu.config import (NetConfig, RNaDConfig, ShapingRule,
                                 TreeConfig)
    from rnad_tpu.env import engine, tree as tree_lib
    from rnad_tpu.learn import rnad as rnad_lib
    from rnad_tpu.metrics import nashconv as nc
    from rnad_tpu.models import nets

    dev = jax.devices()[0]
    rows = []

    def emit(metric, value, unit, **extra):
        rec = {"metric": metric, "value": round(value, 2), "unit": unit,
               **extra}
        print(json.dumps(rec), flush=True)
        rows.append(rec)

    from rnad_tpu.ops import stepping

    stepping.set_lookup_mode(args.lookup)

    if args.tree == "demo":
        tree_cfg = TreeConfig(
            max_actions=3, max_transitions=2, transition_threshold=0.3,
            depth_bound=4,
            depth_bound_rule=ShapingRule(delta=-1, stochastic_delta=-2,
                                         stochastic_prob=0.5))
    else:
        tree_cfg = TreeConfig(
            max_actions=5, max_transitions=2, transition_threshold=0.25,
            depth_bound=6,
            depth_bound_rule=ShapingRule(delta=-1, stochastic_delta=-2,
                                         stochastic_prob=0.55))
    t0 = time.time()
    try:
        tree = tree_lib.generate_tree_native(tree_cfg, seed=0)
    except RuntimeError:
        tree = tree_lib.generate_tree(tree_cfg, seed=0)
    emit("tree_generation", time.time() - t0, "s", size=tree.size)

    A = tree.max_actions
    def net_config(compute_dtype="float32"):
        if args.net == "conv":
            return NetConfig(type="ConvNet", max_actions=A, channels=16,
                             depth=1, compute_dtype=compute_dtype)
        return NetConfig(type="MLP", max_actions=A, width=256,
                         compute_dtype=compute_dtype)

    # the analytic roofline models the MLP towers; conv rows report raw
    # throughput only
    model_roofline = args.net == "mlp"
    if args.fused_turn and args.net != "mlp":
        raise SystemExit("--fused-turn requires --net mlp (the Pallas turn "
                         "kernel fuses the depth-1 MLP actor)")
    net = nets.build_net(net_config())
    variables = nets.init_variables(net, jax.random.PRNGKey(0), A)
    actor = lambda vs, obs: nets.apply_eval(net, vs, obs)
    T = 2 * tree.max_depth

    import numpy as np

    packed = stepping.make_packed_tables(tree)
    for B in args.batches:
        # tree/packed as jit arguments, not closure constants — closure
        # constants get embedded in the compile payload (a ~1M-node tree
        # overflows the remote-compile request limit).  All iterations run
        # inside ONE jitted scan so measurements are pure device throughput
        # (per-call tunnel latency on this sandbox is ~30 ms).
        # Enough iterations that the ~20-30 ms per-program tunnel dispatch
        # is <2% of the measurement (the scan is rolled, so the trip count
        # does not affect compile time).
        # Long enough that the single dispatch round trip of the timed
        # scan (~30 ms on this sandbox) is <5% even at the smallest batch;
        # the scan is rolled, so the trip count does not affect compile
        # time.
        roll_iters = max(4, min(1024, (1 << 26) // B))

        # The measured program asserts its own per-lane RNG diversity —
        # collapsed lanes would gather one row repeatedly and inflate the
        # number (see bench.py and tools/check_fused_consistency.py).  The
        # per-lane signature (reward x termination time) reads only the
        # rewards output the accumulator already keeps alive; an
        # indices-based length costs an extra (T, B) scan output (~25%
        # at 131k lanes).
        t_w = jnp.arange(1.0, T + 1.0)[:, None]

        # Seat-fused rows-actor for the depth-1 MLP (+18% at 131k —
        # engine.make_mlp_rows_actor); lane-chunking above the scoped-memory
        # boundary (both a 35%+ regression AND a reward-sum miscompile were
        # measured in the one-program form at 262k — docs/PERF_ANALYSIS.md).
        rows_actor = (engine.make_mlp_rows_actor(
            net, packed, compute_dtype=jnp.dtype(args.actor_dtype))
            if args.net == "mlp" else None)
        # Smallest divisor of B with chunks <= max lanes each: ceil division
        # alone can produce a chunk count that does not divide a
        # non-power-of-two B, which rollout_from rejects.
        lane_chunks = next(k for k in range(-(-B // args.max_lanes_per_chunk),
                                            B + 1) if B % k == 0)

        @jax.jit
        def roll_many(tr, pk, vs, key, B=B, n=roll_iters,
                      lane_chunks=lane_chunks):
            def body(carry, k):
                traj = engine.rollout(tr, actor, vs, k, B, tr.max_depth, pk,
                                      lane_chunks=lane_chunks,
                                      rows_actor=rows_actor,
                                      policy_minor=True)
                acc, min_std = carry
                return (acc + traj.rewards.sum(),
                        jnp.minimum(min_std,
                                    jnp.std((traj.rewards * t_w).sum(0)))
                        ), None
            carry, _ = jax.lax.scan(
                body, (jnp.float32(0.0), jnp.float32(1e9)),
                jax.random.split(key, n))
            return carry

        np.asarray(
            roll_many(tree, packed, variables, jax.random.PRNGKey(1))[0])
        t0 = time.perf_counter()
        acc, min_std = roll_many(tree, packed, variables,
                                 jax.random.PRNGKey(2))
        min_std = float(np.asarray(min_std))
        mean_return = float(np.asarray(acc)) / (B * roll_iters)
        dt = (time.perf_counter() - t0) / roll_iters
        assert min_std > 0.0, "PRNG lane collapse in the measured program"
        # Terminal values are in [-1, 1]: a mean return outside that range
        # means the measured program computed garbage (the 262k one-program
        # miscompile manifests as a ~1e27 reward sum).
        assert abs(mean_return) <= 1.0, \
            f"miscompiled rollout program: mean return {mean_return}"
        rmodel = (roofline.rollout_model(A, tree.max_transitions,
                                         tree.max_depth, B, net.width,
                                         rows_actor=rows_actor is not None)
                  if model_roofline else None)
        extra = (roofline.annotate(rmodel, dt, dtype=args.actor_dtype)
                 if model_roofline else {})
        if args.actor_dtype != "float32":
            extra["actor_dtype"] = args.actor_dtype
        if lane_chunks > 1:
            extra["lane_chunks"] = lane_chunks
        emit("rollout_env_steps_per_s", T * B / dt, "steps/s", batch=B,
             **extra)

        if args.fused_turn:
            from rnad_tpu.ops import pallas_turn

            @jax.jit
            def roll_fused_many(pk, vs, key, B=B, n=roll_iters):
                def body(acc, k):
                    traj = pallas_turn.rollout_fused(
                        pk, vs["params"], k, jnp.ones((B,), jnp.int32),
                        tree.max_depth)
                    return acc + traj.rewards.sum(), None
                acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                      jax.random.split(key, n))
                return acc

            np.asarray(roll_fused_many(packed, variables,
                                       jax.random.PRNGKey(1)))
            t0 = time.perf_counter()
            np.asarray(roll_fused_many(packed, variables,
                                       jax.random.PRNGKey(2)))
            dt = (time.perf_counter() - t0) / roll_iters
            emit("rollout_fused_turn_env_steps_per_s", T * B / dt,
                 "steps/s", batch=B, **roofline.annotate(rmodel, dt))

        train_iters = max(4, min(1000, (1 << 23) // B))

        def bench_train(compute_dtype, suffix, dtype_label):
            # the training rollout's rows-actor is f32-only (auto resolves
            # off for bf16 compute — engine.make_mlp_rows_actor)
            tmodel = (roofline.train_model(
                A, tree.max_transitions, tree.max_depth, B, net.width,
                act_elt_bytes=2 if dtype_label == "bfloat16" else 4,
                rows_actor=dtype_label != "bfloat16")
                if model_roofline else None)
            cfg = RNaDConfig(batch_size=B, eta=0.2, bounds=(1,),
                             delta_m=(1,), lr=1e-3, gamma_averaging=0.01,
                             logit_clip=2.0,
                             frozen_net_dtype=compute_dtype)
            tnet = nets.build_net(net_config(compute_dtype))
            train_step, rollout_jit, learn_jit, _ = rnad_lib.make_rnad_fns(
                tnet, tree, cfg)
            state = rnad_lib.init_train_state(tnet, jax.random.PRNGKey(0),
                                              A, cfg)

            # Reference value for the self-check below: the first step
            # through the split (correct-by-construction) programs.
            s_ref, traj_ref = rollout_jit(state)
            _, m_ref = learn_jit(s_ref, traj_ref, jnp.float32(0.5))
            loss_ref = float(np.asarray(m_ref["loss"]))

            # Preferred measurement: all iterations inside ONE jitted scan
            # (no per-call dispatch in the number).  The scanned loop is a
            # bench-only mega-program that XLA:TPU MISCOMPILES at some
            # shapes (B>=131072 f32 demo tree: NaN losses from iteration 0
            # while the per-step program is verified bit-exact vs the
            # split programs — docs/PERF_ANALYSIS.md), so every run
            # SELF-CHECKS: all losses finite and iteration 0 equal to the
            # split-path reference.  If the check fails, fall back to
            # measuring the production per-step program under a bounded
            # dispatch pipeline (adds ~1 ms host overhead per step —
            # negligible exactly at the large batches where the scan
            # miscompiles, 20+ ms steps).
            @jax.jit
            def train_many(tr, pk, s0, n=train_iters):
                def body(s, _):
                    s2, m = train_step.inner(tr, pk, s, jnp.float32(0.5))
                    return s2, m["loss"]
                s_out, losses = jax.lax.scan(body, s0, None, length=n)
                return losses

            # The warm call and the timed call use DIFFERENT states: the
            # axon tunnel serves repeated executions of an identical
            # (program, args) pair from a result cache, so timing a
            # second call with the same args measures the cache, not the
            # device (observed; see tools/rmplus_probe.py).  The warm
            # state differs only by seed — same program.
            state_warm = rnad_lib.init_train_state(
                tnet, jax.random.PRNGKey(7), A, cfg)
            losses_w = np.asarray(train_many(tree, packed, state_warm))
            scan_ok = np.isfinite(losses_w).all()
            if scan_ok:
                t0 = time.perf_counter()
                losses = np.asarray(train_many(tree, packed, state))
                dt = (time.perf_counter() - t0) / train_iters
                scan_ok = (np.isfinite(losses).all()
                           and np.isclose(losses[0], loss_ref,
                                          rtol=1e-5, atol=1e-6))
            if scan_ok:
                method = "scan"
            else:
                print(json.dumps({"note": "scan-of-steps miscompiled "
                                  "(self-check failed); measuring the "
                                  "per-step program", "batch": B,
                                  "dtype": dtype_label}), flush=True)

                # Chained async dispatch of the production per-step
                # program: enqueue every step (each consumes the previous
                # step's state, so the device runs them back-to-back,
                # ~1 ms/call host enqueue hidden under the 20+ ms steps at
                # these batch sizes), sync once at the end — the tunnel
                # round trip is paid once, not per step.  In-flight state
                # is just the small TrainState pytrees.
                alpha = jnp.float32(0.5)

                def run_chain(s, n):
                    losses = []
                    for _ in range(n):
                        s, m = train_step(s, alpha)
                        losses.append(m["loss"])
                    return s, losses

                n = max(8, train_iters)
                _, warm = run_chain(state_warm, 2)  # distinct args: see
                np.asarray(warm[-1])                # the cache note above
                t0 = time.perf_counter()
                _, chain = run_chain(state, n)
                np.asarray(chain[-1])  # sync + surface async errors
                dt = (time.perf_counter() - t0) / n
                final = np.asarray(jax.device_get(chain), dtype=np.float64)
                assert np.isfinite(final).all()
                assert np.isclose(final[0], loss_ref, rtol=1e-5, atol=1e-6)
                method = "per-step"
            troof = (roofline.annotate(tmodel, dt, dtype=dtype_label)
                     if model_roofline else {"dtype": dtype_label})
            troof["method"] = method
            emit("train_steps_per_s" + suffix, 1.0 / dt, "updates/s",
                 batch=B, **troof)
            emit("train_env_steps_per_s" + suffix, T * B / dt, "steps/s",
                 batch=B, **troof)

        # f32 = reference-bit-exact mode; bf16 = the TPU-native compute
        # mode (net + frozen passes in bfloat16, gradients/optimizer f32)
        bench_train("float32", "", "float32")
        bench_train("bfloat16", "_bf16", "bfloat16")
        import gc

        gc.collect()

    joint = nc.joint_policy_from_net(tree, actor, variables)
    # All iterations in one jitted scan (the per-call tunnel round trip of
    # this sandbox, ~25 ms, would otherwise swamp a millisecond-scale
    # eval).  Each iteration perturbs the joint policy by a traced
    # zero-in-f32 scale so XLA cannot hoist the loop-invariant induction.
    nc_iters = max(4, min(64, (1 << 21) // tree.size))

    @jax.jit
    def nconv_many(tr, jp, n=nc_iters):
        def body(acc, k):
            jp_k = jp * (1.0 + 1e-30 * k)
            return acc + nc.nashconv_pure(tr, jp_k).nashconv(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(n, dtype=jnp.float32))
        return acc

    ref = float(np.asarray(
        jax.jit(lambda tr, jp: nc.nashconv_pure(tr, jp).nashconv())(
            tree, joint)))
    total = float(np.asarray(nconv_many(tree, joint)))  # compile + warm
    assert abs(total / nc_iters - ref) < 1e-4 * max(1.0, abs(ref))
    # Timed call uses bitwise-different args than the warm call (the
    # tunnel result-caches identical (program, args) executions — see the
    # bench_train cache note); the policy renormalizes, so scaling is
    # value-neutral up to rounding and nothing downstream asserts on it.
    joint_t = joint * np.float32(1.0000001)
    jax.block_until_ready(joint_t)
    t0 = time.perf_counter()
    np.asarray(nconv_many(tree, joint_t))
    dt = (time.perf_counter() - t0) / nc_iters
    emit("nashconv_eval", dt * 1e3, "ms", tree_size=tree.size)

    if args.write_doc:
        os.makedirs("docs", exist_ok=True)
        with open("docs/PERF.md", "w") as f:
            f.write(f"# Performance ({dev.device_kind}, 1 chip)\n\n"
                    "Generated by tools/bench_suite.py.  `%roof` is the "
                    "analytic ACHIEVABLE speed-of-light bound of "
                    "tools/roofline.py — max of HBM-bytes time and "
                    "tile-padded MXU time (each matmul charged at "
                    "`2*M*ceil(K,128)*ceil(N,128)`: the real rate of the "
                    "128x128 systolic array on these small-K/N net "
                    "shapes) for the unavoidable work — divided by the "
                    "measured time; `bound` names the binding side "
                    "(`mxu-pad` = padded-matmul wall) and `%hbm` isolates "
                    "the byte budget as a fraction of wire speed.  The "
                    "padded-MXU charge carries tile-granularity "
                    "assumptions (which dots XLA pads vs lowers to the "
                    "VPU), so `%roof` is a ~±10% estimate — a small-batch "
                    "row can read near or just above 100; `%hbm` is a "
                    "hard bound.  "
                    "Per-phase trace attribution and the large-batch "
                    "scaling analysis live in docs/PERF_ANALYSIS.md.  "
                    "`train_steps_per_s` is the reference-bit-exact f32 "
                    "mode; `_bf16` is the TPU-native bfloat16 compute "
                    "mode (net + frozen passes bf16, gradients/optimizer "
                    "f32).\n\n"
                    "| metric | batch | value | unit | %roof | %hbm "
                    "| bound |\n"
                    "|---|---|---|---|---|---|---|\n")
            for r in rows:
                if "metric" not in r:
                    continue  # informational notes (e.g. scan fallback)
                name = r["metric"]
                if r.get("method") == "per-step":
                    # scan-of-steps self-check failed for this config; the
                    # number is the per-step production program (see
                    # docs/PERF_ANALYSIS.md)
                    name += " *"
                f.write(f"| {name} | {r.get('batch', '-')} "
                        f"| {r['value']:,} | {r['unit']} "
                        f"| {r.get('pct_of_roof', '-')} "
                        f"| {r.get('pct_of_hbm', '-')} "
                        f"| {r.get('bound', '-')} |\n")
            if any(r.get("method") == "per-step" for r in rows):
                f.write("\n`*` scan-of-steps self-check failed for this "
                        "config (XLA:TPU miscompile, docs/PERF_ANALYSIS.md)"
                        "; the number measures the per-step production "
                        "program via chained async dispatch.\n")
            f.write(
                "\n## How these numbers relate to the other published "
                "numbers\n\n"
                "Three harnesses measure the same programs with different "
                "denominators; when comparing, match the method:\n\n"
                "- **This table** (tools/bench_suite.py): N iterations "
                "inside one jitted scan (or, for `*` rows, chained "
                "per-step dispatch), so the per-program tunnel round trip "
                "is amortized below a few percent.  Wall-clock sustained "
                "throughput.\n"
                "- **bench.py** (the driver headline; BENCH_r0N.json): the "
                "same scan method at one shape — demo tree, 131,072 lanes, "
                "512 rollouts per timed program — plus a fused-train-step "
                "rate at 32,768 lanes measured with chained per-step "
                "dispatch (production dispatch mode, so it reads a few "
                "percent below this table's scan numbers for the same "
                "shape).\n"
                "- **docs/PERF_ANALYSIS.md**: device-busy time from "
                "xplane traces (jax.profiler), i.e. excluding all host/"
                "dispatch overhead — its per-step times are the floor the "
                "two wall-clock harnesses approach from above.\n\n"
                "Any residual disagreement between same-method, same-shape "
                "numbers in different docs means one of them is stale: "
                "this file and docs/PERF_ANALYSIS.md carry their "
                "generation context in git history; BENCH_rNN.json is "
                "written by the round driver at round end.\n")
        print("wrote docs/PERF.md")


if __name__ == "__main__":
    main()
