"""On-device check: the fused train step must equal rollout + learn run as
separate programs, bit for bit.

Why this exists: XLA:TPU was observed to miscompile the fused
rollout+learner program at large shapes (785k-node tree, T=12, A=5,
B=131072 on v5e) in two ways — a (T, B, A) tiny-trailing-dim scan-output
buffer (the stored legal masks) misread by the learner phase (-inf NeuRD
loss), and, in a differently-perturbed program, collapsed per-lane PRNG
counters (every lane rolled the identical episode).  The production step
was restructured around both (masks are a slice of the stored
observations; regather mode runs as two programs; an optimization_barrier
pins the phase boundary — see docs/PERF_ANALYSIS.md).  This tool
re-verifies the equivalence on real hardware at any configuration, since a
compiler bug of this class is shape- and program-dependent.

Usage:
    python tools/check_fused_consistency.py [--tree demo|big] [--batch N]
        [--dtype float32|bfloat16] [--cpu]

Exits 0 and prints PASS if the trajectory checksums and first-step metrics
match exactly; exits 1 with a diff otherwise.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.realpath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tree", default="demo",
                        help="'demo', 'big', or the name of a saved tree "
                             "under saved_trees/ (e.g. 'deeptree-t36' to "
                             "check the associative-v-trace T=36 shape)")
    parser.add_argument("--batch", type=int, default=4096)
    parser.add_argument("--dtype", choices=["float32", "bfloat16"],
                        default="float32")
    parser.add_argument("--fuse",
                        choices=["off", "heads", "frozen", "all", "auto"],
                        default="off",
                        help="RNaDConfig.fuse_net_passes for the checked "
                             "step (the fused-matmul net passes)")
    parser.add_argument("--layout", choices=["bma", "amb", "auto"],
                        default="bma",
                        help="RNaDConfig.learner_layout for the checked "
                             "step (batch-minor v-trace/loss tensors)")
    parser.add_argument("--flat-optimizer", action="store_true",
                        help="RNaDConfig.flat_optimizer for the checked "
                             "step")
    parser.add_argument("--vtrace-mode", choices=["scan", "associative",
                                                  "auto"], default="auto",
                        help="RNaDConfig.vtrace_mode for the checked step")
    parser.add_argument("--rows-actor", choices=["auto", "on", "off"],
                        default="auto",
                        help="RNaDConfig.rollout_rows_actor (bisection "
                             "knob: the seat-fused rollout actor)")
    parser.add_argument("--actor-dtype", choices=["float32", "bfloat16"],
                        default="float32",
                        help="RNaDConfig.rollout_actor_dtype")
    parser.add_argument("--probe-split", action="store_true",
                        help="additionally validate the SPLIT rollout's "
                             "trajectory with a third, small jitted "
                             "program (policy-vs-recompute kld, value "
                             "recompute error, reward stats) — isolates "
                             "whether a split-path FAIL corrupts in the "
                             "rollout program or the learner program")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (sanity mode)")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from rnad_tpu.config import (NetConfig, RNaDConfig, ShapingRule,
                                 TreeConfig)
    from rnad_tpu.env import engine, tree as tree_lib
    from rnad_tpu.learn import rnad as rnad_lib
    from rnad_tpu.models import nets
    from rnad_tpu.ops import stepping

    tree = tcfg = None
    if args.tree == "demo":
        tcfg = TreeConfig(
            max_actions=3, max_transitions=2, transition_threshold=0.3,
            depth_bound=4,
            depth_bound_rule=ShapingRule(delta=-1, stochastic_delta=-2,
                                         stochastic_prob=0.5))
    elif args.tree == "big":
        tcfg = TreeConfig(
            max_actions=5, max_transitions=2, transition_threshold=0.25,
            depth_bound=6,
            depth_bound_rule=ShapingRule(delta=-1, stochastic_delta=-2,
                                         stochastic_prob=0.55))
    else:
        from rnad_tpu.utils import checkpoint
        tree = checkpoint.load_tree(args.tree)
    if tree is None:
        try:
            tree = tree_lib.generate_tree_native(tcfg, seed=0)
        except RuntimeError:
            tree = tree_lib.generate_tree(tcfg, seed=0)
    A = tree.max_actions
    print(f"tree={tree.size} A={A} depth={tree.max_depth} "
          f"batch={args.batch} dtype={args.dtype} "
          f"device={jax.devices()[0].device_kind}", flush=True)

    net = nets.build_net(NetConfig(type="MLP", max_actions=A, width=256,
                                   compute_dtype=args.dtype))
    cfg = RNaDConfig(batch_size=args.batch, eta=0.2, bounds=(1,),
                     delta_m=(1,), lr=1e-3, gamma_averaging=0.01,
                     logit_clip=2.0, frozen_net_dtype=args.dtype,
                     fuse_net_passes=args.fuse,
                     learner_layout=args.layout,
                     flat_optimizer=args.flat_optimizer,
                     vtrace_mode=args.vtrace_mode,
                     rollout_rows_actor=args.rows_actor,
                     rollout_actor_dtype=args.actor_dtype)
    train_step, rollout_jit, learn_jit, _ = rnad_lib.make_rnad_fns(
        net, tree, cfg)
    state = rnad_lib.init_train_state(net, jax.random.PRNGKey(0), A, cfg)

    # Split: rollout and learn as separate device programs.
    state_s, traj = rollout_jit(state)

    if args.probe_split:
        # Third program, far below the miscompile size class: recompute
        # the behavior policy and values from the trajectory's own stored
        # observations and compare against the rollout's records.  Garbage
        # here => the ROLLOUT program wrote a corrupt trajectory; sane
        # here with a FAIL below => the LEARNER program misreads it.
        from rnad_tpu.metrics.nashconv import kld as kld_fn

        @jax.jit
        def probe(variables, traj):
            obs, masks = engine.trajectory_observations(packed_t, traj)
            Tn, Bn = traj.indices.shape
            obs_flat = obs.reshape((Tn * Bn,) + obs.shape[2:])
            from rnad_tpu.models import common
            from rnad_tpu.models import nets as nets_lib
            logits, values = nets_lib.apply_eval(net, variables,
                                                 obs_flat.astype(jnp.float32))
            pi = common.masked_policy(logits.reshape(Tn, Bn, A),
                                      masks.reshape(Tn, Bn, A))
            valid = traj.valid()
            k = kld_fn(traj.policy_bma(), pi, valid,
                       masks.reshape(Tn, Bn, A))
            verr = (jnp.abs(values.reshape(Tn, Bn) - traj.values)
                    * valid).sum() / valid.sum()
            ret = traj.rewards.sum(0)
            return k, verr, ret.mean(), jnp.abs(ret).max()

        packed_t = stepping.make_packed_tables(tree)
        k, verr, rmean, rmax = [float(jax.device_get(v))
                                for v in probe(state_s.variables, traj)]
        print(f"probe-split: policy_kld={k:.6g} value_err={verr:.6g} "
              f"mean_return={rmean:.4f} max|return|={rmax:.2f}", flush=True)

    _, metrics_split = learn_jit(state_s, traj, jnp.float32(0.5))

    # Fused: the production one-program step on an identical fresh state.
    _, metrics_fused = train_step(state, jnp.float32(0.5))

    # Trajectory checksums of what the fused program rolled are not
    # directly observable; compare every returned metric instead (the loss,
    # v-trace and diagnostic metrics are sensitive to any trajectory or
    # mask corruption) plus the split trajectory's own sanity.
    failures = []
    exact = True
    for k in sorted(dict(metrics_split)):
        a = float(jax.device_get(metrics_split[k]))
        b = float(jax.device_get(metrics_fused[k]))
        if a != b:
            exact = False
        # The miscompile shifts metrics by orders of magnitude (or to
        # -inf); a loose tolerance separates it from any last-ulp fusion
        # difference between the two compilations.
        if not np.allclose(a, b, rtol=1e-4, atol=1e-6, equal_nan=True):
            failures.append(f"  {k}: split={a!r} fused={b!r}")
        if not np.isfinite(a):
            failures.append(f"  {k}: split value non-finite ({a!r})")

    valid = np.asarray(traj.valid())
    lanes_alive = valid[0].sum()
    if lanes_alive != args.batch:
        failures.append(f"  rollout: only {lanes_alive} live lanes at t=0")
    # Lane-collapse detector: with independent per-lane sampling the
    # episode-length distribution over a big batch is never a point mass.
    lens = valid.sum(0)
    if args.batch >= 256 and float(lens.std()) == 0.0:
        failures.append("  rollout: all lanes have identical episode "
                        "length (PRNG lane collapse)")

    if args.tree == "demo" and args.batch >= 4096:
        stepping_obs, _ = engine.trajectory_observations(
            stepping.make_packed_tables(tree), traj)
        if not np.isfinite(np.asarray(stepping_obs)).all():
            failures.append("  rollout: non-finite observations")

    if failures:
        print("FAIL: fused train step != split rollout+learn:")
        print("\n".join(failures))
        sys.exit(1)
    loss = float(jax.device_get(metrics_split["loss"]))
    print(f"PASS: fused == split ({'bit-exact' if exact else 'within tol'}),"
          f" loss={loss:.6g}")


if __name__ == "__main__":
    main()
