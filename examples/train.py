"""General training entrypoint.

Generates (or loads) a game tree, then runs R-NaD with either the demo
hyperparameters or the DeepNash paper schedule, optionally data-parallel
over all local devices (multi-host via --coordinator/--num-processes).

Examples:
  python examples/train.py --demo                      # reference demo run
  python examples/train.py --tree-depth 6 --max-actions 5 \
      --batch-size 32768 --data-parallel                # big tree, sharded
  python examples/train.py --load-tree small_tree      # reuse a saved tree
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.realpath(__file__))))

from rnad_tpu.config import NetConfig, RNaDConfig, ShapingRule, TreeConfig
from rnad_tpu.env import tree as tree_lib
from rnad_tpu.learn import rnad as rnad_lib
from rnad_tpu.utils import checkpoint


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--name", default=None, help="run directory name")
    p.add_argument("--seed", type=int, default=0)
    # tree
    p.add_argument("--load-tree", default=None)
    p.add_argument("--load-reference-tree", default=None, metavar="PATH",
                   help="import a reference-format tree.tar (torch.save of "
                        "the saved_keys dict) and train on it")
    p.add_argument("--max-actions", type=int, default=3)
    p.add_argument("--max-transitions", type=int, default=2)
    p.add_argument("--tree-depth", type=int, default=4)
    p.add_argument("--transition-threshold", type=float, default=0.3)
    p.add_argument("--stochastic-depth", action="store_true",
                   help="depth rule -1 with --stochastic-prob extra -2 "
                        "(reference demo)")
    p.add_argument("--stochastic-prob", type=float, default=0.5,
                   help="probability of the extra -2 depth decrement when "
                        "--stochastic-depth is set")
    p.add_argument("--native-gen", action="store_true",
                   help="use the C++ generator (fast for big trees)")
    # training
    p.add_argument("--demo", action="store_true",
                   help="reference main.py hyperparameters")
    p.add_argument("--eta", type=float, default=0.2)
    p.add_argument("--batch-size", type=int, default=768)
    # schedule / optimizer overrides (defaults: DeepNash paper values,
    # reference rnad.py:40-64; the reference edits these in code)
    p.add_argument("--bounds", type=int, nargs="+", default=None,
                   help="(n, m) schedule period bounds, e.g. --bounds 30 "
                        "60 90")
    p.add_argument("--delta-m", type=int, nargs="+", default=None,
                   help="steps per update period in each bounds segment")
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--lr-schedule", default=None,
                   choices=["constant", "cosine"],
                   help="constant (reference-exact) or cosine decay to "
                        "lr * lr-final-fraction over --lr-decay-steps "
                        "(RNaDConfig.lr_schedule)")
    p.add_argument("--lr-decay-steps", type=int, default=None)
    p.add_argument("--lr-final-fraction", type=float, default=None)
    p.add_argument("--policy-warmup", type=int, default=None,
                   help="critic-first warmup: gate the NeuRD policy loss "
                        "to zero for this many initial learner steps "
                        "(RNaDConfig.policy_warmup_steps)")
    p.add_argument("--gamma-avg", type=float, default=None,
                   help="EMA rate of the target net (gamma_averaging)")
    p.add_argument("--fuse-net-passes", default=None,
                   choices=["off", "heads", "frozen", "all", "auto"],
                   help="fuse the step's identical-shape MLP forwards into "
                        "one matmul pair (RNaDConfig.fuse_net_passes)")
    p.add_argument("--frozen-dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="dtype of the 3 frozen-net learner forwards")
    p.add_argument("--learner-layout", default=None,
                   choices=["bma", "amb", "auto"],
                   help="v-trace/loss tensor layout: reference (T, B, A), "
                        "batch-minor (T, A, B), or auto (minor on TPU; "
                        "RNaDConfig.learner_layout)")
    p.add_argument("--flat-optimizer", action="store_true", default=None,
                   help="run clip+Adam+EMA on one raveled vector "
                        "(RNaDConfig.flat_optimizer; bit-exact)")
    p.add_argument("--vtrace-mode", default=None,
                   choices=["scan", "associative", "auto"],
                   help="v-trace time recursion: sequential scan, "
                        "parallel-in-time associative scan, or auto "
                        "(associative past 2x the scan unroll cap)")
    p.add_argument("--net", choices=["MLP", "ConvNet", "EquiNet"],
                   default="MLP")
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--net-depth", type=int, default=1,
                   help="MLP hidden / ConvNet residual / EquiNet layers")
    p.add_argument("--channels", type=int, default=16,
                   help="ConvNet / EquiNet only")
    p.add_argument("--solver-iters", type=int, default=0,
                   help="EquiNet only: RM+ solver-iterate input features "
                        "(models/nets.py::_solver_features)")
    p.add_argument("--solver-prime", action="store_true",
                   help="EquiNet only: primed heads — step-0 policy/value "
                        "is the RM+ solve, training learns the correction")
    p.add_argument("--compute-dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--reg-anchor", default=None,
                   choices=["target", "best", "fixed"],
                   help="regularization rotation at update boundaries: "
                        "'target' = reference rotation; 'best' = anchor "
                        "pi_reg to the best checkpoint's target whenever "
                        "the boundary eval worsened; 'fixed' = never "
                        "rotate, anchor to the init nets for the whole "
                        "run (RNaDConfig.reg_anchor)")
    p.add_argument("--obs-lift", type=int, default=None, metavar="C",
                   help="enable the high-dimensional noisy observation "
                        "transform with C lifted channels (the reference's "
                        "observations_noisy promise, ops/obs_transform.py)")
    p.add_argument("--obs-noise-sigma", type=float, default=0.1,
                   help="per-half-step Gaussian noise std of --obs-lift")
    p.add_argument("--obs-lift-bias", type=float, default=1.0,
                   help="fixed random spatial bias scale of --obs-lift")
    p.add_argument("--obs-lift-seed", type=int, default=0,
                   help="parameter seed of --obs-lift")
    p.add_argument("--n-batches-per-buffer", type=int, default=1,
                   help="replay-buffer capacity in rollout batches; 1 = "
                        "on-policy (reference episode.py:292-334)")
    p.add_argument("--buffer-mod", type=int, default=1,
                   help="roll out a fresh batch every this many learner "
                        "steps (off-policy ratio)")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard lanes over all local devices")
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (JAX_PLATFORMS alone does "
                        "not override the axon sitecustomize pre-import; "
                        "same pattern as the tools' --cpu flags)")
    p.add_argument("--max-updates", type=int, default=10**6)
    p.add_argument("--checkpoint-mod", type=int, default=1000)
    p.add_argument("--expl-mod", type=int, default=1)
    p.add_argument("--log-mod", type=int, default=20)
    p.add_argument("--wandb", action="store_true")
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from rnad_tpu.parallel import runtime
    runtime.initialize_distributed(args.coordinator, args.num_processes,
                                   args.process_id)

    if args.load_reference_tree:
        tree = checkpoint.load_reference_tree(args.load_reference_tree)
    elif args.load_tree:
        tree = checkpoint.load_tree(args.load_tree)
    else:
        depth_rule = (ShapingRule(delta=-1, stochastic_delta=-2,
                                  stochastic_prob=args.stochastic_prob)
                      if args.stochastic_depth else ShapingRule(delta=-1))
        tree_cfg = TreeConfig(
            max_actions=args.max_actions,
            max_transitions=args.max_transitions,
            depth_bound=args.tree_depth,
            transition_threshold=args.transition_threshold,
            depth_bound_rule=depth_rule)
        gen = (tree_lib.generate_tree_native if args.native_gen
               else tree_lib.generate_tree)
        tree = gen(tree_cfg, seed=args.seed)
        tree_lib.assert_index_is_tree(tree)
        import jax
        if jax.process_index() == 0:  # run dir is shared across processes
            checkpoint.save_tree(tree, args.name or "train_tree",
                                 config_json=tree_cfg.to_json())
    logging.info("tree: size=%d depth=%d hash=%d", tree.size, tree.max_depth,
                 tree.hash)

    buffer_kw = dict(n_batches_per_buffer=args.n_batches_per_buffer,
                     buffer_mod=args.buffer_mod)
    if args.fuse_net_passes is not None:
        buffer_kw["fuse_net_passes"] = args.fuse_net_passes
    if args.obs_lift is not None:
        from rnad_tpu.config import ObsTransformConfig
        buffer_kw["obs_transform"] = ObsTransformConfig(
            kind="lift", channels=args.obs_lift,
            sigma=args.obs_noise_sigma, bias_scale=args.obs_lift_bias,
            seed=args.obs_lift_seed)
    if args.demo:
        cfg = RNaDConfig(batch_size=512, eta=args.eta, bounds=(64,),
                         delta_m=(100,), lr=1e-3, gamma_averaging=0.01,
                         logit_clip=2.0, **buffer_kw)
    else:
        # DeepNash paper schedule (reference rnad.py:40-64 defaults),
        # overridable per flag
        override_kw = {k: v for k, v in dict(
            bounds=tuple(args.bounds) if args.bounds else None,
            delta_m=tuple(args.delta_m) if args.delta_m else None,
            lr=args.lr, lr_schedule=args.lr_schedule,
            lr_decay_steps=args.lr_decay_steps,
            lr_final_fraction=args.lr_final_fraction,
            policy_warmup_steps=args.policy_warmup,
            gamma_averaging=args.gamma_avg,
            frozen_net_dtype=args.frozen_dtype,
            learner_layout=args.learner_layout,
            flat_optimizer=args.flat_optimizer,
            vtrace_mode=args.vtrace_mode,
            reg_anchor=args.reg_anchor).items() if v is not None}
        cfg = RNaDConfig(batch_size=args.batch_size, eta=args.eta,
                         **buffer_kw, **override_kw)

    net_cfg = NetConfig(type=args.net, max_actions=tree.max_actions,
                        width=args.width, depth=args.net_depth,
                        channels=args.channels,
                        solver_iters=args.solver_iters,
                        solver_prime=args.solver_prime,
                        compute_dtype=args.compute_dtype)

    trainer = rnad_lib.RNaD(tree, cfg, net_cfg, directory_name=args.name,
                            seed=args.seed, use_wandb=args.wandb)
    if args.data_parallel:
        from rnad_tpu.parallel import runtime as rt

        (trainer.train_step, trainer.rollout_jit, trainer.learn_jit,
         trainer.nashconv_fn), mesh, place = rt.make_sharded_rnad_fns(
            trainer.net, tree, cfg)
        trainer.initialize()
        trainer.state = place(trainer.state)
        logging.info("sharded over mesh %s", dict(mesh.shape))
    trainer.run(max_updates=args.max_updates,
                checkpoint_mod=args.checkpoint_mod,
                expl_mod=args.expl_mod, log_mod=args.log_mod)
    logging.info("final nashconv: %f", trainer.final_eval())


if __name__ == "__main__":
    main()
