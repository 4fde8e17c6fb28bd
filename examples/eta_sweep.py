"""Demo application: the reference's main.py experiment, TPU-native.

Generates the small stochastic demo tree (reference main.py:31-39), saves it,
then sweeps the regularization coefficient eta over {0, 0.2, 0.5, 1}, reusing
the first run's initial network for comparability (reference main.py:47-74).
eta=0 is vanilla policy gradient; NashConv per update lands in each run's
``metrics.jsonl``.

Run from the repo root:  python examples/eta_sweep.py

Beyond the reference demo shape, ``--load-tree`` + the ``--net*`` flags run
the same sweep at scale (e.g. the s32 EquiNet on the 136k-node
``midtree-eta`` tree — docs/SCALE.md's eta study).
"""

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.realpath(__file__))))

from rnad_tpu.config import NetConfig, RNaDConfig, ShapingRule, TreeConfig
from rnad_tpu.env import tree as tree_lib
from rnad_tpu.learn.rnad import RNaD
from rnad_tpu.utils import checkpoint


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument("--bounds", type=int, default=64)
    parser.add_argument("--delta-m", type=int, default=100)
    parser.add_argument("--etas", type=float, nargs="+",
                        default=[0.0, 0.2, 0.5, 1.0])
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--gamma-avg", type=float, default=0.01)
    parser.add_argument("--load-tree", default=None,
                        help="sweep on a saved tree instead of generating "
                             "the demo tree")
    parser.add_argument("--net", choices=["MLP", "ConvNet", "EquiNet"],
                        default="MLP")
    parser.add_argument("--width", type=int, default=256)
    parser.add_argument("--net-depth", type=int, default=1)
    parser.add_argument("--channels", type=int, default=16)
    parser.add_argument("--solver-iters", type=int, default=0)
    parser.add_argument("--solver-prime", action="store_true")
    parser.add_argument("--compute-dtype", default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--name", default=None,
                        help="run-directory prefix (default: a timestamp)")
    parser.add_argument("--expl-mod", type=int, default=1)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--wandb", action="store_true")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.load_tree:
        tree = checkpoint.load_tree(args.load_tree)
    else:
        tree_config = TreeConfig(
            max_actions=3, max_transitions=2, transition_threshold=0.3,
            depth_bound=4,
            depth_bound_rule=ShapingRule(delta=-1, stochastic_delta=-2,
                                         stochastic_prob=0.5),
            desc="3x3 stochastic tree, with depth up to 4")
        tree = tree_lib.generate_tree(tree_config, seed=args.seed)
        tree_lib.assert_index_is_tree(tree)
        checkpoint.save_tree(tree, "small_tree", desc=tree_config.desc,
                             config_json=tree_config.to_json())

    prefix = args.name or str(int(time.time()))
    for idx, eta in enumerate(args.etas):
        same_init = (None if idx == 0
                     else f"{prefix}-eta={args.etas[0]}")
        cfg = RNaDConfig(
            batch_size=args.batch_size, eta=eta,
            bounds=(args.bounds,), delta_m=(args.delta_m,),
            lr=args.lr, gamma_averaging=args.gamma_avg, logit_clip=2.0)
        trial = RNaD(
            tree, cfg,
            NetConfig(type=args.net, max_actions=tree.max_actions,
                      width=args.width, depth=args.net_depth,
                      channels=args.channels,
                      solver_iters=args.solver_iters,
                      solver_prime=args.solver_prime,
                      compute_dtype=args.compute_dtype),
            directory_name=f"{prefix}-eta={eta}",
            seed=args.seed,
            use_same_init_net_as=same_init,
            use_wandb=args.wandb)
        trial.run(log_mod=10, expl_mod=args.expl_mod, checkpoint_mod=1000)
        logging.info("eta=%s final nashconv: %f", eta, trial.final_eval())


if __name__ == "__main__":
    main()
