"""Trainer NashConv hook on large trees (VERDICT round-1 item 8).

The trainer's eval switches to host-driven chunked inference above
``cfg.nashconv_chunk_nodes`` so the (2S, 2, A, A) observation tensor is
never materialized whole (learn/rnad.py::nashconv_fn); the backward
induction is identical, so chunked and fused must agree exactly.
"""

import jax
import numpy as np

from rnad_tpu.config import NetConfig, RNaDConfig, ShapingRule, TreeConfig
from rnad_tpu.env import tree as tree_lib
from rnad_tpu.learn import rnad as rnad_lib
from rnad_tpu.models import nets


def _nashconv_value(tree, cfg):
    net = nets.build_net(NetConfig(type="MLP", max_actions=tree.max_actions,
                                   width=16))
    state = rnad_lib.init_train_state(net, jax.random.PRNGKey(0),
                                      tree.max_actions, cfg)
    *_, nashconv_fn = rnad_lib.make_rnad_fns(net, tree, cfg)
    return float(nashconv_fn(state.variables).nashconv())


def test_chunked_equals_fused(small_tree):
    fused = _nashconv_value(small_tree, RNaDConfig(batch_size=8))
    # chunk of 16 nodes on a 125-node tree: forces many padded chunks
    chunked = _nashconv_value(small_tree,
                              RNaDConfig(batch_size=8,
                                         nashconv_chunk_nodes=16))
    np.testing.assert_allclose(chunked, fused, rtol=1e-6)


def test_trainer_eval_on_half_million_node_tree():
    """A >=500k-node tree must evaluate through the trainer hook without
    materializing whole-tree observations (chunked path, default
    threshold)."""
    cfg_tree = TreeConfig(
        max_actions=5, max_transitions=2, transition_threshold=0.25,
        depth_bound=6,
        depth_bound_rule=ShapingRule(delta=-1, stochastic_delta=-2,
                                     stochastic_prob=0.55))
    try:
        tree = tree_lib.generate_tree_native(cfg_tree, seed=0)
    except RuntimeError:
        tree = tree_lib.generate_tree(cfg_tree, seed=0)
    assert tree.size >= 500_000
    cfg = RNaDConfig(batch_size=8)
    assert tree.size > cfg.nashconv_chunk_nodes  # chunked path selected
    value = _nashconv_value(tree, cfg)
    assert np.isfinite(value) and 0.0 <= value <= 4.0
