"""Reference tree.tar interop (VERDICT round-1 item 5).

The reference persists trees as ``torch.save`` of its ``saved_keys`` dict
(reference environment/tree.py:385-433).  ``load_reference_tree`` imports
such a file into a GameTree; the round trip goes through the reference's
own Tree object (build_reference_tree) so both directions of BASELINE
config 1 "shared tree" are covered: ours -> reference (already used by
tools/validate_vs_reference.py) and reference -> ours (this file).
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
if not os.path.isdir(REF):
    pytest.skip("reference unavailable", allow_module_level=True)

from rnad_tpu.env import tree as tree_lib
from rnad_tpu.utils import checkpoint
from tools import validate_vs_reference as vvr


def _save_reference_style(ref_tree, path: str) -> str:
    """Writes tree.tar exactly as reference Tree.save does (tree.py:385-413):
    torch.save of the saved_keys dict."""
    import torch

    saved = {key: ref_tree.__dict__[key] for key in ref_tree.saved_keys}
    tar = os.path.join(path, "tree.tar")
    torch.save(saved, tar)
    return tar


def test_reference_tree_tar_round_trip(tmp_path, small_tree):
    vvr.stub_modules()
    sys.path.insert(0, REF)
    try:
        ref = vvr.build_reference_tree(small_tree)
        tar = _save_reference_style(ref, str(tmp_path))
    finally:
        sys.path.remove(REF)

    loaded = checkpoint.load_reference_tree(tar)

    for field in ("index", "value", "chance", "expected_value", "legal",
                  "solution", "root_value"):
        np.testing.assert_array_equal(
            np.asarray(getattr(loaded, field)),
            np.asarray(getattr(small_tree, field)), err_msg=field)
    # depth is recomputed (the reference does not store it) and must match
    # the generator's stored index
    np.testing.assert_array_equal(np.asarray(loaded.depth),
                                  np.asarray(small_tree.depth))
    assert loaded.max_depth == small_tree.max_depth
    assert loaded.hash == small_tree.hash
    assert loaded.max_actions == small_tree.max_actions
    assert loaded.max_transitions == small_tree.max_transitions

    # directory form also accepted
    loaded2 = checkpoint.load_reference_tree(str(tmp_path))
    assert loaded2.hash == loaded.hash


def test_depth_from_index_matches_generator():
    """depth_from_index reproduces the generator's depth on a stochastic-
    depth tree (uneven subtree heights exercise the per-node max)."""
    from rnad_tpu.config import ShapingRule, TreeConfig

    cfg = TreeConfig(max_actions=3, max_transitions=2, depth_bound=4,
                     transition_threshold=0.3,
                     depth_bound_rule=ShapingRule(delta=-1,
                                                  stochastic_delta=-2,
                                                  stochastic_prob=0.5))
    tree = tree_lib.generate_tree(cfg, seed=11)
    depth = tree_lib.depth_from_index(np.asarray(tree.index),
                                      np.asarray(tree.chance))
    np.testing.assert_array_equal(depth, np.asarray(tree.depth))
