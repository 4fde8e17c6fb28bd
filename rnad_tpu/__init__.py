"""rnad_tpu — TPU-native R-NaD on exactly-solved stochastic matrix-tree games.

Public API (see README.md for the architecture map):

    from rnad_tpu import (TreeConfig, ShapingRule, RNaDConfig, NetConfig,
                          generate_tree, generate_tree_native, GameTree,
                          RNaD)
"""

from .config import NetConfig, RNaDConfig, ShapingRule, TreeConfig  # noqa: F401
from .env.tree import (GameTree, generate_tree,  # noqa: F401
                       generate_tree_native)
from .learn.rnad import RNaD  # noqa: F401

__all__ = [
    "TreeConfig", "ShapingRule", "RNaDConfig", "NetConfig",
    "GameTree", "generate_tree", "generate_tree_native", "RNaD",
]
