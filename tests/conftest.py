"""Test configuration: force CPU with 8 virtual devices.

Distributed/sharding tests run on a virtual 8-device CPU mesh — the
fake-multi-device backend the reference lacks (SURVEY.md §4).  Must run
before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Some sandboxes pre-import jax with a TPU plugin at interpreter boot
# (sitecustomize), which ignores the env vars above; override the platform
# selection through the config API before any backend is initialized.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest

# persistent XLA compilation cache: makes repeat test runs much faster
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/rnad_tpu_xla_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")


@pytest.fixture(scope="session")
def small_tree():
    from rnad_tpu.config import TreeConfig
    from rnad_tpu.env import tree as tree_lib

    cfg = TreeConfig(max_actions=3, max_transitions=2,
                     transition_threshold=0.3, depth_bound=3)
    return tree_lib.generate_tree(cfg, seed=0)


@pytest.fixture(scope="session")
def tiny_tree():
    from rnad_tpu.config import TreeConfig
    from rnad_tpu.env import tree as tree_lib

    cfg = TreeConfig(max_actions=2, max_transitions=1, depth_bound=2)
    return tree_lib.generate_tree(cfg, seed=3)
