"""High-dimensional noisy observation transform (``observations_noisy``).

The reference PROMISES this capability and never ships it — its
``Episode.observations_noisy`` is a ``return None`` stub ("Coming Soon!",
reference environment/episode.py:70-82): "Instead of simply returning the
expected value matrix from the pov of the player, we now transform the
image so it is both high dimensional and noisy.  This allows us to test the
algorithm's robustness to the Credit Assignment problem, and the
effectiveness of representation learning techniques."

This module implements it for real, as a declared, seeded, serializable
transform family (``config.ObsTransformConfig`` — the same
declared-not-lambda philosophy as ``ShapingRule``):

    out[c] = sum_d M[c, d] * raw[d] + bias[c] + sigma * eps[c]   (lifted)
    out[1] = raw legal matrix                                     (passthrough)

where ``raw`` is the (2, A, A) reference observation ([expected_value |
legal], ops/stepping.py::seat_observations), ``M`` is a fixed random
(channels, 2) mixing matrix, ``bias`` a fixed random (channels, A, A)
spatial field — both drawn once from ``ObsTransformConfig.seed``, so the
lift is a pure function of the config — and ``eps`` is fresh unit Gaussian
noise per half-step per lane (per ``apply`` call, keyed by the rollout's
per-turn PRNG stream).

Design notes (TPU-first):

* The lift is computed ON THE FLY from the raw obs already in registers
  after the packed-row gather (one tiny einsum + fused elementwise adds) —
  the packed state table is NOT widened, so rollout HBM gather traffic is
  unchanged regardless of ``channels``.
* The mixing matrix is SHARED across spatial cells (a 1x1 conv in disguise)
  and the bias/noise are per-cell: spatial structure survives the lift, so
  the ConvNet family's locality bias is exactly what the task rewards —
  the representation-learning testbed the reference describes.
* The raw legal matrix rides along unlifted at channel 1 — agents know
  their own legal actions (the reference obs exposes them raw too), and
  every mask consumer in the framework (``Trajectory.obs`` slicing,
  reference episode.py:208) reads ``obs[..., 1, :, 0]`` unchanged.  The
  expected-value matrix itself never appears: with ``channels`` lifted
  channels the payoff is only observable through ``M``'s mixture plus
  noise.
* Information is preserved (the task is well-posed): given ``M`` and
  ``bias``, each cell's lifted vector carries ``channels`` independent
  noisy linear measurements of the payoff entry, so the clean observation
  is recoverable by least squares — see
  tests/test_obs_transform.py::test_lift_is_information_preserving.

Exact evaluation (NashConv) uses the transform with ``key=None`` — the
noise-free lift — scoring the policy induced by the mean observation.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ObsTransformConfig

# apply(obs (..., 2, A, A), key | None) -> (..., channels + 1, A, A)
ObsTransformFn = Callable[[jax.Array, Optional[jax.Array]], jax.Array]


def out_channels(cfg: ObsTransformConfig) -> int:
    """Channel count of transformed observations (raw obs have 2)."""
    if cfg.kind == "none":
        return 2
    return cfg.channels + 1


def make_obs_transform(cfg: ObsTransformConfig, max_actions: int
                       ) -> Optional[ObsTransformFn]:
    """Builds the transform, or None for the raw reference observation.

    The returned function maps (..., 2, A, A) raw seat observations to
    (..., channels + 1, A, A): channel 1 is the raw legal matrix (the
    mask-slice convention of ``Trajectory.obs`` holds for transformed
    observations too); every other channel is a lifted view.  ``key=None``
    applies the deterministic lift only (exact evaluation); a PRNG key adds
    fresh ``sigma``-scaled Gaussian noise to the lifted channels.
    """
    if cfg.kind == "none":
        return None
    if cfg.kind != "lift":
        raise ValueError(f"unknown obs transform kind {cfg.kind!r}; "
                         "expected 'none' or 'lift'")
    if cfg.channels < 1:
        raise ValueError(f"obs transform needs channels >= 1, got "
                         f"{cfg.channels}")
    A = max_actions
    mix, bias = transform_params(cfg, max_actions)

    def apply(obs: jax.Array, key: Optional[jax.Array] = None) -> jax.Array:
        if obs.shape[-3:] != (2, A, A):
            raise ValueError(f"expected raw (..., 2, {A}, {A}) observations,"
                             f" got {obs.shape}")
        lifted = (jnp.einsum("cd,...dij->...cij", mix,
                             obs.astype(jnp.float32))
                  + bias)
        if key is not None and cfg.sigma > 0.0:
            lifted = lifted + cfg.sigma * jax.random.normal(
                key, lifted.shape, jnp.float32)
        legal = obs[..., 1:2, :, :].astype(jnp.float32)
        # channel 1 stays the legal matrix: [lift_0, legal, lift_1, ...]
        return jnp.concatenate(
            [lifted[..., :1, :, :], legal, lifted[..., 1:, :, :]], axis=-3)

    return apply


def transform_params(cfg: ObsTransformConfig, max_actions: int
                     ) -> Tuple[jax.Array, jax.Array]:
    """The (mix, bias) pair the lift uses — for analysis/tests (e.g.
    verifying least-squares recoverability of the clean observation)."""
    if cfg.kind != "lift":
        raise ValueError("transform_params is defined for kind='lift' only")
    A = max_actions
    k_mix, k_bias = jax.random.split(jax.random.PRNGKey(cfg.seed))
    mix = jax.random.normal(k_mix, (cfg.channels, 2),
                            jnp.float32) / math.sqrt(2.0)
    bias = cfg.bias_scale * jax.random.normal(k_bias, (cfg.channels, A, A),
                                              jnp.float32)
    return mix, bias
