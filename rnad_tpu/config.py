"""Typed configuration objects for the rnad_tpu framework.

The reference configures everything through Python constructor kwargs
(``Tree.__init__`` at reference environment/tree.py:67-113 and
``RNaD.__init__`` at reference learn/rnad.py:34-74), including three arbitrary
Python lambdas that shape the generated game tree.  Lambdas are not
serializable and not vectorizable, so here they are replaced by a declared
family of shaping rules (``ShapingRule``) that covers every use in the
reference (constant, decrement-by-one, and the stochastic-decrement rule used
by reference main.py:37) while remaining a pure function of
``(parent_value, uniform_draw)`` — which is what makes level-synchronous,
fully vectorized tree generation possible.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class ShapingRule:
    """Declared replacement for the reference's shaping lambdas.

    ``new = old + delta + (u < stochastic_prob) * stochastic_delta`` where
    ``u ~ U[0, 1)`` is drawn independently per child.

    Reference defaults (environment/tree.py:148-162):
      * row/col actions: identity          -> ShapingRule()
      * depth bound:     decrement by one  -> ShapingRule(delta=-1)
    Reference main.py:37 (``depth_bound - 1 - 2 * (random() < 0.5)``):
      -> ShapingRule(delta=-1, stochastic_delta=-2, stochastic_prob=0.5)
    """

    delta: int = 0
    stochastic_delta: int = 0
    stochastic_prob: float = 0.0

    def apply(self, value: np.ndarray, u: np.ndarray) -> np.ndarray:
        out = value + self.delta
        if self.stochastic_prob > 0.0 and self.stochastic_delta != 0:
            out = out + (u < self.stochastic_prob) * self.stochastic_delta
        return out

    def to_json(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_json(cls, d: dict) -> "ShapingRule":
        return cls(**d)


@dataclasses.dataclass(frozen=True)
class TreeConfig:
    """Parameters of the random stochastic matrix-tree game.

    Mirrors the reference ``Tree.__init__`` parameters
    (environment/tree.py:67-113) minus the torch device (arrays are placed by
    JAX) and with lambdas replaced by shaping rules.
    """

    max_actions: int = 3
    max_transitions: int = 1
    depth_bound: int = 1
    row_actions: Optional[int] = None  # defaults to max_actions
    col_actions: Optional[int] = None
    transition_threshold: float = 0.0
    terminal_values: Tuple[float, ...] = (-1.0, 1.0)
    row_actions_rule: ShapingRule = ShapingRule()
    col_actions_rule: ShapingRule = ShapingRule()
    depth_bound_rule: ShapingRule = ShapingRule(delta=-1)
    # Which equilibrium to STORE on degenerate nodes (games with multiple
    # Nash equilibria); the game value and the oracle invariants are
    # identical for every choice (env/solver.py module docstring):
    #   "vertex" — the LP simplex's optimal vertex (default; typically pure)
    #   "pure"   — a pure saddle point whenever one exists (the reference
    #              CODE's pick: its purity sort places pure solutions first,
    #              reference tree.py:226-234)
    #   "mixed"  — the maximal-support point of the optimal face (the
    #              reference COMMENT's stated intent, "favor mixed over
    #              pure"; costs one small LP per support atom on the
    #              degenerate nodes)
    #   "enummixed" — the reference pipeline end to end: enumerate ALL
    #              extreme equilibria per degenerate node
    #              (env/solver.py::enumerate_equilibria, pygambit's
    #              enummixed_solve equivalent), purity-sort, store the
    #              first — the reference's stored pick semantics
    equilibrium_selection: str = "vertex"
    desc: str = ""

    def root_row_actions(self) -> int:
        return self.row_actions if self.row_actions is not None else self.max_actions

    def root_col_actions(self) -> int:
        return self.col_actions if self.col_actions is not None else self.max_actions

    def to_json(self) -> dict:
        d = dataclasses.asdict(self)
        d["terminal_values"] = list(self.terminal_values)
        return d

    @classmethod
    def from_json(cls, d: dict) -> "TreeConfig":
        d = dict(d)
        d["terminal_values"] = tuple(d["terminal_values"])
        for k in ("row_actions_rule", "col_actions_rule", "depth_bound_rule"):
            d[k] = ShapingRule.from_json(d[k])
        return cls(**d)


@dataclasses.dataclass(frozen=True)
class ObsTransformConfig:
    """High-dimensional noisy observation transform — the capability the
    reference's ``observations_noisy`` stub promises but never implements
    (reference environment/episode.py:70-82; see ops/obs_transform.py for
    the full design).  Declared and seeded, like ``ShapingRule``, so runs
    are reproducible and the config serializes.

    ``kind="lift"``: each half-step observation becomes ``channels``
    random-mixed lifted views of the payoff/legal matrices (fixed seeded
    (channels, 2) mixing + fixed seeded per-cell bias field) plus fresh
    per-half-step Gaussian noise of std ``sigma``; the raw legal matrix
    rides along at channel 1.  The net never sees the raw payoff matrix.
    """

    kind: str = "none"  # "none" | "lift"
    channels: int = 8  # lifted channels (net input channels = this + 1)
    sigma: float = 0.1  # per-half-step Gaussian noise std
    bias_scale: float = 1.0  # scale of the fixed random spatial bias field
    seed: int = 0  # the transform's own parameter seed

    def to_json(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_json(cls, d: dict) -> "ObsTransformConfig":
        return cls(**d)


@dataclasses.dataclass(frozen=True)
class NetConfig:
    """Network architecture selection (reference learn/rnad.py:145-151)."""

    type: str = "MLP"  # "MLP" | "ConvNet" | "EquiNet"
    max_actions: int = 3
    width: int = 256  # MLP hidden width
    channels: int = 16  # ConvNet / EquiNet channels
    depth: int = 1  # ConvNet residual tower / MLP hidden / EquiNet layers
    batch_norm: bool = True  # ConvNet only
    # EquiNet only: > 0 prepends equivariant RM+ solver-iterate input
    # features (models/nets.py::_solver_features); 0 = plain tower.
    solver_iters: int = 0
    # EquiNet only, needs solver_iters > 0: zero-init the heads and add the
    # RM+ solution through learnable gates, so the step-0 policy/value IS
    # the solver's epsilon-Nash and training learns only the correction.
    solver_prime: bool = False
    # "float32" (default, matches the reference numerics) or "bfloat16"
    # (mixed precision: bf16 activations/matmuls on the MXU, f32 params and
    # f32 head outputs).
    compute_dtype: str = "float32"

    def to_json(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_json(cls, d: dict) -> "NetConfig":
        return cls(**d)


@dataclasses.dataclass(frozen=True)
class RNaDConfig:
    """Hyperparameters of the R-NaD trainer.

    Field-for-field mirror of the reference ``RNaD.__init__``
    (learn/rnad.py:34-74) with the DeepNash-paper defaults
    (learn/rnad.py:40-64).  ``logit_clip`` is the NeuRD logit threshold
    (``beta``), not an activation clamp.
    """

    batch_size: int = 3 * 2**8
    eta: float = 0.2
    bounds: Tuple[int, ...] = (100, 165, 200)
    delta_m: Tuple[int, ...] = (10_000, 100_000, 35_000)
    lr: float = 5e-5
    # Learning-rate schedule (framework extension; the reference trains at
    # a constant lr, reference rnad.py:40-64 — "constant" reproduces it
    # exactly, same optimizer state layout).  "cosine": lr decays from
    # ``lr`` to ``lr * lr_final_fraction`` over ``lr_decay_steps`` learner
    # steps, then holds.  Motivation (docs/SCALE.md): at production scale
    # the constant-lr NashConv curve is U-shaped — it descends, then erodes
    # as successive regularization-net rotations compound the per-period
    # tracking error; decaying the step size freezes the policy at its
    # converged point instead.
    lr_schedule: str = "constant"
    lr_decay_steps: int = 0
    lr_final_fraction: float = 0.0
    logit_clip: float = 2.0
    neurd_clip: float = 1e3
    grad_clip: float = 1e3
    b1_adam: float = 0.0
    b2_adam: float = 0.999
    epsilon_adam: float = 1e-8
    gamma_averaging: float = 0.001
    roh_bar: float = 1.0
    c_bar: float = 1.0
    epsilon_threshold: float = 0.03
    n_discrete: int = 32
    n_batches_per_buffer: int = 1  # 1 == degenerate on-policy buffer
    buffer_mod: int = 1
    vtrace_gamma: float = 1.0
    value_loss_weight: float = 1.0
    neurd_loss_weight: float = 1.0
    # Critic-first warmup (framework extension; the reference has no analog
    # and always trains both heads, reference rnad.py:407-425): while
    # ``total_steps < policy_warmup_steps`` the NeuRD policy loss is gated
    # to zero, so the value head learns accurate returns before the policy
    # is allowed to move.  Motivation (docs/SCALE.md): a solver-primed net
    # starts with a near-exact policy but an untrained critic; early policy
    # updates driven by the critic's large initial error are what erode the
    # primed policy.  Counted in ``total_steps``, so the gate is
    # resume-safe.  0 disables (the reference behavior).
    policy_warmup_steps: int = 0
    # trees larger than this evaluate NashConv via host-driven chunked
    # inference (chunk = this many nodes) instead of the fused whole-tree
    # program, bounding eval memory on multi-million-node trees (extension;
    # the reference's metric is whole-tree, util/metric.py:51-82)
    nashconv_chunk_nodes: int = 200_000
    # v-trace evaluation strategy: "scan" = sequential reverse lax.scan
    # (bit-matches the reference recursion order), "associative" =
    # parallel-in-time associative scan (learn/vtrace_assoc.py; O(log T)
    # depth, shardable time axis), "auto" = scan.  Measured on v5e
    # (round 4, docs/PERF_ANALYSIS.md): the sequential scan wins at every
    # tested depth incl. T=36 (38.9 vs 31.7 steps/s at B=16384 — the
    # associative form does O(T log T) elementwise work and on one chip
    # the scan's short fused body is throughput-, not latency-bound), so
    # "auto" no longer switches by depth.  "associative" remains the
    # explicit choice for time-axis sharding across a mesh (its reason to
    # exist; CPU-mesh-tested) and for extreme-T experimentation.
    vtrace_mode: str = "auto"
    # dtype of the 3 frozen-net forwards in the learner (EMA target +
    # regularization pair): "bfloat16" halves their HBM traffic and doubles
    # their MXU rate; the v-trace targets they feed are gradient-free, so
    # only the reward-transform/target precision changes, not the gradient
    # path.  float32 matches the reference bit-for-bit.
    frozen_net_dtype: str = "float32"
    # Execution strategy of the learner step's frozen-net forwards (all
    # measured at 32k lanes on v5e, docs/PERF_ANALYSIS.md):
    #   "off"    — one vmapped 3-net batched pass (any net family;
    #              reference-shaped re-inference).
    #   "heads"  — MLP dead-head elimination: the EMA target contributes
    #              only its VALUE head and the regularization pair only
    #              their POLICY heads, so half the frozen head matmuls are
    #              skipped.  Same outputs as "off" to ulp tolerance.  The
    #              measured winner.
    #   "frozen" — EMA target + regularization pair as ONE fused matmul
    #              pair (models/nets.py::mlp_multi_net_forward; depth-1 MLP
    #              only).  Measured 3-5% SLOWER than "off" — the step is
    #              hidden-activation-traffic-bound, which the fusion does
    #              not reduce; kept as a documented negative result.
    #   "all"    — all four nets (learner included) in one fused pair;
    #              measured ~3x slower (backward spans the fused width).
    #   "auto"   — "heads" for MLPs, "off" otherwise.
    fuse_net_passes: str = "auto"
    # False drops the diagnostic metrics (policy klds, logit stats,
    # trajectory length — reference rnad.py:427-454) from the compiled step,
    # keeping only the three loss scalars; the diagnostics cost real step
    # time at large batch (three (T,B,A) kld reductions) and are usually
    # consumed only every log_mod steps.
    detailed_metrics: bool = True
    # Store each half-step's observation + legal mask in the trajectory
    # during rollout instead of re-gathering the 512-byte packed rows in the
    # learner (which needs only ~84 bytes of each): ~6x less learner-side
    # HBM traffic, bit-identical updates (env/engine.py::Trajectory.obs).
    store_rollout_obs: bool = True
    # Seat-fused rows-actor inside the training rollout
    # (engine.make_mlp_rows_actor): both seats' towers as one matmul pair
    # straight off the gathered packed rows, skipping the per-turn obs
    # slice/concat copies of the generic actor (+18% rollout-only at 131k
    # lanes, docs/PERF_ANALYSIS.md).  Same math up to matmul reduction
    # order, so episodes coincide except at measure-zero sampling ties.
    #   "auto" — on exactly when the packing exists (depth-1 f32 MLP).
    #   "on"   — require it (raises for other nets/dtypes).
    #   "off"  — generic actor path (reference-shaped turn).
    rollout_rows_actor: str = "auto"
    # Operand dtype of the seat-fused rows-actor matmuls ("float32" |
    # "bfloat16"; rows-actor path only).  DOCUMENTED NEGATIVE RESULT:
    # measured 2% SLOWER than f32 at 32k and 131k lanes on v5e — XLA's
    # default matmul precision already feeds the MXU bf16 operands for
    # f32 arrays, so the explicit cast only adds work
    # (docs/PERF_ANALYSIS.md round 5).  Kept for experimentation and for
    # backends where the default feed is true f32.  Semantics when on:
    # f32 accumulation, logits shift by bf16 rounding only; the stored
    # behavior policy remains exactly what the actor sampled from, so
    # v-trace off-policy correctness is untouched.
    rollout_actor_dtype: str = "float32"
    # Layout of the learner's v-trace/loss block (learn/vtrace.py's
    # batch-minor section).  Every (..., A)-trailing tensor that
    # materializes between the net forwards and the losses (the v-trace
    # scan xs/ys especially) has a trailing dim of A=3-5 — far below the
    # 128-lane TPU tile — so the reference (T, B, A) layout pads each one
    # ~128/A-fold in HBM.  "amb" runs the identical math as (T, A, B)
    # (B minor, unpadded): bit-identical in isolation
    # (tests/test_vtrace_minor.py); ulp tolerance inside the fused step,
    # where XLA's fusion/FMA choices differ between the two program shapes
    # (tests/test_rnad.py::test_learner_layout_bit_exact — the same
    # tolerance class as fuse_net_passes="heads").
    #   "bma"  — reference layout (matches the torch reference shapes).
    #   "amb"  — batch-minor (sequential-scan v-trace only).
    #   "auto" — "amb" on TPU backends, "bma" elsewhere; the associative
    #            v-trace path always uses "bma" (vtrace_assoc.py).
    # Default "auto" since the round-4 measurement: at 32k lanes on v5e
    # amb reads +5% f32 / +2% bf16 over "heads"-mode bma
    # (tools/learner_probe.py, docs/PERF_ANALYSIS.md), bit-exact.
    learner_layout: str = "auto"
    # Run the clip+Adam+EMA tail of the learner step on ONE raveled vector
    # instead of per-leaf pytree maps (learn/rnad.py::flat_optimizer_update).
    # Elementwise bit-exact (same optax formulas, per-leaf global-norm
    # order preserved; tests/test_rnad.py::test_flat_optimizer_bit_exact)
    # and the checkpointed opt_state layout is unchanged.  Applies only
    # when every param/variable leaf is float32 (raveling mixed dtypes
    # would promote); non-f32 states fall back to the pytree path.
    flat_optimizer: bool = False
    # Regularization-anchor policy at update (m) boundaries (framework
    # extension; the reference always rotates reg <- target,
    # rnad.py:528-531 — "target" reproduces it exactly):
    #   "target" — pi_reg_prev <- pi_reg; pi_reg <- EMA target.
    #   "best"   — same, EXCEPT when the boundary eval is worse than the
    #              best eval seen: then pi_reg <- the best checkpoint's
    #              EMA target instead, so the R-NaD reward transform
    #              anchors the next period to the best policy rather than
    #              to the drifted one.  Motivation (docs/SCALE.md): at
    #              production scale successive rotations compound per-
    #              period tracking error into upward NashConv drift;
    #              anchoring to best makes the fixed-point iteration
    #              contract toward the measured optimum.  Requires in-loop
    #              evals (expl_mod > 0).
    #   "fixed"  — never rotate: pi_reg and pi_reg_prev stay the nets the
    #              run started from.  With a solver-primed init this is
    #              KL-anchored fine-tuning — the R-NaD reward transform
    #              permanently penalizes divergence from the near-Nash
    #              init, giving up the fixed-point *iteration* (whose
    #              per-rotation tracking error is the drift mechanism
    #              measured in docs/SCALE.md (d)) in exchange for a
    #              stationary anchor.  The schedule's (m) boundaries still
    #              advance (evals, lr segments); only the reg nets hold.
    reg_anchor: str = "target"
    # Observation transform between the environment and every net input
    # (rollout actor, learner, exact eval): "none" reproduces the reference
    # observation; "lift" is the high-dimensional noisy transform the
    # reference's observations_noisy stub promises (ObsTransformConfig,
    # ops/obs_transform.py).
    obs_transform: ObsTransformConfig = ObsTransformConfig()

    def to_json(self) -> dict:
        d = dataclasses.asdict(self)
        d["bounds"] = list(self.bounds)
        d["delta_m"] = list(self.delta_m)
        return d

    @classmethod
    def from_json(cls, d: dict) -> "RNaDConfig":
        d = dict(d)
        d["bounds"] = tuple(d["bounds"])
        d["delta_m"] = tuple(d["delta_m"])
        if "obs_transform" in d:
            d["obs_transform"] = ObsTransformConfig.from_json(
                d["obs_transform"])
        return cls(**d)


def dump_json(obj, path) -> None:
    with open(path, "w") as f:
        json.dump(obj, f, indent=2, sort_keys=True)


def load_json(path) -> dict:
    with open(path) as f:
        return json.load(f)
