"""R-NaD trainer: one fused jitted train step + a thin host schedule loop.

The reference trainer (reference learn/rnad.py) runs, per step: a Python
rollout loop, four per-timestep trajectory re-inference loops, two Python
v-trace scans, loss/backward, Adam, and a state_dict-copy EMA — all as
separate host-driven phases.  Here the entire step body is **one jitted
program**: rollout (``lax.scan``) → 4-net trajectory inference (single
batched forwards over (T*B)) → reward transform + two-player v-trace
(``lax.scan`` reverse) → losses → grads → global-norm clip → Adam → EMA
target update → metrics.  The host loop owns only the (n, m, alpha) schedule,
regularization-net rotation, checkpointing, NashConv cadence and logging —
mirroring reference ``__resume`` (rnad.py:458-531) exactly.

State layout: four network variable pytrees (learner / EMA target /
regularization pair, reference rnad.py:169-172) + Adam state + RNG key +
step counter, as one ``TrainState`` pytree so checkpointing is a single
serialization call.
"""

from __future__ import annotations

import functools
import json
import logging
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..config import NetConfig, RNaDConfig
from ..env import engine
from ..env.tree import GameTree
from ..metrics import nashconv as nashconv_lib
from ..models import common, nets
from ..ops import obs_transform as obs_transform_lib
from ..ops import stepping
from ..parallel.mesh import host_value
from . import vtrace, vtrace_assoc
from . import buffer as buffer_lib
from .buffer import TrajectoryBuffer


@struct.dataclass
class TrainState:
    variables: Any  # learner net (params [+ batch_stats])
    variables_target: Any  # EMA target net
    variables_reg: Any  # regularization net (pi_reg)
    variables_reg_: Any  # previous regularization net (pi_reg_prev)
    opt_state: Any
    key: jax.Array  # uint32 PRNG key (legacy format: serializable)
    total_steps: jax.Array  # int32 scalar


def make_optimizer(cfg: RNaDConfig) -> optax.GradientTransformation:
    """Global-norm clip then Adam with the paper's b1=0
    (reference rnad.py:232-237, 456).

    ``cfg.lr_schedule == "constant"`` (the default) matches the reference's
    fixed learning rate and its optimizer-state layout exactly; "cosine"
    passes an optax cosine-decay schedule instead (see RNaDConfig).
    """
    if cfg.lr_schedule == "constant":
        lr = cfg.lr
    elif cfg.lr_schedule == "cosine":
        if cfg.lr_decay_steps <= 0:
            raise ValueError("lr_schedule='cosine' needs lr_decay_steps > 0")
        lr = optax.cosine_decay_schedule(cfg.lr, cfg.lr_decay_steps,
                                         alpha=cfg.lr_final_fraction)
    else:
        raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adam(lr, b1=cfg.b1_adam, b2=cfg.b2_adam,
                   eps=cfg.epsilon_adam),
    )


def _all_f32(tree) -> bool:
    return all(jnp.dtype(x.dtype) == jnp.float32
               for x in jax.tree.leaves(tree))


def flat_optimizer_update(cfg: RNaDConfig, grads, opt_state, params):
    """``make_optimizer()``'s update re-expressed on ONE raveled vector.

    The params pytree is ~8 small leaves (two towers x kernel/bias x two
    heads), so the per-leaf optax update lowers to dozens of tiny HLO ops;
    raveling first turns the whole clip+Adam+apply chain into a handful of
    fused ops over a single (P,) buffer.  Elementwise bit-exact vs the
    optax path (identical formulas, optax 0.2.6 clipping.py:
    clip_by_global_norm / transform.py:scale_by_adam; verified in
    tests/test_rnad.py::test_flat_optimizer_bit_exact): the global norm
    keeps ``optax.global_norm``'s per-leaf reduction order, and every other
    op is elementwise, so raveling cannot change any bit.  The checkpointed
    ``opt_state`` pytree layout is unchanged (mu/nu are unraveled back).
    """
    from jax.flatten_util import ravel_pytree

    clip_state, (adam, scale_state) = opt_state
    g_flat, unravel = ravel_pytree(grads)
    mu_flat, _ = ravel_pytree(adam.mu)
    nu_flat, _ = ravel_pytree(adam.nu)
    p_flat, unravel_p = ravel_pytree(params)

    g_norm = optax.global_norm(grads)  # per-leaf order, matches optax clip
    g_flat = jax.lax.select(g_norm < cfg.grad_clip, g_flat,
                            (g_flat / g_norm) * cfg.grad_clip)

    b1, b2 = cfg.b1_adam, cfg.b2_adam
    mu_flat = (1 - b1) * g_flat + b1 * mu_flat
    nu_flat = (1 - b2) * (g_flat ** 2) + b2 * nu_flat
    count_inc = optax.safe_increment(adam.count)
    mu_hat = mu_flat / (1 - b1 ** count_inc).astype(mu_flat.dtype)
    nu_hat = nu_flat / (1 - b2 ** count_inc).astype(nu_flat.dtype)
    upd = (-cfg.lr) * (mu_hat / (jnp.sqrt(nu_hat) + cfg.epsilon_adam))
    new_params = unravel_p(p_flat + upd.astype(p_flat.dtype))
    new_opt_state = (clip_state,
                     (adam._replace(count=count_inc, mu=unravel(mu_flat),
                                    nu=unravel(nu_flat)), scale_state))
    return new_params, new_opt_state


def flat_ema_update(gamma: float, variables, variables_target):
    """EMA over the full variables pytree as one fused vector op (the
    per-leaf ``tree.map`` form, raveled; elementwise bit-exact)."""
    from jax.flatten_util import ravel_pytree

    v_flat, _ = ravel_pytree(variables)
    t_flat, unravel = ravel_pytree(variables_target)
    return unravel(gamma * v_flat + (1.0 - gamma) * t_flat)


def init_train_state(net, key: jax.Array, max_actions: int,
                     cfg: RNaDConfig,
                     init_variables: Optional[Any] = None) -> TrainState:
    k_init, k_run = jax.random.split(key)
    variables = (init_variables if init_variables is not None
                 else nets.init_variables(
                     net, k_init, max_actions,
                     obs_transform_lib.out_channels(cfg.obs_transform)))
    tx = make_optimizer(cfg)
    opt_state = tx.init(variables["params"])
    copy = lambda: jax.tree.map(lambda x: x, variables)
    return TrainState(
        variables=variables,
        variables_target=copy(),
        variables_reg=copy(),
        variables_reg_=copy(),
        opt_state=opt_state,
        key=k_run,
        total_steps=jnp.zeros((), jnp.int32),
    )


def _forward_trajectory(net, variables, observations, train: bool,
                        valid=None, **apply_kw):
    """Whole-trajectory inference as one batched forward (no time loop —
    contrast reference nn/net.py:64-85).  ``valid`` (T, B) keeps the
    absorbing-state padding rows of fixed-length trajectories out of
    BatchNorm batch statistics (see models/nets.py::MaskedBatchNorm).
    ``apply_kw`` passes net-specific keywords through (e.g. the EquiNet's
    precomputed ``solver_feats``)."""
    T, B = observations.shape[:2]
    obs = observations.reshape((T * B,) + observations.shape[2:])
    if train:
        mask = valid.reshape(T * B) if valid is not None else None
        (logits, v), mutated = nets.apply_train(net, variables, obs, mask,
                                                **apply_kw)
    else:
        logits, v = nets.apply_eval(net, variables, obs)
        mutated = {}
    return logits.reshape(T, B, -1), v.reshape(T, B), mutated


def resolve_fuse_mode(net, cfg: RNaDConfig) -> str:
    """Resolves ``cfg.fuse_net_passes`` against the net family (the MLP is
    the only family with separable heads / a fused-matmul packing) and
    rejects silently-diverging combinations up front."""
    mode = cfg.fuse_net_passes
    is_mlp = isinstance(net, nets.MLP)
    is_flat_mlp = is_mlp and net.depth == 1
    if mode == "auto":
        # "heads" (dead-head elimination) is the measured winner on v5e
        # (same math as "off" to ulp tolerance); the matmul fusions lose
        # (see the learn_loss note).
        return "heads" if is_mlp else "off"
    if mode == "heads":
        if not is_mlp:
            raise ValueError(
                f"fuse_net_passes='heads' requires an MLP (the only family "
                f"with separable heads); got {type(net).__name__}")
        return mode
    if mode in ("frozen", "all"):
        if not is_flat_mlp:
            raise ValueError(
                f"fuse_net_passes={mode!r} requires a depth-1 MLP "
                f"(mlp_multi_net_forward packing); got "
                f"{type(net).__name__} with depth "
                f"{getattr(net, 'depth', '?')}")
        if (mode == "all"
                and jnp.dtype(cfg.frozen_net_dtype) != jnp.dtype(net.dtype)):
            raise ValueError(
                f"fuse_net_passes='all' runs all four nets in the learner's "
                f"compute dtype ({jnp.dtype(net.dtype).name}); set "
                f"frozen_net_dtype to match (got "
                f"{cfg.frozen_net_dtype!r}) or use 'frozen'")
        return mode
    if mode != "off":
        raise ValueError(f"unknown fuse_net_passes mode {mode!r}")
    return mode


def resolve_rows_actor(net, packed, cfg: RNaDConfig):
    """Resolves ``cfg.rollout_rows_actor`` to a prepared rows-actor (or
    None for the generic turn).  "auto" enables the seat-fused packing
    exactly where it exists — depth-1 f32 MLP (make_mlp_rows_actor's own
    guards define that set); "on" surfaces those guards as hard errors."""
    mode = cfg.rollout_rows_actor
    if mode == "off":
        return None
    if cfg.obs_transform.kind != "none":
        # the rows-actor consumes raw packed rows, bypassing the
        # observation path the transform lives on (env/engine.py)
        if mode == "on":
            raise ValueError(
                "rollout_rows_actor='on' is incompatible with an active "
                "obs_transform (the seat-fused packing bypasses the "
                "observation path); use 'auto' or 'off'")
        return None
    dtype = jnp.dtype(cfg.rollout_actor_dtype)
    if mode == "on":
        return engine.make_mlp_rows_actor(net, packed, compute_dtype=dtype)
    if mode != "auto":
        raise ValueError(f"unknown rollout_rows_actor mode {mode!r}")
    try:
        return engine.make_mlp_rows_actor(net, packed, compute_dtype=dtype)
    except ValueError:
        return None


def resolve_obs_transform(net, tree: GameTree, cfg: RNaDConfig):
    """Builds the observation transform (ops/obs_transform.py) and rejects
    the configurations it cannot compose with, up front:

    * ``store_rollout_obs=False`` (regather mode) — the learner re-derives
      observations from state indices, but per-half-step NOISE is not a
      function of the state; the learner must consume the exact bits the
      actor saw, which only the stored-obs path carries.
    * EquiNet with ``solver_iters > 0`` — its RM+ solver features read the
      raw payoff matrix out of the observation, which the transform exists
      to hide ("the net never sees the raw payoff matrix").
    """
    tf = obs_transform_lib.make_obs_transform(cfg.obs_transform,
                                              tree.max_actions)
    if tf is None:
        return None
    if not cfg.store_rollout_obs:
        raise ValueError(
            "obs_transform requires store_rollout_obs=True: per-half-step "
            "noise cannot be re-derived from state indices in regather "
            "mode, so the learner must consume the stored actor bits")
    if isinstance(net, nets.EquiNet) and net.solver_iters:
        raise ValueError(
            "obs_transform hides the raw payoff matrix, but EquiNet with "
            "solver_iters > 0 computes RM+ solver features from it; use "
            "solver_iters=0 or another net family")
    return tf


def resolve_vtrace_assoc(cfg: RNaDConfig) -> bool:
    """True = run the associative (parallel-in-time, time-shardable)
    v-trace; False = the sequential reverse scan.

    "auto" takes the scan: measured faster than the associative form at
    every tested depth incl. T=36 on v5e (round 4, docs/PERF_ANALYSIS.md —
    the assoc form's O(T log T) work loses to the scan's short
    throughput-bound fused body on one chip).  "associative" remains the
    explicit mode for time-axis sharding."""
    mode = cfg.vtrace_mode
    if mode not in ("scan", "associative", "auto"):
        raise ValueError(f"unknown vtrace_mode {mode!r}; expected 'scan', "
                         "'associative' or 'auto'")
    return mode == "associative"


def resolve_learner_layout(cfg: RNaDConfig, use_assoc: bool,
                           max_actions: Optional[int] = None) -> bool:
    """True = run the v-trace/loss block in the batch-minor (T, A, B)
    layout (learn/vtrace.py's batch-minor section; bit-identical values).

    "auto" selects minor exactly where the tile padding it avoids is real:
    on TPU backends — and only for action spaces the batch-minor
    ``process_policy_minor`` covers (its branchless pairwise discretizer
    is O(A^2) and capped at A <= 16; wider trees take the (T, B, A)
    path).  The associative v-trace path keeps the reference (T, B, A)
    layout (vtrace_assoc.py operates there), so assoc trumps."""
    mode = cfg.learner_layout
    if mode not in ("bma", "amb", "auto"):
        raise ValueError(f"unknown learner_layout {mode!r}")
    if use_assoc:
        if mode == "amb":
            raise ValueError(
                "learner_layout='amb' applies to the sequential-scan "
                "v-trace only; vtrace_mode selected the associative path "
                "at this trajectory length — use learner_layout='auto'")
        return False
    if max_actions is not None and max_actions > 16:
        if mode == "amb":
            raise ValueError(
                "learner_layout='amb' requires max_actions <= 16 (the "
                f"batch-minor policy discretizer's cap); this tree has "
                f"max_actions={max_actions} — use learner_layout='auto'")
        return False
    if mode == "auto":
        return jax.default_backend() in ("tpu", "axon")
    return mode == "amb"


def neurd_scale_for(cfg: RNaDConfig, total_steps) -> jax.Array | float:
    """Critic-first warmup gate (RNaDConfig.policy_warmup_steps): the NeuRD
    loss weight multiplier — 0.0 while ``total_steps < policy_warmup_steps``
    (value head trains, policy head receives zero gradient and, with Adam's
    zero-numerator update, does not move), 1.0 after.  ``total_steps`` may
    be a traced array (it lives in TrainState, so the gate compiles into
    the fused step without a host round-trip)."""
    warm = cfg.policy_warmup_steps
    if not warm:
        return 1.0
    return (jnp.asarray(total_steps) >= warm).astype(jnp.float32)


def learn_loss(learner_params, aux_collections, net, target_vars, reg_vars,
               reg_prev_vars, packed, traj: engine.Trajectory,
               alpha: jax.Array, cfg: RNaDConfig,
               axis_name: Optional[str] = None,
               neurd_scale: jax.Array | float = 1.0):
    """Loss of one learner update (mirrors reference ``__learn``,
    rnad.py:353-456).  Differentiated w.r.t. ``learner_params`` only.

    Observations and legal masks are re-derived from the state indices via
    the packed table (pure functions of the index; see env/engine.py).

    ``axis_name``: when the trajectory is a per-device lane shard inside a
    ``shard_map``, every masked-mean normalization (losses, kld metrics) is
    made global with psums over that axis, so the loss — and therefore the
    psum of the per-shard gradients — matches the unsharded computation up
    to reduction order (see parallel/shard_map_step.py)."""
    gsum = ((lambda x: jax.lax.psum(x, axis_name))
            if axis_name is not None else None)
    fuse = resolve_fuse_mode(net, cfg)
    learner_vars = dict(aux_collections, params=learner_params)
    valid = traj.valid()
    player_id = traj.turns
    observations, masks = engine.trajectory_observations(packed, traj)
    T, B = traj.rewards.shape
    A = traj.num_actions
    obs_flat = observations.reshape((T * B,) + observations.shape[2:])

    # Frozen nets: EMA target for values, regularization pair for the
    # R-NaD transform (reference rnad.py:377-382).  All three share the
    # architecture and are gradient-free inputs to the v-trace targets, so
    # the learner's gradient path stays f32 even when they run in bfloat16
    # (cfg.frozen_net_dtype).  Execution strategies (fuse_net_passes; all
    # measured on v5e, docs/PERF_ANALYSIS.md):
    #   off    — one vmapped 3-net batched pass (any family).
    #   heads  — dead-head elimination for the separate-head MLP: the
    #            target net contributes only its VALUE (its policy feeds
    #            one optional diagnostic) and the reg pair only POLICY
    #            log-probs, so half the frozen head matmuls are never
    #            computed.  Same math as "off" to ulp tolerance (batched
    #            vs separate dot accumulation).  The measured winner.
    #   frozen — the 3 frozen nets as one fused matmul pair
    #            (nets.mlp_multi_net_forward); measured 3-5% SLOWER than
    #            off (the step is hidden-activation-traffic-bound, which
    #            fusion does not reduce).
    #   all    — all four nets in one pair; measured 3x slower (the
    #            backward spans the full fused width).
    sg = jax.lax.stop_gradient
    logits_t = None  # target policy logits; only a diagnostic consumer
    if fuse == "all":
        params4 = [learner_params, sg(target_vars["params"]),
                   sg(reg_vars["params"]), sg(reg_prev_vars["params"])]
        logits4, values4 = nets.mlp_multi_net_forward(net, params4, obs_flat)
        logits = logits4[:, 0].reshape(T, B, A)
        v_raw = values4[:, 0].reshape(T, B)
        mutated = {}
        logits_t = logits4[:, 1].reshape(T, B, A)
        values_target = values4[:, 1]
        logits_reg2 = jnp.moveaxis(logits4[:, 2:], 1, 0)  # (2, T*B, A)
    else:
        # The EquiNet's RM+ solver features are a stop-gradient function of
        # the observations alone — shared by all four net passes below, so
        # the solve runs ONCE per step instead of four times.
        apply_kw = {}
        if isinstance(net, nets.EquiNet) and net.solver_iters:
            apply_kw["solver_feats"] = nets.equinet_solver_features(
                net, obs_flat)
        logits, v_raw, mutated = _forward_trajectory(net, learner_vars,
                                                     observations,
                                                     train=True, valid=valid,
                                                     **apply_kw)
        frozen_net = net
        if cfg.frozen_net_dtype != "float32":
            frozen_net = net.clone(dtype=jnp.dtype(cfg.frozen_net_dtype))
        if fuse == "frozen":
            params3 = [target_vars["params"], reg_vars["params"],
                       reg_prev_vars["params"]]
            logits3, values3 = nets.mlp_multi_net_forward(
                frozen_net, params3, obs_flat)
            logits_t = logits3[:, 0].reshape(T, B, A)
            values_target = values3[:, 0]
            logits_reg2 = jnp.moveaxis(logits3[:, 1:], 1, 0)
        elif fuse == "heads":
            values_target = nets.mlp_head_eval(
                frozen_net, target_vars["params"], obs_flat, "value")
            reg2 = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                                reg_vars["params"], reg_prev_vars["params"])
            logits_reg2 = jax.vmap(lambda p: nets.mlp_head_eval(
                frozen_net, p, obs_flat, "policy"))(reg2)
            if cfg.detailed_metrics:  # entropy_target diagnostic only
                logits_t = nets.mlp_head_eval(
                    frozen_net, target_vars["params"], obs_flat,
                    "policy").reshape(T, B, A)
        else:
            frozen = jax.tree.map(lambda a, b, c: jnp.stack([a, b, c]),
                                  target_vars, reg_vars, reg_prev_vars)
            logits3, values3 = jax.vmap(
                lambda v: nets.apply_eval(frozen_net, v, obs_flat,
                                          **apply_kw))(frozen)
            logits_t = logits3[0].reshape(T, B, A)
            values_target = values3[0]
            logits_reg2 = logits3[1:]

    use_assoc = resolve_vtrace_assoc(cfg)
    minor = resolve_learner_layout(cfg, use_assoc, max_actions=A)
    sg = jax.lax.stop_gradient
    if minor:
        # Batch-minor layout: every (..., A)-trailing tensor that
        # materializes between here and the losses — the v-trace scan
        # xs/ys above all — runs as (T, A, B) instead of (T, B, A), so
        # nothing is padded to the 128-lane tile (learn/vtrace.py's
        # batch-minor section; bit-identical values, tested).
        amb = lambda x: jnp.moveaxis(x, -1, -2)
        masks_m = amb(masks)
        logits_m = amb(logits)
        v = v_raw  # (T, B)
        pi = common.masked_policy_minor(logits_m, masks_m)
        log_pi = common.masked_log_policy_minor(logits_m, masks_m)
        pi_processed = vtrace.process_policy_minor(
            pi, masks_m, cfg.n_discrete, cfg.epsilon_threshold)
        pi_processed_sg = sg(pi_processed)
        pi_target = (common.masked_policy_minor(amb(logits_t), masks_m)
                     if logits_t is not None else None)
        v_target_net = sg(values_target.reshape(T, B))
        log_pi_reg = common.masked_log_policy_minor(
            amb(logits_reg2[0].reshape(T, B, A)), masks_m)
        log_pi_reg_prev = common.masked_log_policy_minor(
            amb(logits_reg2[1].reshape(T, B, A)), masks_m)
        log_policy_reg = sg(log_pi) - (
            alpha * log_pi_reg + (1.0 - alpha) * log_pi_reg_prev)
        acting_policy = traj.policy_amb()
        actions_oh = (jnp.arange(A, dtype=traj.actions.dtype)[None, :, None]
                      == traj.actions[:, None, :]).astype(pi.dtype)
        v_t2, played2, pol_t2 = vtrace.v_trace_both_minor(
            v_target_net, valid, player_id, acting_policy, pi_processed_sg,
            log_policy_reg, actions_oh, traj.rewards,
            eta=cfg.eta, lambda_=1.0, c=cfg.c_bar, rho=cfg.roh_bar,
            gamma=cfg.vtrace_gamma)
        v_target_list = [sg(v_t2[p]) for p in range(2)]
        has_played_list = [sg(played2[p]) for p in range(2)]
        policy_target_list = [sg(pol_t2[p]) for p in range(2)]

        loss_v = vtrace.get_loss_v_minor([v, v], v_target_list,
                                         has_played_list, global_sum=gsum)
        is_vector = jnp.ones_like(valid)
        loss_nerd = vtrace.get_loss_nerd_minor(
            [logits_m, logits_m], [pi_processed_sg, pi_processed_sg],
            policy_target_list, valid, player_id, masks_m,
            [is_vector, is_vector], clip=cfg.neurd_clip,
            threshold=cfg.logit_clip, global_sum=gsum)
        masks_metrics = masks_m
        action_axis = -2
    else:
        v = v_raw[..., None]
        pi = common.masked_policy(logits, masks)
        log_pi = common.masked_log_policy(logits, masks)
        pi_processed = vtrace.process_policy(pi, masks, cfg.n_discrete,
                                             cfg.epsilon_threshold)
        pi_processed_sg = jax.lax.stop_gradient(pi_processed)
        pi_target = (common.masked_policy(logits_t, masks)
                     if logits_t is not None else None)
        v_target_net = jax.lax.stop_gradient(
            values_target.reshape(T, B)[..., None])
        log_pi_reg = common.masked_log_policy(
            logits_reg2[0].reshape(T, B, A), masks)
        log_pi_reg_prev = common.masked_log_policy(
            logits_reg2[1].reshape(T, B, A), masks)

        # alpha interpolates the two regularization nets' log-policies
        # (reference rnad.py:382); the whole v-trace block is gradient-free
        # (computed under no_grad in the reference).
        log_policy_reg = jax.lax.stop_gradient(log_pi) - (
            alpha * log_pi_reg + (1.0 - alpha) * log_pi_reg_prev)

        acting_policy = traj.policy_bma()
        actions_oh = traj.actions_oh()
        vt_both = (vtrace_assoc.v_trace_both_assoc if use_assoc
                   else vtrace.v_trace_both)
        v_t2, played2, pol_t2 = vt_both(
            v_target_net, valid, player_id, acting_policy, pi_processed_sg,
            log_policy_reg, actions_oh, traj.rewards,
            eta=cfg.eta, lambda_=1.0, c=cfg.c_bar, rho=cfg.roh_bar,
            gamma=cfg.vtrace_gamma)
        v_target_list = [jax.lax.stop_gradient(v_t2[p]) for p in range(2)]
        has_played_list = [jax.lax.stop_gradient(played2[p])
                           for p in range(2)]
        policy_target_list = [jax.lax.stop_gradient(pol_t2[p])
                              for p in range(2)]

        loss_v = vtrace.get_loss_v([v, v], v_target_list, has_played_list,
                                   global_sum=gsum)

        is_vector = jnp.ones_like(valid)[..., None]
        loss_nerd = vtrace.get_loss_nerd(
            [logits, logits], [pi_processed_sg, pi_processed_sg],
            policy_target_list, valid, player_id, masks,
            [is_vector, is_vector], clip=cfg.neurd_clip,
            threshold=cfg.logit_clip, global_sum=gsum)
        masks_metrics = masks
        action_axis = -1

    # neurd_scale gates the policy loss during the critic-first warmup
    # (RNaDConfig.policy_warmup_steps; see neurd_scale_for).
    loss = (cfg.value_loss_weight * loss_v
            + neurd_scale * cfg.neurd_loss_weight * loss_nerd)

    metrics = {
        "loss": loss,
        "loss_v": loss_v,
        "loss_nerd": loss_nerd,
    }
    if not cfg.detailed_metrics:
        return loss, (mutated, metrics)

    # Diagnostics (reference rnad.py:427-454).  Under an axis_name, counts
    # and extrema reduce globally so every metric equals its unsharded value.
    uniform_policy = masks_metrics / jnp.maximum(
        masks_metrics.sum(action_axis, keepdims=True), 1e-30)
    if gsum is None:
        logit_mean = logits.mean()
        traj_len = valid.sum(0).mean()
        logit_max = jnp.abs(logits - logit_mean).max()
    else:
        logit_mean = gsum(logits.sum()) / gsum(jnp.float32(logits.size))
        traj_len = gsum(valid.sum()) / gsum(jnp.float32(valid.shape[1]))
        # diagnostics only: stop_gradient so pmax (no JVP rule) is never
        # differentiated through
        logit_max = jax.lax.pmax(
            jax.lax.stop_gradient(jnp.abs(logits - logit_mean).max()),
            axis_name)
    metrics.update({
        "traj_len": traj_len,
        "logit_mean": logit_mean,
        "logit_max": logit_max,
        "entropy": nashconv_lib.kld(pi, uniform_policy, valid,
                                    masks_metrics, gsum, action_axis),
        "entropy_target": nashconv_lib.kld(pi_target, uniform_policy, valid,
                                           masks_metrics, gsum, action_axis),
        "actor_learner_kld": nashconv_lib.kld(pi, acting_policy, valid,
                                              masks_metrics, gsum,
                                              action_axis),
    })
    return loss, (mutated, metrics)


def obs_storage_dtype(net, cfg: RNaDConfig):
    """Stored-observation dtype: wide enough that every learner-side
    consumer (learner net AND frozen nets) sees bit-identical inputs to the
    re-derived f32 path after its own entry cast.  Single source of truth
    for every step family (fused, sharded, shard_map)."""
    return jnp.promote_types(jnp.dtype(net.dtype),
                             jnp.dtype(cfg.frozen_net_dtype))


def make_rnad_fns(net, tree: GameTree, cfg: RNaDConfig,
                  constrain_batch: Optional[Callable] = None,
                  eval_mesh=None):
    """Builds the jitted step functions.

    ``constrain_batch`` optionally applies a sharding constraint to the
    per-lane state vector at rollout start (see parallel/), letting GSPMD
    shard the whole rollout + learner data over a device mesh.

    ``eval_mesh``: a mesh makes large-tree NashConv evals run the
    node-sharded backward induction (metrics/nashconv_shard.py) instead of
    the single-device pass — for trees whose node-minor tables exceed one
    chip's HBM (SURVEY §5 pod-scale NashConv).  Small trees keep the fused
    single-program eval either way.
    """
    actor_fn = lambda variables, obs: nets.apply_eval(net, variables, obs)
    tx = make_optimizer(cfg)
    packed_tables = stepping.make_packed_tables(tree)
    obs_store_dtype = obs_storage_dtype(net, cfg)
    rows_actor = resolve_rows_actor(net, packed_tables, cfg)
    obs_tf = resolve_obs_transform(net, tree, cfg)
    # The rollout's policy-record layout follows the learner layout (the
    # record is the learner's acting_policy input), but only on the
    # on-policy path: the replay buffer collates along lane axis 1 on
    # every field (learn/buffer.py), so buffered rollouts stay "bma".
    use_assoc = resolve_vtrace_assoc(cfg)
    logging.info("v-trace mode: %s (vtrace_mode=%s, T=%d)",
                 "associative" if use_assoc else "scan", cfg.vtrace_mode,
                 2 * tree.max_depth)
    on_policy = cfg.n_batches_per_buffer == 1 and cfg.buffer_mod == 1
    policy_minor_record = (resolve_learner_layout(
        cfg, use_assoc, max_actions=tree.max_actions) and on_policy)

    # The SPLIT-path rollout (the standalone rollout_jit program consumed
    # by a separately compiled learner: regather mode, the buffered path,
    # the consistency checker) drops the seat-fused rows-actor at >=131072
    # lanes on TPU: hardware bisection at (785k-node tree, B=131072, f32)
    # shows the separately compiled learner computing garbage from an
    # RA-produced trajectory whose CONTENT is verified sane by a third
    # small program (policy kld at bf16-feed noise, returns in range) and
    # whose generic-actor twin is consumed bit-exactly — a cross-program
    # buffer-layout miscompile in the XLA:TPU large-program class of
    # docs/PERF_ANALYSIS.md.  The fused one-program step (no cross-program
    # buffer handoff) is verified bit-exact WITH the rows-actor and keeps
    # it.
    split_rows_actor = rows_actor
    if (rows_actor is not None and cfg.batch_size >= (1 << 17)
            and jax.default_backend() in ("tpu", "axon")):
        logging.warning(
            "split-path rollout: rows_actor disabled at batch %d (>=131072"
            " lanes: XLA:TPU cross-program miscompile, learn/rnad.py)",
            cfg.batch_size)
        split_rows_actor = None

    # tree/packed are threaded as explicit jit arguments (not closure
    # constants) so large game tables are runtime inputs, never baked into
    # the compiled executable.
    def make_rollout_fn(ra):
        def rollout_fn(tree, packed, state: TrainState
                       ) -> Tuple[TrainState, engine.Trajectory]:
            key, k_roll = jax.random.split(state.key)
            init = jnp.ones((cfg.batch_size,), jnp.int32)
            if constrain_batch is not None:
                init = constrain_batch(init)
            traj = engine.rollout_from(tree, actor_fn, state.variables,
                                       k_roll, init, tree.max_depth, packed,
                                       store_obs=cfg.store_rollout_obs,
                                       obs_dtype=obs_store_dtype,
                                       rows_actor=ra,
                                       policy_minor=policy_minor_record,
                                       obs_transform=obs_tf)
            return state.replace(key=key), traj
        return rollout_fn

    # NOTE: the fused path embeds THIS function; its program shape is the
    # hardware-verified one (see _train_step) — do not perturb.
    rollout_fn = make_rollout_fn(rows_actor)
    rollout_fn_split = (rollout_fn if split_rows_actor is rows_actor
                        else make_rollout_fn(split_rows_actor))

    def learn_fn(packed, state: TrainState, traj: engine.Trajectory,
                 alpha: jax.Array) -> Tuple[TrainState, Dict]:
        aux_collections = {k: v for k, v in state.variables.items()
                           if k != "params"}
        grad_fn = jax.value_and_grad(learn_loss, has_aux=True)
        (loss, (mutated, metrics)), grads = grad_fn(
            state.variables["params"], aux_collections, net,
            state.variables_target, state.variables_reg,
            state.variables_reg_, packed, traj, alpha, cfg,
            neurd_scale=neurd_scale_for(cfg, state.total_steps))
        metrics["gradient_norm"] = optax.global_norm(grads)

        use_flat = (cfg.flat_optimizer
                    and cfg.lr_schedule == "constant"
                    and _all_f32((grads, state.variables,
                                  state.variables_target)))
        if use_flat:
            params, opt_state = flat_optimizer_update(
                cfg, grads, state.opt_state, state.variables["params"])
        else:
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.variables["params"])
            params = optax.apply_updates(state.variables["params"], updates)
        variables = dict(mutated, params=params)
        for k, v in state.variables.items():
            variables.setdefault(k, v)

        # EMA target update over params and aux stats alike
        # (reference rnad.py:516-523 copies the full state_dict).
        g = cfg.gamma_averaging
        if use_flat:
            variables_target = flat_ema_update(g, variables,
                                               state.variables_target)
        else:
            variables_target = jax.tree.map(
                lambda p, t: g * p + (1.0 - g) * t,
                variables, state.variables_target)
        new_state = state.replace(
            variables=variables,
            variables_target=variables_target,
            opt_state=opt_state,
            total_steps=state.total_steps + 1,
        )
        return new_state, metrics

    @jax.jit
    def _train_step(tree, packed, state: TrainState, alpha: jax.Array):
        """Fused on-policy step: rollout + learn + optimize + EMA.

        This exact program shape — optimization_barrier pinning the
        trajectory between the phases, legal masks derived from the stored
        observations rather than a dedicated (T, B, A) buffer (see
        env/engine.py::Trajectory) — is verified bit-identical to running
        rollout and learn as separate programs on real hardware, including
        the largest single-chip config (785k-node tree, B=131072, f32),
        where earlier fused-program shapes were miscompiled by XLA:TPU in
        two different ways (misread mask buffer; collapsed per-lane PRNG).
        After restructuring this function, re-run
        tools/check_fused_consistency.py on TPU.  The barrier costs
        nothing: scan outputs are materialized anyway."""
        state, traj = rollout_fn(tree, packed, state)
        state, traj = jax.lax.optimization_barrier((state, traj))
        return learn_fn(packed, state, traj, alpha)

    _rollout_jit = jax.jit(rollout_fn_split)
    _learn_jit = jax.jit(learn_fn)

    def train_step(state, alpha):
        if not cfg.store_rollout_obs:
            # Regather mode keeps no per-step observation record, so the
            # learner's masks come through the (T, B, A)-shaped trajectory
            # buffers that the fused single-program form was observed to
            # misread at large shapes (see _train_step).  Two programs are
            # correct by construction; the cost is one extra dispatch.
            state, traj = _rollout_jit(tree, packed_tables, state)
            return _learn_jit(packed_tables, state, traj, alpha)
        return _train_step(tree, packed_tables, state, alpha)

    def rollout_jit(state):
        return _rollout_jit(tree, packed_tables, state)

    def learn_jit(state, traj, alpha):
        return _learn_jit(packed_tables, state, traj, alpha)

    # Fused sample+learn for the buffered path: the replay gather+concat
    # runs INSIDE the learner program (one dispatch, and XLA fuses the
    # lane gather into the trajectory's first consumers instead of
    # materializing the sampled batch).  Fed by TrajectoryBuffer.plan.
    def _learn_sampled_fn(packed, state, slots, lanes, alpha):
        return learn_fn(packed, state, buffer_lib.collate_slots(slots,
                                                                lanes),
                        alpha)

    _learn_sampled_jit = jax.jit(_learn_sampled_fn)

    def learn_sampled(state, slots, lanes, alpha):
        if lanes is None:  # single-full-slot fast path
            return _learn_jit(packed_tables, state, slots[0], alpha)
        return _learn_sampled_jit(packed_tables, state, slots, lanes,
                                  alpha)

    learn_jit.sampled = learn_sampled

    # expose the table-as-argument form for callers that wrap the step in a
    # larger jitted program (closing over the tables would bake them into
    # the outer program as constants)
    train_step.inner = _train_step
    train_step.tables = (tree, packed_tables)

    # Exact evaluation under an active obs transform scores the policy the
    # net induces on the NOISE-FREE lifted observation (the mean of the
    # per-step observation distribution); the nashconv module itself keeps
    # slicing legality from its raw observations.
    eval_actor_fn = (actor_fn if obs_tf is None
                     else (lambda variables, obs:
                           actor_fn(variables, obs_tf(obs, None))))

    @functools.partial(jax.jit, static_argnames=("num_passes",))
    def _nashconv_jit(tree, variables, num_passes):
        joint = nashconv_lib.joint_policy_all_nodes(tree, eval_actor_fn,
                                                    variables)
        return nashconv_lib.nashconv_pure(tree, joint, num_passes,
                                          compute_reach=False)

    # The config threshold is capped by the architecture's activation
    # footprint (nets.inference_chunk_nodes): a node count that fits the
    # MLP can OOM a wide EquiNet, whose exchangeable layers materialize
    # ~6*channels floats per matrix cell.
    chunk_nodes = min(cfg.nashconv_chunk_nodes,
                      nets.inference_chunk_nodes(net, tree.max_actions))

    def nashconv_fn(variables) -> nashconv_lib.NashConvResult:
        # Above the node threshold the fused whole-tree program would
        # materialize the (2S, 2, A, A) observation tensor plus the net
        # activations in one live set; host-driven chunked inference keeps
        # the working set at inference_batch_size nodes and feeds the exact
        # same backward induction.
        if tree.size > chunk_nodes:
            joint = nashconv_lib.joint_policy_from_net(
                tree, eval_actor_fn, variables,
                inference_batch_size=chunk_nodes)
            if eval_mesh is not None:
                from ..metrics import nashconv_shard

                return nashconv_shard.nashconv_sharded(tree, joint,
                                                       eval_mesh)
            return nashconv_lib.nashconv_root(tree, joint)
        return _nashconv_jit(tree, variables, tree.max_depth)

    return train_step, rollout_jit, learn_jit, nashconv_fn


def rotate_regularization_nets(state: TrainState) -> TrainState:
    """At each update (m) boundary: pi_reg_prev <- pi_reg; pi_reg <- target
    (reference rnad.py:528-531).  Pure pytree rebinding, no copies."""
    return state.replace(variables_reg_=state.variables_reg,
                         variables_reg=state.variables_target)


def alpha_schedule(n: int, delta_m: int) -> float:
    """Linear 0 -> 1 ramp over the first half of each update period
    (reference rnad.py:497)."""
    return 1.0 if n > delta_m / 2 else n * 2.0 / delta_m


class RNaD:
    """Host-side experiment driver: fresh-or-resume lifecycle, two-timescale
    schedule, checkpointing, NashConv cadence (reference learn/rnad.py:18-547).
    """

    def __init__(self, tree: GameTree, cfg: RNaDConfig = RNaDConfig(),
                 net_config: Optional[NetConfig] = None,
                 directory_name: Optional[str] = None,
                 runs_root: Optional[str] = None,
                 seed: int = 0,
                 use_same_init_net_as: Optional[str] = None,
                 use_wandb: bool = False):
        from ..utils.checkpoint import RunStore
        from ..utils.logging import MetricLogger

        self.tree = tree
        self.cfg = cfg
        self.seed = seed
        if net_config is None:
            net_config = NetConfig(type="MLP", max_actions=tree.max_actions,
                                   width=256)
        self.net_config = net_config
        self.net = nets.build_net(net_config)
        if directory_name is None:
            import time
            directory_name = str(int(time.time()))
        self.store = RunStore(directory_name, runs_root)
        self.runs_root = runs_root
        self.use_same_init_net_as = use_same_init_net_as
        self.use_wandb = use_wandb
        self._logger_cls = MetricLogger
        self.logger = None

        self.m = 0
        self.n = 0
        self.state: Optional[TrainState] = None
        (self.train_step, self.rollout_jit, self.learn_jit,
         self.nashconv_fn) = make_rnad_fns(self.net, tree, cfg)
        self._np_rng = np.random.default_rng(seed + 1)

    # -- lifecycle ---------------------------------------------------------

    def _fresh_state(self) -> TrainState:
        key = jax.random.PRNGKey(self.seed)
        init_variables = None
        if self.use_same_init_net_as:
            from ..utils.checkpoint import RunStore
            other = RunStore(self.use_same_init_net_as, self.runs_root)
            template = init_train_state(self.net, key,
                                        self.tree.max_actions, self.cfg)
            loaded = other.load_checkpoint(0, 0, template)
            init_variables = loaded.variables
            logging.info("loaded init net from run %s",
                         self.use_same_init_net_as)
        return init_train_state(self.net, key, self.tree.max_actions,
                                self.cfg, init_variables)

    def initialize(self) -> None:
        if self.state is not None:
            return  # already initialized in this object's lifetime
        # under multi-controller SPMD every process runs this same loop for
        # the compute, but only process 0 touches the shared run directory
        # (params/checkpoints/metrics); see docs/DISTRIBUTED.md
        is_proc0 = jax.process_index() == 0
        resumed = False
        if not self.store.exists() or self.store.latest() is None:
            logging.info("initializing R-NaD run %s", self.store.name)
            if is_proc0:
                self.store.save_params({
                    "rnad": self.cfg.to_json(),
                    "net": self.net_config.to_json(),
                    "tree_hash": self.tree.hash,
                    "seed": self.seed,
                    "directory_name": self.store.name,
                })
            self.state = self._fresh_state()
            self.m, self.n = 0, 0
            self.save_checkpoint()
        else:
            params = self.store.load_params()
            if int(params["tree_hash"]) != int(self.tree.hash):
                raise AssertionError(
                    "resume tree hash mismatch: run was trained on a "
                    "different tree (reference rnad.py:256-258 semantics)")
            self.m, self.n = self.store.latest()
            template = init_train_state(
                self.net, jax.random.PRNGKey(self.seed),
                self.tree.max_actions, self.cfg)
            self.state = self.store.load_checkpoint(self.m, self.n, template)
            resumed = True
            logging.info("resumed run %s at m=%d n=%d", self.store.name,
                         self.m, self.n)
        if self.logger is None:
            self.logger = self._logger_cls(
                directory=self.store.directory if is_proc0 else None,
                use_wandb=self.use_wandb and is_proc0,
                run_name=self.store.name,
                config={"rnad": self.cfg.to_json(),
                        "net": self.net_config.to_json()},
                resume=resumed)

    def save_checkpoint(self) -> None:
        self.store.save_checkpoint(self.m, self.n, self.state)

    # -- schedule ----------------------------------------------------------

    def _get_update_info(self) -> Tuple[bool, int]:
        """(may_resume, delta_m) from cumulative m-bounds
        (reference rnad.py:321-332)."""
        bounding = [i for i, b in enumerate(self.cfg.bounds) if b > self.m]
        if not bounding:
            return False, 0
        return True, self.cfg.delta_m[min(bounding)]

    def nashconv(self) -> float:
        """NashConv of the EMA target net (reference rnad.py:334-351)."""
        result = self.nashconv_fn(self.state.variables_target)
        by_depth = nashconv_lib.mean_nashconv_by_depth(self.tree, result)
        for depth, val in by_depth.items():
            logging.info("depth:%d nashconv:%f", depth, val)
        return host_value(result.nashconv())

    # -- main loop ---------------------------------------------------------

    def _seed_best_bar(self) -> None:
        """Resume-safe best-checkpoint bar: a restarted run keeps
        improving on the stored best instead of overwriting it with a
        worse early eval.  Called from every path that can save_best."""
        if hasattr(self, "_best_nashconv"):
            return
        meta = self.store.load_best_meta()
        self._best_nashconv = (float(meta["nashconv"]) if meta
                               else float("inf"))

    def _maybe_save_best(self, value: float, step: int) -> None:
        self._seed_best_bar()
        self._last_nashconv = value
        if value < self._best_nashconv:
            self._best_nashconv = value
            self._best_target = self.state.variables_target
            self.store.save_best(self.state, {"nashconv": value,
                                              "step": step,
                                              "m": self.m, "n": self.n})
            logging.info("new best nashconv %.6f at step %d", value, step)

    def _rotate_for_schedule(self) -> None:
        """Update-boundary regularization rotation, honoring
        ``cfg.reg_anchor`` (see RNaDConfig; "target" is the reference
        rotation, reference rnad.py:528-531)."""
        if self.cfg.reg_anchor == "fixed":
            return  # stationary anchor: the reg nets stay the init nets
        if (self.cfg.reg_anchor == "best"
                and getattr(self, "_best_target", None) is not None
                and getattr(self, "_last_nashconv", float("inf"))
                > self._best_nashconv):
            logging.info(
                "reg_anchor=best: eval %.6f worse than best %.6f — "
                "anchoring pi_reg to the best checkpoint's target",
                self._last_nashconv, self._best_nashconv)
            self.state = self.state.replace(
                variables_reg_=self.state.variables_reg,
                variables_reg=self._best_target)
        else:
            self.state = rotate_regularization_nets(self.state)

    def final_eval(self) -> float:
        """One exact eval of the current EMA target, logged to the metric
        stream and folded into best-checkpoint selection.  The run loop
        only evaluates at update boundaries BEFORE training the update, so
        a completed run's last policy is otherwise never scored or eligible
        for best.ckpt."""
        value = self.nashconv()
        step = int(host_value(self.state.total_steps))
        self.logger.log({"nashconv": value}, step)
        self._maybe_save_best(value, step)
        return value

    def run(self, max_updates: int = 10**6, checkpoint_mod: int = 1000,
            expl_mod: int = 1, log_mod: int = 20) -> None:
        self.initialize()
        cfg = self.cfg
        self._seed_best_bar()
        if cfg.reg_anchor not in ("target", "best", "fixed"):
            raise ValueError(f"unknown reg_anchor {cfg.reg_anchor!r}; "
                             "expected 'target', 'best' or 'fixed'")
        if cfg.reg_anchor == "best" and not hasattr(self, "_best_target"):
            loaded = self.store.load_best(self.state)  # resume-safe anchor
            if loaded is not None:
                self._best_target = loaded[0].variables_target
        on_policy = cfg.n_batches_per_buffer == 1 and cfg.buffer_mod == 1
        buffer = TrajectoryBuffer(cfg.n_batches_per_buffer)
        import time as _time
        last_log_time = _time.perf_counter()
        last_log_steps = int(host_value(self.state.total_steps))
        last_log_steps_host = last_log_steps  # host mirror of total_steps

        for _ in range(max_updates):
            may_resume, delta_m = self._get_update_info()
            if not may_resume:
                return
            logging.info("m: %d, delta_m: %d", self.m, delta_m)
            buffer.max_size = cfg.n_batches_per_buffer

            # expl_mod <= 0 disables the (expensive, whole-tree) eval
            if (expl_mod > 0 and self.m % expl_mod == 0 and self.n == 0
                    and self.m != 0):
                value = self.nashconv()
                step = int(host_value(self.state.total_steps))
                self.logger.log({"nashconv": value}, step)
                # Model selection by the exact evaluator: keep the best
                # EMA-target policy seen (see RunStore.save_best).
                self._maybe_save_best(value, step)

            while self.n < delta_m:
                alpha = alpha_schedule(self.n, delta_m)
                if self.n % checkpoint_mod == 0:
                    self.save_checkpoint()

                if on_policy:
                    self.state, metrics = self.train_step(
                        self.state, jnp.float32(alpha))
                else:
                    # track the step counter host-side: fetching
                    # state.total_steps would force a device sync per step.
                    # The empty-buffer check covers resume at a step count
                    # not divisible by buffer_mod (the reference crashes
                    # there, episode.py:318 via rnad.py:488).
                    if (len(buffer) == 0
                            or last_log_steps_host % cfg.buffer_mod == 0):
                        self.state, traj = self.rollout_jit(self.state)
                        buffer.append(traj)
                    sampled = getattr(self.learn_jit, "sampled", None)
                    if sampled is not None:
                        # fused sample+learn: the replay gather runs
                        # inside the learner program (learn/rnad.py)
                        slots, lanes = buffer.plan(cfg.batch_size,
                                                   self._np_rng)
                        self.state, metrics = sampled(
                            self.state, slots, lanes, jnp.float32(alpha))
                    else:  # externally injected learn_jit (parallel/)
                        sample = buffer.sample(cfg.batch_size,
                                               self._np_rng)
                        self.state, metrics = self.learn_jit(
                            self.state, sample, jnp.float32(alpha))
                last_log_steps_host += 1

                if self.n % log_mod == 0:
                    # blocking on the metrics here also attributes the wall
                    # clock of the async step pipeline correctly
                    total = int(host_value(self.state.total_steps))
                    now = _time.perf_counter()
                    dsteps = total - last_log_steps
                    if dsteps > 0:
                        sps = dsteps / max(now - last_log_time, 1e-9)
                        metrics = dict(metrics)
                        metrics["steps_per_s"] = sps
                        metrics["env_steps_per_s"] = (
                            sps * cfg.batch_size
                            * 2 * self.tree.max_depth)
                    last_log_time, last_log_steps = now, total
                    self.logger.log(metrics, total)
                self.n += 1

            self.n = 0
            self.m += 1
            self._rotate_for_schedule()
