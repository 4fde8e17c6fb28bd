"""Supervised oracle-distillation baseline.

The reference notes (environment/tree.py:231-233) that besides R-NaD one can
train a network directly on the generator's exact Nash strategies and
payoffs "for setting a benchmark to compare R-NaD to" — but never implements
it.  This module does: every tree node (both seats) becomes a labeled
example — cross-entropy of the masked policy against the stored exact NE
strategy plus MSE of the value head against the stored exact game value —
trained full-batch (or node-minibatched) on device.

The resulting NashConv is the practical floor for a given architecture on a
given tree: it measures pure function-approximation error with perfect
labels, isolating it from R-NaD's learning dynamics.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..env.tree import GameTree
from ..metrics import nashconv as nashconv_lib
from ..models import common, nets
from ..ops.stepping import seat_observations


def _dataset(tree: GameTree):
    """(obs, target_policy, target_value, mask) over every node x seat.

    Row seat values are +v, column seat -v (zero-sum).  The absorbing state
    (node 0) is excluded via sample weights.

    Observations are stored FLAT, (2S, 2*A*A): the (.., 2, A, A) form pads
    its (A, A) minor dims to (8, 128) tiles in HBM — a 16x blowup at A=5
    that alone overflows a v5e on ~800k-node trees.  The loss reshapes per
    (mini)batch; the MLP immediately flattens again, so XLA cancels the
    reshape pair.
    """
    A = tree.max_actions
    row_obs, col_obs = seat_observations(tree.expected_value, tree.legal)
    obs = jnp.concatenate([row_obs, col_obs], axis=0)  # (2S, 2, A, A)
    obs = obs.reshape(obs.shape[0], 2 * A * A)
    pol = jnp.concatenate([tree.solution[:, :A], tree.solution[:, A:]],
                          axis=0)  # (2S, A)
    val = jnp.concatenate([tree.root_value[:, 0], -tree.root_value[:, 0]],
                          axis=0)  # (2S,)
    S = tree.index.shape[0]
    live = (jnp.arange(S) != 0).astype(jnp.float32)
    weight = jnp.concatenate([live, live], axis=0)
    return obs, pol, val, weight


def supervised_loss(params, aux, net, obs_flat, target_pol, target_val,
                    weight):
    variables = dict(aux, params=params)
    A = net.max_actions
    obs = obs_flat.reshape(-1, 2, A, A)
    logits, value = nets.apply_eval(net, variables, obs)
    legal = obs[:, 1, :, 0]
    log_pi = common.masked_log_policy(logits, legal)
    ce = -(target_pol * log_pi).sum(-1)
    mse = (value - target_val) ** 2
    n = jnp.maximum(weight.sum(), 1.0)
    loss_pi = (ce * weight).sum() / n
    loss_v = (mse * weight).sum() / n
    return loss_pi + loss_v, {"loss_pi": loss_pi, "loss_v": loss_v}


def train_oracle_net(tree: GameTree, net, key: jax.Array,
                     steps: int = 2000, lr: float = 1e-3,
                     variables: Optional[Dict] = None,
                     node_batch: Optional[int] = None,
                     eval_chunk_nodes: Optional[int] = None,
                     scan_segment_steps: int = 1000
                     ) -> Tuple[Dict, Dict[str, float]]:
    """Distills the exact solution into ``net``; returns (variables, metrics).

    Metrics include the final losses and the exact NashConv of the distilled
    policy — the architecture's approximation floor on this tree.

    ``node_batch``: when set, each step trains on that many uniformly
    (with-replacement) sampled node-seat rows instead of the full dataset —
    required on big trees, where full-batch activations do not fit in HBM.
    ``eval_chunk_nodes``: trees larger than this evaluate the final NashConv
    through the chunked inference path (metrics/nashconv.py).  Default:
    memory-aware per architecture (nets.inference_chunk_nodes) — a fixed
    node count OOMs wide EquiNets on big trees.
    """
    if variables is None:
        variables = nets.init_variables(net, key, tree.max_actions)
    if eval_chunk_nodes is None:
        eval_chunk_nodes = nets.inference_chunk_nodes(net, tree.max_actions)
    obs, target_pol, target_val, weight = _dataset(tree)
    tx = optax.adam(lr)
    opt_state = tx.init(variables["params"])
    n_rows = obs.shape[0]

    @jax.jit
    def run(params, opt_state, step_keys, obs, target_pol, target_val,
            weight):
        def step(carry, step_key):
            params, opt_state = carry
            if node_batch is None:
                batch = (obs, target_pol, target_val, weight)
            else:
                idx = jax.random.randint(step_key, (node_batch,), 0, n_rows)
                batch = (obs[idx], target_pol[idx], target_val[idx],
                         weight[idx])
            (loss, parts), grads = jax.value_and_grad(
                supervised_loss, has_aux=True)(params, {}, net, *batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), step_keys)
        return params, opt_state, losses

    # The scan runs in bounded segments (one device program each) rather
    # than one steps-long program: a single multi-minute XLA program can
    # trip runtime watchdogs (observed: a 10k-step EquiNet scan crashed the
    # TPU worker where the same-length MLP scan, ~10x faster per step, ran
    # fine), and segment boundaries cost one dispatch each.  Per-step keys
    # are pre-split once, so segmentation does not change the math.
    step_keys = jax.random.split(jax.random.fold_in(key, 1), steps)
    params = variables["params"]
    seg = max(1, min(steps, scan_segment_steps))
    loss_tail = []
    for start in range(0, steps, seg):
        stop = min(start + seg, steps)
        # a shorter tail segment compiles its own (smaller) program once
        params, opt_state, losses = run(params, opt_state,
                                        step_keys[start:stop], obs,
                                        target_pol, target_val, weight)
        loss_tail = losses
    losses = loss_tail
    variables = dict(variables, params=params)

    actor_fn = lambda vs, o: nets.apply_eval(net, vs, o)
    if tree.size > eval_chunk_nodes:
        joint = nashconv_lib.joint_policy_from_net(
            tree, actor_fn, variables,
            inference_batch_size=eval_chunk_nodes)
        result = nashconv_lib.nashconv_root(tree, joint)
    else:
        joint = nashconv_lib.joint_policy_all_nodes(tree, actor_fn,
                                                    variables)
        result = nashconv_lib.nashconv(tree, joint)
    metrics = {
        "final_loss": float(losses[-1]),
        "nashconv": float(result.nashconv()),
    }
    return variables, metrics
