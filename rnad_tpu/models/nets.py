"""Policy+value networks (flax.linen).

Two interchangeable architectures selected by ``NetConfig.type``, mirroring
the reference's family (reference nn/net.py):

  * ``MLP`` — flattened 2*A*A observation into two separate single-hidden-
    layer heads (value, policy) (net.py:18-51).
  * ``ConvNet`` — AlphaZero-style tower of ``CrossConv`` blocks: a
    matrix-structured convolution whose receptive field is the union of a
    full row and a full column, implemented as a padded (1, 2A-1) conv plus a
    padded (2A-1, 1) conv, summed (net.py:88-143), with optional BatchNorm
    residual blocks (net.py:146-172) and linear heads (net.py:175-227).

Both take observations of shape (..., 2, A, A) — [expected-value matrix,
legality mask] from the mover's point of view — and return raw policy logits
(masking happens in models.common) and a value scalar.

Unlike the reference there is no Python loop over time anywhere
(net.py:64-85): trajectory re-inference is a single reshape to (T*B, ...)
and one forward pass.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import NetConfig
from . import common


class MLP(nn.Module):
    """Two-headed MLP (reference nn/net.py:18-51).

    ``depth`` is the number of hidden layers per head; the reference is
    fixed at one (depth=1, the default — parameter names and checkpoints
    stay interchangeable).  Deeper heads are a TPU-native extension: the
    capacity floor of the one-layer net dominates approximation error on
    large trees (tools/distill_floor.py), and width x width hidden matmuls
    are far better MXU shapes than the tiny 2A^2 input contraction.
    """

    max_actions: int
    width: int = 256
    depth: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: jax.Array, train: bool = False,
                 mask: jax.Array | None = None
                 ) -> Tuple[jax.Array, jax.Array]:
        del mask  # no batch statistics to protect
        A = self.max_actions
        # channel count follows the observation (2 raw; more under an
        # active obs_transform — ops/obs_transform.py)
        din = obs.shape[-3] * A * A
        x = obs.reshape(obs.shape[:-3] + (din,)).astype(self.dtype)
        dense = lambda feat, fan_in, name: nn.Dense(
            feat, name=name, dtype=self.dtype,
            kernel_init=common.torch_linear_kernel_init,
            bias_init=common.torch_bias_init(fan_in))

        def head(name: str, out_features: int) -> jax.Array:
            h = nn.relu(dense(self.width, din, f"{name}_fc0")(x))
            for i in range(1, self.depth):
                h = nn.relu(dense(self.width, self.width,
                                  f"{name}_hidden{i}")(h))
            return dense(out_features, self.width, f"{name}_fc1")(h)

        v = head("value", 1)
        logits = head("policy", A)
        return logits, v


class CrossConv(nn.Module):
    """Row+column structured conv (reference net.py:88-143)."""

    max_actions: int
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        A = self.max_actions
        # NHWC layout; pad width for the row conv, height for the col conv.
        conv = lambda ks, name: nn.Conv(
            self.features, kernel_size=ks, padding="VALID", name=name,
            dtype=self.dtype, kernel_init=common.torch_conv_kernel_init,
            bias_init=common.torch_bias_init(
                x.shape[-1] * ks[0] * ks[1]))
        xr = jnp.pad(x, ((0, 0), (0, 0), (A - 1, A - 1), (0, 0)))
        r = conv((1, 2 * A - 1), "row_conv")(xr)
        xc = jnp.pad(x, ((0, 0), (A - 1, A - 1), (0, 0), (0, 0)))
        c = conv((2 * A - 1, 1), "col_conv")(xc)
        return r + c


class MaskedBatchNorm(nn.Module):
    """BatchNorm whose batch statistics can exclude masked-out samples.

    With ``mask=None`` this matches ``nn.BatchNorm`` semantically and keeps
    identical variable names/shapes (checkpoints are interchangeable), but
    not bitwise: flax's default fast variance computes E[x^2] - mu^2 while
    this module uses the two-pass E[(x - mu)^2], which rounds differently
    at the ulp level (the two-pass form is what the masked weighting
    needs, and is the numerically safer of the two).  With a
    per-sample 0/1 ``mask`` the train-mode mean/variance are weighted over
    valid samples only: the trainer feeds fixed-length (T = 2*max_depth)
    trajectories, so without masking the many absorbing-state padding rows
    would contaminate the statistics (the reference only trims to the
    longest episode in the batch, nn/net.py:246-268 via episode t_eff —
    rows past a lane's own terminal still leak into its stats; here they
    never do).  Running averages (eval mode) follow flax defaults.
    """

    momentum: float = 0.99
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool,
                 mask: jax.Array | None = None) -> jax.Array:
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (feat,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            if mask is None:
                mean = xf.mean(axis=reduce_axes)
                var = xf.var(axis=reduce_axes)
            else:
                w = mask.astype(jnp.float32).reshape(
                    (-1,) + (1,) * (x.ndim - 1))
                per_sample = float(np.prod(x.shape[1:-1]))
                denom = jnp.maximum(w.sum() * per_sample, 1.0)
                mean = (xf * w).sum(axis=reduce_axes) / denom
                var = (((xf - mean) ** 2) * w).sum(axis=reduce_axes) / denom
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(
            var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


class ConvResBlock(nn.Module):
    max_actions: int
    channels: int
    batch_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 mask: jax.Array | None = None) -> jax.Array:
        h = CrossConv(self.max_actions, self.channels, dtype=self.dtype,
                      name="conv0")(x)
        h = nn.relu(h)
        if self.batch_norm:
            h = MaskedBatchNorm(name="bn0", dtype=self.dtype)(
                h, use_running_average=not train, mask=mask)
        h = CrossConv(self.max_actions, self.channels, dtype=self.dtype,
                      name="conv1")(h)
        h = nn.relu(h)
        if self.batch_norm:
            h = MaskedBatchNorm(name="bn1", dtype=self.dtype)(
                h, use_running_average=not train, mask=mask)
        return x + h


class ConvNet(nn.Module):
    max_actions: int
    channels: int = 16
    depth: int = 1
    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: jax.Array, train: bool = False,
                 mask: jax.Array | None = None
                 ) -> Tuple[jax.Array, jax.Array]:
        A = self.max_actions
        lead = obs.shape[:-3]
        if mask is not None:
            mask = mask.reshape(-1)  # one weight per flattened sample
        # (..., C, A, A) -> (N, A, A, C) NHWC (C = 2 raw, or the
        # obs_transform's lifted channel count)
        x = obs.reshape((-1,) + obs.shape[-3:]).transpose(0, 2, 3, 1)
        x = x.astype(self.dtype)
        x = CrossConv(A, self.channels, dtype=self.dtype, name="pre")(x)
        for i in range(self.depth):
            x = ConvResBlock(A, self.channels, self.batch_norm,
                             dtype=self.dtype, name=f"block{i}")(x, train,
                                                                 mask)
        flat = x.reshape((x.shape[0], self.channels * A * A))
        dense = lambda feat, name: nn.Dense(
            feat, name=name, dtype=self.dtype,
            kernel_init=common.torch_linear_kernel_init,
            bias_init=common.torch_bias_init(self.channels * A * A))
        logits = dense(A, "policy")(flat)
        value = dense(1, "value")(flat)
        return logits.reshape(lead + (A,)), value.reshape(lead + (1,))


def _solver_features(x: jax.Array, iters: int
                     ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Six equivariant input channels derived from a short RM+ solve of the
    observed matrix (env/solver_device.py) — averaged strategies x/y, their
    logs, and the action utilities against them — plus the solve itself as
    head primers: (feats (N,A,A,6), log x-bar (N,A), value (N,)).

    The observation IS the matrix whose NE is the training target's local
    solution (reference episode.py:62-68), so an iterative solver computes
    near-exact answers from it (the RM+ skyline row of docs/SCALE.md); a
    pooling tower has to approximate that iteration.  Feeding a few solver
    iterates in lets the heads read the solution off linearly (log x-bar is
    exactly the NE logits) and spend capacity on the *correction* — which is
    what R-NaD training needs, since its reward transform perturbs the game
    away from the observed matrix's NE.  All six channels are equivariant
    under (row, col) relabeling because RM+ itself is.  Gradients do not
    flow (pure input features of data).
    """
    from ..env.solver_device import solve_zero_sum_rmplus

    M = x[..., 0].astype(jnp.float32)       # (N, A, A)
    legal = x[..., 1].astype(jnp.float32)
    # The legality channel is the outer product legal_rows x legal_cols
    # (generator convention); recover the factors by row/col max, which —
    # unlike slicing column 0 — stays correct under any relabeling.
    lr = legal.max(axis=2)                   # mover's legal rows
    lc = legal.max(axis=1)                   # opponent's legal cols
    xs, ys, v = solve_zero_sum_rmplus(M, lr, lc, iters=iters)
    u_r = jnp.einsum("nrc,nc->nr", M, ys)    # row utilities vs y-bar
    u_c = -jnp.einsum("nr,nrc->nc", xs, M)   # col utilities vs x-bar
    eps = 1e-9
    log_x = jnp.log(xs + eps)
    rows = [xs, log_x, u_r]                  # broadcast over columns
    cols = [ys, jnp.log(ys + eps), u_c]      # broadcast over rows
    feats = [jnp.broadcast_to(r[:, :, None], M.shape) for r in rows]
    feats += [jnp.broadcast_to(c[:, None, :], M.shape) for c in cols]
    return (jax.lax.stop_gradient(jnp.stack(feats, axis=-1)),
            jax.lax.stop_gradient(log_x), jax.lax.stop_gradient(v))


class _ExchangeableDense(nn.Module):
    """One row/column-exchangeable linear layer (Hartford et al. 2018),
    computed in block form: conceptually the layer is
    ``concat([h, rowmean, colmean, globalmean, rowmax, colmax]) @ W``,
    but broadcasting the five pooled tensors back to (N, A, A, C) and
    materializing the 6C-channel concat is the worst possible TPU shape —
    at production batch it was the single biggest live buffer of the
    learner step (a (3, T*B, A, A, 6C) remat output OOM'd the 16 GB chip
    at B=32k) and 150/46 of the layer's matmul FLOPs are multiplications
    by broadcast-duplicated rows.  Here the kernel is sliced into its six
    (C_in, C) blocks and each pooled tensor is contracted UN-broadcast
    (row/col pools at 1/A the rows, the global pool at 1/A^2), with the
    outputs broadcast-added: same parameters, same math up to float
    reassociation (per-block MXU accumulation instead of one 6C-long
    dot), ~3.3x fewer tower FLOPs at A=5, and no 6C buffer ever exists.

    The parameter tree ({kernel (6*C_in, C), bias (C,)} under the module
    name) and the initializers match the nn.Dense(concat) formulation
    byte for byte, so existing EquiNet checkpoints load unchanged."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h: jax.Array) -> jax.Array:
        cin = h.shape[-1]
        kernel = self.param("kernel", common.torch_linear_kernel_init,
                            (6 * cin, self.features))
        bias = self.param("bias", common.torch_bias_init(6 * cin),
                          (self.features,))
        k = kernel.astype(self.dtype)
        h = h.astype(self.dtype)
        blk = lambda i: k[i * cin:(i + 1) * cin]
        out = jnp.dot(h, blk(0))
        out = out + jnp.dot(h.mean(axis=2, keepdims=True), blk(1))
        out = out + jnp.dot(h.mean(axis=1, keepdims=True), blk(2))
        out = out + jnp.dot(h.mean(axis=(1, 2), keepdims=True), blk(3))
        out = out + jnp.dot(h.max(axis=2, keepdims=True), blk(4))
        out = out + jnp.dot(h.max(axis=1, keepdims=True), blk(5))
        return out + bias.astype(self.dtype)


class EquiNet(nn.Module):
    """Permutation-equivariant policy/value net (TPU-native extension; no
    reference counterpart — the reference's families are the MLP and the
    CrossConv ConvNet, reference nn/net.py).

    The function the net must represent is the Nash-equilibrium map
    payoff-matrix -> (NE strategy, game value), and that map is exactly
    equivariant: relabeling the mover's actions by a permutation sigma and
    the opponent's by tau permutes the NE strategy by sigma and leaves the
    value unchanged.  The MLP and ConvNet have to *learn* this symmetry
    from data; this net encodes it, which collapses the hypothesis space by
    ~(A!)^2 per matrix.  The flip side is that it cannot memorize node
    identities the way an MLP can on a small tree, so its floor should be
    compared on trees too large to memorize (docs/SCALE.md).

    Architecture: a tower of exchangeable matrix layers (the
    row/column-exchangeable linear layer of Hartford et al. 2018, "Deep
    Models of Interactions Across Sets"): each layer concatenates, per cell,
    the cell features with the cell's row-mean/max, column-mean/max and
    global-mean features and mixes channels with one dense matmul — so the
    whole tower is reductions + (N*A*A, 6C) x (6C, C) matmuls, an
    MXU-friendly shape.  Max pools are included alongside means because the
    map's primitive, best response, IS a max over actions.
    The policy head pools each row over columns (row-equivariant,
    column-invariant) and the value head pools globally (invariant); both
    symmetries hold by construction, see
    tests/test_models.py::test_equinet_equivariance.
    """

    max_actions: int
    channels: int = 128
    depth: int = 4
    solver_iters: int = 0
    solver_prime: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: jax.Array, train: bool = False,
                 mask: jax.Array | None = None, solver_feats=None
                 ) -> Tuple[jax.Array, jax.Array]:
        del train, mask  # no batch statistics to protect
        A = self.max_actions
        lead = obs.shape[:-3]
        # (..., C, A, A) -> (N, A, A, C): rows = mover actions, cols =
        # opponent actions, channels = [expected value, legality] raw
        # (C=2) or the obs_transform's lifted views.
        x = obs.reshape((-1,) + obs.shape[-3:]).transpose(0, 2, 3, 1)
        prime_logits = prime_value = None
        if self.solver_iters:
            # The RM+ solve is a pure (gradient-free) function of the
            # observation, so callers running several net passes on the
            # SAME observations (the learner's 4-net step) precompute it
            # once via ``equinet_solver_features`` and pass it in.
            feats, log_x, v_rm = (solver_feats if solver_feats is not None
                                  else _solver_features(x, self.solver_iters))
            x = jnp.concatenate([x, feats], axis=-1)
            if self.solver_prime:
                prime_logits, prime_value = log_x, v_rm[:, None]
        x = x.astype(self.dtype)
        x0 = x  # input skip to the heads (solver channels readable linearly)

        for i in range(self.depth):
            x = nn.relu(_ExchangeableDense(
                self.channels, name=f"ex{i}", dtype=self.dtype)(x))

        # Primed heads start as the identity on the solver solution: the
        # head kernels are zero-initialized and the RM+ outputs enter
        # through learnable scalar gates (init 1), so the step-0 policy IS
        # the RM+ epsilon-Nash (the skyline row of docs/SCALE.md) and
        # training only has to learn the *correction* — exactly what R-NaD
        # needs, since its reward transform perturbs each node's game away
        # from the observed matrix whose NE the solver computes.
        primed = prime_logits is not None
        head = lambda feat, fan_in, name: nn.Dense(
            feat, name=name, dtype=self.dtype,
            kernel_init=(nn.initializers.zeros if primed
                         else common.torch_linear_kernel_init),
            bias_init=(nn.initializers.zeros if primed
                       else common.torch_bias_init(fan_in)))
        # Input skip: row-pooled raw channels ride along to the heads, so
        # with solver features on, the NE logits (the log x-bar channel) are
        # one linear readout away instead of having to survive the tower.
        row_feat = jnp.concatenate([x.mean(axis=2), x0.mean(axis=2)],
                                   axis=-1)            # (N, A, C + C0)
        glob = jnp.concatenate([x.mean(axis=(1, 2)), x0.mean(axis=(1, 2))],
                               axis=-1)                # (N, C + C0)
        fan = row_feat.shape[-1]
        logits = head(1, fan, "policy")(row_feat)[..., 0]
        value = head(1, fan, "value")(glob)
        if primed:
            gp = self.param("policy_prime_gate", nn.initializers.ones, ())
            gv = self.param("value_prime_gate", nn.initializers.ones, ())
            logits = logits.astype(jnp.float32) + gp * prime_logits
            value = value.astype(jnp.float32) + gv * prime_value
        return logits.reshape(lead + (A,)), value.reshape(lead + (1,))


def mlp_fused_weights(params: dict, max_actions: int):
    """Packs the two-head MLP into one fused pair: W0 = [policy_fc0 |
    value_fc0] (din, 2W); W1 block-diagonal (2W, A+1) mapping the policy
    half to logits and the value half to column A.  Two matmuls instead of
    four — the heads never interact (block structure), so outputs are the
    same math with a wider reduction-free concat.

    Only the reference-shaped depth-1 MLP is supported: deeper heads
    (NetConfig.depth > 1) carry ``*_hidden{i}`` layers this packing cannot
    express, so they are rejected rather than silently dropped."""
    hidden = [k for k in params if "hidden" in k]
    if hidden:
        raise ValueError(
            f"mlp_fused_weights supports depth=1 MLPs only; params contain "
            f"hidden layers {sorted(hidden)}")
    A = max_actions
    p0, v0 = params["policy_fc0"], params["value_fc0"]
    p1, v1 = params["policy_fc1"], params["value_fc1"]
    W = p0["kernel"].shape[1]
    w0 = jnp.concatenate([p0["kernel"], v0["kernel"]], axis=1)
    b0 = jnp.concatenate([p0["bias"], v0["bias"]], axis=0)
    w1 = jnp.zeros((2 * W, A + 1), p1["kernel"].dtype)
    w1 = w1.at[:W, :A].set(p1["kernel"])
    w1 = w1.at[W:, A].set(v1["kernel"][:, 0])
    b1 = jnp.concatenate([p1["bias"], v1["bias"]], axis=0)
    return w0, b0, w1, b1


def mlp_seat_fused_weights(params: dict, max_actions: int, d_pad: int,
                           obs_width: int):
    """Both seats' fused two-head MLP as ONE kernel over whole packed state
    rows (the ops/stepping.py row layout): kernel rows [0, W_obs) carry the
    row seat's fused [policy | value] first layer, rows [W_obs, 2*W_obs) the
    col seat's, and every other table lane (masks, transition triples, pad)
    gets a zero row — so the gathered (B, D_pad) row feeds the matmul
    DIRECTLY, with no per-turn obs slice or (2B, ...) seat concat copies
    (the dominant non-matmul HBM traffic of a rollout turn, see
    docs/PERF_ANALYSIS.md).  Adding the x*0 terms of the dead lanes is
    exact in floating point, and K = D_pad occupies the same single
    128-wide MXU tile the sliced path's padded K already paid for.

    Second layer is the (4W, 2*(A+1)) block-diagonal of the per-seat fused
    head: output columns [0, A) row logits, A row value, [A+1, 2A+1) col
    logits, 2A+1 col value.

    Returns (W0 (D_pad, 4W), b0 (4W,), W1 (4W, 2(A+1)), b1 (2(A+1),)).
    Depth-1 MLPs only (same restriction as mlp_fused_weights)."""
    w0, b0, w1, b1 = mlp_fused_weights(params, max_actions)
    din, two_w = w0.shape
    if din != obs_width:
        raise ValueError(f"MLP input dim {din} != packed obs width "
                         f"{obs_width}")
    W0 = jnp.zeros((d_pad, 2 * two_w), w0.dtype)
    W0 = W0.at[:din, :two_w].set(w0)
    W0 = W0.at[din:2 * din, two_w:].set(w0)
    out = w1.shape[1]
    W1 = jnp.zeros((2 * two_w, 2 * out), w1.dtype)
    W1 = W1.at[:two_w, :out].set(w1)
    W1 = W1.at[two_w:, out:].set(w1)
    return (W0, jnp.concatenate([b0, b0]), W1, jnp.concatenate([b1, b1]))


def mlp_multi_net_forward(net, params_list, obs_flat: jax.Array):
    """N two-head MLP forwards over the same observations as TWO matmuls.

    The learner step needs 4 structurally-identical nets (learner, EMA
    target, regularization pair) on one observation batch; separate applies
    re-read the (T*B, 2A^2) observations from HBM once per net.  Here every
    net's fused W0 concatenates into (din, N*2W) and the W1s into a
    block-diagonal (N*2W, N*(A+1)), so the whole thing is two MXU calls and
    one observation read.  Wired into the train step by
    ``RNaDConfig.fuse_net_passes`` (learn/rnad.py::learn_loss); gradients
    flow only through entries whose params were not stop_gradient'ed by the
    caller.

    Returns (logits (N_obs, n, A) f32, values (N_obs, n) f32)."""
    A = net.max_actions
    n = len(params_list)
    fused = [mlp_fused_weights(p, A) for p in params_list]
    din = fused[0][0].shape[0]
    twoW = fused[0][0].shape[1]
    w0 = jnp.concatenate([f[0] for f in fused], axis=1)  # (din, n*2W)
    b0 = jnp.concatenate([f[1] for f in fused], axis=0)
    w1 = jnp.zeros((n * twoW, n * (A + 1)), w0.dtype)
    for i, f in enumerate(fused):
        w1 = jax.lax.dynamic_update_slice(w1, f[2],
                                          (i * twoW, i * (A + 1)))
    b1 = jnp.concatenate([f[3] for f in fused], axis=0)

    dtype = jnp.dtype(net.dtype)
    x = obs_flat.reshape(obs_flat.shape[0], -1).astype(dtype)
    h = nn.relu(jnp.dot(x, w0.astype(dtype)) + b0.astype(dtype))
    out = jnp.dot(h, w1.astype(dtype)) + b1.astype(dtype)
    out = out.astype(jnp.float32).reshape(-1, n, A + 1)
    return out[..., :A], out[..., A]


def mlp_head_eval(net, params: dict, obs_flat: jax.Array,
                  head: str) -> jax.Array:
    """One MLP head's inference-mode forward from raw params.

    The two-head MLP's heads share NOTHING (separate fc0/hidden/fc1 per
    head, see class MLP), so a consumer that needs only one head's output
    can skip the other head's matmuls entirely.  The learner's frozen-net
    passes are exactly that consumer: the EMA target contributes only its
    VALUE (its policy feeds one optional diagnostic) and the regularization
    pair contributes only POLICY log-probs (reference rnad.py:377-382) — so
    half the reference's frozen re-inference work is dead
    (learn/rnad.py::learn_loss, fuse_net_passes="heads").

    Matches the corresponding slice of ``apply_eval`` to ulp tolerance
    (same math; a vmapped multi-net batched dot accumulates in a different
    order than a separate dot).  Returns f32
    ``logits (N, A)`` for ``head="policy"`` or ``values (N,)`` for
    ``head="value"``.
    """
    dtype = jnp.dtype(net.dtype)
    x = obs_flat.reshape(obs_flat.shape[0], -1).astype(dtype)
    h = x
    layers = [f"{head}_fc0"]
    layers += [f"{head}_hidden{i}" for i in range(1, net.depth)]
    for name in layers:
        p = params[name]
        h = nn.relu(jnp.dot(h, p["kernel"].astype(dtype))
                    + p["bias"].astype(dtype))
    p = params[f"{head}_fc1"]
    out = jnp.dot(h, p["kernel"].astype(dtype)) + p["bias"].astype(dtype)
    out = out.astype(jnp.float32)
    return out[:, 0] if head == "value" else out


def build_net(config: NetConfig) -> nn.Module:
    dtype = jnp.dtype(config.compute_dtype)
    if config.type == "MLP":
        return MLP(max_actions=config.max_actions, width=config.width,
                   depth=config.depth, dtype=dtype)
    if config.type == "ConvNet":
        return ConvNet(max_actions=config.max_actions,
                       channels=config.channels, depth=config.depth,
                       batch_norm=config.batch_norm, dtype=dtype)
    if config.type == "EquiNet":
        return EquiNet(max_actions=config.max_actions,
                       channels=config.channels, depth=config.depth,
                       solver_iters=config.solver_iters,
                       solver_prime=config.solver_prime, dtype=dtype)
    raise ValueError(f"unknown net type: {config.type}")


def inference_chunk_nodes(net: nn.Module, max_actions: int,
                          budget_bytes: int = 2 << 30,
                          cap: int = 200_000) -> int:
    """Largest whole-tree-inference chunk (in NODES) whose peak activations
    fit ``budget_bytes``, for the chunked evaluators that feed
    ``metrics/nashconv.py::joint_policy_from_net`` (the reference sizes this
    by node count alone, util/metric.py:51-60 ``inference_batch_size`` —
    fine for its tiny nets, but architecture-dependent here: EquiNet's
    exchangeable layers materialize a (rows, A, A, 6*channels) pooled
    concat per matmul, ~770 floats per CELL at channels=128, vs the MLP's
    ~2 floats per cell.  A fixed 200k-node chunk OOMs a 16 GB chip for
    EquiNet while wasting nothing for the MLP).

    Charges the dominant per-row terms of each family's forward (times two
    seats per node, plus 2x slack for XLA fusion copies/remat); clamps to
    [1024, cap].
    """
    A = max_actions
    esz = jnp.dtype(getattr(net, "dtype", jnp.float32)).itemsize
    if isinstance(net, EquiNet):
        cin = 2 + (6 if net.solver_iters else 0)
        width = max(6 * net.channels, 6 * cin)
        per_row = A * A * (width * esz + net.channels * 4)
    elif isinstance(net, ConvNet):
        per_row = A * A * (2 * A - 1) * net.channels * esz  # im2col rows
    else:  # MLP and MLP-like flat nets
        width = getattr(net, "width", 256)
        per_row = (2 * A * A + 2 * width) * esz
    per_node = 2 * per_row * 2  # two seats; 2x fusion/remat slack
    return max(1024, min(cap, int(budget_bytes // per_node)))


def init_variables(net: nn.Module, key: jax.Array, max_actions: int,
                   in_channels: int = 2) -> Dict:
    """``in_channels``: observation channel count — 2 for the raw reference
    observation, ``obs_transform.out_channels(cfg)`` under an active
    observation transform (every family infers its input width from the
    init example)."""
    obs = jnp.zeros((1, in_channels, max_actions, max_actions), jnp.float32)
    return net.init(key, obs)


def has_batch_stats(variables: Dict) -> bool:
    return "batch_stats" in variables


def apply_eval(net: nn.Module, variables: Dict, obs: jax.Array,
               **apply_kw) -> Tuple[jax.Array, jax.Array]:
    """Inference-mode forward: (logits, value), value squeezed to (...,).

    Head outputs are always f32 (mixed-precision nets compute internally in
    bf16 but the policy/value math downstream stays in f32).  ``apply_kw``
    passes net-specific keywords through (e.g. the EquiNet's precomputed
    ``solver_feats``)."""
    logits, value = net.apply(variables, obs, train=False, **apply_kw)
    return (logits.astype(jnp.float32),
            jnp.squeeze(value, axis=-1).astype(jnp.float32))


def apply_train(net: nn.Module, variables: Dict, obs: jax.Array,
                mask: jax.Array | None = None,
                **apply_kw) -> Tuple[Tuple[jax.Array, jax.Array], Dict]:
    """Training-mode forward; returns updated mutable collections (e.g.
    BatchNorm running stats), empty dict when the net has none.

    ``mask`` (one 0/1 weight per flattened leading-dim sample) excludes
    padding rows from BatchNorm batch statistics; see MaskedBatchNorm."""
    mutable = ["batch_stats"] if has_batch_stats(variables) else []
    (logits, value), mutated = net.apply(variables, obs, train=True,
                                         mask=mask, mutable=mutable,
                                         **apply_kw)
    return (logits.astype(jnp.float32),
            jnp.squeeze(value, axis=-1).astype(jnp.float32)), dict(mutated)


def equinet_solver_features(net, obs_flat: jax.Array):
    """Precomputed ``solver_feats`` for an EquiNet with solver_iters > 0.

    The RM+ solve inside the EquiNet forward is a stop-gradient function of
    the observation alone — identical across the learner step's FOUR net
    passes (learner + EMA target + regularization pair, reference
    rnad.py:373-382) over the same trajectory.  Computing it once and
    passing it to each apply cuts the step's solver iterations 4x; at
    solver_iters=128 the loop's carry traffic was a dominant step cost.
    """
    A = net.max_actions
    x = obs_flat.reshape((-1, 2, A, A)).transpose(0, 2, 3, 1)
    return _solver_features(x, net.solver_iters)
