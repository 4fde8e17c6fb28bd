"""Analytic roofline model for the rollout and fused train step.

Counts the bytes each phase must move through HBM and the matmul work it
must execute, then converts the measured wall time into a percentage of the
speed-of-light bound  t_sol = max(t_hbm, t_mxu_achievable).

Two matmul charges are computed (round-5; the earlier model charged only
the first and understated %roof ~2.5-4x):

* **ideal FLOPs** — the logical multiply-accumulates.  Unreachable here:
  the net shapes are tiny against the 128x128 MXU.
* **achievable (tile-padded) FLOPs** — each matmul charged at its MXU
  footprint ``2 * M * ceil(K, 128) * ceil(N, 128)``: a contraction dim K
  below 128 underfills the systolic depth and an output dim N below 128
  underfills the lanes, so the array runs at K/128 * N/128 of peak for
  that op.  For the A=3 MLP head shapes (K=18, N=3) this is the real
  compute wall; the achievable roof is what "speed of light" means on this
  hardware for these shapes.

The byte side counts only unavoidable traffic (packed-table gathers,
trajectory IO, net parameters/activations), so it too is a lower bound.
``bound`` names the binding side: "hbm", or "mxu-pad" when the tile-padded
matmul time exceeds the byte time (the ideal-FLOPs time never binds).

Peaks default to TPU v5e (v5 lite): 197 TFLOP/s bf16 matmul (f32 inputs
run the MXU at half rate via bf16x3 passes — we charge the f32 rate when
the net computes in f32), 819 GB/s HBM.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple


@dataclasses.dataclass(frozen=True)
class Peaks:
    flops_bf16: float = 197e12
    flops_f32: float = 98.5e12
    hbm_bytes_per_s: float = 819e9


V5E = Peaks()

Matmul = Tuple[int, int, int]  # (M rows, K contraction, N cols)


def _ceil(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def matmul_flops(ms: List[Matmul]) -> Tuple[float, float]:
    """(ideal, tile-padded) FLOPs of a matmul list.

    Contractions of depth K <= 8 are charged UNPADDED: XLA:TPU lowers such
    dots to VPU broadcast-multiply-accumulates rather than feeding a
    95%-empty systolic pass (observed: head dgrads with K = A+1)."""
    ideal = sum(2.0 * M * K * N for M, K, N in ms)
    padded = sum(
        2.0 * M * K * N if K <= 8
        else 2.0 * _ceil(M, 8) * _ceil(K, 128) * _ceil(N, 128)
        for M, K, N in ms)
    return ideal, padded


def backward_matmuls(ms: List[Matmul]) -> List[Matmul]:
    """dgrad + wgrad shapes of each forward matmul (X (M,K) @ W (K,N)):
    dgrad dY @ W^T = (M, N, K); wgrad X^T @ dY = (K, M, N) with the big
    M as contraction — wgrad tiles are full, dgrad pads like the fwd."""
    out: List[Matmul] = []
    for M, K, N in ms:
        out.append((M, N, K))
        out.append((K, M, N))
    return out


def mlp_forward_matmuls(n: int, A: int, width: int, depth: int = 1,
                        heads: Tuple[int, ...] = None) -> List[Matmul]:
    """Matmul shapes of one MLP forward over n samples
    (models/nets.py::MLP; generic actor/learner path).  ``heads`` selects
    which head towers run (output widths); default both (policy A +
    value 1)."""
    din = 2 * A * A
    ms: List[Matmul] = []
    for head_out in (heads if heads is not None else (A, 1)):
        ms.append((n, din, width))
        for _ in range(1, depth):
            ms.append((n, width, width))
        ms.append((n, width, head_out))
    return ms


def rows_actor_matmuls(B: int, A: int, T: int, width: int) -> List[Matmul]:
    """Matmul shapes of the seat-fused rows-actor turn
    (engine.make_mlp_rows_actor): one (B, D_pad) x (D_pad, 4W) + heads.
    More ideal FLOPs than the generic path (dead table lanes multiply
    zeros) but perfectly tiled — K = D_pad and N = 4W are 128-multiples."""
    d_pad = packed_row_bytes(A, T) // 4
    return [(B, d_pad, 4 * width), (B, 4 * width, 2 * A + 2)]


def mlp_flops_per_sample(A: int, width: int) -> float:
    """Ideal FLOPs of one two-headed MLP forward (kept for callers)."""
    return matmul_flops(mlp_forward_matmuls(1, A, width))[0]


def packed_row_bytes(A: int, T: int) -> int:
    """Bytes of one padded packed-table row (ops/stepping.py layout)."""
    D = 4 * A * A + 2 * A + A * A * 3 * T
    D_pad = ((D + 127) // 128) * 128
    return 4 * D_pad


def rollout_model(A: int, T: int, depth: int, B: int, width: int,
                  act_elt_bytes: int = 4, rows_actor: bool = True) -> dict:
    """Unavoidable work of one rollout (depth levels, 2*depth half-steps).

    ``act_elt_bytes``: bytes per network-activation element (2 for a
    bfloat16 compute mode); table gathers and trajectory scalars stay f32.
    ``rows_actor``: the actor runs the seat-fused packed-row matmul
    (bench/production default for depth-1 f32 MLPs) instead of the generic
    per-seat forward — different matmul shapes, so a different MXU wall.
    """
    levels = depth
    half_steps = 2 * depth
    din = 2 * A * A
    # one packed-row gather per lane per level
    gather_bytes = levels * B * packed_row_bytes(A, T)
    # per level: one (2B)-batched forward; activations written+read once
    act_bytes = levels * (2 * B) * (2 * din + A + 1) * act_elt_bytes
    traj_bytes = half_steps * B * (A + 4) * 4  # policy + 4 scalar fields
    ms = (rows_actor_matmuls(B, A, T, width) if rows_actor
          else mlp_forward_matmuls(2 * B, A, width))
    ideal, padded = matmul_flops([(M * levels, K, N) for M, K, N in ms])
    return {"flops": ideal, "flops_padded": padded,
            "bytes": float(gather_bytes + act_bytes + traj_bytes),
            "env_half_steps": half_steps * B}


def train_model(A: int, T: int, depth: int, B: int, width: int,
                act_elt_bytes: int = 4, rows_actor: bool = True) -> dict:
    """Unavoidable work of one fused train step: rollout + learner.

    Learner: stored-observation reads over (T_traj*B) rows (obs + masks;
    see env/engine.py::Trajectory.obs), learner forward + backward, 3
    frozen forwards (vmapped), two v-trace scans and the loss elementwise
    field (~24 passes over (T_traj, B, A) f32).  ``rows_actor`` applies to
    the embedded rollout phase (off for bf16 compute — the packing is
    f32-only, engine.make_mlp_rows_actor)."""
    roll = rollout_model(A, T, depth, B, width, act_elt_bytes,
                         rows_actor=rows_actor)
    t_traj = 2 * depth
    n = t_traj * B
    din = 2 * A * A
    # learner-side input traffic: stored obs (written once by the rollout,
    # read once here) + f32 legal masks, instead of a packed-row re-gather
    obs_bytes = n * din * act_elt_bytes * 2 + n * A * 4 * 2
    fwd = mlp_forward_matmuls(n, A, width)
    ms = fwd + backward_matmuls(fwd)  # learner fwd + bwd
    # frozen passes, production "heads" mode (fuse_net_passes): the EMA
    # target contributes only its VALUE tower, the regularization pair
    # only their POLICY towers (learn/rnad.py)
    ms += mlp_forward_matmuls(n, A, width, heads=(1,))
    ms += mlp_forward_matmuls(2 * n, A, width, heads=(A,))
    ideal, padded = matmul_flops(ms)
    act_bytes = 6 * n * (2 * din + A + 1) * act_elt_bytes
    vtrace_bytes = 24 * n * A * 4
    return {"flops": roll["flops"] + ideal,
            "flops_padded": roll["flops_padded"] + padded,
            "bytes": roll["bytes"] + float(obs_bytes + act_bytes
                                           + vtrace_bytes),
            "env_half_steps": roll["env_half_steps"]}


def speed_of_light_s(model: dict, peaks: Peaks = V5E,
                     dtype: str = "float32") -> float:
    # Matmul time is charged at the bf16 rate REGARDLESS of array dtype:
    # the framework runs XLA's default matmul precision, which on TPU
    # feeds the MXU bf16 operands even for f32 arrays (measured: an
    # explicit bf16-operand rows-actor is 2% SLOWER than the f32 path at
    # 32k/131k lanes — there was nothing left to halve).  ``dtype`` only
    # matters for the byte side, which callers encode via act_elt_bytes.
    del dtype
    return max(model.get("flops_padded", model["flops"]) / peaks.flops_bf16,
               model["bytes"] / peaks.hbm_bytes_per_s)


def annotate(model: dict, measured_s: float, peaks: Peaks = V5E,
             dtype: str = "float32") -> dict:
    """Returns roofline fields to merge into a bench record.

    ``pct_of_roof`` is against the ACHIEVABLE roof (tile-padded matmuls at
    the bf16 feed rate vs HBM, whichever binds); ``pct_of_hbm`` isolates
    the byte side (the per-step byte budget as a fraction of wire speed);
    ``pct_of_sum`` is against the SUM of the two floors — the right bound
    when XLA serializes the gather and matmul phases of a turn instead of
    overlapping them."""
    sol = speed_of_light_s(model, peaks, dtype)
    t_pad = model.get("flops_padded", model["flops"]) / peaks.flops_bf16
    t_bytes = model["bytes"] / peaks.hbm_bytes_per_s
    return {
        "pct_of_roof": round(100.0 * sol / measured_s, 1),
        "pct_of_hbm": round(100.0 * t_bytes / measured_s, 1),
        "pct_of_sum": round(100.0 * (t_pad + t_bytes) / measured_s, 1),
        "bound": "hbm" if t_bytes >= t_pad else "mxu-pad",
        "model_gb_per_step": round(model["bytes"] / 1e9, 4),
        "model_gflops_per_step": round(model["flops"] / 1e9, 2),
        "model_padded_gflops_per_step": round(
            model.get("flops_padded", model["flops"]) / 1e9, 2),
    }
