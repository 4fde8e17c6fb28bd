"""Analytic roofline model for the rollout and fused train step.

Counts the bytes each phase must move through HBM and the matmul FLOPs it
must execute, then converts the measured wall time into a percentage of the
speed-of-light bound  t_sol = max(flops / peak_flops, bytes / peak_bw).
This is a *lower-bound* model: it counts only the unavoidable traffic
(packed-table gathers, trajectory IO, net parameters/activations) and the
net matmuls, so 100% is unreachable; the value is trend and bottleneck
attribution (which side of the roof each config sits on), matching
BASELINE.md's speed-of-light framing.

Peaks default to TPU v5e (v5 lite): 197 TFLOP/s bf16 matmul (f32 inputs
run the MXU at half rate via bf16x3 passes — we charge the f32 rate when
the net computes in f32), 819 GB/s HBM.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class Peaks:
    flops_bf16: float = 197e12
    flops_f32: float = 98.5e12
    hbm_bytes_per_s: float = 819e9


V5E = Peaks()


def mlp_flops_per_sample(A: int, width: int) -> float:
    """Multiply-accumulate FLOPs (2 per MAC) of one two-headed MLP forward
    (models/nets.py::MLP): value head din->W->1, policy head din->W->A."""
    din = 2 * A * A
    macs = din * width + width * 1 + din * width + width * A
    return 2.0 * macs


def packed_row_bytes(A: int, T: int) -> int:
    """Bytes of one padded packed-table row (ops/stepping.py layout)."""
    D = 4 * A * A + 2 * A + A * A * 3 * T
    D_pad = ((D + 127) // 128) * 128
    return 4 * D_pad


def rollout_model(A: int, T: int, depth: int, B: int, width: int,
                  act_elt_bytes: int = 4) -> dict:
    """Unavoidable work of one rollout (depth levels, 2*depth half-steps).

    ``act_elt_bytes``: bytes per network-activation element (2 for a
    bfloat16 compute mode); table gathers and trajectory scalars stay f32.
    """
    levels = depth
    half_steps = 2 * depth
    din = 2 * A * A
    # one packed-row gather per lane per level
    gather_bytes = levels * B * packed_row_bytes(A, T)
    # per level: one (2B)-batched forward; activations written+read once
    act_bytes = levels * (2 * B) * (2 * din + A + 1) * act_elt_bytes
    traj_bytes = half_steps * B * (A + 4) * 4  # policy + 4 scalar fields
    flops = levels * (2 * B) * mlp_flops_per_sample(A, width)
    return {"flops": flops,
            "bytes": float(gather_bytes + act_bytes + traj_bytes),
            "env_half_steps": half_steps * B}


def train_model(A: int, T: int, depth: int, B: int, width: int,
                act_elt_bytes: int = 4) -> dict:
    """Unavoidable work of one fused train step: rollout + learner.

    Learner: stored-observation reads over (T_traj*B) rows (obs + masks;
    see env/engine.py::Trajectory.obs), learner forward + backward (2x
    forward), 3 frozen forwards (vmapped), two v-trace scans and the loss
    elementwise field (~24 passes over (T_traj, B, A) f32)."""
    roll = rollout_model(A, T, depth, B, width, act_elt_bytes)
    t_traj = 2 * depth
    n = t_traj * B
    din = 2 * A * A
    # learner-side input traffic: stored obs (written once by the rollout,
    # read once here) + f32 legal masks, instead of a packed-row re-gather
    obs_bytes = n * din * act_elt_bytes * 2 + n * A * 4 * 2
    fwd_flops = mlp_flops_per_sample(A, width)
    flops = n * fwd_flops * (1 + 2 + 3)  # learner fwd + bwd(2x) + 3 frozen
    act_bytes = 6 * n * (2 * din + A + 1) * act_elt_bytes
    vtrace_bytes = 24 * n * A * 4
    return {"flops": roll["flops"] + flops,
            "bytes": roll["bytes"] + float(obs_bytes + act_bytes
                                           + vtrace_bytes),
            "env_half_steps": roll["env_half_steps"]}


def speed_of_light_s(model: dict, peaks: Peaks = V5E,
                     dtype: str = "float32") -> float:
    peak = peaks.flops_f32 if dtype == "float32" else peaks.flops_bf16
    return max(model["flops"] / peak, model["bytes"] / peaks.hbm_bytes_per_s)


def annotate(model: dict, measured_s: float, peaks: Peaks = V5E,
             dtype: str = "float32") -> dict:
    """Returns roofline fields to merge into a bench record."""
    sol = speed_of_light_s(model, peaks, dtype)
    peak = peaks.flops_f32 if dtype == "float32" else peaks.flops_bf16
    t_flops = model["flops"] / peak
    t_bytes = model["bytes"] / peaks.hbm_bytes_per_s
    return {
        "pct_of_roof": round(100.0 * sol / measured_s, 1),
        "bound": "hbm" if t_bytes >= t_flops else "mxu",
        "model_gb_per_step": round(model["bytes"] / 1e9, 4),
        "model_gflops_per_step": round(model["flops"] / 1e9, 2),
    }
