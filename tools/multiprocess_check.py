"""Real multi-process distributed check (VERDICT round-1 item 1).

Spawns N actual OS processes that form a jax.distributed cluster over
localhost (Gloo collectives on CPU; the identical code path rides ICI/DCN
on a TPU pod), runs the GSPMD-sharded fused train step over the
cross-process global mesh, and asserts the per-step losses and final
parameter checksum match a single-process run of the same seed — the
process-count-invariance claim of parallel/runtime.py, now exercised
across a process boundary instead of virtual devices.

    python tools/multiprocess_check.py                 # 2 procs x 2 devices
    python tools/multiprocess_check.py --num-processes 4 --devices-per-proc 1
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
sys.path.insert(0, REPO)


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def run_cluster(num_processes: int, devices_per_proc: int, steps: int,
                batch_size: int, seed: int, timeout: int = 600,
                run_dir: str | None = None, save: bool = False,
                resume: bool = False) -> dict:
    """Spawns the worker cluster; returns process 0's result dict."""
    port = free_port()
    out = tempfile.mktemp(suffix=".json")
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_force_host_platform_device_count="
                        f"{devices_per_proc}").strip()
    extra = []
    if run_dir:
        extra += ["--run-dir", run_dir]
    if save:
        extra += ["--save"]
    if resume:
        extra += ["--resume"]
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", "mp_worker.py"),
             "--process-id", str(i), "--num-processes", str(num_processes),
             "--port", str(port), "--steps", str(steps),
             "--batch-size", str(batch_size), "--seed", str(seed),
             "--cpu", "--out", out] + extra,
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(num_processes)
    ]
    logs = []
    for i, proc in enumerate(procs):
        try:
            stdout, _ = proc.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise RuntimeError(f"worker {i} timed out")
        logs.append(stdout)
        if proc.returncode != 0:
            for q in procs:
                q.kill()
            raise RuntimeError(
                f"worker {i} exited {proc.returncode}:\n{stdout}")
    with open(out) as f:
        result = json.load(f)
    result["logs"] = logs
    os.unlink(out)
    return result


def run_single(steps: int, batch_size: int, seed: int) -> dict:
    """Same-seed single-process reference via one worker (1 proc cluster)."""
    return run_cluster(1, 1, steps, batch_size, seed)


def run_resume_across(procs_a: int, devs_a: int, steps_a: int,
                      procs_b: int, devs_b: int, steps_b: int,
                      batch_size: int, seed: int) -> tuple:
    """Mid-run resume across a CLUSTER SHAPE change: cluster A trains and
    checkpoints, a differently-shaped cluster B resumes the checkpoint and
    continues.  Checkpoints hold global host arrays (utils/checkpoint.py
    fetches across processes before writing), so the continued run is
    process-count independent — GSPMD invariance extended through the
    serialization boundary."""
    run_dir = os.path.join(tempfile.mkdtemp(prefix="mpresume_"), "run")
    phase1 = run_cluster(procs_a, devs_a, steps_a, batch_size, seed,
                         run_dir=run_dir, save=True)
    phase2 = run_cluster(procs_b, devs_b, steps_b, batch_size, seed,
                         run_dir=run_dir, resume=True)
    return phase1, phase2


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-processes", type=int, default=2)
    p.add_argument("--devices-per-proc", type=int, default=2)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--seed", type=int, default=7)
    args = p.parse_args()

    multi = run_cluster(args.num_processes, args.devices_per_proc,
                        args.steps, args.batch_size, args.seed)
    single = run_single(args.steps, args.batch_size, args.seed)

    print(f"multi : {multi['num_processes']} processes x "
          f"{multi['local_devices']} devices = {multi['global_devices']} "
          f"global; losses {multi['losses']}")
    print(f"single: losses {single['losses']}")
    ok = True
    for a, b in zip(multi["losses"], single["losses"]):
        if abs(a - b) > 1e-4 * max(1.0, abs(b)):
            ok = False
    dsum = abs(multi["param_checksum"] - single["param_checksum"])
    if dsum > 1e-3:
        ok = False
    print(f"param checksum: multi {multi['param_checksum']:.6f} "
          f"single {single['param_checksum']:.6f} (|diff| {dsum:.2e})")
    print("MULTIPROCESS CHECK:", "OK" if ok else "MISMATCH")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
