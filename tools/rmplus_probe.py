"""Micro-benchmark: the RM+ solver loop, XLA batch-minor vs Pallas kernel.

Times ``iters`` RM+ iterations over B random A x A games through both
paths of env/solver_device.py (the per-forward cost EquiNet's
``solver_iters`` feature pays), plus the padded (B, A)-major layout the
loop originally used, as one scan of ``--reps`` solves per timed program
(single dispatch).  Prints one JSON line per variant.

  python tools/rmplus_probe.py --batch 393216 --iters 128 [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.realpath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=393216)
    p.add_argument("--actions", type=int, default=5)
    p.add_argument("--iters", type=int, default=128)
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rnad_tpu.env import solver_device
    from rnad_tpu.ops import pallas_rmplus

    B, A = args.batch, args.actions
    key = jax.random.PRNGKey(0)
    M = jax.random.uniform(key, (B, A, A), minval=-1.0, maxval=1.0)
    ones = jnp.ones((B, A), jnp.float32)
    Mt = M.transpose(1, 2, 0)
    onest = ones.T

    on_tpu = jax.default_backend() == "tpu"
    print(f"B={B} A={A} iters={args.iters} reps={args.reps} "
          f"device={jax.devices()[0].device_kind}", flush=True)

    def timed(label, fn, M0, *xs):
        # One scan-of-solves program per timed call.  Two sandbox traps
        # this is built around (both observed on v5e through the axon
        # tunnel): (1) a loop-INVARIANT scan body gets hoisted and the
        # measurement collapses to one solve, so the body input is chained
        # through the carry (the perturbation scales by 1e-30 — far below
        # f32 resolution, so results are bit-identical — but XLA cannot
        # prove that); (2) the tunnel serves repeated executions of the
        # same (program, args) pair from a result cache, so the timed call
        # must use DIFFERENT arguments than the warmup call.
        @jax.jit
        def scan_prog(M0, *xs):
            def body(c, _):
                out = fn(M0 * (1.0 + c * 1e-30), *xs)
                return out[0][0].sum() + out[2].sum(), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                length=args.reps)
            return c
        out = scan_prog(M0, *xs)
        jax.block_until_ready(out)
        t0 = time.time()
        out = scan_prog(M0 * 0.9999999, *xs)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / args.reps
        print(json.dumps({"variant": label, "ms_per_solve":
                          round(dt * 1e3, 3), "check": float(out)}),
              flush=True)
        return dt

    t_xla = timed("xla_batch_minor",
                  lambda Mt, lt: solver_device.rmplus_core(
                      Mt, lt, lt, args.iters), Mt, onest)
    t_pal = timed("pallas",
                  lambda Mt, lt: pallas_rmplus.rmplus(
                      Mt, lt, lt, args.iters, interpret=not on_tpu),
                  Mt, onest)
    print(json.dumps({"variant": "speedup",
                      "pallas_vs_xla": round(t_xla / t_pal, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
