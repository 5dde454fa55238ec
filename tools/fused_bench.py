"""Fused-chunk kernel vs XLA scan path: production 64-agent timing.

Runs the exact headline flow (bench.py: canonical 20-obstacle forest,
phased production schedule, host-f64 prep) twice — once on the XLA
banded scan path and once with NSSettings.fused_chunk=True — verifies
both against the full acceptance gate, and times repeated cycles.

Expected (roofline): the XLA path pays ~359 us/iteration re-streaming
the active rung's pivot inventory from HBM; the fused kernel DMAs it
to VMEM once per check_every chunk, leaving the sequential VPU Thomas
sweeps (~35 knots x ~1 us/block-apply) plus the MXU pair contractions
— a ~2-3x per-iteration cut if the estimates hold.

Usage: python tools/fused_bench.py [--seeds 0] [--reps 3]
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="logic check on the CPU backend (interpret "
                    "kernel; timings meaningless)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import bench
    from swarm_simulator_tpu.qp import nullspace

    plan, mission, param = bench.build_problem(args.seed)
    data, _ = bench.assemble_joint(plan, mission, param)
    data_dev = jax.tree.map(jnp.asarray, data)

    results = {}
    for name, fused in (("xla", False), ("fused", True)):
        phases = tuple(dataclasses.replace(p, fused_chunk=fused)
                       for p in bench.ns_phases())
        t0 = time.perf_counter()
        op = nullspace.prepare_ns_np(data, phases[0])
        op_dev = jax.device_put(op)
        log(f"{name}: prep+transfer {time.perf_counter() - t0:.1f}s")

        solve = jax.jit(lambda d, o, j: nullspace.solve_ns_phases(
            dataclasses.replace(d, x0=d.x0 + j), phases, op=o))

        t0 = time.perf_counter()
        x, info = solve(data_dev, op_dev, jnp.float32(0.0))
        x = np.asarray(x, np.float64)
        log(f"{name}: first cycle (incl. compile) "
            f"{time.perf_counter() - t0:.1f}s iters={int(info.iters)} "
            f"rp={float(info.r_prim):.1e}")
        ctrl = x.transpose(0, 2, 1).reshape(mission.qn, plan.M,
                                            param.n + 1, 3)
        ok, m = bench.gate_quality(ctrl, plan, mission, param)
        log(f"{name}: gate={'OK' if ok else 'FAIL'} ratio={m['ratio']:.4f} "
            f"cont2={m['cont2']:.1e} box={m['box_viol']:.1e}")

        t0 = time.perf_counter()
        for rr in range(args.reps):
            xx, _ = solve(data_dev, op_dev, jnp.float32(4.3e-6 * (rr + 1)))
            np.asarray(xx)
        dt = (time.perf_counter() - t0) / args.reps
        log(f"{name}: {dt:.3f}s/cycle -> {1.0 / dt:.2f} cycles/s")
        results[name] = dict(ok=ok, cycle_s=dt, ratio=m["ratio"])

    if all(r["ok"] for r in results.values()):
        sp = results["xla"]["cycle_s"] / results["fused"]["cycle_s"]
        log(f"\nfused speedup vs XLA path: {sp:.2f}x "
            f"({results['xla']['cycle_s']:.3f}s -> "
            f"{results['fused']['cycle_s']:.3f}s)")
    print(results)


if __name__ == "__main__":
    main()
