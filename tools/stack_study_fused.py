"""Scenario stacking, re-measured on the PRODUCTION kernel paths
(round-4 ask #4 — the round-2 'flat throughput' conclusion was an
XLA-path HBM artifact; the fused kernel since removed that stream).

Arms, S in {1, 2, 4, 8} distinct 64-agent forests (same M bucket):

  fused-interleave: S problems' (data, host-prepped op) resident on
      device; dispatch the FUSED production solve round-robin with
      depth-2 readback overlap.  The fused kernel is ONE problem per
      kernel BY DESIGN (the whole working set lives in VMEM — a
      second problem's rung inventory does not fit; see
      ARCHITECTURE.md), so S multiplies only by amortizing dispatch,
      which the depth-2 pipeline already hides: aggregate cycles/s vs
      S tells us whether the chip has idle capacity the headline
      leaves unused.

  thomas-map: S problems stacked [S, ...] and solved inside ONE
      dispatch via lax.map(solve) on the streaming-Thomas path (the
      kernel is un-vmappable, but lax.map keeps each sub-solve
      unbatched) — zero inter-solve dispatch cost, the strongest
      possible amortization.

Writes benchmarks/stack_fused_tpu.json.
Usage: timeout 595 python tools/stack_study_fused.py [--sizes 1,2,4,8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--cpu", action="store_true",
                    help="logic smoke only (arm 1 runs the XLA path; "
                         "arm 2 needs Mosaic and is skipped)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="benchmarks/stack_fused_tpu.json")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import bench
    from swarm_simulator_tpu.qp import nullspace

    sizes = [int(s) for s in args.sizes.split(",")]
    S_max = max(sizes)

    # ---- S same-M forest problems, host-f64 prepped ------------------
    import dataclasses
    phases_fused = bench.ns_phases()           # fused on accelerator
    phases_thomas = tuple(
        dataclasses.replace(p, fused_chunk=False, thomas_kernel=True)
        for p in phases_fused)
    datas, ops_fused, ops_thomas = [], [], []
    seed = 0
    while len(datas) < S_max and seed < 24:
        plan, mission, param = bench.build_problem(seed=seed)
        seed += 1
        if plan.M != 36:
            log(f"seed {seed - 1}: M={plan.M} != 36, skipped")
            continue
        data, _ = bench.assemble_joint(plan, mission, param)
        datas.append(jax.tree.map(jnp.asarray, data))
        ops_fused.append(jax.device_put(
            nullspace.prepare_ns_np(data, phases_fused[0])))
        ops_thomas.append(jax.device_put(
            nullspace.prepare_ns_np(data, phases_thomas[0])))
        log(f"prepped problem {len(datas)}/{S_max}")

    out = {"arms": {}}

    # ---- arm 1: fused, round-robin interleave ------------------------
    @jax.jit
    def solve_fused(d, o):
        return nullspace.solve_ns_phases(d, phases_fused, op=o)

    x, _ = solve_fused(datas[0], ops_fused[0])   # compile
    np.asarray(x)
    arm = {}
    for S in sizes:
        hs = []
        t0 = time.perf_counter()
        n_disp = args.reps * S
        prev = None
        for r in range(n_disp):
            i = r % S
            h, _ = solve_fused(datas[i], ops_fused[i])
            if prev is not None:
                np.asarray(prev)
            prev = h
        np.asarray(prev)
        dt = (time.perf_counter() - t0) / n_disp
        arm[S] = dict(s_per_solve=round(dt, 4),
                      aggregate_solves_per_s=round(1.0 / dt, 2))
        log(f"fused-interleave S={S}: {dt * 1e3:.1f} ms/solve -> "
            f"{1 / dt:.2f} aggregate solves/s")
    out["arms"]["fused_interleave"] = arm

    # ---- arm 2: thomas, lax.map over stacked problems ----------------
    if jax.default_backend() == "cpu":
        log("cpu smoke: skipping the thomas-map arm (Mosaic is TPU-only)")
        os.makedirs("benchmarks", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
        return

    import functools

    @functools.partial(jax.jit, static_argnames=())
    def solve_map(ds, os_):
        def one(args_):
            d, o = args_
            x, info = nullspace.solve_ns_phases(d, phases_thomas, op=o)
            return x
        return jax.lax.map(one, (ds, os_))

    arm = {}
    for S in sizes:
        ds = jax.tree.map(lambda *xs: jnp.stack(xs), *datas[:S])
        os_ = jax.tree.map(lambda *xs: jnp.stack(xs), *ops_thomas[:S])
        x = solve_map(ds, os_)                 # compile per S
        np.asarray(x)
        ts = []
        for _ in range(max(1, args.reps - 1)):
            t0 = time.perf_counter()
            np.asarray(solve_map(ds, os_))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        arm[S] = dict(s_per_dispatch=round(dt, 4),
                      aggregate_solves_per_s=round(S / dt, 2))
        log(f"thomas-map S={S}: {dt:.3f} s/dispatch -> "
            f"{S / dt:.2f} aggregate solves/s")
    out["arms"]["thomas_map"] = arm

    os.makedirs("benchmarks", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
