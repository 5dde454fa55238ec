"""Component profile of the 256-agent JOINT solve on the real chip.

The 256-agent corridor-refresh cycle is ~28 s (device prep 1.1 s +
refine-1 solve ~27 s, benchmarks/devprep256_tpu.json).  This tool
decomposes the solve with the slope method that round-3's fused-kernel
profiling established (tunnel dispatch ~30 ms, block_until_ready a
no-op -> all timings from k-iterations-in-one-executable slopes,
forced by scalar materialization):

  * whole phased solve at two iteration budgets -> per-iteration cost
  * kinv_apply-only loop (the banded Thomas pivot stream)
  * A-apply loop (_A_x + _AT_x pair einsums, the O(N^2 M) tensors)
  * residuals-only loop

Usage: python tools/profile_256_solve.py [--agents 256] [--refine 0|1]
"""
from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--agents", type=int, default=256)
    ap.add_argument("--refine", type=int, default=0)
    ap.add_argument("--thomas", action="store_true",
                    help="streaming Pallas Thomas kernel for the KKT "
                    "applies (ops/pallas_thomas.py) instead of the XLA "
                    "scan — requires 128-aligned bs and uniform dt")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import swarm_simulator_tpu as sst
    from swarm_simulator_tpu.corridor.times import build_corridors
    from swarm_simulator_tpu.io.mission_json import scatter_mission
    from swarm_simulator_tpu.qp import assemble, nullspace
    from swarm_simulator_tpu.search.planner import plan_initial_trajectories
    from swarm_simulator_tpu.world.esdf import ESDF
    from swarm_simulator_tpu.world.voxel import OccupancyGrid

    N = args.agents
    mission = scatter_mission(N, half=9.5, z=1.0, seed=7)
    param = sst.Param(world_x_min=-10, world_x_max=10, world_y_min=-10,
                      world_y_max=10, world_z_min=0.3, world_z_max=2.5,
                      grid_xy_res=0.5, grid_z_res=1.0,
                      solver_dtype="float32")
    world = OccupancyGrid.empty(param.world_min, param.world_max,
                                param.world_resolution)
    esdf = ESDF(world, max_dist=param.esdf_max_dist)
    plan = plan_initial_trajectories(esdf, mission, param)
    build_corridors(esdf, plan, mission.radius, param)
    log(f"M={plan.M} pairs={len(plan.pair_idx)}")

    dummy = assemble.build_dummy(plan.init_traj, param.n)
    data = assemble.assemble_batch(plan, mission, param, np.arange(N),
                                   dummy, device=False)
    data_dev = jax.tree.map(jnp.asarray, data)

    base = nullspace.NSSettings(
        max_iter=1500, check_every=50, eps_abs=2e-4, eps_rel=2e-4,
        eps_dual_abs=5e-3, tighten=2e-3, warm_start="x0",
        kkt_mode="banded", rho_min=3e-5, n_rungs=5,
        kkt_refine=args.refine, thomas_kernel=args.thomas)

    def phases(budgets):
        return (dataclasses.replace(base, max_iter=budgets[0],
                                    rho_lo=1e-3),
                dataclasses.replace(base, max_iter=budgets[1]),
                dataclasses.replace(base, max_iter=budgets[2],
                                    rho_lo=1e-2))

    # device f32 prep (the production 256-agent mode)
    t0 = time.perf_counter()
    prep_jit = jax.jit(lambda d: nullspace.prepare_ns(d, phases(
        (200, 600, 100))[0]))
    op_dev = prep_jit(data_dev)
    float(np.asarray(jnp.sum(op_dev.Dinvs[0, 0, :2, :2])))
    log(f"device prep (incl compile) {time.perf_counter() - t0:.1f}s "
        f"Dinvs {op_dev.Dinvs.shape} "
        f"{op_dev.Dinvs.nbytes / 1e9:.1f} GB")

    @functools.partial(jax.jit, static_argnames=("budgets",))
    def solve(d, o, jv, budgets):
        dd = dataclasses.replace(d, x0=d.x0 + jv)
        return nullspace.solve_ns_phases(dd, phases(budgets), op=o)

    def timed_solve(budgets):
        x, info = solve(data_dev, op_dev, jnp.float32(0.0),
                        budgets=budgets)
        float(np.asarray(jnp.sum(x)))
        ts = []
        for j in range(args.reps):
            t0 = time.perf_counter()
            x, info = solve(data_dev, op_dev,
                            jnp.float32(1e-6 * (j + 1)),
                            budgets=budgets)
            float(np.asarray(jnp.sum(x)))
            ts.append(time.perf_counter() - t0)
        m = min(ts)
        it = int(np.asarray(info.iters))
        log(f"solve budgets={budgets}: {m:.2f} s, iters={it}, "
            f"rp={float(np.asarray(info.r_prim)):.1e}")
        return m, it

    t_small, it_small = timed_solve((50, 150, 50))
    t_big, it_big = timed_solve((200, 600, 100))
    per_iter_ms = (t_big - t_small) / max(1, it_big - it_small) * 1e3
    log(f"per-iteration {per_iter_ms:.2f} ms")

    # ---- component loops (one executable each, n iterations) --------
    B, K3, D = data.lb.shape
    phi = param.phi
    nw = (plan.M - 1) * phi
    rng = np.random.default_rng(0)
    w0 = jnp.asarray(rng.normal(size=(B, K3, nw)) * 0.01, jnp.float32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def kinv_loop(o, w, n):
        ka = nullspace.make_kinv_apply(o, B, K3, plan.M, phi,
                                       thomas_kernel=args.thomas)

        def step(v, _):
            return ka(2, v) * 0.999, 0

        with jax.default_matmul_precision("highest"):
            v, _ = jax.lax.scan(step, w, None, length=n)
        return v

    @functools.partial(jax.jit, static_argnames=("n", "prec"))
    def aapply_loop(d, w, n, prec="highest"):
        pop = nullspace._pair_op(d)

        def step(v, _):
            with jax.default_matmul_precision(prec):
                x_v = jnp.einsum("da,bka->bkd", op_dev.N, v)
                ax = nullspace._A_x(d, x_v, pop)
                atv = nullspace._AT_x(d, ax, pop)
                v2 = jnp.einsum("da,bkd->bka", op_dev.N, atv)
            return v * 0.999 + v2 * 1e-9, 0

        v, _ = jax.lax.scan(step, w, None, length=n)
        return v

    def timed_loop(fn, label, *a, **k):
        o = fn(*a, **k)
        float(np.asarray(jnp.sum(o)))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            o = fn(*a, **k)
            float(np.asarray(jnp.sum(o)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    n1, n2 = 20, 80
    ka = (timed_loop(kinv_loop, "kinv", op_dev, w0, n=n2)
          - timed_loop(kinv_loop, "kinv", op_dev, w0, n=n1)) / (n2 - n1)
    log(f"kinv_apply (banded Thomas, pivot stream): {ka*1e3:.2f} ms/apply")
    aa_hi = (timed_loop(aapply_loop, "aapply", data_dev, w0, n=n2)
             - timed_loop(aapply_loop, "aapply", data_dev, w0, n=n1)) \
        / (n2 - n1)
    log(f"A-apply round trip (highest): {aa_hi*1e3:.2f} ms")
    aa_def = (timed_loop(aapply_loop, "aapply", data_dev, w0, n=n2,
                         prec="high")
              - timed_loop(aapply_loop, "aapply", data_dev, w0, n=n1,
                           prec="high")) / (n2 - n1)
    log(f"A-apply round trip (high):    {aa_def*1e3:.2f} ms")

    print(json.dumps(dict(
        agents=N, M=int(plan.M), pairs=int(len(plan.pair_idx)),
        refine=args.refine, thomas=bool(args.thomas),
        solve_s=round(t_big, 2), iters=it_big,
        per_iter_ms=round(per_iter_ms, 3),
        kinv_ms=round(ka * 1e3, 3),
        aapply_highest_ms=round(aa_hi * 1e3, 3),
        aapply_high_ms=round(aa_def * 1e3, 3))))


if __name__ == "__main__":
    main()
