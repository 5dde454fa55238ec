"""BASELINE ladder top rung: 256-agent planning cycle on one chip.

Full pipeline (ESDF -> ECBS -> corridors -> device-resident Jacobi sweep
over 64 agent-batches) on a seeded 256-agent scattered mission in a
20x20x2.5 m world, quality-verified (safety ratio >= 1), results to
benchmarks/swarm256_tpu.json.

Usage: python tools/large_swarm.py [--agents 256] [--cpu]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--agents", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--rounds", type=int, default=2)
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
    from swarm_simulator_tpu.eval.safety import safety_margin_ratio
    from swarm_simulator_tpu.eval.sample import (sample_times,
                                                 sample_trajectories)
    from swarm_simulator_tpu.io.mission_json import scatter_mission
    from swarm_simulator_tpu.parallel import mesh as pmesh
    from swarm_simulator_tpu.parallel import seqbatch
    from swarm_simulator_tpu.qp import admm, assemble, convert
    from swarm_simulator_tpu.search.planner import plan_initial_trajectories
    from swarm_simulator_tpu.world.esdf import ESDF
    from swarm_simulator_tpu.world.voxel import OccupancyGrid

    N = args.agents
    mission = scatter_mission(N, half=9.5, z=1.0, seed=7)
    param = sst.Param(world_x_min=-10, world_x_max=10, world_y_min=-10,
                      world_y_max=10, world_z_min=0.3, world_z_max=2.5,
                      grid_xy_res=0.5, grid_z_res=1.0,
                      sequential=True, batch_size=4, batch_iter=-1,
                      solver_dtype="float32")
    world = OccupancyGrid.empty(param.world_min, param.world_max,
                                param.world_resolution)
    esdf = ESDF(world, max_dist=param.esdf_max_dist)

    t0 = time.perf_counter()
    plan = plan_initial_trajectories(esdf, mission, param)
    t_search = time.perf_counter() - t0
    log(f"search: {t_search:.2f}s M={plan.M}")
    t0 = time.perf_counter()
    build_corridors(esdf, plan, mission.radius, param)
    t_corridor = time.perf_counter() - t0
    log(f"corridor: {t_corridor:.2f}s pairs={len(plan.pair_idx)}")

    batches, _ = seqbatch.make_batches(N, param)
    dummy = assemble.build_dummy(plan.init_traj, param.n)
    members = [set(int(q) for q in b) for b in batches]
    pad = max(sum(1 for (qi, qj) in np.asarray(plan.pair_idx)
                  if int(qi) in m or int(qj) in m) for m in members)
    t0 = time.perf_counter()
    # numpy assembly + ONE host->device transfer after stacking (per-batch
    # transfers over a tunneled backend would dominate: measured 213 s for
    # 64 batches vs ~4 s this way)
    datas = [assemble.assemble_batch(plan, mission, param, b, dummy, pad,
                                     device=False)
             for b in batches]
    stacked = jax.tree.map(lambda *xs: jnp.stack(np.stack(xs)), *datas)
    t_asm = time.perf_counter() - t0
    log(f"assemble: {t_asm:.2f}s  batches={len(datas)} pad={pad}")

    # KKT mode by STACKED memory: the dense inverse is [nx, nx] per batch
    # and all batches live in HBM at once (64 batches at nx=5184 -> 6.9 GB
    # -> ResourceExhausted on v5e); structured CG is O(D^2 + D*(3B)^2)
    nx = 3 * param.batch_size * datas[0].lb.shape[-1]
    kkt = "dense" if len(datas) * nx * nx * 4 < 2e9 else "cg"
    log(f"kkt={kkt} (stacked dense inverses would be "
        f"{len(datas) * nx * nx * 4 / 1e9:.1f} GB)")
    settings = admm.ADMMSettings(max_iter=500, eps_abs=2e-4, eps_rel=2e-4,
                                 kkt_solver=kkt, eps_dual_abs=1.5)
    sched = (350,) + (250,) * (args.rounds - 1)

    def cycle(jit_val):
        dm0 = jnp.asarray(dummy, dtype=jnp.float32) + jnp.float32(jit_val)
        ctrl, _ = pmesh.jacobi_sweep(stacked, dm0, settings,
                                     rounds=args.rounds,
                                     iters_schedule=sched)
        return np.asarray(ctrl, dtype=np.float64)

    t0 = time.perf_counter()
    dm = cycle(0.0)  # compile + quality
    t_first = time.perf_counter() - t0

    coef = convert.ctrl_to_coef(dm, plan.T, param.n)
    ts = sample_times(np.asarray(plan.T), 0.1)
    pos = np.asarray(sample_trajectories(
        jnp.asarray(coef), jnp.asarray(np.asarray(plan.T)),
        jnp.asarray(ts), n=param.n, derivatives=1))[:, :, 0]
    ratio = float(safety_margin_ratio(
        jnp.asarray(pos), jnp.asarray(mission.radius),
        downwash=param.downwash))
    log(f"first cycle (incl compile): {t_first:.1f}s  safety_ratio={ratio:.4f}")

    t0 = time.perf_counter()
    reps = 2
    for r in range(reps):
        cycle(3.1e-6 * (r + 1))
    dt = (time.perf_counter() - t0) / reps
    n_solves = len(datas) * args.rounds
    log(f"steady cycle: {dt:.3f}s -> {n_solves / dt:.1f} solves/s "
        f"({len(datas)} batches x {args.rounds} rounds)")

    os.makedirs("benchmarks", exist_ok=True)
    out = {"agents": N, "M": int(plan.M), "batches": len(datas),
           "rounds": args.rounds, "pairs": int(len(plan.pair_idx)),
           "t_search_s": round(t_search, 2),
           "t_corridor_s": round(t_corridor, 2),
           "t_assemble_s": round(t_asm, 2),
           "t_cycle_s": round(dt, 3),
           "solves_per_s": round(n_solves / dt, 1),
           "safety_ratio": round(ratio, 4),
           "platform": "cpu" if args.cpu else "tpu"}
    path = f"benchmarks/swarm{N}_{'cpu' if args.cpu else 'tpu'}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}: {out}")


if __name__ == "__main__":
    main()
