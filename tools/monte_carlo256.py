"""BASELINE ladder config 5: 256 agents x 16 scenarios Monte-Carlo.

The scaled analog of the reference's 50-map sweep
(swarm_traj_planner_rbp_test_all.cpp:49) at the ladder's top rung
(BASELINE.md:31): 16 seeded random scenarios (scattered 256-agent
missions in a 20x20x2.5 m world, 40-cylinder random forest per seed),
each planned END TO END — ESDF -> threaded ECBS -> corridors -> ONE
joint 32,640-pair QP — and judged by the full safety gate.

Streaming protocol (one chip): each scenario's 7.5 GB pivot inventory
is prepared ON DEVICE in f32 (cold_prep="device": lax.map over rungs,
~1.1 s warm) and RELEASED before the next scenario (two inventories
exceed the 16 GB HBM).  Makespans are quantized to the M_BUCKET=8 grid
(hold-at-goal padding) so all 16 scenarios share ONE compiled program
per (M-bucket) — without it, every distinct M is a 4-20 min remote
compile.  The KKT applies route to the streaming Thomas kernel
(select_kkt_path; 256 agents is past the fused VMEM bound).

Wall breakdown (prep / solve / host stages / compile) is reported
separately per the round-4 VERDICT ask.  Results to
benchmarks/monte_carlo256_tpu.json.

Usage: python tools/monte_carlo256.py [--scenarios 16] [--cpu]
       [--budgets 100,400,100] [--obs 40]
"""
from __future__ import annotations

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
    ap.add_argument("--scenarios", type=int, default=16)
    ap.add_argument("--agents", type=int, default=256)
    ap.add_argument("--obs", type=int, default=40)
    ap.add_argument("--seed0", type=int, default=100)
    ap.add_argument("--budgets", default=None,
                    help="phase budgets, e.g. 100,400,100 (default: the "
                         "oracle-licensed 256-agent replan schedule)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="benchmarks/monte_carlo256_tpu.json")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, "/root/repo")
    import bench
    import swarm_simulator_tpu as sst
    from swarm_simulator_tpu.corridor.times import build_corridors
    from swarm_simulator_tpu.io.mission_json import scatter_mission
    from swarm_simulator_tpu.parallel.scenarios import (pad_plan_segments,
                                                        quantize_M)
    from swarm_simulator_tpu.qp import joint as qjoint
    from swarm_simulator_tpu.search.planner import plan_initial_trajectories
    from swarm_simulator_tpu.world.esdf import ESDF
    from swarm_simulator_tpu.world.forest import generate_forest

    N = args.agents
    if args.budgets:
        budgets = tuple(int(b) for b in args.budgets.split(","))
    else:
        budgets = qjoint.budgets_for_swarm(N)
    phases = qjoint.production_phases(budgets)

    rows = []
    wall0 = time.perf_counter()
    for s in range(args.scenarios):
        seed = args.seed0 + s
        mission = scatter_mission(N, half=9.5, z=1.0, seed=seed)
        param = sst.Param(world_x_min=-10, world_x_max=10,
                          world_y_min=-10, world_y_max=10,
                          world_z_min=0.3, world_z_max=2.5,
                          grid_xy_res=0.5, grid_z_res=1.0,
                          solver_dtype="float32")
        world = generate_forest(mission, world_min=param.world_min,
                                world_max=param.world_max,
                                obs_num=args.obs, r_min=0.3, r_max=0.3,
                                h_min=0.0, h_max=2.5, margin=0.5,
                                seed=seed)
        esdf = ESDF(world, max_dist=param.esdf_max_dist)
        t0 = time.perf_counter()
        plan = plan_initial_trajectories(esdf, mission, param)
        t_search = time.perf_counter() - t0
        t0 = time.perf_counter()
        build_corridors(esdf, plan, mission.radius, param)
        t_corr = time.perf_counter() - t0
        M_raw = plan.M
        plan = pad_plan_segments(plan, quantize_M(plan.M))
        log(f"scenario {seed}: search {t_search:.1f}s corridor "
            f"{t_corr:.1f}s M={M_raw}->{plan.M} "
            f"pairs={len(plan.pair_idx)}")

        t0 = time.perf_counter()
        plan = qjoint.solve_trajectories(plan, mission, param,
                                         phases=phases,
                                         cold_prep="device")
        t_cycle = time.perf_counter() - t0
        prep_s = plan.solver_info["prep_s"]

        ctrl = np.asarray(plan.ctrl)
        ok, m = bench.gate_quality(ctrl, plan, mission, param)
        log(f"scenario {seed}: gate={'OK' if ok else 'FAIL'} "
            f"ratio={m['ratio']:.4f} box={m['box_viol']:.1e} "
            f"prep {prep_s:.1f}s solve {t_cycle - prep_s:.1f}s "
            f"iters={plan.solver_info['iters']}")
        rows.append(dict(
            seed=seed, gate_ok=bool(ok), M=int(plan.M),
            pairs=int(len(plan.pair_idx)),
            ratio=round(m["ratio"], 4), box_viol=float(m["box_viol"]),
            search_s=round(t_search, 2), corridor_s=round(t_corr, 2),
            prep_s=round(prep_s, 2),
            solve_s=round(t_cycle - prep_s, 2),
            polish_rounds=plan.solver_info["polish_rounds"],
            iters=plan.solver_info["iters"]))

    wall = time.perf_counter() - wall0
    n_ok = sum(r["gate_ok"] for r in rows)
    # per-scenario compile attribution (round-5, VERDICT r4 weak #5 —
    # the seed-100 9x outlier was a hidden first-in-bucket compile):
    # compile_est_s per ROW = that scenario's excess over its bucket's
    # WARM (min) cost; only first-in-bucket rows carry a material one
    by_m = {}
    for r in rows:
        by_m.setdefault(r["M"], []).append(r["prep_s"] + r["solve_s"])
    for r in rows:
        warm = min(by_m[r["M"]])
        r["compile_est_s"] = round(max(0.0, r["prep_s"] + r["solve_s"]
                                       - warm), 1)
    compile_s = sum(v[0] - min(v) for v in by_m.values() if len(v) > 1)
    out = dict(
        agents=N, scenarios=len(rows), gates_ok=n_ok,
        budgets=list(budgets), obs_num=args.obs,
        wall_s=round(wall, 1),
        compile_est_s=round(compile_s, 1),
        host_s=round(sum(r["search_s"] + r["corridor_s"]
                         for r in rows), 1),
        prep_s=round(sum(r["prep_s"] for r in rows), 1),
        solve_s=round(sum(r["solve_s"] for r in rows), 1),
        m_buckets=sorted(by_m),
        scenarios_detail=rows)
    os.makedirs("benchmarks", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k != "scenarios_detail"}))


if __name__ == "__main__":
    main()
