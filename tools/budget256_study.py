"""Phase-budget knee at 256 agents on the streaming-Thomas path.

The production (200, 600, 100) budgets were tuned on the 64-agent
forest (tools/schedule_study.py); nobody re-tuned them at 256 where
each iteration costs ~6 ms (Thomas) instead of ~45 us (fused).  This
sweeps shorter schedules on the 256-agent scatter problem and gates
each: safety ratio, box containment, continuity, and objective
degradation vs the full-budget solve.

Usage: python tools/budget256_study.py [--agents 256]
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
    ap.add_argument("--refine", type=int, default=0,
                    help="kkt_refine PCG steps (1 = the replan mode)")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 pivot preconditioner (requires --refine"
                    " >= 1; halves the dominant HBM stream)")
    ap.add_argument("--cpu", action="store_true")
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
    from swarm_simulator_tpu.qp import assemble, convert, nullspace
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
        thomas_kernel=not args.cpu, kkt_refine=args.refine,
        precond_dtype="bfloat16" if args.bf16 else "float32")

    def phases(budgets):
        return (dataclasses.replace(base, max_iter=budgets[0],
                                    rho_lo=1e-3),
                dataclasses.replace(base, max_iter=budgets[1]),
                dataclasses.replace(base, max_iter=budgets[2],
                                    rho_lo=1e-2))

    prep_jit = jax.jit(
        lambda d: nullspace.prepare_ns(d, phases((200, 600, 100))[0]))
    op_dev = prep_jit(data_dev)
    float(np.asarray(jnp.sum(op_dev.Dinvs[0, 0, :2, :2])))

    @functools.partial(jax.jit, static_argnames=("budgets",))
    def solve(d, o, budgets):
        return nullspace.solve_ns_phases(d, phases(budgets), op=o)

    Qseg = np.asarray(data.Qseg, np.float64)

    def quality(x):
        ctrl = x.transpose(0, 2, 1).reshape(N, plan.M, param.n + 1, 3)
        coef = convert.ctrl_to_coef(ctrl, plan.T, param.n)
        ts = sample_times(np.asarray(plan.T), 0.1)
        pos = np.asarray(sample_trajectories(
            jnp.asarray(coef), jnp.asarray(np.asarray(plan.T)),
            jnp.asarray(ts), n=param.n, derivatives=1))[:, :, 0]
        ratio = float(safety_margin_ratio(
            jnp.asarray(pos), jnp.asarray(mission.radius),
            downwash=param.downwash))
        boxes = plan.seg_boxes
        viol = float(np.maximum(boxes[:, :, None, :3] - ctrl,
                                ctrl - boxes[:, :, None, 3:]).max())
        cont = float(np.abs(ctrl[:, 1:, 0] - ctrl[:, :-1, -1]).max())
        obj = float(np.einsum("bmik,mij,bmjk->", ctrl.reshape(
            N, plan.M, param.n + 1, 3), Qseg,
            ctrl.reshape(N, plan.M, param.n + 1, 3)) * 0.5)
        return ratio, viol, cont, obj

    results = []
    obj_ref = None
    for budgets in ((200, 600, 100), (100, 400, 100), (100, 300, 100),
                    (50, 200, 50)):
        x, info = solve(data_dev, op_dev, budgets=budgets)
        x = np.asarray(x, np.float64)
        t0 = time.perf_counter()
        x2, info = solve(dataclasses.replace(
            data_dev, x0=data_dev.x0 + jnp.float32(1e-7)), op_dev,
            budgets=budgets)
        np.asarray(x2)
        dt = time.perf_counter() - t0
        ratio, viol, cont, obj = quality(x)
        if obj_ref is None:
            obj_ref = obj
        ok = ratio >= 1.0 and viol < 1e-3 and cont < 1e-3
        log(f"budgets={budgets}: {dt:.2f} s  ratio={ratio:.4f} "
            f"box={viol:.1e} cont={cont:.1e} obj={obj:.3f} "
            f"(x{obj / obj_ref:.3f}) -> {'OK' if ok else 'FAIL'}")
        results.append(dict(budgets=list(budgets), solve_s=round(dt, 2),
                            ratio=round(ratio, 4), box_viol=viol,
                            obj=round(obj, 4),
                            obj_vs_full=round(obj / obj_ref, 4),
                            ok=bool(ok)))
    print(json.dumps(dict(agents=N, M=int(plan.M),
                          pairs=int(len(plan.pair_idx)),
                          refine=args.refine, bf16=bool(args.bf16),
                          results=results)))


if __name__ == "__main__":
    main()
