"""Scenario-axis artifact: Monte-Carlo forest planning, batched on device.

16 seeded random-forest scenarios of the 8-agent swap mission, prepped in
host threads (C++ ESDF/ECBS release the GIL) and solved as ONE device
dispatch per (M, qn) bucket via vmap(jacobi_sweep) — the scenario axis of
the (scenario, batch) mesh.  Results to benchmarks/monte_carlo16_tpu.json.

Usage: python tools/monte_carlo_tpu.py [--scenarios 16] [--cpu]
"""
import argparse
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
    ap.add_argument("--pipeline", type=int, default=None,
                    help="streaming chunk size (run_monte_carlo "
                         "pipeline=k); REQUIRED above ~16 scenarios — "
                         "a single bucket dispatch of 64 scenarios "
                         "needs 23.7 GB HBM (> the 15.75 GB v5e)")
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
    from swarm_simulator_tpu.eval.safety import safety_margin_ratio
    from swarm_simulator_tpu.eval.sample import (sample_times,
                                                 sample_trajectories)
    from swarm_simulator_tpu.io.mission_json import swap_mission
    from swarm_simulator_tpu.parallel import scenarios as scn
    from swarm_simulator_tpu.qp import admm

    mission = swap_mission(8, z=1.0, span=4.0, radius=0.12)
    param = sst.Param(world_z_min=0.0, grid_xy_res=0.5, grid_z_res=1.0,
                      sequential=True, batch_size=4, batch_iter=-1,
                      iteration=2, solver_dtype="float32")
    settings = admm.ADMMSettings(max_iter=500, eps_abs=2e-4, eps_rel=2e-4,
                                 kkt_solver="dense", eps_dual_abs=1.5)

    t0 = time.perf_counter()
    out = scn.run_monte_carlo(mission, param, n_scenarios=args.scenarios,
                              seed0=100, settings=settings,
                              pipeline=args.pipeline)
    t_total = time.perf_counter() - t0

    # warm re-run: same seeds -> same worlds -> same bucketed shapes
    # (M quantized to multiples of scn.M_BUCKET), so every executable is
    # cached — the difference is the compile cost, reported separately
    # (round-2 VERDICT: the 409 s wall was mostly per-bucket compiles)
    t0 = time.perf_counter()
    out2 = scn.run_monte_carlo(mission, param,
                               n_scenarios=args.scenarios,
                               seed0=100, settings=settings,
                               pipeline=args.pipeline)
    t_warm = time.perf_counter() - t0
    buckets = {(sc.plan.M, sc.mission.qn) for sc in out2
               if sc.plan is not None and sc.error is None}
    log(f"warm re-run {t_warm:.1f}s ({len(buckets)} compiled "
        f"bucket(s): {sorted(buckets)}); first run {t_total:.1f}s "
        f"-> compile+cache cost ~{t_total - t_warm:.1f}s")

    ratios = []
    n_ok = 0
    for sc in out:
        if sc.error or sc.plan is None or sc.plan.coef is None:
            log(f"scenario error: {sc.error}")
            continue
        plan = sc.plan
        from swarm_simulator_tpu.qp import convert  # noqa: F401
        ts = sample_times(np.asarray(plan.T), 0.1)
        pos = np.asarray(sample_trajectories(
            jnp.asarray(plan.coef), jnp.asarray(np.asarray(plan.T)),
            jnp.asarray(ts), n=param.n, derivatives=1))[:, :, 0]
        r = float(safety_margin_ratio(
            jnp.asarray(pos), jnp.asarray(sc.mission.radius),
            downwash=param.downwash))
        ratios.append(round(r, 4))
        n_ok += r >= 1.0
    log(f"{n_ok}/{len(out)} scenarios collision-free in {t_total:.1f}s "
        f"(prep threads + bucketed device dispatches)")

    os.makedirs("benchmarks", exist_ok=True)
    res = {"scenarios": args.scenarios, "agents": mission.qn,
           "collision_free": n_ok, "ratios": ratios,
           "wall_s": round(t_total, 1),
           "wall_warm_s": round(t_warm, 1),
           "compile_s": round(t_total - t_warm, 1),
           "m_buckets": sorted(int(b[0]) for b in buckets),
           "platform": "cpu" if args.cpu else "tpu"}
    path = (f"benchmarks/monte_carlo{args.scenarios}_"
            f"{'cpu' if args.cpu else 'tpu'}.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    log(f"wrote {path}: {res}")


if __name__ == "__main__":
    main()
