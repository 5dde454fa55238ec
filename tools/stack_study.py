"""Scenario-stacked joint-solve throughput study (VERDICT r1 item 5).

Stacks S independent 64-agent forest scenarios (distinct seeds, same
segment count) into ONE device dispatch — vmap(solve_ns_phases) — and
measures solves/s and achieved TFLOP/s for S in {1, 2, 4, 8}.  The
reference's analog runs its 50-scenario benchmark sweep one CPLEX solve
at a time (swarm_traj_planner_rbp_test_all.cpp:49-103); here the
scenario axis is a batch dimension feeding the MXU.

Writes benchmarks/stack_study_tpu.json.  Run on the real chip:
    timeout 595 python tools/stack_study.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

import bench
from swarm_simulator_tpu.qp import nullspace


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def collect_problems(n_needed: int, target_M: int = 36, max_seed: int = 24):
    datas = []
    for seed in range(max_seed):
        if len(datas) == n_needed:
            break
        plan, mission, param = bench.build_problem(seed=seed)
        if plan.M != target_M:
            log(f"seed {seed}: M={plan.M} != {target_M}, skipped")
            continue
        data, _ = bench.assemble_joint(plan, mission, param)
        datas.append(jax.tree.map(np.asarray, data))
    if len(datas) < n_needed:
        raise RuntimeError(f"only {len(datas)} same-M problems found")
    return datas


def main():
    sizes = [int(x) for x in (sys.argv[1:] or ["1", "2", "4", "8"])]
    datas = collect_problems(max(sizes))
    phases = bench.ns_phases()

    def solve_stack(stacked):
        x, info = jax.vmap(
            lambda d: nullspace.solve_ns_phases(d, phases))(stacked)
        return x, info

    results = {}
    for S in sizes:
        stacked = jax.tree.map(
            lambda *xs: jnp.asarray(np.stack(xs)), *datas[:S])
        fn = jax.jit(solve_stack)
        t0 = time.perf_counter()
        lowered = fn.lower(stacked)
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0
        ca = compiled.cost_analysis()
        flops = float((ca or {}).get("flops", 0.0))
        x, info = compiled(stacked)
        np.asarray(x)  # block
        reps = 3
        t0 = time.perf_counter()
        for r in range(reps):
            import dataclasses
            jittered = dataclasses.replace(
                stacked, x0=stacked.x0 + np.float32(1e-6 * (r + 1)))
            x, info = compiled(jittered)
            np.asarray(x)
        dt = (time.perf_counter() - t0) / reps
        tf = flops / dt / 1e12 if flops else float("nan")
        results[S] = dict(
            s_per_dispatch=round(dt, 4),
            solves_per_s=round(S / dt, 2),
            xla_tflop_per_dispatch=round(flops / 1e12, 3),
            achieved_tflop_s=round(tf, 2),
            compile_s=round(t_compile, 1),
            iters=int(np.max(np.asarray(info.iters))),
        )
        log(f"S={S}: {dt:.3f}s/dispatch -> {S/dt:.2f} solves/s, "
            f"{tf:.2f} TFLOP/s achieved (compile {t_compile:.0f}s)")

    out = dict(
        metric="stacked_joint_64agent_forest_solves",
        note="S independent forest scenarios per dispatch, "
             "vmap(solve_ns_phases), banded KKT, production phases",
        results=results,
    )
    with open("/root/repo/benchmarks/stack_study_tpu.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
