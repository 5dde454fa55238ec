"""Monte-Carlo scenario batching — the framework's scenario axis.

The reference's closest analog is the 50-map benchmark sweep
(swarm_traj_planner_rbp_test_all.cpp:49-103), which runs scenarios one at
a time.  Here many scenarios (map seeds x missions) run as one batch:

  host prep (ESDF + ECBS + corridors) ........ thread pool — the native
      C++ calls release the GIL, so scenarios prep in parallel
  QP solves .................................. scenarios bucketed by
      segment count M (shapes must match), each bucket solved as one
      batched/sharded device call (vmap over scenario x agent-group)

This is BASELINE.md config 5 ("256 agents x 16 scenarios, Monte-Carlo
batched solves") at any scale the host fits.
"""
from __future__ import annotations

import dataclasses
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np

from ..core.types import Mission, Param, PlanResult
from ..corridor.times import build_corridors
from ..qp import admm, assemble, convert
from ..search.planner import plan_initial_trajectories
from ..world.esdf import ESDF
from ..world.voxel import OccupancyGrid
from . import seqbatch


@dataclass
class Scenario:
    mission: Mission
    world: OccupancyGrid
    plan: PlanResult | None = None
    error: str | None = None


def prep_scenarios(scenarios: list[Scenario], param: Param,
                   max_workers: int = 8) -> list[Scenario]:
    """ESDF + initial paths + corridors for every scenario, in threads."""

    def prep(sc: Scenario) -> Scenario:
        try:
            esdf = ESDF(sc.world, max_dist=param.esdf_max_dist)
            plan = plan_initial_trajectories(esdf, sc.mission, param)
            build_corridors(esdf, plan, sc.mission.radius, param)
            sc.plan = plan
        except Exception as e:
            sc.error = f"{type(e).__name__}: {e}"
        return sc

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        return list(pool.map(prep, scenarios))


def solve_scenarios(scenarios: list[Scenario], param: Param,
                    settings: admm.ADMMSettings | None = None) -> list[Scenario]:
    """Batched device solves, scenarios bucketed by segment count.

    Within a bucket every (scenario, agent-batch) QP is stacked on one
    leading axis and solved by a single solve_qp_batched call; the
    Gauss-Seidel dummy semantics degrade to Jacobi across agent-batches
    (iterate via param.iteration if needed).
    """
    import jax
    import jax.numpy as jnp

    if settings is None:
        settings = admm.ADMMSettings(
            max_iter=param.solver_max_iter, eps_abs=param.solver_eps_abs,
            eps_rel=param.solver_eps_rel, kkt_solver="cg",
            adaptive_rho=True, eps_dual_abs=0.5)

    buckets: dict[int, list[int]] = {}
    for i, sc in enumerate(scenarios):
        if sc.plan is not None and sc.error is None:
            buckets.setdefault(sc.plan.M, []).append(i)

    for M, idxs in sorted(buckets.items()):
        jobs = []  # (scenario idx, batch agents, QPData)
        dummies = {}
        pad = 0
        metas = []
        for i in idxs:
            sc = scenarios[i]
            plan = sc.plan
            batches, batch_iter = seqbatch.make_batches(sc.mission.qn, param)
            dummy = assemble.build_dummy(plan.init_traj, param.n, M)
            dummies[i] = dummy
            for b in batches[:batch_iter]:
                members = set(int(q) for q in b)
                cnt = sum(1 for (qi, qj) in np.asarray(plan.pair_idx)
                          if int(qi) in members or int(qj) in members)
                pad = max(pad, cnt)
                metas.append((i, b))
        if not metas:
            continue
        # Jacobi across agent-batches: iterate so cross-batch coupling sees
        # refreshed dummies (param.iteration rounds, reference :140)
        ctrls = dummies
        for _round in range(max(1, param.iteration)):
            datas = [assemble.assemble_batch(
                scenarios[i].plan, scenarios[i].mission, param, b,
                ctrls[i], pad) for (i, b) in metas]
            stacked = seqbatch._stack_qpdata(datas)
            xs, info = admm.solve_qp_batched(stacked, settings)
            xs = np.asarray(xs)
            new_ctrls = {i: ctrls[i].copy() for i in idxs}
            for row, (i, b) in enumerate(metas):
                new_ctrls[i][b] = convert.x_to_ctrl(xs[row][: len(b)], M,
                                                    param.n)
            ctrls = new_ctrls
        for i in idxs:
            plan = scenarios[i].plan
            plan.coef = convert.ctrl_to_coef(ctrls[i], plan.T, param.n)
            plan.solver_info = {"mode": "scenario-batched", "M": M}
    return scenarios


def run_monte_carlo(mission: Mission, param: Param, *, n_scenarios: int,
                    seed0: int = 0, forest_kwargs: dict | None = None,
                    settings: admm.ADMMSettings | None = None):
    """Generate n_scenarios seeded forests and plan them all, batched."""
    from ..world.forest import generate_forest

    fk = dict(obs_num=20, r_min=0.3, r_max=0.3, h_min=0.0, h_max=2.5,
              margin=0.5)
    fk.update(forest_kwargs or {})
    scenarios = [
        Scenario(mission=mission,
                 world=generate_forest(mission, world_min=param.world_min,
                                       world_max=param.world_max,
                                       resolution=param.world_resolution,
                                       seed=seed0 + i, **fk))
        for i in range(n_scenarios)
    ]
    prep_scenarios(scenarios, param)
    solve_scenarios(scenarios, param, settings)
    return scenarios
