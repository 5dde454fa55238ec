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


#: segment-count quantum for scenario bucketing: pad every plan's M up
#: to the next multiple, so a Monte-Carlo sweep whose makespans span
#: e.g. 33-40 compiles ONE executable instead of one per distinct M
#: (round-2 finding: the 16-scenario run spent most of its 409 s wall
#: in per-(M, qn)-bucket compiles)
M_BUCKET = 8


def quantize_M(M: int, bucket: int = M_BUCKET) -> int:
    return -(-M // bucket) * bucket


def pad_plan_segments(plan: PlanResult, M_target: int) -> PlanResult:
    """Extend a plan to M_target segments by APPENDING hold-at-goal
    segments — the same relaxation the reference already applies when
    it pads every path to makespan+3 with the goal repeated
    (ecbs_planner.hpp:49-70), taken k steps further so scenarios share
    a compiled shape.  Semantics: the padded problem gives agents MORE
    time (T grows by k uniform steps); every safety property is
    preserved (the last SFC box contains the held goal, the last RSFC
    normal separates the goal positions it was built from), and the
    goal-state pin moves to the new final knot."""
    M = plan.M
    if M_target <= M:
        return plan
    k = M_target - M

    def rep_last(a, axis):
        last = np.take(a, [-1], axis=axis)
        return np.concatenate([a] + [last] * k, axis=axis)

    plan.init_traj = rep_last(np.asarray(plan.init_traj), 1)
    T = np.asarray(plan.T, np.float64)
    dtl = T[-1] - T[-2]
    plan.T = np.concatenate([T, T[-1] + dtl * np.arange(1, k + 1)])
    plan.seg_boxes = rep_last(np.asarray(plan.seg_boxes), 1)
    plan.pair_normals = rep_last(np.asarray(plan.pair_normals), 1)
    return plan


def solve_scenarios(scenarios: list[Scenario], param: Param,
                    settings: admm.ADMMSettings | None = None) -> list[Scenario]:
    """Batched device solves, scenarios bucketed by (segments, agents).

    Each bucket becomes ONE device dispatch: per-scenario agent-batch
    stacks [L, ...] are stacked again on a scenario axis [S, L, ...]
    (numpy assembly, a single host->device transfer) and the whole
    multi-round Jacobi sweep — coupling refresh, warm starts, dummy
    exchange — runs on device via vmap(jacobi_sweep).  This is the
    (scenario x batch) mesh layout: shard the leading axes to spread
    Monte-Carlo over hosts/DCN and agent groups over ICI.
    """
    import jax
    import jax.numpy as jnp

    from . import mesh as pmesh

    if settings is None:
        settings = admm.ADMMSettings(
            max_iter=param.solver_max_iter, eps_abs=param.solver_eps_abs,
            eps_rel=param.solver_eps_rel, kkt_solver="cg",
            adaptive_rho=True, eps_dual_abs=0.5)

    buckets: dict[tuple[int, int], list[int]] = {}
    for i, sc in enumerate(scenarios):
        if sc.plan is not None and sc.error is None:
            pad_plan_segments(sc.plan, quantize_M(sc.plan.M))
            buckets.setdefault((sc.plan.M, sc.mission.qn), []).append(i)

    rounds = max(1, param.iteration)
    for (M, qn), idxs in sorted(buckets.items()):
        batches, batch_iter = seqbatch.make_batches(qn, param)
        if batch_iter == 0:
            continue
        pad = 0
        for i in idxs:
            plan = scenarios[i].plan
            for b in batches[:batch_iter]:
                members = set(int(q) for q in b)
                pad = max(pad, sum(
                    1 for (qi, qj) in np.asarray(plan.pair_idx)
                    if int(qi) in members or int(qj) in members))
        per_scenario = []
        dummies = []
        for i in idxs:
            sc = scenarios[i]
            dummy = assemble.build_dummy(sc.plan.init_traj, param.n, M)
            dummies.append(dummy)
            datas = [assemble.assemble_batch(sc.plan, sc.mission, param, b,
                                             dummy, pad, device=False)
                     for b in batches[:batch_iter]]
            per_scenario.append(seqbatch._stack_qpdata(datas))
        stacked = jax.tree.map(
            lambda *xs: jnp.asarray(np.stack(xs)), *per_scenario)
        dm0 = jnp.asarray(np.stack(dummies), dtype=stacked.lb.dtype)

        ctrls, _info = jax.vmap(
            lambda s_, d_: pmesh.jacobi_sweep(s_, d_, settings,
                                              rounds=rounds))(stacked, dm0)
        ctrls = np.asarray(ctrls, dtype=np.float64)
        for row, i in enumerate(idxs):
            plan = scenarios[i].plan
            plan.coef = convert.ctrl_to_coef(ctrls[row], plan.T, param.n)
            plan.solver_info = {"mode": "scenario-batched-device", "M": M,
                                "rounds": rounds}
    return scenarios


def pair_pad_bound(qn: int, param: Param) -> int:
    """Deterministic upper bound on the pair rows any one agent batch can
    own (the global pair list is all C(qn, 2) pairs, rsfc.build_rsfc):
    B*(qn-B) one-sided rows + C(B, 2) intra-batch rows.  Streaming
    dispatch pads every chunk to this bound so ONE compiled program
    serves the whole run (masked rows are inactive by construction)."""
    batches, _ = seqbatch.make_batches(qn, param)
    return max(len(b) * (qn - len(b)) + len(b) * (len(b) - 1) // 2
               for b in batches)


def _assemble_scenario(sc: Scenario, param: Param, batch_iter: int,
                       batches, pad: int):
    dummy = assemble.build_dummy(sc.plan.init_traj, param.n, sc.plan.M)
    datas = [assemble.assemble_batch(sc.plan, sc.mission, param, b,
                                     dummy, pad, device=False)
             for b in batches[:batch_iter]]
    return seqbatch._stack_qpdata(datas), dummy


def run_monte_carlo(mission: Mission, param: Param, *, n_scenarios: int,
                    seed0: int = 0, forest_kwargs: dict | None = None,
                    settings: admm.ADMMSettings | None = None,
                    pipeline: int | None = None):
    """Generate n_scenarios seeded forests and plan them all, batched.

    pipeline=None: two phases — prep everything (thread pool), then one
    batched device dispatch per (M, qn) bucket.  At 256 agents the host
    prep measured 42 s against 5.2 s of device compute, fully serialized.

    pipeline=k: streaming overlap — scenarios are dispatched to the
    device in chunks of k AS their host prep completes, and JAX's async
    dispatch returns before the solve finishes, so chunk j solves on
    device while chunks j+1.. are still running ECBS/corridor/assembly
    on host threads.  Every chunk is padded to exactly (k scenarios,
    pair_pad_bound rows), so each (M, qn) bucket compiles ONCE.  Results
    are materialized only after every chunk has been dispatched.
    """
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
    if pipeline is None:
        prep_scenarios(scenarios, param)
        solve_scenarios(scenarios, param, settings)
        return scenarios
    return _run_pipelined(scenarios, param, settings, chunk=pipeline)


def _run_pipelined(scenarios: list[Scenario], param: Param,
                   settings: admm.ADMMSettings | None, chunk: int,
                   max_workers: int = 8) -> list[Scenario]:
    """Streaming prep -> assemble -> dispatch (see run_monte_carlo)."""
    import jax
    import jax.numpy as jnp

    from concurrent.futures import as_completed

    from . import mesh as pmesh

    if settings is None:
        settings = admm.ADMMSettings(
            max_iter=param.solver_max_iter, eps_abs=param.solver_eps_abs,
            eps_rel=param.solver_eps_rel, kkt_solver="cg",
            adaptive_rho=True, eps_dual_abs=0.5)
    rounds = max(1, param.iteration)

    def prep(i: int) -> int:
        sc = scenarios[i]
        try:
            esdf = ESDF(sc.world, max_dist=param.esdf_max_dist)
            plan = plan_initial_trajectories(esdf, sc.mission, param)
            build_corridors(esdf, plan, sc.mission.radius, param)
            sc.plan = plan
        except Exception as e:
            sc.error = f"{type(e).__name__}: {e}"
        return i

    pending: dict[tuple[int, int], list[int]] = {}
    in_flight: list[tuple[list[int], object]] = []

    def dispatch(key: tuple[int, int], idxs: list[int]):
        M, qn = key
        batches, batch_iter = seqbatch.make_batches(qn, param)
        if batch_iter == 0:
            return
        pad = pair_pad_bound(qn, param)
        # pad the chunk to full size by repeating the last scenario —
        # same shapes as every other chunk -> one compile per bucket
        rows = idxs + [idxs[-1]] * (chunk - len(idxs))
        per_scenario, dummies = [], []
        for i in rows:
            stacked_i, dummy_i = _assemble_scenario(
                scenarios[i], param, batch_iter, batches, pad)
            per_scenario.append(stacked_i)
            dummies.append(dummy_i)
        stacked = jax.tree.map(
            lambda *xs: jnp.asarray(np.stack(xs)), *per_scenario)
        dm0 = jnp.asarray(np.stack(dummies), dtype=stacked.lb.dtype)
        ctrls, _info = jax.vmap(
            lambda s_, d_: pmesh.jacobi_sweep(s_, d_, settings,
                                              rounds=rounds))(stacked, dm0)
        in_flight.append((idxs, ctrls))   # async: not materialized yet

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futs = [pool.submit(prep, i) for i in range(len(scenarios))]
        for fut in as_completed(futs):
            i = fut.result()
            sc = scenarios[i]
            if sc.plan is None or sc.error is not None:
                continue
            pad_plan_segments(sc.plan, quantize_M(sc.plan.M))
            key = (sc.plan.M, sc.mission.qn)
            pending.setdefault(key, []).append(i)
            if len(pending[key]) == chunk:
                dispatch(key, pending.pop(key))
        for key, idxs in sorted(pending.items()):
            dispatch(key, idxs)

    for idxs, ctrls in in_flight:
        ctrls = np.asarray(ctrls, dtype=np.float64)
        for row, i in enumerate(idxs):
            plan = scenarios[i].plan
            plan.coef = convert.ctrl_to_coef(ctrls[row], plan.T, param.n)
            plan.solver_info = {"mode": "scenario-pipelined-device",
                                "M": plan.M, "rounds": rounds}
    return scenarios
