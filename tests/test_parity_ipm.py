"""Coefficient-level parity against the trusted f64 interior-point oracle.

BASELINE.md's parity bar is "coefficient sequences within tolerance" of a
high-accuracy solve of the same program (the reference solves each batch
QP with CPLEX to optimality, rbp_planner.hpp:111-206).  qp/ipm.py plays
CPLEX's role: a float64 Mehrotra barrier solver whose returned triple is
independently KKT-verified (stationarity + feasibility + complementary
slackness), so these tests do not rely on trusting any one solver
implementation.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from test_qp import _tiny_problem  # noqa: E402


def _assemble(plan, mission, param, agents):
    from swarm_simulator_tpu.qp import assemble

    dummy = assemble.build_dummy(plan.init_traj, param.n)
    return assemble.assemble_batch(plan, mission, param,
                                   np.asarray(agents), dummy)


_CACHE: dict = {}


def _forest_8agent_batch():
    """First sequential batch of a real 8-agent forest mission — real
    SFC boxes, real pair rows against fixed dummies.  Cached: three
    tests share the fixture and its IPM oracle solve (~60 s each)."""
    if "data" in _CACHE:
        return _CACHE["data"]
    import jax

    import swarm_simulator_tpu as sst
    from swarm_simulator_tpu.corridor.times import build_corridors
    from swarm_simulator_tpu.io.mission_json import load_mission
    from swarm_simulator_tpu.parallel import seqbatch
    from swarm_simulator_tpu.qp import assemble
    from swarm_simulator_tpu.search.planner import plan_initial_trajectories
    from swarm_simulator_tpu.world.esdf import ESDF
    from swarm_simulator_tpu.world.forest import generate_forest

    mission = load_mission(
        "/root/reference/swarm_planner/missions/mission_8agents_12.json")
    param = sst.Param(world_z_min=0.0, solver_dtype="float64",
                      grid_xy_res=0.5, grid_z_res=0.5, sequential=True,
                      batch_size=4, batch_iter=-1)
    world = generate_forest(mission, world_min=param.world_min,
                            world_max=param.world_max, obs_num=6,
                            h_min=1.0, h_max=2.5, margin=0.5, seed=3)
    esdf = ESDF(world, max_dist=param.esdf_max_dist)
    plan = plan_initial_trajectories(esdf, mission, param)
    build_corridors(esdf, plan, mission.radius, param)
    batches, _ = seqbatch.make_batches(mission.qn, param)
    dummy = assemble.build_dummy(plan.init_traj, param.n)
    data = assemble.assemble_batch(plan, mission, param, batches[0], dummy)
    _CACHE["data"] = jax.tree.map(np.asarray, data)
    return _CACHE["data"]


def _oracle(data):
    """KKT-verified IPM solve of the shared fixture (cached)."""
    from swarm_simulator_tpu.qp import ipm

    if "oracle" not in _CACHE:
        res = ipm.solve_ipm(data)
        ipm.verify_optimal(data, res, tol=1e-6)
        _CACHE["oracle"] = res
    return _CACHE["oracle"]


def test_ipm_matches_converged_admm_tiny():
    """On a small strictly-determined problem the two algorithm families
    (barrier vs operator splitting) agree to solver precision."""
    from swarm_simulator_tpu.qp import admm, ipm

    plan, mission, param = _tiny_problem(n_agents=3, M=4)
    data = _assemble(plan, mission, param, np.arange(3))
    res = ipm.solve_ipm(data)
    ipm.verify_optimal(data, res, tol=1e-6)

    x, info = admm.solve_qp(data, admm.ADMMSettings(
        max_iter=4000, eps_abs=1e-7, eps_rel=1e-7, eps_dual_abs=1e-5))
    assert np.abs(np.asarray(x) - res.x).max() < 1e-5


def test_ipm_kkt_verified_on_real_pipeline_problem():
    """The oracle itself must hold up on a real forest batch QP (SFC box
    geometry, one-sided pair rows): KKT residuals independently checked."""
    from swarm_simulator_tpu.qp import ipm

    data = _forest_8agent_batch()
    res = _oracle(data)
    out = ipm.verify_optimal(data, res, tol=1e-6)
    assert res.mu < 1e-7
    assert out["r_ineq"] == 0.0


def test_production_solution_near_optimal_on_real_problem():
    """Coefficient-level parity on the real 8-agent forest batch: the
    production knot-state solver must land on the IPM optimum.  The
    reduced Hessian is PD (unique optimum) but extremely flat near it, so
    the robust parity statement is: objective within 5%, equalities to
    machine precision, constraint violation below solver tolerance, and
    sampled trajectory positions within centimeters of the optimum."""
    from swarm_simulator_tpu.qp import ipm, nullspace

    data = _forest_8agent_batch()
    res = _oracle(data)

    # deep-polish ladder: the production default range (1e-3..1e1) favors
    # feasibility-first convergence at small budgets; objective polish to
    # the optimum needs the 1e-5 floor (see NSSettings.rho_min notes)
    x = np.asarray(nullspace.solve_ns(
        data, nullspace.NSSettings(max_iter=3000, check_every=100,
                                   eps_abs=1e-7, eps_rel=1e-7,
                                   eps_dual_abs=1e-5,
                                   rho_min=1e-5, n_rungs=9)))
    Q, E, d, C, c, _ = ipm.build_flat(data)
    xf = np.asarray(x, np.float64).reshape(-1)
    xo = res.x.reshape(-1)
    obj = 0.5 * xf @ (Q @ xf)
    obj_opt = 0.5 * xo @ (Q @ xo)
    assert obj <= obj_opt * 1.05 + 1e-9, (obj, obj_opt)
    assert np.abs(E @ xf - d).max() < 1e-9
    assert np.maximum(c - C @ xf, 0.0).max() < 2e-3
    # the Hessian is extremely flat near the optimum: at a few-% objective
    # gap, control points can still sit ~0.5 m away along near-zero-cost
    # directions (test_coefficient_parity_converged pins the exact limit)
    assert np.abs(xf - xo).max() < 1.0, np.abs(xf - xo).max()


def test_coefficient_parity_converged():
    """BASELINE.md's bar, met exactly: run the knot-state solver to
    convergence (f64) on a real forest batch QP and the control points
    coincide with the independently KKT-verified IPM optimum —
    coefficient sequences within tolerance, not just matching metrics."""
    from swarm_simulator_tpu.qp import ipm, nullspace

    data = _forest_8agent_batch()
    res = _oracle(data)

    x = np.asarray(nullspace.solve_ns(
        data, nullspace.NSSettings(max_iter=20000, check_every=200,
                                   eps_abs=1e-10, eps_rel=1e-10,
                                   eps_dual_abs=1e-8, rho_min=1e-5,
                                   n_rungs=9)))
    Q, E, d, C, c, _ = ipm.build_flat(data)
    xf = np.asarray(x, np.float64).reshape(-1)
    xo = res.x.reshape(-1)
    obj = 0.5 * xf @ (Q @ xf)
    obj_opt = 0.5 * xo @ (Q @ xo)
    assert abs(obj - obj_opt) <= 1e-4 * max(obj_opt, 1e-9)
    assert np.maximum(c - C @ xf, 0.0).max() < 1e-8
    assert np.abs(xf - xo).max() < 1e-3, np.abs(xf - xo).max()


def test_reduced_ipm_matches_full():
    """The fast equality-eliminated barrier (bench.py's denominator) must
    land on the same optimum as the full-space oracle, and its returned
    triple must pass the full-space KKT verification."""
    from swarm_simulator_tpu.qp import ipm

    data = _forest_8agent_batch()
    res_full = _oracle(data)
    res_red = ipm.solve_ipm_reduced(data, tol=1e-12, max_iter=80)
    ipm.verify_optimal(data, res_red, tol=1e-6)
    assert np.abs(res_red.x - res_full.x).max() < 1e-4, \
        np.abs(res_red.x - res_full.x).max()


def test_joint_objective_parity_16agents():
    """FULL-JOINT parity point (round-2 VERDICT weak #2): all 120 pair
    constraints of a 16-agent forest problem active in ONE QP, solved
    by the production joint recipe (f32 data, host-f64 prep, phased rho
    schedule) and independently by the KKT-verified reduced f64 barrier
    — EVERY agent's objective quality is covered by one oracle here,
    complementing bench.py's per-batch best-response rotation at 64
    agents."""
    import jax
    import jax.numpy as jnp

    import swarm_simulator_tpu as sst
    from swarm_simulator_tpu.corridor.times import build_corridors
    from swarm_simulator_tpu.io.mission_json import perimeter_swap_mission
    from swarm_simulator_tpu.qp import assemble, ipm, joint, nullspace
    from swarm_simulator_tpu.search.planner import plan_initial_trajectories
    from swarm_simulator_tpu.world.esdf import ESDF
    from swarm_simulator_tpu.world.forest import generate_forest

    param = sst.Param(world_z_min=0.3, grid_xy_res=0.5, grid_z_res=1.0,
                      solver_dtype="float64", time_scale=False)
    mission = perimeter_swap_mission(16, half=2.0, z=1.0, radius=0.15)
    world = generate_forest(mission, world_min=param.world_min,
                            world_max=param.world_max, obs_num=6,
                            r_min=0.3, r_max=0.3, h_min=0.0, h_max=2.5,
                            margin=0.5, seed=5)
    esdf = ESDF(world, max_dist=param.esdf_max_dist)
    plan = plan_initial_trajectories(esdf, mission, param)
    build_corridors(esdf, plan, mission.radius, param)
    dummy = assemble.build_dummy(plan.init_traj, param.n)
    data64 = assemble.assemble_batch(plan, mission, param, np.arange(16),
                                     dummy, device=False)

    # f64 oracle on the WHOLE joint QP, independently KKT-verified
    res = ipm.solve_ipm_reduced(data64, tol=1e-10, max_iter=60)
    ipm.verify_optimal(data64, res, tol=1e-5)
    Qseg = np.asarray(data64.Qseg, np.float64)
    M, npp = Qseg.shape[0], Qseg.shape[1]

    def per_agent_obj(x_flat):
        # x [B, 3, D] -> objective per agent
        c = np.asarray(x_flat, np.float64).reshape(16, 3, M, npp)
        return 0.5 * np.einsum("bkmi,mij,bkmj->b", c, Qseg, c)

    obj_opt = per_agent_obj(res.x)

    # production joint recipe at the production dtype
    data32 = jax.tree.map(
        lambda a: np.asarray(a, np.float32)
        if np.asarray(a).dtype == np.float64 else np.asarray(a), data64)
    phases = joint.production_phases(fused=False)   # CPU suite
    op = nullspace.prepare_ns_np(data32, phases[0])
    x, info = jax.jit(
        lambda d, o: nullspace.solve_ns_phases(d, phases, op=o))(
        jax.tree.map(jnp.asarray, data32), jax.device_put(op))
    obj_ours = per_agent_obj(np.asarray(x, np.float64))

    # total objective parity + per-agent coverage (the Hessian is very
    # flat near the optimum, so individual agents may trade jerk; the
    # joint total is the sharp statement)
    assert obj_ours.sum() <= obj_opt.sum() * 1.15 + 1e-9, \
        (obj_ours.sum(), obj_opt.sum())
    assert np.all(obj_ours <= obj_opt * 1.6 + 1e-3), \
        (obj_ours / np.maximum(obj_opt, 1e-9)).max()

    # and the solved swarm is safe (full gate, incl. dynamic limits)
    import bench
    ctrl = np.asarray(x, np.float64).transpose(0, 2, 1).reshape(
        16, M, npp, 3)
    ok, m = bench.gate_quality(ctrl, plan, mission, param)
    assert ok, m
