"""QP assembly + ADMM solver correctness on small problems.

Verifies against a dense scipy reference solution of the same program, and
checks the KKT/physical properties the reference relies on: endpoint pins,
C^phi continuity, box containment, pair-plane feasibility.
"""
import numpy as np
import pytest

import dataclasses

from swarm_simulator_tpu.core.types import Mission, Param, PlanResult
from swarm_simulator_tpu.qp import admm, assemble, convert


def _tiny_problem(n_agents=2, M=3, sequential=False):
    """Straight-line missions in an empty world with whole-world boxes."""
    param = Param(solver_dtype="float64", time_scale=False,
                  sequential=sequential)
    start = np.zeros((n_agents, 9))
    goal = np.zeros((n_agents, 9))
    ys = np.linspace(-0.5, 0.5, n_agents)
    start[:, 0] = -1.0
    start[:, 1] = ys
    start[:, 2] = 0.5
    goal[:, 0] = 1.0
    goal[:, 1] = ys
    goal[:, 2] = 0.5
    mission = Mission(
        start=start, goal=goal, radius=np.full(n_agents, 0.15),
        speed=np.ones(n_agents), max_vel=np.full((n_agents, 3), 1.7),
        max_acc=np.full((n_agents, 3), 6.2), names=["d"] * n_agents)

    T = np.arange(M + 1, dtype=float)
    L = M + 1
    init_traj = np.zeros((n_agents, L, 3))
    for qi in range(n_agents):
        for k in range(3):
            init_traj[qi, :, k] = np.linspace(start[qi, k], goal[qi, k], L)

    plan = PlanResult(init_traj=init_traj, T=T)
    plan.seg_boxes = np.tile(
        np.array([-5.0, -5.0, 0.0, 5.0, 5.0, 2.5]), (n_agents, M, 1))
    iu, ju = np.triu_indices(n_agents, k=1)
    plan.pair_idx = np.stack([iu, ju], axis=1).astype(np.int32)
    # separating planes: agents stacked in y -> normal = +y from i to j
    P = len(iu)
    normals = np.zeros((P, M, 3))
    normals[:, :, 1] = 1.0
    plan.pair_normals = normals
    return plan, mission, param


def _dense_reference_solution(data: assemble.QPData):
    """Solve the same QP with scipy (dense active-set via cvxpy-free KKT):
    minimize 0.5 x^T P x  s.t. Aeq x = b, lb <= x <= ub, Cx >= d.

    Uses scipy.optimize.minimize(SLSQP) — adequate for tiny problems."""
    from scipy.optimize import LinearConstraint, minimize

    Qseg = np.asarray(data.Qseg)
    Aeq = np.asarray(data.Aeq)
    deq = np.asarray(data.deq)
    lb = np.asarray(data.lb)
    ub = np.asarray(data.ub)
    B, K, D = lb.shape
    M, npp, _ = Qseg.shape
    nx = B * K * D

    Pm = np.zeros((nx, nx))
    for b in range(B):
        for k in range(K):
            off = (b * K + k) * D
            for m in range(M):
                s = off + m * npp
                Pm[s:s + npp, s:s + npp] = Qseg[m]

    Re = Aeq.shape[0]
    Aeq_full = np.zeros((B * K * Re, nx))
    beq_full = np.zeros(B * K * Re)
    for b in range(B):
        for k in range(K):
            r0 = (b * K + k) * Re
            c0 = (b * K + k) * D
            Aeq_full[r0:r0 + Re, c0:c0 + D] = Aeq
            beq_full[r0:r0 + Re] = deq[b, k]

    # pair constraints
    rows = []
    rhs = []
    pair_bi = np.asarray(data.pair_bi)
    pair_bj = np.asarray(data.pair_bj)
    pair_n = np.asarray(data.pair_n)
    pair_rhs = np.asarray(data.pair_rhs)
    mask = np.asarray(data.pair_mask)
    for p in range(len(pair_bi)):
        if mask[p] == 0:
            continue
        for d in range(D):
            m = d // npp
            row = np.zeros(nx)
            for k in range(K):
                if pair_bj[p] >= 0:
                    row[(pair_bj[p] * K + k) * D + d] += pair_n[p, m, k]
                if pair_bi[p] >= 0:
                    row[(pair_bi[p] * K + k) * D + d] -= pair_n[p, m, k]
            rows.append(row)
            rhs.append(pair_rhs[p, d])

    cons = [LinearConstraint(Aeq_full, beq_full, beq_full)]
    if rows:
        cons.append(LinearConstraint(np.array(rows), np.array(rhs), np.inf))
    x0 = np.asarray(data.x0).reshape(nx)
    res = minimize(
        lambda x: 0.5 * x @ Pm @ x, x0, jac=lambda x: Pm @ x,
        bounds=list(zip(lb.reshape(nx), ub.reshape(nx))),
        constraints=cons, method="SLSQP",
        options={"maxiter": 500, "ftol": 1e-12})
    assert res.success, res.message
    return res.x.reshape(B, K, D)


def test_admm_matches_scipy_single_agent():
    plan, mission, param = _tiny_problem(n_agents=1, M=3)
    dummy = assemble.build_dummy(plan.init_traj, param.n)
    data = assemble.assemble_batch(plan, mission, param, np.array([0]), dummy)
    x, info = admm.solve_qp(data, admm.ADMMSettings(
        max_iter=4000, eps_abs=1e-8, eps_rel=1e-8))
    x = np.asarray(x)
    x_ref = _dense_reference_solution(data)
    np.testing.assert_allclose(x, x_ref, atol=2e-4)


def test_admm_matches_scipy_two_agents():
    plan, mission, param = _tiny_problem(n_agents=2, M=3)
    dummy = assemble.build_dummy(plan.init_traj, param.n)
    data = assemble.assemble_batch(plan, mission, param, np.array([0, 1]),
                                   dummy)
    x, info = admm.solve_qp(data, admm.ADMMSettings(
        max_iter=6000, eps_abs=1e-8, eps_rel=1e-8))
    x = np.asarray(x)
    assert float(info.r_prim) < 1e-6
    x_ref = _dense_reference_solution(data)
    np.testing.assert_allclose(x, x_ref, atol=5e-4)


def test_solution_properties():
    plan, mission, param = _tiny_problem(n_agents=2, M=4)
    dummy = assemble.build_dummy(plan.init_traj, param.n)
    data = assemble.assemble_batch(plan, mission, param, np.array([0, 1]),
                                   dummy)
    x, info = admm.solve_qp(data, admm.ADMMSettings(
        max_iter=6000, eps_abs=1e-7, eps_rel=1e-7))
    ctrl = convert.x_to_ctrl(np.asarray(x), plan.M, param.n)
    coef = convert.ctrl_to_coef(ctrl, plan.T, param.n)

    from swarm_simulator_tpu.eval.safety import (box_containment_error,
                                                 knot_continuity_error)
    assert knot_continuity_error(coef, plan.T, param.n, param.phi) < 1e-4
    assert box_containment_error(ctrl, plan.seg_boxes) < 1e-5

    # endpoint pins
    import jax.numpy as jnp
    from swarm_simulator_tpu.eval.sample import sample_trajectories
    s = np.asarray(sample_trajectories(
        jnp.asarray(coef), jnp.asarray(plan.T),
        jnp.asarray([0.0, float(plan.T[-1])]), n=param.n))
    np.testing.assert_allclose(s[:, 0, 0], mission.start[:, :3], atol=1e-5)
    np.testing.assert_allclose(s[:, 1, 0], mission.goal[:, :3], atol=1e-5)
    np.testing.assert_allclose(s[:, 0, 1], 0.0, atol=1e-4)  # zero start vel

    # pair plane: y separation >= r_i + r_j at every control point
    sep = ctrl[1, :, :, 1] - ctrl[0, :, :, 1]
    assert sep.min() >= 0.3 - 1e-5


def test_sequential_one_sided_pairs():
    """Fixed-agent pair constraints reference the dummy trajectory."""
    plan, mission, param = _tiny_problem(n_agents=2, M=3, sequential=True)
    param = dataclasses.replace(param, batch_size=1, batch_iter=-1)
    dummy = assemble.build_dummy(plan.init_traj, param.n)
    data = assemble.assemble_batch(plan, mission, param, np.array([0]), dummy)
    # agent 1 fixed: constraint n.(dummy_1 - x_0) >= rsum
    assert int(np.asarray(data.pair_bi)[0]) == 0
    assert int(np.asarray(data.pair_bj)[0]) == -1
    x, info = admm.solve_qp(data, admm.ADMMSettings(
        max_iter=4000, eps_abs=1e-8, eps_rel=1e-8))
    ctrl = convert.x_to_ctrl(np.asarray(x), plan.M, param.n)
    # dummy of agent 1 has y = +0.5; constraint: 0.5 - y_0 >= 0.3
    assert ctrl[0, :, :, 1].max() <= 0.2 + 1e-5


def test_cg_kkt_matches_dense():
    plan, mission, param = _tiny_problem(n_agents=2, M=4)
    dummy = assemble.build_dummy(plan.init_traj, param.n)
    data = assemble.assemble_batch(plan, mission, param, np.array([0, 1]),
                                   dummy)
    s = dict(max_iter=6000, eps_abs=1e-8, eps_rel=1e-8)
    xd, _ = admm.solve_qp(data, admm.ADMMSettings(**s))
    xc, info = admm.solve_qp(data, admm.ADMMSettings(
        kkt_solver="cg", cg_iters=15, **s))
    np.testing.assert_allclose(np.asarray(xc), np.asarray(xd), atol=1e-6)
