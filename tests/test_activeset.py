"""Exact active-set polish (qp/activeset.py) against the f64 IPM oracle.

The polish claims to turn a first-order (ADMM) solution into the EXACT
QP optimum whenever its final KKT certificate holds — these tests check
that claim against the independently KKT-verified barrier solver on
problems with genuinely active box and pair constraints, including the
degenerate zero-width shared-face class (assemble.KNOT_FACE_GUARD).
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

from test_qp import _tiny_problem  # noqa: E402


def _obj(data, x):
    Qseg = np.asarray(data.Qseg, np.float64)
    B, K3, D = x.shape
    M = Qseg.shape[0]
    npp = D // M
    xs = np.asarray(x, np.float64).transpose(0, 2, 1).reshape(B, M, npp, 3)
    return 0.5 * float(np.einsum("bmik,mij,bmjk->", xs, Qseg, xs))


def test_polish_unconstrained_reaches_exact_optimum():
    """No active rows: one block solve must land on the IPM optimum to
    f64 accuracy from a loosely-converged ADMM point."""
    from swarm_simulator_tpu.qp import activeset, admm, assemble, ipm

    plan, mission, param = _tiny_problem(n_agents=2, M=3)
    dummy = assemble.build_dummy(plan.init_traj, param.n)
    data = assemble.assemble_batch(plan, mission, param,
                                   np.array([0, 1]), dummy, device=False)
    res = ipm.solve_ipm(data)
    x_admm, _ = admm.solve_qp(data, admm.ADMMSettings(
        max_iter=300, eps_abs=1e-3, eps_rel=1e-3))
    xp, info = activeset.polish(data, np.asarray(x_admm, np.float64))
    assert info["accepted"] and info["kkt_optimal"], info
    np.testing.assert_allclose(xp, res.x, atol=1e-8)


def test_polish_active_box_rows():
    """A start-velocity overshoot against a low box lid: the z-axis
    rows bind at the optimum (feasible: the pinned control points
    0.5/0.6/0.7 stay under the 0.75 lid) and the polish must land on
    the IPM optimum with a nonempty active set."""
    from swarm_simulator_tpu.qp import activeset, admm, assemble, ipm

    plan, mission, param = _tiny_problem(n_agents=1, M=4)
    mission.start[0, 3:6] = (0.0, 0.0, 0.5)   # z climb at start
    plan.seg_boxes[:, :, 2] = 0.0
    plan.seg_boxes[:, :, 5] = 0.75
    dummy = assemble.build_dummy(plan.init_traj, param.n)
    data = assemble.assemble_batch(plan, mission, param,
                                   np.array([0]), dummy, device=False)
    res = ipm.solve_ipm(data)
    obj_ipm = _obj(data, res.x)
    x_admm, _ = admm.solve_qp(data, admm.ADMMSettings(
        max_iter=3000, eps_abs=1e-6, eps_rel=1e-6))
    x_admm = np.asarray(x_admm, np.float64)
    xp, info = activeset.polish(data, x_admm)
    assert info["accepted"], info
    assert info["n_active"] > 0, info
    assert abs(_obj(data, xp) - obj_ipm) < 1e-8 * max(1.0, obj_ipm)
    np.testing.assert_allclose(xp, res.x, atol=1e-6)


def test_polish_forest_batch_matches_ipm():
    """Real 8-agent forest batch (real SFC boxes + one-sided pair rows
    against fixed dummies): a loosely-converged dense-ADMM point is
    polished onto the KKT-verified IPM optimum."""
    from test_parity_ipm import _forest_8agent_batch

    from swarm_simulator_tpu.qp import activeset, admm, ipm

    data = _forest_8agent_batch()
    res = ipm.solve_ipm(data)
    obj_ipm = _obj(data, res.x)
    x_admm, _ = admm.solve_qp(data, admm.ADMMSettings(
        max_iter=1500, eps_abs=1e-5, eps_rel=1e-5))
    x_admm = np.asarray(x_admm, np.float64)
    obj_admm = _obj(data, x_admm)
    xp, info = activeset.polish(data, x_admm)
    assert info["accepted"] and info["kkt_optimal"], info
    assert info["n_active"] > 0, info
    obj_p = _obj(data, xp)
    assert obj_p <= obj_admm + 1e-9
    assert abs(obj_p - obj_ipm) < 1e-6 * max(1.0, obj_ipm), \
        (obj_p, obj_ipm)
    assert info["worst_slack_out"] > -1e-6, info


def test_polish_zero_width_shared_face():
    """Consecutive SFC boxes sharing only a face pin the knot exactly —
    the polish must treat the duplicated rows as ONE equality and still
    certify (the +e/-e active pair would be singular)."""
    from swarm_simulator_tpu.qp import activeset, admm, assemble

    plan, mission, param = _tiny_problem(n_agents=1, M=4)
    # y boxes: segments 0-1 in [-5, 0], segments 2-3 in [0, 5] -> the
    # knot between segments 1 and 2 is pinned to y = 0 exactly; fly
    # diagonally so the pin binds against the jerk-optimal path
    mission.start[0, :3] = (-1.0, -0.8, 0.5)
    mission.goal[0, :3] = (1.0, 0.8, 0.5)
    L = plan.init_traj.shape[1]
    for k in range(3):
        plan.init_traj[0, :, k] = np.linspace(
            mission.start[0, k], mission.goal[0, k], L)
    plan.seg_boxes[0, :2, 1] = -5.0
    plan.seg_boxes[0, :2, 4] = 0.0
    plan.seg_boxes[0, 2:, 1] = 0.0
    plan.seg_boxes[0, 2:, 4] = 5.0
    dummy = assemble.build_dummy(plan.init_traj, param.n)
    data = assemble.assemble_batch(plan, mission, param,
                                   np.array([0]), dummy, device=False)
    x_admm, _ = admm.solve_qp(data, admm.ADMMSettings(
        max_iter=4000, eps_abs=1e-7, eps_rel=1e-7))
    xp, info = activeset.polish(data, np.asarray(x_admm, np.float64))
    assert info["accepted"], info
    # the shared-face knot sits exactly on y = 0
    npp = param.n + 1
    xs = xp.transpose(0, 2, 1).reshape(1, plan.M, npp, 3)
    assert abs(xs[0, 1, npp - 1, 1]) < 1e-9
    assert abs(xs[0, 2, 0, 1]) < 1e-9
    assert info["worst_slack_out"] > -1e-6


def test_polish_idempotent_on_own_output():
    """Feeding the polish its own output must change nothing (already
    optimal)."""
    from swarm_simulator_tpu.qp import activeset, admm, assemble

    plan, mission, param = _tiny_problem(n_agents=1, M=4)
    mission.start[0, 3:6] = (0.0, 0.0, 0.5)
    plan.seg_boxes[:, :, 5] = 0.75
    dummy = assemble.build_dummy(plan.init_traj, param.n)
    data = assemble.assemble_batch(plan, mission, param,
                                   np.array([0]), dummy, device=False)
    x_admm, _ = admm.solve_qp(data, admm.ADMMSettings(
        max_iter=2000, eps_abs=1e-6, eps_rel=1e-6))
    xp, info = activeset.polish(data, np.asarray(x_admm, np.float64))
    assert info["accepted"]
    xp2, info2 = activeset.polish(data, xp)
    assert info2["accepted"]
    assert abs(info2["obj_out"] - info["obj_out"]) < 1e-9
    np.testing.assert_allclose(xp2, xp, atol=1e-9)


def test_polish_flags_pinned_infeasibility():
    """A start state whose PINNED control points leave the box is an
    infeasible instance — the polish must not 'fix' it silently: the
    diagnostic carries the pinned violation and the input is returned
    unless a genuine improvement exists."""
    from swarm_simulator_tpu.qp import activeset, admm, assemble

    plan, mission, param = _tiny_problem(n_agents=1, M=4)
    mission.start[0, 3:6] = (0.0, 0.0, 2.0)   # pins: 0.5, 0.9, 1.3
    plan.seg_boxes[:, :, 5] = 0.75            # lid below the pins
    dummy = assemble.build_dummy(plan.init_traj, param.n)
    data = assemble.assemble_batch(plan, mission, param,
                                   np.array([0]), dummy, device=False)
    x_admm, _ = admm.solve_qp(data, admm.ADMMSettings(
        max_iter=500, eps_abs=1e-4, eps_rel=1e-4))
    _, info = activeset.polish(data, np.asarray(x_admm, np.float64))
    assert info["pinned_box_viol"] > 0.1, info
