"""Knot-state (null-space) formulation: exactness of the elimination.

The maps must reproduce the SAME constraint system as qp/assemble.build_aeq
(continuity + endpoint pins, mirroring build_Aeq_base,
rbp_planner.hpp:353-405): Aeq @ N == 0 and Aeq @ x_pin == deq to machine
precision, and the x <-> knot-state roundtrip must be exact on
continuity-feasible trajectories.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

from test_qp import _tiny_problem  # noqa: E402


def _data(n_agents=3, M=5, nonuniform=False):
    from swarm_simulator_tpu.qp import assemble

    plan, mission, param = _tiny_problem(n_agents=n_agents, M=M)
    if nonuniform:
        T = np.concatenate([[0.0], np.cumsum(0.5 + np.arange(M) * 0.3)])
        plan.T = T
    dummy = assemble.build_dummy(plan.init_traj, param.n)
    return assemble.assemble_batch(plan, mission, param,
                                   np.arange(n_agents), dummy), param


def test_N_spans_the_aeq_null_space():
    from swarm_simulator_tpu.qp import nullspace

    for nonuniform in (False, True):
        data, param = _data(nonuniform=nonuniform)
        s = nullspace.NSSettings()
        op = nullspace.prepare_ns(data, s)
        N = np.asarray(op.N)
        Aeq = np.asarray(data.Aeq)
        # exact elimination: every column of N satisfies the homogeneous
        # continuity + endpoint system
        assert np.abs(Aeq @ N).max() < 1e-10
        # dimension: full null space, nothing lost
        assert N.shape[1] == Aeq.shape[1] - Aeq.shape[0]
        assert np.linalg.matrix_rank(N) == N.shape[1]
        # pinned trajectory satisfies the inhomogeneous system
        x_pin = np.asarray(op.x_pin)
        B, K3, D = x_pin.shape
        err = np.einsum("rd,bkd->bkr", Aeq, x_pin) - np.asarray(data.deq)
        assert np.abs(err).max() < 1e-10


def test_knot_state_roundtrip():
    from swarm_simulator_tpu.qp import nullspace

    data, param = _data(nonuniform=True)
    s = nullspace.NSSettings()
    op = nullspace.prepare_ns(data, s)
    rng = np.random.default_rng(0)
    B = np.asarray(data.lb).shape[0]
    nw = op.N.shape[1]
    w = rng.normal(size=(B, 3, nw))
    x = nullspace._x_of(op, w)
    w2 = np.asarray(nullspace._w_from_x(op, x, phi=param.phi))
    assert np.abs(w2 - w).max() < 1e-9


def test_solve_ns_respects_tightening():
    from swarm_simulator_tpu.qp import ipm, nullspace

    data, _ = _data()
    t = 1e-2
    x = np.asarray(nullspace.solve_ns(
        data, nullspace.NSSettings(max_iter=2000, check_every=100,
                                   tighten=t)))
    Q, E, d, C, c, _ = ipm.build_flat(data)
    xf = x.reshape(-1)
    # true constraints satisfied strictly (violation of the tightened
    # problem stays below the margin)
    assert np.maximum(c - C @ xf, 0.0).max() < t
    assert np.abs(E @ xf - d).max() < 1e-9
