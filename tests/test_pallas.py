"""Pallas ADMM kernel vs the XLA solver.

Pointwise trajectory equality only holds for bit-identical arithmetic
(ADMM paths near constraint boundaries diverge under any rounding
difference), so the kernel is validated on convergence quality: primal
feasibility of its fixed point.
"""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def _viol(data, x):
    from swarm_simulator_tpu.qp import admm

    pop = admm._pair_op(data)
    av = admm.A_matvec(data, jnp.asarray(x), pop)
    l, u = admm._bounds(data)
    over = jax.tree.map(lambda a, ll, uu: jnp.maximum(
        jnp.maximum(ll - a, a - uu), 0.0), av, l, u)
    return max(float(jnp.max(v)) for v in over if v.size > 0)


def test_pallas_admm_converges():
    from __graft_entry__ import _tiny_qp

    from swarm_simulator_tpu.ops.pallas_admm import (PallasADMMSettings,
                                                     solve_admm_pallas)
    from swarm_simulator_tpu.qp import admm

    data = _tiny_qp(n_agents=4, M=4)
    x_pal = solve_admm_pallas(data, PallasADMMSettings(iters=400),
                              interpret=True)
    assert _viol(data, x_pal) < 5e-4

    # objective within a few percent of the XLA solver's
    x_ref, _ = admm.solve_qp(data, admm.ADMMSettings(
        max_iter=2000, eps_abs=1e-8, eps_rel=1e-8, kkt_solver="cg"))
    obj = lambda x: float(jnp.vdot(jnp.asarray(x),
                                   admm.P_matvec(data, jnp.asarray(x))))
    assert obj(x_pal) <= obj(x_ref) * 1.05 + 1e-6


def test_pallas_admm_batched_matches_single():
    from __graft_entry__ import _tiny_qp

    from swarm_simulator_tpu.ops.pallas_admm import (
        PallasADMMSettings, solve_admm_pallas, solve_admm_pallas_batched)

    d1 = _tiny_qp(n_agents=4, M=4)
    import dataclasses
    d2 = dataclasses.replace(d1, x0=d1.x0 + 0.01)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), d1, d2)
    st = PallasADMMSettings(iters=100)
    xb = solve_admm_pallas_batched(stacked, st, interpret=True)
    x1 = solve_admm_pallas(d1, st, interpret=True)
    x2 = solve_admm_pallas(d2, st, interpret=True)
    np.testing.assert_allclose(np.asarray(xb[0]), np.asarray(x1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(xb[1]), np.asarray(x2), atol=1e-5)
