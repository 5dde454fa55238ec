"""Pallas ADMM kernel vs the XLA solver (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_pallas_admm_matches_xla():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _tiny_qp

    from swarm_simulator_tpu.ops.pallas_admm import (PallasADMMSettings,
                                                     solve_admm_pallas)
    from swarm_simulator_tpu.qp import admm

    data = _tiny_qp(n_agents=4, M=4)
    x_ref, info = admm.solve_qp(data, admm.ADMMSettings(
        max_iter=200, check_every=200, eps_abs=1e-12, eps_rel=1e-12,
        kkt_solver="cg"))
    x_pal = solve_admm_pallas(data, PallasADMMSettings(iters=200),
                              interpret=True)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_ref),
                               atol=5e-3)


def test_pallas_admm_batched_matches_single():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _tiny_qp

    from swarm_simulator_tpu.ops.pallas_admm import (
        PallasADMMSettings, solve_admm_pallas, solve_admm_pallas_batched)

    d1 = _tiny_qp(n_agents=4, M=4)
    d2 = _tiny_qp(n_agents=4, M=4)
    import dataclasses

    import jax
    d2 = dataclasses.replace(d2, x0=d2.x0 + 0.01)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), d1, d2)
    st = PallasADMMSettings(iters=100)
    xb = solve_admm_pallas_batched(stacked, st, interpret=True)
    x1 = solve_admm_pallas(d1, st, interpret=True)
    x2 = solve_admm_pallas(d2, st, interpret=True)
    np.testing.assert_allclose(np.asarray(xb[0]), np.asarray(x1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(xb[1]), np.asarray(x2), atol=1e-5)
