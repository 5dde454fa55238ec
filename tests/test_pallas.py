"""Pallas kernels (interpret mode) vs the XLA solver paths.

(The dense-mode VMEM ADMM kernel and its tests were deleted in round 3
— superseded by the fused knot-state chunk kernel, validated in
tests/test_nullspace.py::test_fused_chunk_matches_xla_path* and on
hardware in tests_tpu/.)
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def test_thomas_kernel_matches_xla_scan():
    """ops/pallas_thomas.py (interpret mode) must reproduce the XLA
    banded Thomas apply on a real prepared operator, every rung."""
    import sys as _sys
    from pathlib import Path as _Path
    _sys.path.insert(0, str(_Path(__file__).parent))
    from test_nullspace import _data

    from swarm_simulator_tpu.ops.pallas_thomas import thomas_solve_pallas
    from swarm_simulator_tpu.qp import nullspace

    data, param = _data(n_agents=3, M=5)   # uniform segment durations
    s = nullspace.NSSettings(kkt_mode="banded", n_rungs=3)
    op = nullspace.prepare_ns_np(data, s)
    # production dtype is f32: compare both paths at f32
    op32 = jax.tree.map(
        lambda a: None if a is None else jnp.asarray(np.asarray(a),
                                                     jnp.float32), op)
    B, K3 = 3, 3
    M = 5
    phi = 3
    Mi = M - 1
    bs = B * K3 * phi
    Ho = np.asarray(op.Kos)
    assert np.allclose(Ho, Ho[0], atol=1e-12), "uniform dt -> constant Ho"
    koM = jnp.asarray(np.kron(np.eye(B * K3), Ho[0]), jnp.float32)

    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.standard_normal((B, K3, Mi * phi)), jnp.float32)
    apply_xla = nullspace.make_kinv_apply(op32, B, K3, M, phi)
    for r in range(3):
        want = np.asarray(apply_xla(jnp.int32(r), rhs))
        b = rhs.reshape(B, K3, Mi, phi).transpose(2, 0, 1, 3)
        b = b.reshape(Mi, bs)
        got = np.asarray(thomas_solve_pallas(
            op32.Dinvs, koM, koM.T, b, jnp.int32(r), interpret=True))
        got = got.reshape(Mi, B, K3, phi).transpose(1, 2, 0, 3)
        got = got.reshape(B, K3, Mi * phi)
        scale = np.abs(want).max()
        assert np.abs(got - want).max() < 2e-5 * max(scale, 1.0), \
            (r, np.abs(got - want).max(), scale)

    # production wiring: thomas_kernel=True prep pads the pivot
    # inventory once to the 128-lane DMA grid, and make_kinv_apply's
    # pallas branch consumes the padded op directly
    sp = nullspace.NSSettings(kkt_mode="banded", n_rungs=3,
                              thomas_kernel=True)
    opp = nullspace.prepare_ns_np(data, sp)
    assert opp.Dinvs.shape[-1] % 128 == 0, opp.Dinvs.shape
    opp32 = jax.tree.map(
        lambda a: None if a is None else jnp.asarray(np.asarray(a),
                                                     jnp.float32), opp)
    import swarm_simulator_tpu.ops.pallas_thomas as pt
    orig = pt.thomas_solve_pallas
    pt.thomas_solve_pallas = lambda *a, **k: orig(*a, interpret=True, **k)
    try:
        apply_pl = nullspace.make_kinv_apply(opp32, B, K3, M, phi,
                                             thomas_kernel=True)
        for r in range(3):
            want = np.asarray(apply_xla(jnp.int32(r), rhs))
            got = np.asarray(apply_pl(jnp.int32(r), rhs))
            scale = max(np.abs(want).max(), 1.0)
            assert np.abs(got - want).max() < 2e-5 * scale, r
    finally:
        pt.thomas_solve_pallas = orig
