"""Compiled-TPU tracking tests (run on real hardware, NOT in the default
CPU suite: `python -m pytest tests_tpu/ -q`).

tests/conftest.py pins the unit suite to CPU float64; these tests instead
exercise the axon TPU platform compiled (not interpreted) and track the
platform-specific quality questions VERDICT round 1 flagged:

  * the production joint solve must pass the full safety gate compiled
    on TPU (the headline bench path);
  * the fused VMEM chunk kernel and the Pallas Thomas kernel must
    reproduce the XLA paths compiled (Mosaic regressions are visible).
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402


def _tpu_device():
    try:
        return jax.devices("axon")[0]
    except RuntimeError:
        return None


pytestmark = pytest.mark.skipif(_tpu_device() is None,
                                reason="no axon TPU attached")


def test_joint_gate_compiled_tpu():
    """The production joint 64-agent forest solve passes the SAFETY gate
    compiled on TPU (collisions / continuity / endpoints / boxes).  The
    objective-quality margin vs the IPM best-response is tracked by
    bench.py across 5 seeds."""
    import bench
    from swarm_simulator_tpu.qp import nullspace

    plan, mission, param = bench.build_problem(seed=0)
    data, _ = bench.assemble_joint(plan, mission, param)
    dev = _tpu_device()
    d = jax.tree.map(lambda x: jax.device_put(jax.numpy.asarray(x), dev),
                     data)
    phases = bench.ns_phases()
    op = jax.device_put(nullspace.prepare_ns_np(data, phases[0]), dev)
    x, info = jax.jit(
        lambda dd, oo: nullspace.solve_ns_phases(dd, phases, op=oo))(d, op)
    x = np.asarray(x, np.float64)
    ctrl = x.transpose(0, 2, 1).reshape(64, plan.M, param.n + 1, 3)
    ok, m = bench.gate_quality(ctrl, plan, mission, param)
    assert ok, m


def test_thomas_kernel_compiled_accuracy():
    """The Pallas Thomas kernel (ops/pallas_thomas.py) must reproduce
    the precision-highest XLA banded apply compiled on TPU, every rung,
    on a REAL prepared operator (round-2 finding: both paths are at the
    achievable HBM ceiling; the kernel stays off by default but its
    compiled accuracy is pinned here so a Mosaic regression is
    visible)."""
    import numpy as np

    import bench
    from swarm_simulator_tpu.ops.pallas_thomas import pad_pivots
    from swarm_simulator_tpu.qp import nullspace

    jnp = jax.numpy
    plan, mission, param = bench.build_problem(seed=0)
    data, _ = bench.assemble_joint(plan, mission, param)
    s = bench.ns_settings()
    op = nullspace.prepare_ns_np(data, s)
    dev = _tpu_device()
    op_dev = jax.device_put(op, dev)
    op_pl = jax.device_put(op._replace(Dinvs=pad_pivots(
        np.asarray(op.Dinvs))), dev)
    B, K3, phi, M = mission.qn, 3, 3, plan.M

    @jax.jit
    def apply_xla(o, r, v):
        with jax.default_matmul_precision("highest"):
            return nullspace.make_kinv_apply(o, B, K3, M, phi)(r, v)

    @jax.jit
    def apply_pl(o, r, v):
        with jax.default_matmul_precision("highest"):
            return nullspace.make_kinv_apply(o, B, K3, M, phi,
                                             thomas_kernel=True)(r, v)

    rng = np.random.default_rng(7)
    rhs = jnp.asarray(rng.standard_normal((B, K3, (M - 1) * phi)),
                      jnp.float32)
    for r in range(op.Dinvs.shape[0]):
        want = np.asarray(apply_xla(op_dev, jnp.int32(r), rhs))
        got = np.asarray(apply_pl(op_pl, jnp.int32(r), rhs))
        err = np.abs(got - want).max() / max(np.abs(want).max(), 1.0)
        assert err < 2e-3, (r, err)


def test_fused_chunk_compiled_accuracy():
    """The VMEM-resident fused ADMM chunk kernel (ops/pallas_nsfused.py)
    must track the XLA scan path compiled on TPU — same phased solve,
    zero tolerances (identical iteration counts), same prepared f64
    operator."""
    import dataclasses

    import numpy as np

    from swarm_simulator_tpu.qp import nullspace

    sys.path.insert(0, "/root/repo/tests")
    from test_nullspace import _data

    jnp = jax.numpy
    dev = _tpu_device()
    data, _ = _data(n_agents=8, M=8)
    data = jax.tree.map(
        lambda a: np.asarray(a, np.float32)
        if np.asarray(a).dtype == np.float64 else np.asarray(a), data)
    s0 = nullspace.NSSettings(kkt_mode="banded", max_iter=100,
                              check_every=50, eps_abs=0.0, eps_rel=0.0,
                              eps_dual_abs=0.0)

    def solve(s):
        op = nullspace.prepare_ns_np(data, s)
        d = jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), dev),
                         data)
        o = jax.device_put(op, dev)
        x, info = jax.jit(
            lambda dd, oo: nullspace.solve_ns_phases(dd, (s,), op=oo))(d, o)
        return np.asarray(x, np.float64)

    x_ref = solve(s0)
    x_fused = solve(dataclasses.replace(s0, fused_chunk=True))
    scale = max(1.0, np.abs(x_ref).max())
    err = np.abs(x_ref - x_fused).max() / scale
    assert err < 2e-4, err


def test_fused_joint_gate_compiled_tpu():
    """The production 64-agent forest solve with the fused chunk kernel
    passes the full safety gate compiled on TPU."""
    import dataclasses

    import numpy as np

    import bench
    from swarm_simulator_tpu.qp import nullspace

    jnp = jax.numpy
    plan, mission, param = bench.build_problem(seed=0)
    data, _ = bench.assemble_joint(plan, mission, param)
    dev = _tpu_device()
    phases = tuple(dataclasses.replace(p, fused_chunk=True)
                   for p in bench.ns_phases())
    op = nullspace.prepare_ns_np(data, phases[0])
    d = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), dev), data)
    o = jax.device_put(op, dev)
    x, info = jax.jit(
        lambda dd, oo: nullspace.solve_ns_phases(dd, phases, op=oo))(d, o)
    x = np.asarray(x, np.float64)
    ctrl = x.transpose(0, 2, 1).reshape(64, plan.M, param.n + 1, 3)
    ok, m = bench.gate_quality(ctrl, plan, mission, param)
    assert ok, m


def test_chunk_kernels_compiled_accuracy():
    """The round-4 chunked Thomas sweeps (ops/pallas_thomas
    thomas_chunk_fwd/bwd — the cross-device pipeline's per-device
    kernels) must reproduce the full-solve kernel COMPILED on TPU: a
    2-chunk split of the knot axis with hand-carried boundaries equals
    the one-kernel solve.  (Multi-device execution is validated on the
    virtual CPU mesh — tests/test_shard.py — since this environment has
    one chip; this pins the Mosaic-compiled chunk kernels themselves.)"""
    import numpy as np

    import bench
    from swarm_simulator_tpu.ops.pallas_thomas import (
        pad_pivots, thomas_chunk_bwd, thomas_chunk_fwd,
        thomas_solve_pallas)
    from swarm_simulator_tpu.qp import nullspace

    jnp = jax.numpy
    plan, mission, param = bench.build_problem(seed=0)
    data, _ = bench.assemble_joint(plan, mission, param)
    op = nullspace.prepare_ns_np(data, bench.ns_settings())
    dev = _tpu_device()
    dinvs = jax.device_put(jnp.asarray(pad_pivots(np.asarray(op.Dinvs))),
                           dev)
    B, K3, phi, M = mission.qn, 3, 3, plan.M
    Mi, bs = M - 1, B * K3 * phi
    bsp = dinvs.shape[-1]
    B3 = B * K3
    koM_u = jnp.kron(jnp.eye(B3, dtype=op.Kos.dtype),
                     jnp.asarray(op.Kos[0])).astype(jnp.float32)
    koM = jnp.zeros((bsp, bsp), jnp.float32).at[:bs, :bs].set(koM_u)
    rng = np.random.default_rng(3)
    b = jnp.zeros((Mi, bsp), jnp.float32).at[:, :bs].set(
        jnp.asarray(rng.standard_normal((Mi, bs)), jnp.float32))

    r = jnp.int32(1)
    want = np.asarray(thomas_solve_pallas(
        dinvs, koM_u, koM_u.T, jnp.asarray(b[:, :bs]), r))

    # 2-chunk split with hand-carried boundary rows (what the sharded
    # pipeline's ppermutes do)
    L = Mi // 2
    d0, d1 = dinvs[:, :L], dinvs[:, L:]
    b0, b1 = b[:L], b[L:]
    z = jnp.zeros(bsp, jnp.float32)
    T0 = thomas_chunk_fwd(d0, koM, b0, z, r)
    T1 = thomas_chunk_fwd(d1, koM, b1, T0[-1], r)
    x1 = thomas_chunk_bwd(d1, koM, T1, z, r)
    x0 = thomas_chunk_bwd(d0, koM, T0, x1[0], r)
    got = np.asarray(jnp.concatenate([x0, x1], axis=0))[:, :bs]
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1.0)
    assert err < 2e-3, err
