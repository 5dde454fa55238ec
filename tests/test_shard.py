"""Cross-device decomposition of ONE joint banded solve
(qp/nullspace_shard.py): the round-3 answer to SURVEY §5's
communication row — pivot inventory block-row-sharded, pair
constraints P-sharded, psum/all_gather coupling — validated on the
8-virtual-CPU-device mesh against the single-device path."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from test_nullspace import _data

from swarm_simulator_tpu.qp import nullspace, nullspace_shard


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), ("kkt",))


def _f32(data):
    return jax.tree.map(
        lambda a: np.asarray(a, np.float32)
        if np.asarray(a).dtype == np.float64 else np.asarray(a), data)


def _phases(max_iters=(100, 100)):
    # adapt_threshold=1e9 pins the rho rung: the sharded path's psum /
    # all_gather re-associate the f32 reductions, and a residual ratio
    # landing exactly on an adaptation boundary could flip the rung on
    # one path only — the exact-equality comparison must not depend on
    # that coin toss (zero tolerances already force full budgets)
    base = nullspace.NSSettings(kkt_mode="banded", check_every=50,
                                eps_abs=0.0, eps_rel=0.0, eps_dual_abs=0.0,
                                rho_min=1e-4, rho_max=1e-1, n_rungs=4,
                                adapt_threshold=1e9)
    return tuple(dataclasses.replace(base, max_iter=mi) for mi in max_iters)


def test_sharded_matches_single_device():
    """8-way sharded phased solve == the single-device XLA scan path on
    the same prepared operator, to f32 reduction tolerance (psum /
    all_gather re-associate the pair and matvec sums).  Zero tolerances
    pin identical iteration counts on both paths."""
    data, _ = _data(n_agents=8, M=8)
    data = _f32(data)
    phases = _phases()
    op = nullspace.prepare_ns_np(data, phases[0])

    x_ref, info_ref = nullspace.solve_ns_phases(
        jax.tree.map(jnp.asarray, data), phases, op=jax.device_put(op))
    x_ref = np.asarray(x_ref, np.float64)

    mesh = _mesh(8)
    x_sh, info_sh = nullspace_shard.solve_ns_phases_sharded(
        data, phases, op, mesh)
    x_sh = np.asarray(x_sh, np.float64)

    assert int(info_sh.iters) == int(info_ref.iters)
    scale = max(1.0, np.abs(x_ref).max())
    err = np.abs(x_ref - x_sh).max() / scale
    assert err < 5e-5, err


def test_sharded_pair_padding_inactive():
    """P=28 pairs at 8 agents pads to 32 over 8 devices; the pad rows
    must never bind (solution identical to the 4-device run where P=28
    pads to 28)."""
    data, _ = _data(n_agents=8, M=8)
    data = _f32(data)
    phases = _phases((50,))
    op = nullspace.prepare_ns_np(data, phases[0])

    mesh4 = _mesh(4)   # 28 % 4 == 0: no padding
    x4, _ = nullspace_shard.solve_ns_phases_sharded(data, phases, op, mesh4)
    mesh8 = _mesh(8)   # pads 28 -> 32
    x8, _ = nullspace_shard.solve_ns_phases_sharded(data, phases, op, mesh8)
    err = np.abs(np.asarray(x4, np.float64)
                 - np.asarray(x8, np.float64)).max()
    assert err < 5e-5, err


def test_sharded_rejects_unshardable():
    data, _ = _data(n_agents=8, M=8)
    data = _f32(data)
    phases = _phases((50,))
    op = nullspace.prepare_ns_np(data, phases[0])
    mesh = _mesh(8)

    bad = tuple(dataclasses.replace(p, kkt_mode="dense") for p in phases)
    with pytest.raises(ValueError, match="banded"):
        nullspace_shard.solve_ns_phases_sharded(data, bad, op, mesh)

    fused = tuple(dataclasses.replace(p, fused_chunk=True) for p in phases)
    with pytest.raises(ValueError, match="plain banded"):
        nullspace_shard.solve_ns_phases_sharded(data, fused, op, mesh)
