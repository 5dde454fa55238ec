"""Sharded Jacobi sweep on a virtual 8-device CPU mesh."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _setup(n_agents=8, M=4, batch_size=2):
    from swarm_simulator_tpu.core.types import Mission, Param, PlanResult
    from swarm_simulator_tpu.parallel import seqbatch
    from swarm_simulator_tpu.qp import assemble

    param = Param(solver_dtype="float64", sequential=True,
                  batch_size=batch_size, batch_iter=-1)
    start = np.zeros((n_agents, 9))
    goal = np.zeros((n_agents, 9))
    ys = np.arange(n_agents) * 0.5 - (n_agents - 1) * 0.25
    start[:, 0], start[:, 1], start[:, 2] = -1.0, ys, 0.5
    goal[:, 0], goal[:, 1], goal[:, 2] = 1.0, ys, 0.5
    mission = Mission(start=start, goal=goal,
                      radius=np.full(n_agents, 0.1),
                      speed=np.ones(n_agents),
                      max_vel=np.full((n_agents, 3), 1.7),
                      max_acc=np.full((n_agents, 3), 6.2))
    T = np.arange(M + 1, dtype=float)
    init_traj = np.zeros((n_agents, M + 1, 3))
    for qi in range(n_agents):
        for k in range(3):
            init_traj[qi, :, k] = np.linspace(start[qi, k], goal[qi, k], M + 1)
    plan = PlanResult(init_traj=init_traj, T=T)
    plan.seg_boxes = np.tile(np.array([-5.0, -5.0, 0.0, 5.0, 5.0, 2.5]),
                             (n_agents, M, 1))
    iu, ju = np.triu_indices(n_agents, k=1)
    plan.pair_idx = np.stack([iu, ju], axis=1).astype(np.int32)
    normals = np.zeros((len(iu), M, 3))
    normals[:, :, 1] = 1.0
    plan.pair_normals = normals
    return plan, mission, param


def test_jacobi_sweep_sharded_mesh():
    from swarm_simulator_tpu.parallel import mesh as pmesh
    from swarm_simulator_tpu.parallel import seqbatch
    from swarm_simulator_tpu.qp import admm, assemble

    assert len(jax.devices()) == 8, "conftest should fake 8 CPU devices"

    plan, mission, param = _setup(n_agents=8, M=4, batch_size=2)
    batches, batch_iter = seqbatch.make_batches(mission.qn, param)
    dummy = assemble.build_dummy(plan.init_traj, param.n)

    members = [set(int(q) for q in b) for b in batches]
    pad = max(sum(1 for (qi, qj) in np.asarray(plan.pair_idx)
                  if int(qi) in m or int(qj) in m) for m in members)
    datas = [assemble.assemble_batch(plan, mission, param, b, dummy, pad)
             for b in batches]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *datas)

    m = pmesh.make_mesh(n_scenario=2, n_batch=4)
    stacked = pmesh.shard_stacked(stacked, m, axes=("batch",))

    settings = admm.ADMMSettings(max_iter=1500, eps_abs=1e-6, eps_rel=1e-6)
    ctrl, info = pmesh.jacobi_sweep(stacked, jnp.asarray(dummy), settings,
                                    rounds=2)
    ctrl = np.asarray(ctrl)

    # endpoints: every agent's first/last control point at start/goal
    np.testing.assert_allclose(ctrl[:, 0, 0], mission.start[:, :3], atol=1e-4)
    np.testing.assert_allclose(ctrl[:, -1, -1], mission.goal[:, :3], atol=1e-4)

    # y separation between adjacent agents at every control point >= rsum
    sep = ctrl[1:, :, :, 1] - ctrl[:-1, :, :, 1]
    assert sep.min() >= 0.2 - 1e-4


def test_refresh_from_dummy_matches_host_assembly():
    from swarm_simulator_tpu.qp import assemble

    plan, mission, param = _setup(n_agents=4, M=3, batch_size=2)
    dummy = assemble.build_dummy(plan.init_traj, param.n)
    batch = np.array([0, 1])
    data = assemble.assemble_batch(plan, mission, param, batch, dummy, 5)

    # perturb dummy, rebuild on host vs refresh on device
    dummy2 = dummy + 0.1
    data_host = assemble.assemble_batch(plan, mission, param, batch, dummy2, 5)
    data_dev = assemble.refresh_from_dummy(data, jnp.asarray(dummy2))
    np.testing.assert_allclose(np.asarray(data_dev.pair_rhs),
                               np.asarray(data_host.pair_rhs), atol=1e-12)
    np.testing.assert_allclose(np.asarray(data_dev.x0),
                               np.asarray(data_host.x0), atol=1e-12)


def test_gauss_seidel_sweep_on_device():
    from swarm_simulator_tpu.parallel import mesh as pmesh
    from swarm_simulator_tpu.parallel import seqbatch
    from swarm_simulator_tpu.qp import admm, assemble

    plan, mission, param = _setup(n_agents=6, M=4, batch_size=2)
    batches, batch_iter = seqbatch.make_batches(mission.qn, param)
    dummy = assemble.build_dummy(plan.init_traj, param.n)
    members = [set(int(q) for q in b) for b in batches]
    pad = max(sum(1 for (qi, qj) in np.asarray(plan.pair_idx)
                  if int(qi) in m or int(qj) in m) for m in members)
    datas = [assemble.assemble_batch(plan, mission, param, b, dummy, pad)
             for b in batches]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *datas)
    settings = admm.ADMMSettings(max_iter=1500, eps_abs=1e-6, eps_rel=1e-6,
                                 kkt_solver="cg")
    ctrl, info = pmesh.gauss_seidel_sweep(stacked, jnp.asarray(dummy),
                                          settings, rounds=1)
    ctrl = np.asarray(ctrl)
    np.testing.assert_allclose(ctrl[:, 0, 0], mission.start[:, :3], atol=1e-4)
    np.testing.assert_allclose(ctrl[:, -1, -1], mission.goal[:, :3], atol=1e-4)
    sep = ctrl[1:, :, :, 1] - ctrl[:-1, :, :, 1]
    assert sep.min() >= 0.2 - 1e-4

    # matches the host-driven Gauss-Seidel loop
    from swarm_simulator_tpu.core.types import PlanResult
    from swarm_simulator_tpu.parallel.seqbatch import solve_trajectories
    solve_trajectories(plan, mission, param, settings)
    ctrl_host = np.asarray(plan.coef)  # power coefs; compare via dummy ctrl
    # (compare control points via coef conversion instead)
    from swarm_simulator_tpu.qp import convert
    coef_dev = convert.ctrl_to_coef(ctrl, plan.T, param.n)
    np.testing.assert_allclose(coef_dev, ctrl_host, atol=5e-4)


def test_jacobi_sweep_iters_schedule():
    """A decreasing per-round iteration budget gives the same converged
    sweep as the uniform budget (later rounds warm-start and need fewer
    iterations), and mismatched schedule length is rejected."""
    from swarm_simulator_tpu.parallel import mesh as pmesh
    from swarm_simulator_tpu.parallel import seqbatch
    from swarm_simulator_tpu.qp import admm, assemble

    plan, mission, param = _setup(n_agents=6, M=4, batch_size=2)
    batches, _ = seqbatch.make_batches(mission.qn, param)
    dummy = assemble.build_dummy(plan.init_traj, param.n)
    members = [set(int(q) for q in b) for b in batches]
    pad = max(sum(1 for (qi, qj) in np.asarray(plan.pair_idx)
                  if int(qi) in m or int(qj) in m) for m in members)
    datas = [assemble.assemble_batch(plan, mission, param, b, dummy, pad)
             for b in batches]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *datas)
    settings = admm.ADMMSettings(max_iter=1500, eps_abs=1e-6, eps_rel=1e-6)

    ctrl_u, _ = pmesh.jacobi_sweep(stacked, jnp.asarray(dummy), settings,
                                   rounds=2)
    ctrl_s, _ = pmesh.jacobi_sweep(stacked, jnp.asarray(dummy), settings,
                                   rounds=2, iters_schedule=(1500, 700))
    np.testing.assert_allclose(np.asarray(ctrl_s), np.asarray(ctrl_u),
                               atol=1e-5)

    with pytest.raises(ValueError, match="iters_schedule"):
        pmesh.jacobi_sweep(stacked, jnp.asarray(dummy), settings,
                           rounds=2, iters_schedule=(100,))


def test_distributed_single_process_paths():
    """Single-process degeneration of the multi-host glue: global mesh,
    scenario sharding, and cross-process stacking all reduce to the local
    mesh primitives (multi-host only adds the initialize() call)."""
    from swarm_simulator_tpu.parallel import distributed, seqbatch
    from swarm_simulator_tpu.parallel import mesh as pmesh
    from swarm_simulator_tpu.qp import admm, assemble

    distributed.initialize()  # no-op without a coordinator
    m = distributed.global_mesh(n_scenario=2, n_batch=4)
    assert m.shape == {"scenario": 2, "batch": 4}

    # contiguous scenario partition covering everything exactly once
    idx = [distributed.scenario_shard(10, process_id=p, num_processes=3)
           for p in range(3)]
    assert np.concatenate(idx).tolist() == list(range(10))
    assert {len(i) for i in idx} == {4, 3}

    # stacked QP solved through the cross-process stacking path
    # (8 agents / batch_size 2 -> 4 groups, matching the batch axis)
    plan, mission, param = _setup(n_agents=8, M=3, batch_size=2)
    batches, _ = seqbatch.make_batches(mission.qn, param)
    dummy = assemble.build_dummy(plan.init_traj, param.n)
    members = [set(int(q) for q in b) for b in batches]
    pad = max(sum(1 for (qi, qj) in np.asarray(plan.pair_idx)
                  if int(qi) in mm or int(qj) in mm) for mm in members)
    datas = [assemble.assemble_batch(plan, mission, param, b, dummy, pad)
             for b in batches]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *datas)
    g = distributed.stack_across_processes(
        stacked, m, axes=("batch",))
    settings = admm.ADMMSettings(max_iter=800, eps_abs=1e-6, eps_rel=1e-6)
    ctrl, _ = pmesh.jacobi_sweep(g, jnp.asarray(dummy), settings, rounds=2)
    ctrl = np.asarray(ctrl)
    np.testing.assert_allclose(ctrl[:, 0, 0], mission.start[:, :3],
                               atol=1e-4)
    np.testing.assert_allclose(ctrl[:, -1, -1], mission.goal[:, :3],
                               atol=1e-4)


def test_jacobi_sweep_carry_state():
    """Carrying the scaled ADMM state (x, z, y) across rounds converges
    to the same sweep as re-initialized rounds at generous budgets, and
    is rejected without a schedule."""
    from swarm_simulator_tpu.parallel import mesh as pmesh
    from swarm_simulator_tpu.parallel import seqbatch
    from swarm_simulator_tpu.qp import admm, assemble

    plan, mission, param = _setup(n_agents=6, M=4, batch_size=2)
    batches, _ = seqbatch.make_batches(mission.qn, param)
    dummy = assemble.build_dummy(plan.init_traj, param.n)
    members = [set(int(q) for q in b) for b in batches]
    pad = max(sum(1 for (qi, qj) in np.asarray(plan.pair_idx)
                  if int(qi) in m or int(qj) in m) for m in members)
    datas = [assemble.assemble_batch(plan, mission, param, b, dummy, pad)
             for b in batches]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *datas)
    settings = admm.ADMMSettings(max_iter=2000, eps_abs=1e-7, eps_rel=1e-7)

    ctrl_a, _ = pmesh.jacobi_sweep(stacked, jnp.asarray(dummy), settings,
                                   rounds=2, iters_schedule=(2000, 1000))
    ctrl_b, _ = pmesh.jacobi_sweep(stacked, jnp.asarray(dummy), settings,
                                   rounds=2, iters_schedule=(2000, 1000),
                                   carry_state=True)
    np.testing.assert_allclose(np.asarray(ctrl_b), np.asarray(ctrl_a),
                               atol=1e-4)

    with pytest.raises(ValueError, match="carry_state"):
        pmesh.jacobi_sweep(stacked, jnp.asarray(dummy), settings, rounds=2,
                           carry_state=True)


def test_distributed_two_process_execution():
    """REAL multi-process execution of the distributed backend: two
    jax.distributed CPU processes (localhost coordinator, 4 virtual
    devices each) jointly build the global (scenario=2, batch=4) mesh,
    contribute per-process scenario stacks via stack_across_processes
    (the jax.make_array_from_process_local_data branch), and run a
    vmapped jacobi_sweep over the sharded stack.  Each worker asserts
    its scenario's physics (endpoint pins, continuity, no collisions)."""
    import socket
    import subprocess
    import sys
    from pathlib import Path

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    worker = Path(__file__).parent / "distributed_worker.py"

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    # the worker imports the package from the repo checkout — do not
    # depend on it being pip-installed in the venv
    repo_root = str(Path(__file__).parent.parent)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo_root, env.get("PYTHONPATH")) if p)
    procs = [subprocess.Popen(
        [sys.executable, str(worker), coord, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=str(Path(__file__).parent.parent))
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER{pid}" in out and "PASS" in out, out
        assert "devices=8" in out, out


def test_distributed_two_process_sharded_joint():
    """ONE joint banded solve partitioned over a global 8-device mesh
    spanning TWO jax.distributed processes: the sharded Thomas
    all_gathers and the pair-coupling psum cross the process boundary
    (the DCN path of a real deployment).  Each worker verifies the
    sharded result against its own single-device solve."""
    import socket
    import subprocess
    import sys
    from pathlib import Path

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    worker = Path(__file__).parent / "distributed_worker.py"

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    repo_root = str(Path(__file__).parent.parent)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo_root, env.get("PYTHONPATH")) if p)
    procs = [subprocess.Popen(
        [sys.executable, str(worker), coord, "2", str(pid), "joint"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=str(Path(__file__).parent.parent))
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER{pid}" in out and "PASS" in out, out
        assert "devices=8" in out, out
