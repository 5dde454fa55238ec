"""End-to-end pipeline tests: the BASELINE config ladder, CPU-sized.

Config 1: 2-agent swap, empty world (BASELINE.md "2-agent swap mission").
Config 2: 8-agent circle swap with random-forest obstacles.
Acceptance follows the reference's printed metrics: min inter-agent
ellipsoidal distance ratio >= 1, endpoint pins, C^3 continuity, dynamic
limits after time scaling (rbp_publisher.hpp:125-126).
"""
import dataclasses

import numpy as np
import pytest

from swarm_simulator_tpu import Param, evaluate, plan
from swarm_simulator_tpu.io.mission_json import swap_mission
from swarm_simulator_tpu.world.forest import generate_forest


def _check(result, metrics, param):
    assert metrics["min_safety_ratio"] >= 1.0 - 1e-3, metrics
    assert metrics["knot_continuity_err"] < 1e-3, metrics
    assert metrics["start_err"] < 1e-3, metrics
    assert metrics["goal_err"] < 1e-3, metrics
    if param.time_scale:
        assert metrics["dynamic_violation"] < 1e-2, metrics


def test_two_agent_swap_empty_world():
    param = Param(world_z_min=0.0, solver_dtype="float64", grid_xy_res=0.5,
                  grid_z_res=0.5)
    mission = swap_mission(2, z=0.5, span=1.0, radius=0.25)
    result, times = plan(mission, param, search_backend="python")
    metrics = evaluate(result, mission, param)
    _check(result, metrics, param)
    # both agents reach antipodes
    np.testing.assert_allclose(result.init_traj[0, -1], [-1.0, 0.0, 0.5],
                               atol=1e-9)


def test_two_agent_swap_sequential():
    param = Param(world_z_min=0.0, solver_dtype="float64", grid_xy_res=0.5,
                  grid_z_res=0.5, sequential=True, batch_size=1,
                  batch_iter=-1)
    mission = swap_mission(2, z=0.5, span=1.0, radius=0.25)
    result, times = plan(mission, param, search_backend="python")
    metrics = evaluate(result, mission, param)
    _check(result, metrics, param)


def test_eight_agent_forest_joint_nullspace():
    """Param.solver="nullspace" routes the pipeline through the
    production joint path (qp/joint.py: host-f64 prep + phased banded
    knot-state ADMM) — the bench.py headline architecture, reachable
    from plan()/CLI."""
    param = Param(world_z_min=0.0, solver_dtype="float32",
                  grid_xy_res=0.5, grid_z_res=0.5, solver="nullspace")
    mission = swap_mission(8, z=1.0, span=4.0, radius=0.12)
    world = generate_forest(
        mission, world_min=param.world_min, world_max=param.world_max,
        resolution=param.world_resolution, obs_num=6, r_min=0.3, r_max=0.3,
        h_min=1.0, h_max=2.5, margin=0.5, seed=7)
    result, times = plan(mission, param, world, search_backend="python")
    metrics = evaluate(result, mission, param)
    _check(result, metrics, param)
    assert result.solver_info["mode"] == "joint-nullspace"
    assert result.solver_info["prep_s"] > 0
    assert "ns_prep" in times.extra


def test_joint_nullspace_outer_iteration():
    """iteration=2 on the joint path: RSFC planes rebuilt from the
    round-0 solution, fresh host prep, warm-started re-solve (the joint
    analog of the reference's outer loop, rbp_planner.hpp:140)."""
    param = Param(world_z_min=0.0, solver_dtype="float32",
                  grid_xy_res=0.5, grid_z_res=0.5, solver="nullspace",
                  iteration=2)
    mission = swap_mission(6, z=1.0, span=3.0, radius=0.12)
    result, _ = plan(mission, param, search_backend="python")
    metrics = evaluate(result, mission, param)
    _check(result, metrics, param)
    assert result.solver_info["mode"] == "joint-nullspace"


def test_eight_agent_forest():
    param = Param(world_z_min=0.0, solver_dtype="float64",
                  grid_xy_res=0.5, grid_z_res=0.5)
    mission = swap_mission(8, z=1.0, span=4.0, radius=0.12)
    world = generate_forest(
        mission, world_min=param.world_min, world_max=param.world_max,
        resolution=param.world_resolution, obs_num=6, r_min=0.3, r_max=0.3,
        h_min=1.0, h_max=2.5, margin=0.5, seed=7)
    result, times = plan(mission, param, world, search_backend="python")
    metrics = evaluate(result, mission, param)
    _check(result, metrics, param)


def test_rsfc_numpy_matches_jax():
    import jax.numpy as jnp

    from swarm_simulator_tpu.corridor.rsfc import (_pair_planes_numpy,
                                                   pair_separating_planes)
    rng = np.random.default_rng(2)
    init_traj = rng.normal(size=(5, 7, 3)) * 2
    iu, ju = np.triu_indices(5, k=1)
    pair_idx = np.stack([iu, ju], axis=1).astype(np.int32)
    n_np, d_np = _pair_planes_numpy(init_traj, pair_idx, 2.0)
    n_jx, d_jx = pair_separating_planes(jnp.asarray(init_traj),
                                        jnp.asarray(pair_idx), downwash=2.0)
    np.testing.assert_allclose(n_np, np.asarray(n_jx), atol=1e-12)
    np.testing.assert_allclose(d_np, np.asarray(d_jx), atol=1e-12)


def test_two_agent_swap_flat_corridor():
    param = Param(world_z_min=0.0, solver_dtype="float64", grid_xy_res=0.5,
                  grid_z_res=0.5, corridor_mode="flat")
    mission = swap_mission(2, z=0.5, span=1.0, radius=0.25)
    result, times = plan(mission, param, search_backend="python")
    metrics = evaluate(result, mission, param)
    _check(result, metrics, param)
    # flat RSFC normals are axis-aligned sector vectors
    nz = result.pair_normals[np.abs(result.pair_normals) > 1e-12]
    assert np.all(np.isin(np.abs(nz), [1.0, 0.5])), nz


def test_eight_agent_jacobi_mode():
    param = Param(world_z_min=0.0, solver_dtype="float64", grid_xy_res=0.5,
                  grid_z_res=0.5, sequential=True, batch_size=2,
                  batch_iter=-1, iteration=2, parallel_mode="jacobi")
    mission = swap_mission(8, z=1.0, span=4.0, radius=0.12)
    result, times = plan(mission, param, search_backend="python")
    metrics = evaluate(result, mission, param)
    _check(result, metrics, param)
    assert result.solver_info["mode"] == "jacobi"
