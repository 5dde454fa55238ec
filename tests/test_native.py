"""Cross-check the C++ native runtime against the Python/JAX references."""
import numpy as np
import pytest

from swarm_simulator_tpu.core.types import GridSpec, Mission, Param, PlanResult
from swarm_simulator_tpu.search import ecbs as pyecbs
from swarm_simulator_tpu.search.native_binding import (
    build_native, ecbs_search_native, esdf_native, sfc_expand_native)
from swarm_simulator_tpu.world.esdf import ESDF, esdf_from_occupancy
from swarm_simulator_tpu.world.voxel import OccupancyGrid


@pytest.fixture(scope="module", autouse=True)
def _build():
    build_native()


def test_esdf_native_matches_xla():
    rng = np.random.default_rng(3)
    occ = rng.random((40, 30, 12)) < 0.04
    occ[5, 5, 5] = True
    ours = esdf_native(occ, 0.1, 1.0)
    ref = np.asarray(esdf_from_occupancy(occ, res=0.1, max_dist=1.0))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def _mapf_case(seed=0, n_agents=4, dims=(8, 8, 2), n_obs=6):
    rng = np.random.default_rng(seed)
    cells = [(x, y, z) for x in range(dims[0]) for y in range(dims[1])
             for z in range(dims[2])]
    rng.shuffle(cells)
    obstacles = set(cells[:n_obs])
    free = [c for c in cells[n_obs:]]
    starts = free[:n_agents]
    goals = free[n_agents:2 * n_agents]
    quad = [0.2] * n_agents
    return dims, obstacles, starts, goals, quad


def _validate(env, paths, starts, goals):
    assert paths is not None
    for i, p in enumerate(paths):
        assert p[0][1:] == starts[i]
        assert p[-1][1:] == goals[i]
        for a, b in zip(p, p[1:]):
            assert abs(a[1] - b[1]) + abs(a[2] - b[2]) + abs(a[3] - b[3]) <= 1
    assert env.first_conflict([list(map(tuple, p)) for p in paths]) is None


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_ecbs_native_matches_python(seed):
    dims, obstacles, starts, goals, quad = _mapf_case(seed)
    grid_size = 0.5
    env = pyecbs.Environment(dims, obstacles, goals, quad, grid_size)

    py = pyecbs.ecbs_search(env, starts, w=1.3)
    nat = ecbs_search_native(dims=dims, obstacles=obstacles, starts=starts,
                             goals=goals, quad_size=quad,
                             grid_size=grid_size, w=1.3)
    _validate(env, nat, starts, goals)
    _validate(env, py, starts, goals)
    # same total cost (both are ECBS within the same suboptimality bound,
    # focal tie-breaking may differ; cost must agree on these small cases)
    cost_py = sum(len(p) - 1 for p in py)
    cost_nat = sum(len(p) - 1 for p in nat)
    assert abs(cost_py - cost_nat) <= max(2, int(0.3 * cost_py))


def test_ecbs_native_radius_conflicts():
    # two agents crossing: radii force > 1 cell separation
    dims = (6, 5, 1)
    env_obstacles = set()
    starts = [(0, 2, 0), (5, 2, 0)]
    goals = [(5, 2, 0), (0, 2, 0)]
    quad = [0.45, 0.45]  # rsum = 0.9 > grid 0.5 -> need dist > 1.8 cells
    nat = ecbs_search_native(dims=dims, obstacles=env_obstacles,
                             starts=starts, goals=goals, quad_size=quad,
                             grid_size=0.5, w=1.3)
    env = pyecbs.Environment(dims, env_obstacles, goals, quad, 0.5)
    _validate(env, nat, starts, goals)


def test_sfc_native_matches_python():
    from swarm_simulator_tpu.corridor import sfc as pysfc

    param = Param(world_z_min=0.0, grid_xy_res=0.5, grid_z_res=0.5)
    grid = OccupancyGrid.empty(param.world_min, param.world_max, 0.1)
    rng = np.random.default_rng(5)
    occ_idx = rng.integers(0, np.array(grid.dims), size=(40, 3))
    grid.occ[occ_idx[:, 0], occ_idx[:, 1], occ_idx[:, 2]] = True
    esdf = ESDF(grid, max_dist=1.0)

    traj = np.array([[-2.0, 0.0, 0.5], [-1.5, 0.0, 0.5], [-1.0, 0.5, 0.5],
                     [-0.5, 0.5, 1.0], [0.0, 0.5, 1.0]])
    margin = 0.15

    # python boxes via expand path
    plan = PlanResult(init_traj=traj[None], T=np.arange(len(traj)) * 1.0)
    try:
        py_sfc = pysfc.update_obs_boxes(esdf, plan, np.array([margin]), param)
        py_boxes = np.array([b for b, _ in py_sfc[0]])
    except ValueError:
        py_boxes = None

    if py_boxes is None:
        with pytest.raises(ValueError):
            sfc_expand_native(esdf.dist, 0.1, grid.i0, param.world_min,
                              param.world_max, param.box_xy_res,
                              param.box_z_res, traj, margin)
        return
    nat_boxes = sfc_expand_native(esdf.dist, 0.1, grid.i0, param.world_min,
                                  param.world_max, param.box_xy_res,
                                  param.box_z_res, traj, margin)
    np.testing.assert_allclose(nat_boxes, py_boxes, atol=1e-9)
