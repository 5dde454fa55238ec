"""ESDF correctness vs scipy's exact Euclidean distance transform."""
import numpy as np
import scipy.ndimage as ndi

from swarm_simulator_tpu.world.esdf import ESDF, esdf_from_occupancy
from swarm_simulator_tpu.world.voxel import OccupancyGrid


def test_esdf_matches_scipy():
    rng = np.random.default_rng(42)
    occ = rng.random((24, 20, 12)) < 0.05
    occ[0, 0, 0] = True  # ensure non-empty
    res = 0.1
    ours = np.asarray(esdf_from_occupancy(occ, res=res, max_dist=10.0))
    ref = ndi.distance_transform_edt(~occ, sampling=res)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_esdf_clamped():
    occ = np.zeros((30, 30, 10), dtype=bool)
    occ[0, 0, 0] = True
    d = np.asarray(esdf_from_occupancy(occ, res=0.1, max_dist=1.0))
    assert d.max() <= 1.0 + 1e-6
    assert d[0, 0, 0] == 0.0


def test_esdf_query_octomap_convention():
    grid = OccupancyGrid.empty([-1.0, -1.0, 0.0], [1.0, 1.0, 1.0], 0.1)
    # voxel count: floor(1.0/0.1) - floor(-1.0/0.1) + 1 = 10 + 10 + 1 = 21
    assert grid.dims == (21, 21, 11)
    grid.occ[10, 10, 5] = True  # voxel centered at (0.05, 0.05, 0.55)
    esdf = ESDF(grid, max_dist=10.0)
    # query at the occupied voxel center
    assert esdf.query([[0.05, 0.05, 0.55]])[0] == 0.0
    # one voxel away in x
    np.testing.assert_allclose(esdf.query([[0.15, 0.05, 0.55]])[0], 0.1,
                               atol=1e-6)
    # outside the map -> -1 (DynamicEDT semantics)
    assert esdf.query([[5.0, 0.0, 0.0]])[0] == -1.0


def test_point_to_index_boundaries():
    grid = OccupancyGrid.empty([-5.0, -5.0, 0.0], [5.0, 5.0, 2.5], 0.1)
    assert grid.dims == (101, 101, 26)
    idx = grid.point_to_index(np.array([[-5.0, -4.95, 0.0], [5.0, 4.999, 2.5]]))
    np.testing.assert_array_equal(idx[0], [0, 0, 0])
    np.testing.assert_array_equal(idx[1], [100, 99, 25])
