"""SCP planner (second algorithm) tests."""
import numpy as np

from swarm_simulator_tpu.core.types import Param
from swarm_simulator_tpu.io.mission_json import swap_mission
from swarm_simulator_tpu.qp.scp import plan_scp


def test_scp_two_agent_swap():
    param = Param(solver_dtype="float64", time_step=1.0)
    mission = swap_mission(2, z=0.5, span=1.0, radius=0.25)
    res = plan_scp(mission, param, horizon=10.0, epsilon=0.01)

    # endpoints
    np.testing.assert_allclose(res.pos[:, :, 0].T, mission.start[:, :3],
                               atol=1e-4)
    np.testing.assert_allclose(res.pos[:, :, -1].T, mission.goal[:, :3],
                               atol=1e-3)
    # zero initial/final inputs and final velocity
    np.testing.assert_allclose(res.u[:, :, 0], 0.0, atol=1e-5)
    np.testing.assert_allclose(res.u[:, :, -1], 0.0, atol=1e-5)
    np.testing.assert_allclose(res.vel[:, :, -1], 0.0, atol=1e-3)

    # pairwise separation after convexification
    dist = np.linalg.norm(res.pos[:, 0] - res.pos[:, 1], axis=0)
    assert dist.min() >= 0.5 - 1e-2, dist.min()
    assert res.iterations >= 2


def test_scp_four_agents():
    param = Param(solver_dtype="float64", time_step=1.0)
    mission = swap_mission(4, z=1.0, span=2.0, radius=0.2)
    res = plan_scp(mission, param, horizon=12.0, epsilon=0.01)
    np.testing.assert_allclose(res.pos[:, :, -1].T, mission.goal[:, :3],
                               atol=1e-3)
    P = res.pos
    for i in range(4):
        for j in range(i + 1, 4):
            d = np.linalg.norm(P[:, i] - P[:, j], axis=0)
            assert d.min() >= 0.4 - 2e-2, (i, j, d.min())
