"""Config presets and observability helpers."""
import numpy as np

from swarm_simulator_tpu.core.config import available, preset
from swarm_simulator_tpu.utils.timing import ProblemSize, Timer, scoped_timer


def test_presets_mirror_launch_defaults():
    p = preset("rbp_random_forest")
    # plan_rbp_random_forest.launch:23-66
    assert p.param.world_z_min == 0.3
    assert p.param.grid_xy_res == 0.5
    assert p.param.grid_z_res == 1.0
    assert p.param.ecbs_w == 1.3
    assert p.param.sequential and p.param.batch_size == 4
    assert p.param.batch_iter == -1
    assert p.mission == "mission_64agents_15.json"
    assert p.obs_num == 20

    assert preset("rbp_test").param.ecbs_w == 1.5  # plan_rbp_test.launch
    assert preset("rbp_flat").param.corridor_mode == "flat"
    assert "scp" in available()
    # plan_scp_empty_space.launch:19,30
    assert preset("scp").param.time_step == 0.5
    assert preset("scp").mission == "mission_8agents_15.json"


def test_problem_size_counters():
    # rbp_planner.hpp:578,623,687 formulas
    ps = ProblemSize.of_batch(B=4, M=36, n=5, phi=3, n_pairs=246)
    assert ps.n_vars == 3 * 4 * 36 * 6  # 2592
    assert ps.n_eq == 3 * 4 * 37 * 3
    assert ps.n_ineq == 2 * 2592 + 246 * 216
    assert "x size=2592" in str(ps)


def test_timer():
    t = Timer()
    t.reset()
    assert t.stop() >= 0.0
    msgs = []
    with scoped_timer("stage", sink=msgs.append):
        pass
    assert msgs and msgs[0].startswith("stage:")
