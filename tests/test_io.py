"""IO parity tests: .bt worlds, crazyswarm CSV, and the reference's golden
64-agent solution evaluated with our metrics."""
from pathlib import Path

import numpy as np
import pytest

from swarm_simulator_tpu.io.coef_csv import (read_coef_csv, write_coef_csv)
from swarm_simulator_tpu.world.btree import load_bt_world, read_bt

REF = Path("/root/reference/swarm_planner")


@pytest.mark.skipif(not REF.exists(), reason="reference not mounted")
def test_read_bt_reference_worlds():
    leaves, res = read_bt(REF / "worlds" / "map1.bt")
    assert res == pytest.approx(0.1)
    assert len(leaves) > 1000
    # all leaves inside a sane world AABB, centers on the voxel lattice
    assert np.all(np.abs(leaves[:, :2]) < 6.0)
    assert np.all((leaves[:, 2] > -0.1) & (leaves[:, 2] < 3.0))
    frac = (leaves[:, 0] / 0.05) % 1
    assert np.allclose(np.minimum(frac, 1 - frac), 0, atol=1e-6)


def test_coef_csv_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    M, n = 4, 5
    coef = rng.normal(size=(M, n + 1, 3))
    T = np.arange(M + 1, dtype=float) * 1.5
    write_coef_csv(tmp_path / "c.csv", coef, T, n)
    coef2, dur = read_coef_csv(tmp_path / "c.csv")
    np.testing.assert_allclose(dur, 1.5)
    # read back is degree-7 descending; high-order terms zero
    np.testing.assert_allclose(coef2[:, :2], 0.0)
    np.testing.assert_allclose(coef2[:, 2:], coef, rtol=2e-5, atol=1e-6)


@pytest.mark.skipif(not REF.exists(), reason="reference not mounted")
def test_reference_golden_solution_is_collision_free_by_our_metrics():
    """Load the reference's committed 64-agent solved trajectories and
    verify OUR evaluator reproduces its acceptance claim (min ellipsoidal
    ratio >= 1, rbp_publisher.hpp:769-798).  This validates the evaluator
    against the reference's own artifact."""
    import jax.numpy as jnp

    from swarm_simulator_tpu.eval.safety import safety_margin_ratio
    from swarm_simulator_tpu.eval.sample import sample_trajectories
    from swarm_simulator_tpu.io.mission_json import load_mission

    coefs = []
    durations = None
    for qi in range(64):
        c, dur = read_coef_csv(REF / "log" / f"coef{qi + 1}.csv")
        coefs.append(c)
        durations = dur
    coef = np.stack(coefs)  # [64, M, 8, 3]
    T = np.concatenate([[0.0], np.cumsum(durations)])

    mission = load_mission(REF / "missions" / "mission_64agents_15.json")
    ts = np.arange(0.0, T[-1] + 1e-9, 0.1)
    states = np.asarray(sample_trajectories(
        jnp.asarray(coef), jnp.asarray(T), jnp.asarray(ts), n=7,
        derivatives=1))
    pos = states[:, :, 0]
    ratio = float(safety_margin_ratio(jnp.asarray(pos),
                                      jnp.asarray(mission.radius),
                                      downwash=2.0))
    assert ratio >= 1.0 - 1e-6, ratio

    # trajectories start/end reasonably within the world
    assert np.all(np.abs(pos[:, :, :2]) < 5.5)


def test_log_flag_exports_qp_and_problem_size(tmp_path, monkeypatch):
    """param.log turns on the reference's logging surface: problem-size
    counters (rbp_planner.hpp:58-60) and QP-model export (the LP export,
    rbp_planner.hpp:150-153) as npz under log/."""
    from swarm_simulator_tpu import Param, plan
    from swarm_simulator_tpu.io.mission_json import swap_mission

    monkeypatch.chdir(tmp_path)
    param = Param(world_z_min=0.0, solver_dtype="float64", grid_xy_res=0.5,
                  grid_z_res=0.5, log=True)
    mission = swap_mission(2, z=0.5, span=1.0, radius=0.25)
    result, _ = plan(mission, param, search_backend="python")

    info = result.solver_info
    assert "x size=" in info["problem_size"]
    assert "eq const size=" in info["problem_size"]

    f = tmp_path / "log" / "qp_batch0.npz"
    assert f.exists()
    qp = np.load(f)
    # the exported program must be the solved one: structured blocks with
    # the documented shapes (QPData docstring)
    D = result.M * 6
    assert qp["lb"].shape == (mission.qn, 3, D)
    assert qp["Aeq"].shape[1] == D
    assert qp["pair_n"].shape[0] >= 1


def test_animate_swarm_smoke(tmp_path):
    """viz.animate_swarm writes a parseable GIF (playback stand-in for
    rbp_publisher.hpp:93-127)."""
    import numpy as np

    from swarm_simulator_tpu.io.viz import animate_swarm

    ts = np.linspace(0.0, 1.0, 21)
    th = np.linspace(0, np.pi, 21)
    pos = np.stack([
        np.stack([np.cos(th), np.sin(th), np.ones_like(th)], axis=1),
        np.stack([-np.cos(th), -np.sin(th), np.ones_like(th)], axis=1),
    ])
    out = tmp_path / "playback.gif"
    animate_swarm(ts, pos, np.array([0.15, 0.15]), path=str(out), fps=10)
    data = out.read_bytes()
    assert data[:6] in (b"GIF87a", b"GIF89a") and len(data) > 1000
