"""Monte-Carlo scenario batching (BASELINE config 5, CPU-sized)."""
import numpy as np

import jax.numpy as jnp

from swarm_simulator_tpu.core.types import Param
from swarm_simulator_tpu.eval.safety import safety_margin_ratio
from swarm_simulator_tpu.eval.sample import sample_times, sample_trajectories
from swarm_simulator_tpu.io.mission_json import swap_mission
from swarm_simulator_tpu.parallel.scenarios import run_monte_carlo


def test_monte_carlo_pipelined_matches_two_phase():
    """The streaming prep->dispatch overlap path (pipeline=k) must land on
    the same trajectories as the two-phase path: identical seeds, only
    the pair-row padding and dispatch granularity differ (padded rows
    are masked-inactive, so solutions agree to solver tolerance)."""
    param = Param(world_z_min=0.0, solver_dtype="float64", grid_xy_res=0.5,
                  grid_z_res=0.5, sequential=True, batch_size=2,
                  batch_iter=-1, iteration=2, time_scale=False)
    mission = swap_mission(4, z=1.0, span=3.0, radius=0.15)
    kw = dict(n_scenarios=3, seed0=100,
              forest_kwargs=dict(obs_num=3, h_min=1.0, h_max=2.0))
    ref = run_monte_carlo(mission, param, **kw)
    pipe = run_monte_carlo(mission, param, pipeline=2, **kw)
    n_checked = 0
    for a, b in zip(ref, pipe):
        if a.error is not None or b.error is not None:
            assert a.error == b.error
            continue
        assert b.plan.solver_info["mode"] == "scenario-pipelined-device"
        assert np.allclose(a.plan.coef, b.plan.coef, atol=1e-6), \
            np.abs(a.plan.coef - b.plan.coef).max()
        n_checked += 1
    assert n_checked >= 2


def test_monte_carlo_batched_scenarios():
    param = Param(world_z_min=0.0, solver_dtype="float64", grid_xy_res=0.5,
                  grid_z_res=0.5, sequential=True, batch_size=2,
                  batch_iter=-1, iteration=2, time_scale=False)
    mission = swap_mission(4, z=1.0, span=3.0, radius=0.15)
    scenarios = run_monte_carlo(
        mission, param, n_scenarios=4, seed0=100,
        forest_kwargs=dict(obs_num=3, h_min=1.0, h_max=2.0))

    n_ok = 0
    for sc in scenarios:
        if sc.error is not None:
            continue
        plan = sc.plan
        assert plan.coef is not None
        ts = sample_times(plan.T, 0.2)
        pos = np.asarray(sample_trajectories(
            jnp.asarray(plan.coef), jnp.asarray(np.asarray(plan.T)),
            jnp.asarray(ts), n=param.n, derivatives=1))[:, :, 0]
        ratio = float(safety_margin_ratio(
            jnp.asarray(pos), jnp.asarray(mission.radius),
            downwash=param.downwash))
        if ratio >= 1.0 - 1e-3:
            n_ok += 1
    assert n_ok >= 3, f"only {n_ok}/4 scenarios collision-free"


def test_m_bucket_quantization_preserves_safety():
    """pad_plan_segments: hold-at-goal extension to the M bucket keeps
    every dense form consistent and the padded solve collision-free
    with the goal held over the extra segments."""
    import swarm_simulator_tpu as sst
    from swarm_simulator_tpu.parallel.scenarios import (pad_plan_segments,
                                                        quantize_M)
    from swarm_simulator_tpu.world.forest import generate_forest

    assert quantize_M(33) == 40 and quantize_M(40) == 40

    param = Param(world_z_min=0.0, solver_dtype="float64", grid_xy_res=0.5,
                  grid_z_res=0.5, sequential=True, batch_size=2,
                  batch_iter=-1, time_scale=False)
    mission = swap_mission(4, z=1.0, span=3.0, radius=0.15)
    world = generate_forest(mission, world_min=param.world_min,
                            world_max=param.world_max, obs_num=3,
                            h_min=1.0, h_max=2.0, margin=0.5, seed=7)
    from swarm_simulator_tpu.corridor.times import build_corridors
    from swarm_simulator_tpu.search.planner import plan_initial_trajectories
    from swarm_simulator_tpu.world.esdf import ESDF

    esdf = ESDF(world, max_dist=param.esdf_max_dist)
    plan = plan_initial_trajectories(esdf, mission, param)
    build_corridors(esdf, plan, mission.radius, param)
    M0 = plan.M
    Mq = quantize_M(M0 + 1)          # force actual padding
    pad_plan_segments(plan, Mq)
    assert plan.M == Mq
    assert plan.init_traj.shape[1] == Mq + 1
    assert plan.seg_boxes.shape[1] == Mq
    assert plan.pair_normals.shape[1] == Mq
    dt = np.diff(plan.T)
    assert np.allclose(dt, dt[0])    # uniform grid preserved

    # the padded plan still solves collision-free with the goal held
    from swarm_simulator_tpu.parallel import seqbatch
    result = seqbatch.solve_trajectories(plan, mission, param)
    ts = sample_times(np.asarray(result.T), 0.1)
    pos = np.asarray(sample_trajectories(
        jnp.asarray(result.coef), jnp.asarray(np.asarray(result.T)),
        jnp.asarray(ts), n=param.n, derivatives=1))[:, :, 0]
    ratio = float(safety_margin_ratio(
        jnp.asarray(pos), jnp.asarray(mission.radius),
        downwash=param.downwash))
    assert ratio >= 1.0, ratio
    # near goal over the padded tail: only the FINAL knot is pinned
    # (exactly like the reference's makespan+3 padding,
    # ecbs_planner.hpp:49-70), so jerk smoothing may drift a few cm
    # inside the last SFC box before settling
    tail = pos[:, ts >= plan.T[M0]]
    goal = np.asarray(mission.goal[:, :3])
    assert np.abs(tail - goal[:, None]).max() < 0.15
    assert np.abs(pos[:, -1] - goal).max() < 1e-4
