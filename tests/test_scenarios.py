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
