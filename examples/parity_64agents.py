import time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import swarm_simulator_tpu as sst
from swarm_simulator_tpu.io.mission_json import load_mission
from swarm_simulator_tpu.io.coef_csv import read_coef_csv
from swarm_simulator_tpu.world.btree import load_bt_world
from swarm_simulator_tpu.eval.sample import sample_trajectories, sample_times
from swarm_simulator_tpu.eval.safety import safety_margin_ratio, flight_distance

REF = "/root/reference/swarm_planner"
mission = load_mission(f"{REF}/missions/mission_64agents_15.json")

# golden metrics
coefs, dur = [], None
for qi in range(64):
    c, dur = read_coef_csv(f"{REF}/log/coef{qi+1}.csv")
    coefs.append(c)
coef_g = np.stack(coefs)
T_g = np.concatenate([[0.0], np.cumsum(dur)])
ts = sample_times(T_g, 0.1)
st_g = np.asarray(sample_trajectories(jnp.asarray(coef_g), jnp.asarray(T_g),
                                      jnp.asarray(ts), n=7))
ratio_g = float(safety_margin_ratio(jnp.asarray(st_g[:, :, 0]),
                                    jnp.asarray(mission.radius), downwash=2.0))
dist_g = float(flight_distance(jnp.asarray(st_g[:, :, 0])))
print(f"GOLDEN : M={len(T_g)-1} makespan={T_g[-1]:.1f} ratio={ratio_g:.4f} "
      f"flight_dist={dist_g:.1f}")

# ours on the same mission + world (canonical launch knobs)
param = sst.Param(world_z_min=0.3, grid_xy_res=0.5, grid_z_res=1.0,
                  sequential=True, batch_size=4, batch_iter=-1,
                  solver_dtype="float64")
from swarm_simulator_tpu.world.forest import generate_forest
# the golden run's forest was unseeded and not committed (SURVEY §4);
# regenerate with the canonical launch knobs + a fixed seed
world = generate_forest(mission, world_min=param.world_min,
                        world_max=param.world_max, obs_num=20,
                        r_min=0.3, r_max=0.3, h_min=0.0, h_max=2.5,
                        margin=0.5, seed=11)
t0 = time.perf_counter()
result, times = sst.plan(mission, param, world)
m = sst.evaluate(result, mission, param)
print(f"OURS   : M={result.M} makespan={result.T[-1]:.1f} "
      f"ratio={m['min_safety_ratio']:.4f} flight_dist={m['flight_distance']:.1f}")
print(f"  stage: esdf={times.esdf:.2f} search={times.init_traj:.2f} "
      f"corridor={times.corridor:.2f} qp={times.qp:.2f} (cpu f64)")
print(f"  continuity={m['knot_continuity_err']:.2e} goal_err={m['goal_err']:.2e} "
      f"dyn={m['dynamic_violation']:.3f} time_scale={times.extra.get('time_scale')}")
