import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
import swarm_simulator_tpu as sst
from swarm_simulator_tpu.io.mission_json import perimeter_swap_mission
from swarm_simulator_tpu.search.planner import plan_initial_trajectories
from swarm_simulator_tpu.corridor.times import build_corridors
from swarm_simulator_tpu.world.esdf import ESDF
from swarm_simulator_tpu.world.voxel import OccupancyGrid
from swarm_simulator_tpu.parallel import seqbatch
from swarm_simulator_tpu.qp import admm, assemble, convert
from swarm_simulator_tpu.ops.pallas_admm import PallasADMMSettings, solve_admm_pallas
from swarm_simulator_tpu.eval.safety import knot_continuity_error

param = sst.Param(world_z_min=0.3, grid_xy_res=0.5, grid_z_res=1.0,
                  sequential=True, batch_size=4, batch_iter=-1,
                  solver_dtype="float32")
mission = perimeter_swap_mission(64)
world = OccupancyGrid.empty(param.world_min, param.world_max, 0.1)
esdf = ESDF(world)
plan = plan_initial_trajectories(esdf, mission, param)
build_corridors(esdf, plan, mission.radius, param)
batches, _ = seqbatch.make_batches(64, param)
dummy = assemble.build_dummy(plan.init_traj, param.n)
data = assemble.assemble_batch(plan, mission, param, batches[0], dummy, 300)
x = solve_admm_pallas(data, PallasADMMSettings(iters=500), interpret=True)
c = convert.ctrl_to_coef(convert.x_to_ctrl(np.asarray(x), plan.M, param.n),
                         plan.T, param.n)
print("interpret-CPU pallas @500 iters, batch0 continuity:",
      knot_continuity_error(c, plan.T, param.n, param.phi), flush=True)
