import functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import swarm_simulator_tpu as sst
from swarm_simulator_tpu.io.mission_json import perimeter_swap_mission
from swarm_simulator_tpu.search.planner import plan_initial_trajectories
from swarm_simulator_tpu.corridor.times import build_corridors
from swarm_simulator_tpu.world.esdf import ESDF
from swarm_simulator_tpu.world.voxel import OccupancyGrid
from swarm_simulator_tpu.parallel import seqbatch
from swarm_simulator_tpu.qp import admm, assemble, convert
from swarm_simulator_tpu.ops import pallas_admm as pa
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
st = pa.PallasADMMSettings(iters=500)
cpu0 = jax.devices("cpu")[0]
with jax.default_device(cpu0):
    with jax.default_matmul_precision("highest"):
        data_cpu = jax.tree.map(lambda a: jax.device_put(a, cpu0), data)
        args, d_vec, dims = pa._prep_args(data_cpu, st)
args = jax.tree.map(np.asarray, args)
d_vec = np.asarray(d_vec)
B, D = dims["B"], dims["M"]*dims["npp"]
B3 = 3*B

kernel = functools.partial(
    pa._kernel, rho=st.rho, rho_eq=st.rho*st.rho_eq_scale, sigma=st.sigma,
    alpha=st.alpha, iters=st.iters, cg_iters=st.cg_iters, **dims)

import contextlib
def run(interpret, dev=None):
    ctx = jax.default_device(dev) if dev else contextlib.nullcontext()
    with ctx:
        cargs = [jnp.asarray(a) for a in args]
        x = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((B3, D), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*len(args),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=64*1024*1024),
            interpret=interpret)(*cargs)
        return np.asarray(x)

def cont(xb):
    x = (xb.reshape(B, 3, D) * d_vec)
    c = convert.ctrl_to_coef(convert.x_to_ctrl(x, plan.M, param.n),
                             plan.T, param.n)
    return knot_continuity_error(c, plan.T, param.n, param.phi)

x_tpu = run(False)
print("TPU real kernel @500 CPU-prepped args: continuity", cont(x_tpu), flush=True)

