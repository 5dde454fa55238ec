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
from swarm_simulator_tpu.qp import admm, assemble
from swarm_simulator_tpu.ops import pallas_admm as pa

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

st = pa.PallasADMMSettings(iters=1)
args, d_vec, dims = pa._prep_args(data, st)
B, M, npp, Re, P = dims["B"], dims["M"], dims["npp"], dims["Re"], dims["P"]
D, B3 = M * npp, 3 * B

def dbg_kernel(base_ref, base_inv_ref, coupling_ref, aeq_ref, s3_ref, r_ref,
               nd_ref, lb_ref, ub_ref, deq_ref, pair_l_ref, x0_ref,
               o_pair_ref, o_eq_ref, o_at_ref, o_k_ref, o_pc_ref):
    kw = dict(B=B, M=M, npp=npp, Re=Re, P=P, rho=st.rho,
              rho_eq=st.rho * st.rho_eq_scale, sigma=st.sigma,
              alpha=st.alpha, iters=0, cg_iters=0)
    # reimplement pieces inline (same as _body internals)
    f32 = jnp.float32
    bf = jnp.bfloat16
    base = base_ref[:]; base_inv = base_inv_ref[:]; coupling = coupling_ref[:]
    aeq = aeq_ref[:]; S3 = s3_ref[:]; R = r_ref[:]; n_d = nd_ref[:]
    x0 = x0_ref[:]
    def _split3(a):
        u32 = jnp.uint32
        mask = u32(0xFFFF0000)
        ua = jax.lax.bitcast_convert_type(a, u32)
        a0 = jax.lax.bitcast_convert_type(ua & mask, f32)
        r_ = a - a0
        ur = jax.lax.bitcast_convert_type(r_, u32)
        a1 = jax.lax.bitcast_convert_type(ur & mask, f32)
        a2 = r_ - a1
        return a0.astype(bf), a1.astype(bf), a2.astype(bf)
    def _dg(a, b, dns):
        a0, a1, a2 = _split3(a)
        b0, b1, b2 = _split3(b)
        d = lambda u, v: jax.lax.dot_general(u, v, dns,
                                             preferred_element_type=f32)
        return (d(a0,b0) + (d(a0,b1)+d(a1,b0)) + (d(a0,b2)+d(a1,b1)+d(a2,b0)))
    mm = lambda a, b: _dg(a, b, (((1,), (0,)), ((), ())))
    xs = mm(S3, x0)
    o_pair_ref[:] = mm(R, n_d * xs)
    o_eq_ref[:] = _dg(x0, aeq, (((1,), (1,)), ((), ())))
    yp = jnp.ones((P, D), f32)
    contrib = n_d * _dg(R, yp, (((0,), (0,)), ((), ())))
    o_at_ref[:] = _dg(S3, contrib, (((0,), (0,)), ((), ())))
    out = _dg(x0, base, (((1,), (1,)), ((), ())))
    for j in range(B3):
        cj = coupling[j * B3:(j + 1) * B3, :]
        out = out + cj * x0[j:j + 1, :]
    o_k_ref[:] = out
    o_pc_ref[:] = _dg(x0, base_inv, (((1,), (1,)), ((), ())))

outs = [jax.ShapeDtypeStruct((P, D), jnp.float32),
        jax.ShapeDtypeStruct((B3, Re), jnp.float32),
        jax.ShapeDtypeStruct((B3, D), jnp.float32),
        jax.ShapeDtypeStruct((B3, D), jnp.float32),
        jax.ShapeDtypeStruct((B3, D), jnp.float32)]
call = pl.pallas_call(
    dbg_kernel, out_shape=tuple(outs),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
    out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in outs),
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64*1024*1024))
o_tpu = call(*args)
o_int = pl.pallas_call(
    dbg_kernel, out_shape=tuple(outs),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
    out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in outs),
    interpret=True)(*args)
names = ["A_pair", "A_eq", "AT_pair", "K_mv", "precond"]
for n, a, b in zip(names, o_tpu, o_int):
    print(n, "max diff:", float(jnp.max(jnp.abs(a - b))),
          " scale:", float(jnp.max(jnp.abs(b))), flush=True)
