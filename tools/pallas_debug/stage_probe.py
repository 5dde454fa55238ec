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
with jax.default_matmul_precision("highest"):
    args, d_vec, dims = pa._prep_args(data, st)
args = jax.tree.map(np.asarray, args)  # freeze prep on host (identical inputs)
B, M, npp, Re, P = (dims[k] for k in ("B","M","npp","Re","P"))
D, B3 = M*npp, 3*B

def stage_kernel(base_ref, base_inv_ref, coupling_ref, aeq_ref, s3_ref, r_ref,
                 nd_ref, lb_ref, ub_ref, deq_ref, pair_l_ref, x0_ref,
                 o_rhs_ref, o_xt_ref):
    f32 = jnp.float32
    bf = jnp.bfloat16
    base, base_inv, coupling = base_ref[:], base_inv_ref[:], coupling_ref[:]
    aeq, S3, R, n_d = aeq_ref[:], s3_ref[:], r_ref[:], nd_ref[:]
    lb, ub, deq, pair_l, x0 = (lb_ref[:], ub_ref[:], deq_ref[:],
                               pair_l_ref[:], x0_ref[:])
    big = f32(1e8)
    def _split3(a):
        u32 = jnp.uint32; mask = u32(0xFFFF0000)
        ua = jax.lax.bitcast_convert_type(a, u32)
        a0 = jax.lax.bitcast_convert_type(ua & mask, f32)
        r_ = a - a0
        ur = jax.lax.bitcast_convert_type(r_, u32)
        a1 = jax.lax.bitcast_convert_type(ur & mask, f32)
        a2 = r_ - a1
        return a0.astype(bf), a1.astype(bf), a2.astype(bf)
    def _dg(a, b, dns):
        a0,a1,a2 = _split3(a); b0,b1,b2 = _split3(b)
        d = lambda u,v: jax.lax.dot_general(u,v,dns,preferred_element_type=f32)
        return d(a0,b0) + (d(a0,b1)+d(a1,b0)) + (d(a0,b2)+d(a1,b1)+d(a2,b0))
    mm = lambda a,b: _dg(a,b,(((1,),(0,)),((),())))
    def A_mv(x):
        eq = _dg(x, aeq, (((1,),(1,)),((),())))
        xs = mm(S3, x); pair = mm(R, n_d*xs)
        return eq, x, pair
    def AT_mv(y_eq, y_box, y_pair):
        out = _dg(y_eq, aeq, (((1,),(0,)),((),())))
        out = out + y_box
        contrib = n_d * _dg(R, y_pair, (((0,),(0,)),((),())))
        return out + _dg(S3, contrib, (((0,),(0,)),((),())))
    def K_mv(x):
        out = _dg(x, base, (((1,),(1,)),((),())))
        for j in range(B3):
            out = out + coupling[j*B3:(j+1)*B3,:] * x[j:j+1,:]
        return out
    precond = lambda r: _dg(r, base_inv, (((1,),(1,)),((),())))
    # iteration-1 pieces
    eq0, box0, pair0 = A_mv(x0)
    z_eq = deq; z_box = jnp.clip(box0, lb, ub); z_pair = jnp.clip(pair0, pair_l, big)
    rho_f, rho_e, sig = f32(0.1), f32(100.0), f32(1e-6)
    rhs = sig*x0 + AT_mv(rho_e*z_eq, rho_f*z_box, rho_f*z_pair)
    o_rhs_ref[:] = rhs
    # CG 12 iters
    x = x0; r = rhs - K_mv(x); z = precond(r); p = z
    rz = jnp.sum(r*z)
    def body(_, c):
        x,r,p,rz = c
        Kp = K_mv(p); den = jnp.sum(p*Kp)
        al = rz / jnp.where(den != 0, den, 1.0)
        x = x + al*p; r = r - al*Kp; z = precond(r)
        rzn = jnp.sum(r*z); be = rzn / jnp.where(rz != 0, rz, 1.0)
        return x, r, z + be*p, rzn
    x, r, p, rz = jax.lax.fori_loop(0, 12, body, (x,r,p,rz))
    o_xt_ref[:] = x

outs = (jax.ShapeDtypeStruct((B3, D), jnp.float32),
        jax.ShapeDtypeStruct((B3, D), jnp.float32))
call = pl.pallas_call(
    stage_kernel, out_shape=outs,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*len(args),
    out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in outs),
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64*1024*1024))
rhs_t, xt_t = jax.tree.map(np.asarray, call(*tuple(map(jnp.asarray, args))))

# CPU truth with the same frozen args
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    cargs = [jnp.asarray(a) for a in args]
    r2, x2 = jax.tree.map(np.asarray, pl.pallas_call(
        stage_kernel, out_shape=outs,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*len(args),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in outs),
        interpret=True)(*cargs))
print("rhs: tpu vs cpu:", np.max(np.abs(rhs_t - r2)), "scale", np.max(np.abs(r2)), flush=True)
print("x_t: tpu vs cpu:", np.max(np.abs(xt_t - x2)), "scale", np.max(np.abs(x2)), flush=True)
