"""Pallas TPU kernel: the whole ADMM solve loop resident in VMEM.

The measured bottlenecks of the XLA-op formulation on this backend are
per-op dispatch overhead (~tiny ops dominate the CG mode) and HBM traffic
(every iteration re-reads constraint tensors).  One batch QP's entire
working set — structured KKT operator, constraint data, iterate state —
is ~12 MB, which fits in VMEM.  This kernel runs the full iteration loop
on-core: grid = one program per problem, every ref in VMEM, zero HBM
round-trips between iterations.

Scope (v1): cg-mode KKT (shared base + pointwise coupling), fixed rho,
fixed iteration count (no data-dependent early exit), q = 0.  Validated
against qp/admm._iterate in tests (interpret mode on CPU, compiled on
TPU).

Layouts follow the tiling rules from ARCHITECTURE.md: the 128-aligned
D axis is last everywhere; pair normals are pre-expanded to [3P, D].
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..qp import admm
from ..qp.assemble import BIG, QPData


def _body(base, base_inv, coupling, aeq, S3, R, n_d, lb, ub, deq, pair_l,
          x0, *, B, M, npp, Re, P, rho, rho_eq, sigma, alpha,
          iters, cg_iters):
    # Mosaic constraint: no reshapes that touch the lane (last) dim inside
    # the kernel -> every regrouping is a host-built selection matmul:
    #   S3 = S (x) I_3   [3P, B3]  expands agent selection per axis
    #   R  = I_P (x) 1^T [P, 3P]   sums axis groups
    D = M * npp
    B3 = 3 * B
    f32 = jnp.float32
    big = f32(BIG)

    hi = jax.lax.Precision.HIGHEST
    bf = jnp.bfloat16

    def _split3(a):
        # top-16-bit mask: the split parts land exactly on the bf16 grid,
        # so later casts are value-preserving and the compiler cannot
        # collapse the split (plain bf16 round-trips are elided under
        # --xla_allow_excess_precision, which silently degraded the
        # arithmetic back to single-pass bf16)
        u32 = jnp.uint32
        mask = u32(0xFFFF0000)
        ua = jax.lax.bitcast_convert_type(a, u32)
        a0 = jax.lax.bitcast_convert_type(ua & mask, f32)
        r = a - a0
        ur = jax.lax.bitcast_convert_type(r, u32)
        a1 = jax.lax.bitcast_convert_type(ur & mask, f32)
        a2 = r - a1
        return a0.astype(bf), a1.astype(bf), a2.astype(bf)

    def _dg(a, b, dns):
        # Mosaic feeds the MXU bf16 regardless of the precision request
        # (measured: 1.7e-2 error after ONE iteration).  A 3-way bf16
        # split (~8+8+8 mantissa bits) with the 6 significant cross terms
        # recovers f32-class accuracy — the classic f32-via-bf16 scheme.
        a0, a1, a2 = _split3(a)
        b0, b1, b2 = _split3(b)
        d = lambda u, v: jax.lax.dot_general(
            u, v, dns, preferred_element_type=f32)
        return (d(a0, b0)
                + (d(a0, b1) + d(a1, b0))
                + (d(a0, b2) + d(a1, b1) + d(a2, b0)))

    def mm(a, b):  # [m, k] @ [k, n]
        return _dg(a, b, (((1,), (0,)), ((), ())))

    def A_mv(x):  # x [B3, D] -> (eq [B3, Re], box, pair [P, D])
        eq = _dg(x, aeq, (((1,), (1,)), ((), ())))
        xs = mm(S3, x)            # [3P, D]
        pair = mm(R, n_d * xs)    # [P, D]
        return eq, x, pair

    def AT_mv(y_eq, y_box, y_pair):  # -> [B3, D]
        out = _dg(y_eq, aeq, (((1,), (0,)), ((), ())))
        out = out + y_box
        contrib = n_d * _dg(R, y_pair, (((0,), (0,)), ((), ())))
        out = out + _dg(S3, contrib, (((0,), (0,)), ((), ())))
        return out

    def K_mv(x):  # structured KKT matvec
        out = _dg(x, base, (((1,), (1,)), ((), ())))
        # out[i, d] += sum_j coupling[(j, i), d] * x[j, d]
        # contiguous static row blocks (j-major host layout) — strided
        # slices lower to gathers, which Mosaic rejects
        for j in range(B3):
            cj = coupling[j * B3:(j + 1) * B3, :]  # block j: [B3(i), D]
            out = out + cj * x[j:j + 1, :]
        return out

    def precond(r):
        return _dg(r, base_inv, (((1,), (1,)), ((), ())))

    eyeB3 = jax.lax.broadcasted_iota(jnp.int32, (B3, B3), 0) == \
        jax.lax.broadcasted_iota(jnp.int32, (B3, B3), 1)
    eyeB3 = eyeB3.astype(f32)

    def dot(a, b):
        # CG's scalar dots steer the search directions; Mosaic's plain
        # jnp.sum reduction over the 2.6k elements injects ~50x the noise
        # of the CPU's pairwise sums (measured as a 1.3e-2 convergence
        # plateau).  Contract via the split-precision MXU path instead and
        # trace the tiny [B3, B3] result.
        tmp = _dg(a, b, (((1,), (1,)), ((), ())))  # [B3, B3]
        return jnp.sum(tmp * eyeB3)

    def cg_solve(rhs, x0):
        x = x0
        r = rhs - K_mv(x)
        z = precond(r)
        p = z
        rz = dot(r, z)

        def body2(_, carry):
            x, r, p, rz = carry
            Kp = K_mv(p)
            denom = dot(p, Kp)
            al = rz / jnp.where(denom != 0, denom, 1.0)
            x = x + al * p
            r = r - al * Kp
            z = precond(r)
            rz_new = dot(r, z)
            be = rz_new / jnp.where(rz != 0, rz, 1.0)
            p = z + be * p
            return x, r, p, rz_new

        x, r, p, rz = jax.lax.fori_loop(0, cg_iters, body2, (x, r, p, rz))
        return x

    x = x0
    eq0, box0, pair0 = A_mv(x)
    z_eq = deq
    z_box = jnp.clip(box0, lb, ub)
    z_pair = jnp.clip(pair0, pair_l, big)
    y_eq = jnp.zeros_like(z_eq)
    y_box = jnp.zeros_like(z_box)
    y_pair = jnp.zeros_like(z_pair)

    rho_f = f32(rho)
    rho_e = f32(rho_eq)
    sig = f32(sigma)
    al = f32(alpha)

    def admm_body(_, carry):
        x, z_eq, z_box, z_pair, y_eq, y_box, y_pair, x_t = carry
        rhs = sig * x + AT_mv(rho_e * z_eq - y_eq, rho_f * z_box - y_box,
                              rho_f * z_pair - y_pair)
        x_t = cg_solve(rhs, x_t)
        aeq_t, abox_t, apair_t = A_mv(x_t)
        x_new = al * x_t + (1 - al) * x
        v_eq = al * aeq_t + (1 - al) * z_eq + y_eq / rho_e
        v_box = al * abox_t + (1 - al) * z_box + y_box / rho_f
        v_pair = al * apair_t + (1 - al) * z_pair + y_pair / rho_f
        z_eq_n = deq  # clip(v, deq, deq)
        z_box_n = jnp.clip(v_box, lb, ub)
        z_pair_n = jnp.clip(v_pair, pair_l, big)
        y_eq = rho_e * (v_eq - z_eq_n)
        y_box = rho_f * (v_box - z_box_n)
        y_pair = rho_f * (v_pair - z_pair_n)
        return x_new, z_eq_n, z_box_n, z_pair_n, y_eq, y_box, y_pair, x_t

    carry = (x, z_eq, z_box, z_pair, y_eq, y_box, y_pair, x)
    carry = jax.lax.fori_loop(0, iters, admm_body, carry)
    return carry[0]


def _kernel(base_ref, base_inv_ref, coupling_ref, aeq_ref, s3_ref, r_ref,
            nd_ref, lb_ref, ub_ref, deq_ref, pair_l_ref, x0_ref,
            x_out_ref, **kw):
    x_out_ref[:] = _body(
        base_ref[:], base_inv_ref[:], coupling_ref[:], aeq_ref[:],
        s3_ref[:], r_ref[:], nd_ref[:], lb_ref[:], ub_ref[:], deq_ref[:],
        pair_l_ref[:], x0_ref[:], **kw)


def _kernel_grid(base_ref, base_inv_ref, coupling_ref, aeq_ref, s3_ref,
                 r_ref, nd_ref, lb_ref, ub_ref, deq_ref, pair_l_ref,
                 x0_ref, x_out_ref, **kw):
    # blocks carry a leading problem axis of size 1
    x_out_ref[0] = _body(
        base_ref[0], base_inv_ref[0], coupling_ref[0], aeq_ref[0],
        s3_ref[0], r_ref[0], nd_ref[0], lb_ref[0], ub_ref[0], deq_ref[0],
        pair_l_ref[0], x0_ref[0], **kw)


@dataclass(frozen=True)
class PallasADMMSettings:
    rho: float = 0.1
    rho_eq_scale: float = 1e3
    sigma: float = 1e-6
    alpha: float = 1.6
    iters: int = 500
    cg_iters: int = 12


def _prep_args(data: QPData, s: "PallasADMMSettings"):
    """Equilibrate + build the kernel operand tuple for one problem.
    Returns (args tuple, unscale vector d).

    Must run under matmul precision "highest": the host-side prep
    (Aeq^T Aeq, the preconditioner inverse) otherwise executes in the
    TPU's default bf16 passes, handing the (exact) kernel a perturbed
    KKT system — measured as a 1.7e-2 error after ONE kernel iteration
    while every in-kernel op agreed bit-for-bit."""
    from ..qp.scaling import equilibrate

    adm = admm.ADMMSettings(rho=s.rho, rho_eq_scale=s.rho_eq_scale,
                            sigma=s.sigma, alpha=s.alpha,
                            kkt_solver="cg", cg_iters=s.cg_iters,
                            scaling=True)
    sdata, scal = equilibrate(data)
    op = admm.build_kkt_operator(sdata, adm)
    pop = admm._pair_op(sdata)

    B, K3, D = sdata.lb.shape
    M, npp, _ = sdata.Qseg.shape
    Re = sdata.Aeq.shape[0]
    P = sdata.pair_n.shape[0]
    B3 = 3 * B

    base = op.base0 + jnp.float32(s.rho) * op.base1
    base_inv = jnp.linalg.inv(base)
    # rho applied here (the op stores coupling unscaled)
    coupling_d = jnp.repeat(jnp.float32(s.rho) * op.coupling, npp,
                            axis=0)  # [D, B3, B3]

    f32 = jnp.float32
    args = (
        base.astype(f32),
        base_inv.astype(f32),
        # j-major rows: block j holds coupling[:, i, j] for all i
        coupling_d.transpose(2, 1, 0).reshape(B3 * B3, D).astype(f32),
        sdata.Aeq.astype(f32),
        jnp.kron(pop.S.astype(f32), jnp.eye(3, dtype=f32)),  # S3 [3P, B3]
        jnp.kron(jnp.eye(P, dtype=f32),
                 jnp.ones((1, 3), f32)),  # R [P, 3P]
        pop.n_d.reshape(3 * P, D).astype(f32),
        sdata.lb.reshape(B3, D).astype(f32),
        sdata.ub.reshape(B3, D).astype(f32),
        sdata.deq.reshape(B3, Re).astype(f32),
        sdata.pair_rhs.astype(f32),
        sdata.x0.reshape(B3, D).astype(f32),
    )
    dims = dict(B=B, M=M, npp=npp, Re=Re, P=P)
    return args, scal.d, dims


def solve_admm_pallas(data: QPData, settings: "PallasADMMSettings",
                      interpret: bool = False) -> jnp.ndarray:
    """Solve one (equilibrated) batch QP entirely in one Pallas kernel.

    Equilibration and the structured-operator build run as normal XLA ops
    (one-time); the iteration loop is the kernel. Returns x [B, 3, D]
    (unscaled).
    """
    s = settings
    with jax.default_matmul_precision("highest"):
        args, d_vec, dims = _prep_args(data, s)
    B = dims["B"]
    D = dims["M"] * dims["npp"]
    B3 = 3 * B

    kernel = functools.partial(
        _kernel, rho=s.rho, rho_eq=s.rho * s.rho_eq_scale, sigma=s.sigma,
        alpha=s.alpha, iters=s.iters, cg_iters=s.cg_iters, **dims)

    x = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B3, D), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)

    x = x.reshape(B, 3, D)
    return (x * d_vec).astype(data.lb.dtype)


def solve_admm_pallas_batched(data: QPData, settings: "PallasADMMSettings",
                              interpret: bool = False) -> jnp.ndarray:
    """Solve a stack of batch QPs (leading axis L) in ONE kernel launch.

    grid = (L,): the TPU core steps through the problems with every
    problem's working set resident in VMEM — one dispatch for a whole
    Jacobi round of agent batches (per-dispatch overhead on remote
    backends is seconds). Returns x [L, B, 3, D] (unscaled).
    """
    s = settings
    with jax.default_matmul_precision("highest"):
        prep = jax.vmap(lambda d: _prep_args(d, s)[:2])(data)
    args, d_vecs = prep
    dims_probe = _prep_args(jax.tree.map(lambda a: a[0], data), s)[2]
    L = args[0].shape[0]
    B = dims_probe["B"]
    D = dims_probe["M"] * dims_probe["npp"]
    B3 = 3 * B

    kernel = functools.partial(
        _kernel_grid, rho=s.rho, rho_eq=s.rho * s.rho_eq_scale,
        sigma=s.sigma, alpha=s.alpha, iters=s.iters, cg_iters=s.cg_iters,
        **dims_probe)

    def spec(a):
        blk = (1,) + a.shape[1:]
        nd = a.ndim
        return pl.BlockSpec(blk, lambda l, _nd=nd: (l,) + (0,) * (_nd - 1),
                            memory_space=pltpu.VMEM)

    x = pl.pallas_call(
        kernel,
        grid=(L,),
        out_shape=jax.ShapeDtypeStruct((L, B3, D), jnp.float32),
        in_specs=[spec(a) for a in args],
        out_specs=pl.BlockSpec((1, B3, D), lambda l: (l, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*args)

    x = x.reshape(L, B, 3, D)
    return (x * d_vecs[:, None, None, :]).astype(data.lb.dtype)
