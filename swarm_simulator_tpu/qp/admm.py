"""Batched OSQP-style ADMM solver for the Bernstein trajectory QP.

Replaces the reference's per-batch CPLEX solves (solveQP,
rbp_planner.hpp:111-206) — the 95%+ runtime hot spot — with a first-order
operator-splitting method whose every step is a fused XLA computation:

  x+ = K^-1 (sigma x - q + A^T (rho.z - y))        (dense MXU matmul)
  z+ = clip(alpha Ax+ + (1-alpha) z + y/rho, l, u) (VPU)
  y+ = y + rho (alpha Ax+ + (1-alpha) z - z+)      (VPU)

where K = P + sigma I + A^T diag(rho) A is formed once per problem from the
structured blocks and inverted with a single Cholesky — O((3*B*M*(n+1))^3)
FLOPs that the MXU eats for breakfast — after which every ADMM iteration is
one dense matmul plus elementwise work.  A and A^T are never materialized:
they are einsums over the equality/box/pair blocks (see qp/assemble.py).

The solver is pure-functional and vmap/pjit-compatible: extra leading axes
on QPData batch whole problems (scenarios, Jacobi agent-batches).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .assemble import BIG, QPData


@dataclass(frozen=True)
class ADMMSettings:
    rho: float = 0.1
    rho_eq_scale: float = 1e3  # equality rows get rho * this (OSQP-style)
    sigma: float = 1e-6
    alpha: float = 1.6
    max_iter: int = 2000
    eps_abs: float = 1e-4
    eps_rel: float = 1e-4
    scaling: bool = True  # Ruiz equilibration (required for float32)


class Constr(NamedTuple):
    """A value per constraint row, grouped by block."""
    eq: jnp.ndarray  # [B, 3, Re]
    box: jnp.ndarray  # [B, 3, D]
    pair: jnp.ndarray  # [P, D]


class SolveInfo(NamedTuple):
    iters: jnp.ndarray
    r_prim: jnp.ndarray
    r_dual: jnp.ndarray
    obj: jnp.ndarray


def _pair_nd(data: QPData) -> jnp.ndarray:
    """[P, 3, D] dense per-control-point normals (n repeated n+1 times)."""
    P, M, _ = data.pair_n.shape
    npp = data.lb.shape[-1] // M
    n_d = jnp.repeat(data.pair_n, npp, axis=1)  # [P, D, 3]
    return n_d.transpose(0, 2, 1) * data.pair_mask[:, None, None]


def A_matvec(data: QPData, x: jnp.ndarray, n_d: jnp.ndarray) -> Constr:
    eq = jnp.einsum("rd,bkd->bkr", data.Aeq, x)
    cj = (data.pair_bj >= 0).astype(x.dtype)
    ci = (data.pair_bi >= 0).astype(x.dtype)
    xj = x[jnp.clip(data.pair_bj, 0, None)]  # [P, 3, D]
    xi = x[jnp.clip(data.pair_bi, 0, None)]
    diff = cj[:, None, None] * xj - ci[:, None, None] * xi
    pair = jnp.sum(n_d * diff, axis=1)  # [P, D]
    return Constr(eq=eq, box=x, pair=pair)


def AT_matvec(data: QPData, y: Constr, n_d: jnp.ndarray) -> jnp.ndarray:
    out = jnp.einsum("rd,bkr->bkd", data.Aeq, y.eq)
    out = out + y.box
    cj = (data.pair_bj >= 0).astype(out.dtype)
    ci = (data.pair_bi >= 0).astype(out.dtype)
    contrib = n_d * y.pair[:, None, :]  # [P, 3, D]
    out = out.at[jnp.clip(data.pair_bj, 0, None)].add(cj[:, None, None] * contrib)
    out = out.at[jnp.clip(data.pair_bi, 0, None)].add(-ci[:, None, None] * contrib)
    return out


def P_matvec(data: QPData, x: jnp.ndarray) -> jnp.ndarray:
    B, K, D = x.shape
    M, npp, _ = data.Qseg.shape
    xs = x.reshape(B, K, M, npp)
    return jnp.einsum("mij,bkmj->bkmi", data.Qseg, xs).reshape(B, K, D)


def _bounds(data: QPData) -> tuple[Constr, Constr]:
    big = jnp.asarray(BIG, data.lb.dtype)
    l = Constr(eq=data.deq, box=data.lb, pair=data.pair_rhs)
    u = Constr(eq=data.deq, box=data.ub,
               pair=jnp.full_like(data.pair_rhs, big))
    return l, u


def _rho_vec(data: QPData, s: ADMMSettings) -> Constr:
    dt = data.lb.dtype
    return Constr(
        eq=jnp.full_like(data.deq, s.rho * s.rho_eq_scale),
        box=jnp.full_like(data.lb, s.rho),
        pair=jnp.full_like(data.pair_rhs, s.rho),
    )


def build_kkt_inverse(data: QPData, s: ADMMSettings) -> jnp.ndarray:
    """K^-1 for K = P + sigma I + A^T diag(rho) A, exploiting structure."""
    M, npp, _ = data.Qseg.shape
    D = M * npp
    B = data.lb.shape[0]
    B3 = 3 * B
    dt = data.lb.dtype
    rho_eq = s.rho * s.rho_eq_scale

    # per-(agent,axis) base block [D, D]
    base = jnp.zeros((D, D), dtype=dt)
    seg_ids = jnp.arange(M)
    # blockdiag(Qseg)
    base = base.reshape(M, npp, M, npp).at[seg_ids, :, seg_ids, :].add(
        data.Qseg).reshape(D, D)
    base = base + (s.sigma + s.rho) * jnp.eye(D, dtype=dt)
    base = base + rho_eq * data.Aeq.T @ data.Aeq

    # pair coupling: for pair p, row d: value c_b n[p, m(d), k] on var (b,k,d)
    cj = (data.pair_bj >= 0).astype(dt) * data.pair_mask
    ci = (data.pair_bi >= 0).astype(dt) * data.pair_mask
    P = data.pair_n.shape[0]
    C = jnp.zeros((P, B), dtype=dt)
    C = C.at[jnp.arange(P), jnp.clip(data.pair_bj, 0, None)].add(cj)
    C = C.at[jnp.arange(P), jnp.clip(data.pair_bi, 0, None)].add(-ci)
    # coupling[m, (b,k), (b2,k2)] = rho * sum_p C[p,b] n[p,m,k] C[p,b2] n[p,m,k2]
    coupling = s.rho * jnp.einsum(
        "pb,pmk,pc,pml->mbkcl", C, data.pair_n, C, data.pair_n
    ).reshape(M, B3, B3)
    coupling_d = jnp.repeat(coupling, npp, axis=0)  # [D, B3, B3]

    K = jnp.einsum("ab,de->adbe", jnp.eye(B3, dtype=dt), base)  # [B3,D,B3,D]
    d_ids = jnp.arange(D)
    K = K.at[:, d_ids, :, d_ids].add(coupling_d)
    nx = B3 * D
    K = K.reshape(nx, nx)

    cho = jax.scipy.linalg.cho_factor(K)
    return jax.scipy.linalg.cho_solve(cho, jnp.eye(nx, dtype=dt))


def _prepare(data: QPData, s: ADMMSettings):
    """Per-problem setup: equilibration + the KKT inverse (the memory- and
    FLOP-heavy phase; batched callers run it in chunks via lax.map so the
    Cholesky/triangular-solve temporaries never exist for the whole stack
    at once)."""
    from .scaling import equilibrate

    if s.scaling:
        sdata, scal = equilibrate(data)
    else:
        sdata, scal = data, None
    Kinv = build_kkt_inverse(sdata, s)
    return sdata, scal, Kinv


def solve_single(data: QPData, s: ADMMSettings) -> tuple[jnp.ndarray, SolveInfo]:
    """Solve one QP. Use jax.vmap(solve_single, ...) for batches.

    Runs under matmul precision "highest": TPU lowers float32 matmuls to
    bfloat16 passes by default, which destroys ADMM convergence (the
    K^-1 @ rhs product needs full f32)."""
    with jax.default_matmul_precision("highest"):
        sdata, scal, Kinv = _prepare(data, s)
        return _iterate(data, sdata, scal, Kinv, s)


def _iterate(orig: QPData, data: QPData, scal, Kinv: jnp.ndarray,
             s: ADMMSettings) -> tuple[jnp.ndarray, SolveInfo]:
    B, K3, D = data.lb.shape
    shape = (B, K3, D)
    nx = B * K3 * D
    dt = data.lb.dtype

    n_d = _pair_nd(data)
    n_d_orig = _pair_nd(orig)
    l, u = _bounds(data)
    rho = _rho_vec(data, s)

    def unscale_x(xb):
        return xb * scal.d if scal is not None else xb

    def unscale_y(yb: Constr) -> Constr:
        if scal is None:
            return yb
        return Constr(eq=yb.eq * scal.e_eq / scal.c,
                      box=yb.box / (scal.d * scal.c),
                      pair=yb.pair * scal.pair_row / scal.c)

    def unscale_z(zb: Constr) -> Constr:
        if scal is None:
            return zb
        return Constr(eq=zb.eq / scal.e_eq,
                      box=zb.box * scal.d,
                      pair=zb.pair / scal.pair_row)

    tmap = jax.tree.map
    x = data.x0
    z = A_matvec(data, x, n_d)
    z = tmap(jnp.clip, z, l, u)
    y = tmap(jnp.zeros_like, z)

    eps_abs = jnp.asarray(s.eps_abs, dt)
    eps_rel = jnp.asarray(s.eps_rel, dt)
    alpha = jnp.asarray(s.alpha, dt)
    sigma = jnp.asarray(s.sigma, dt)

    def tmax(tree) -> jnp.ndarray:
        vals = [jnp.max(jnp.abs(v)) for v in tree if v.size > 0]
        return jnp.max(jnp.array(vals)) if vals else jnp.asarray(0.0, dt)

    def body(state):
        x, z, y, it, _ = state
        rhs = sigma * x + AT_matvec(
            data, tmap(lambda r, zz, yy: r * zz - yy, rho, z, y), n_d)
        x_t = (Kinv @ rhs.reshape(nx)).reshape(shape)
        ax_t = A_matvec(data, x_t, n_d)
        x_new = alpha * x_t + (1 - alpha) * x
        v = tmap(lambda a_, zz, yy, r: alpha * a_ + (1 - alpha) * zz + yy / r,
                 ax_t, z, y, rho)
        z_new = tmap(jnp.clip, v, l, u)
        y_new = tmap(lambda vv, zz, r: r * (vv - zz), v, z_new, rho)

        # termination on *unscaled* residuals (OSQP sec. 3.4 + 5.1)
        xu = unscale_x(x_new)
        yu = unscale_y(y_new)
        zu = unscale_z(z_new)
        ax = A_matvec(orig, xu, n_d_orig)
        px = P_matvec(orig, xu)
        aty = AT_matvec(orig, yu, n_d_orig)
        r_prim = tmax(tmap(lambda a_, zz: a_ - zz, ax, zu))
        r_dual = tmax([px + aty])
        eps_prim = eps_abs + eps_rel * jnp.maximum(tmax(ax), tmax(z_new))
        eps_dual = eps_abs + eps_rel * jnp.maximum(tmax([px]), tmax([aty]))
        done = (r_prim <= eps_prim) & (r_dual <= eps_dual)
        return x_new, z_new, y_new, it + 1, done

    def cond(state):
        _, _, _, it, done = state
        return (it < s.max_iter) & ~done

    state = (x, z, y, jnp.asarray(0), jnp.asarray(False))
    x, z, y, it, _ = jax.lax.while_loop(cond, body, state)

    # final unscaled residuals for reporting
    xu = unscale_x(x)
    yu = unscale_y(y)
    zu = unscale_z(z)
    ax = A_matvec(orig, xu, n_d_orig)
    r_prim = tmax(tmap(lambda a_, zz: a_ - zz, ax, zu))
    r_dual = tmax([P_matvec(orig, xu) + AT_matvec(orig, yu, n_d_orig)])

    obj = 0.5 * jnp.vdot(xu, P_matvec(orig, xu))
    return xu, SolveInfo(iters=it, r_prim=r_prim, r_dual=r_dual, obj=obj)


@partial(jax.jit, static_argnames=("settings",))
def solve_qp(data: QPData, settings: ADMMSettings = ADMMSettings()):
    return solve_single(data, settings)


@partial(jax.jit, static_argnames=("settings", "kkt_chunk"))
def solve_qp_batched(data: QPData, settings: ADMMSettings = ADMMSettings(),
                     kkt_chunk: int = 4):
    """Solve a stack of QPs: every QPData leaf has a leading batch axis.

    The KKT inverses are computed ``kkt_chunk`` problems at a time (the
    batched triangular solves behind cho_solve(K, I) allocate O(nx^2)
    panel temporaries *per problem* — fully vmapping them OOMs HBM at
    planner scale); the ADMM iterations then run fully batched.
    """
    with jax.default_matmul_precision("highest"):
        prep = jax.lax.map(lambda d: _prepare(d, settings), data,
                           batch_size=kkt_chunk)
        return jax.vmap(
            lambda d, p: _iterate(d, p[0], p[1], p[2], settings))(data, prep)
