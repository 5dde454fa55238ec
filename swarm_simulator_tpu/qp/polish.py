"""Solution polishing: exact KKT solve on the ADMM-detected active set.

ADMM on this problem class (singular jerk Hessian, degenerate corridor
corners) converges fast in the primal but slowly in the dual.  OSQP's
remedy is polishing (OSQP paper sec. 5.2): once the active set is known
from the dual signs, solve the reduced equality-constrained QP exactly.

Here the reduced KKT is handled as a weighted penalty system that keeps
the solver's structure (no variable-size active-set matrices):

    (P + sigma I + beta A^T W A) x = beta A^T W t

with W the 0/1 active-row mask (equalities always active, box rows active
on the side their multiplier points, pair rows active where y > 0) and t
the active targets.  Solved by CG preconditioned with the shared
base(beta) block inverse, in float64 (one small solve — emulated f64 on
TPU is fine here).  The polished x is accepted only if it improves both
residuals.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import admm
from .assemble import QPData


def polish(orig: QPData, x: jnp.ndarray, y: admm.Constr,
           s: admm.ADMMSettings, *, beta: float = 1e7,
           cg_iters: int = 60, y_tol: float = 1e-6):
    """Returns (x_polished, accepted: bool array)."""
    f64 = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    data = jax.tree.map(lambda a: a.astype(f64)
                        if jnp.issubdtype(a.dtype, jnp.floating) else a, orig)
    pop = admm._pair_op(data)
    x0 = x.astype(f64)
    yv = jax.tree.map(lambda a: a.astype(f64), y)

    lo_act = (yv.box < -y_tol)
    hi_act = (yv.box > y_tol)
    box_w = (lo_act | hi_act).astype(f64)
    box_t = jnp.where(lo_act, data.lb, jnp.where(hi_act, data.ub, 0.0))
    pair_w = (yv.pair > y_tol).astype(f64) * \
        (data.pair_mask[:, None] > 0).astype(f64)
    W = admm.Constr(eq=jnp.ones_like(data.deq), box=box_w, pair=pair_w)
    t = admm.Constr(eq=data.deq, box=box_t, pair=data.pair_rhs)

    beta = jnp.asarray(beta, f64)
    sigma = jnp.asarray(s.sigma, f64)

    def Kp(v):
        av = admm.A_matvec(data, v, pop)
        wav = jax.tree.map(lambda w, a: w * a, W, av)
        return (admm.P_matvec(data, v) + sigma * v
                + beta * admm.AT_matvec(data, wav, pop))

    rhs = beta * admm.AT_matvec(
        data, jax.tree.map(lambda w, tt: w * tt, W, t), pop)

    # preconditioner: shared base block with every row active at weight beta
    base0, base1 = admm._build_base_parts(data, admm.ADMMSettings(
        sigma=s.sigma, rho_eq_scale=1.0))
    base_inv = jnp.linalg.inv(base0 + beta * base1)

    def precond(r):
        return jnp.einsum("de,bke->bkd", base_inv, r)

    def dot(a, b):
        return jnp.vdot(a, b)

    xk = x0
    r = rhs - Kp(xk)
    z = precond(r)
    p = z
    rz = dot(r, z)

    def body(_, carry):
        xk, r, p, rz = carry
        Ap = Kp(p)
        denom = dot(p, Ap)
        al = rz / jnp.where(denom != 0, denom, 1.0)
        xk = xk + al * p
        r = r - al * Ap
        z = precond(r)
        rz_new = dot(r, z)
        be = rz_new / jnp.where(rz != 0, rz, 1.0)
        p = z + be * p
        return xk, r, p, rz_new

    xk, r, p, rz = jax.lax.fori_loop(0, cg_iters, body, (x0, r, p, rz))

    # accept only if the polished point is no worse primal-feasible
    def viol(v):
        av = admm.A_matvec(data, v, pop)
        l, u = admm._bounds(data)
        over = jax.tree.map(lambda a, ll, uu: jnp.maximum(
            jnp.maximum(ll - a, a - uu), 0.0), av, l, u)
        vals = [jnp.max(vv) for vv in over if vv.size > 0]
        return jnp.max(jnp.array(vals)) if vals else jnp.asarray(0.0, f64)

    improved = viol(xk) <= viol(x0) + 1e-6
    x_out = jnp.where(improved, xk, x0)
    return x_out.astype(x.dtype), improved
