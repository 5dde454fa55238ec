"""Generic dense-matrix ADMM QP solver.

  minimize 0.5 x^T Q x + q^T x   s.t.  l <= A x <= u

Used by the SCP planner (whose constraint matrices are naturally dense,
scp_planner.hpp:202-292) and anywhere a problem doesn't fit the structured
Bernstein QPData.  Same OSQP-style splitting as qp/admm.py, with dense
Ruiz equilibration; one Cholesky, then each iteration is one matmul.
vmap/pjit-compatible (stack leading axes on all operands).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class DenseSettings:
    rho: float = 0.1
    rho_eq_scale: float = 1e3
    sigma: float = 1e-6
    alpha: float = 1.6
    max_iter: int = 2000
    eps_abs: float = 1e-5
    eps_rel: float = 1e-5
    scaling_iters: int = 10


class DenseInfo(NamedTuple):
    iters: jnp.ndarray
    r_prim: jnp.ndarray
    r_dual: jnp.ndarray
    obj: jnp.ndarray


def _equilibrate(Q, q, A, l, u, iters):
    m, n = A.shape
    dt = Q.dtype
    d = jnp.ones(n, dt)
    e = jnp.ones(m, dt)
    c = jnp.asarray(1.0, dt)
    lo, hi = 1e-4, 1e4

    def isqrt(v):
        return 1.0 / jnp.sqrt(jnp.clip(v, lo, hi))

    for _ in range(iters):
        colQ = jnp.max(c * d[:, None] * jnp.abs(Q) * d[None, :], axis=0)
        colA = jnp.max(e[:, None] * jnp.abs(A) * d[None, :], axis=0)
        d = d * isqrt(jnp.maximum(colQ, colA))
        rowA = jnp.max(e[:, None] * jnp.abs(A) * d[None, :], axis=1)
        e = e * isqrt(rowA)
        colQ = jnp.max(c * d[:, None] * jnp.abs(Q) * d[None, :], axis=0)
        qn = jnp.max(jnp.abs(c * d * q)) if q is not None else 0.0
        c = c / jnp.clip(jnp.maximum(jnp.mean(colQ), qn), lo, hi)
    return d, e, c


def solve_dense(Q, q, A, l, u, settings: DenseSettings = DenseSettings(),
                is_eq=None, x0=None):
    """Solve one dense QP.  is_eq: bool[m] marks rows given the boosted rho.

    Returns (x, DenseInfo)."""
    with jax.default_matmul_precision("highest"):
        return _solve_dense(Q, q, A, l, u, settings, is_eq, x0)


def _solve_dense(Q, q, A, l, u, s, is_eq, x0):
    m, n = A.shape
    dt = Q.dtype
    if q is None:
        q = jnp.zeros(n, dt)
    if is_eq is None:
        is_eq = l == u
    rho = jnp.where(is_eq, s.rho * s.rho_eq_scale, s.rho).astype(dt)

    d, e, c = _equilibrate(Q, q, A, l, u, s.scaling_iters)
    Qs = c * d[:, None] * Q * d[None, :]
    qs = c * d * q
    As = e[:, None] * A * d[None, :]
    ls = e * l
    us = e * u

    K = Qs + s.sigma * jnp.eye(n, dtype=dt) + (As.T * rho) @ As
    cho = jax.scipy.linalg.cho_factor(K)
    Kinv = jax.scipy.linalg.cho_solve(cho, jnp.eye(n, dtype=dt))

    x = jnp.zeros(n, dt) if x0 is None else x0 / d
    z = jnp.clip(As @ x, ls, us)
    y = jnp.zeros(m, dt)

    alpha = jnp.asarray(s.alpha, dt)
    sigma = jnp.asarray(s.sigma, dt)
    eps_abs = jnp.asarray(s.eps_abs, dt)
    eps_rel = jnp.asarray(s.eps_rel, dt)

    def body(state):
        x, z, y, it, _ = state
        rhs = sigma * x - qs + As.T @ (rho * z - y)
        x_t = Kinv @ rhs
        ax_t = As @ x_t
        x_new = alpha * x_t + (1 - alpha) * x
        v = alpha * ax_t + (1 - alpha) * z + y / rho
        z_new = jnp.clip(v, ls, us)
        y_new = rho * (v - z_new)

        # unscaled residuals
        xu = d * x_new
        yu = e * y_new / c
        zu = z_new / e
        ax = A @ xu
        px = Q @ xu + q
        aty = A.T @ yu
        r_prim = jnp.max(jnp.abs(ax - zu))
        r_dual = jnp.max(jnp.abs(px + aty))
        eps_p = eps_abs + eps_rel * jnp.maximum(jnp.max(jnp.abs(ax)),
                                                jnp.max(jnp.abs(zu)))
        eps_d = eps_abs + eps_rel * jnp.maximum(jnp.max(jnp.abs(px)),
                                                jnp.max(jnp.abs(aty)))
        done = (r_prim <= eps_p) & (r_dual <= eps_d)
        return x_new, z_new, y_new, it + 1, done

    def cond(state):
        _, _, _, it, done = state
        return (it < s.max_iter) & ~done

    x, z, y, it, _ = jax.lax.while_loop(
        cond, body, (x, z, y, jnp.asarray(0), jnp.asarray(False)))

    xu = d * x
    yu = e * y / c
    zu = z / e
    r_prim = jnp.max(jnp.abs(A @ xu - zu))
    r_dual = jnp.max(jnp.abs(Q @ xu + q + A.T @ yu))
    obj = 0.5 * xu @ Q @ xu + q @ xu
    return xu, DenseInfo(iters=it, r_prim=r_prim, r_dual=r_dual, obj=obj)


solve_dense_jit = jax.jit(solve_dense, static_argnames=("settings",))
