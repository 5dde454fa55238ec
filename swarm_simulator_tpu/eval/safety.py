"""Safety and acceptance metrics.

The reference prints two acceptance numbers after every run
(rbp_publisher.hpp:125-126): the global minimum inter-agent ellipsoidal
distance ratio (collision iff < 1, update_safety_margin_ratio :769-798)
and the total flight distance (trajectory_length_sum :685-695).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("downwash",))
def safety_margin_ratio(pos: jnp.ndarray, radius: jnp.ndarray,
                        *, downwash: float) -> jnp.ndarray:
    """pos [N, S, 3] -> min over time/pairs of downwash-scaled dist ratio."""
    scale = jnp.array([1.0, 1.0, 1.0 / downwash], pos.dtype)
    d = (pos[:, None] - pos[None, :]) * scale  # [N, N, S, 3]
    dist = jnp.linalg.norm(d, axis=-1)
    rsum = radius[:, None] + radius[None, :]
    ratio = dist / rsum[:, :, None]
    N = pos.shape[0]
    iu = jnp.triu_indices(N, k=1)
    return jnp.min(ratio[iu[0], iu[1]])


@jax.jit
def flight_distance(pos: jnp.ndarray) -> jnp.ndarray:
    """Total path length over all agents from dense samples [N, S, 3]."""
    seg = jnp.linalg.norm(pos[:, 1:] - pos[:, :-1], axis=-1)
    return jnp.sum(seg)


def knot_continuity_error(coef: np.ndarray, T: np.ndarray, n: int,
                          phi: int) -> float:
    """Max |p^(r)(T_m^-) - p^(r)(T_m^+)| over interior knots, r < phi."""
    from .sample import sample_trajectories

    T = np.asarray(T)
    eps = 1e-6
    tl = jnp.asarray(T[1:-1] - eps)
    tr = jnp.asarray(T[1:-1] + eps)
    sl = np.asarray(sample_trajectories(jnp.asarray(coef), jnp.asarray(T), tl,
                                        n=n, derivatives=phi))
    sr = np.asarray(sample_trajectories(jnp.asarray(coef), jnp.asarray(T), tr,
                                        n=n, derivatives=phi))
    return float(np.max(np.abs(sl - sr)))


def box_containment_error(ctrl: np.ndarray, seg_boxes: np.ndarray) -> float:
    """Max violation of control points vs their segment SFC boxes.

    ctrl [N, M, n+1, 3], seg_boxes [N, M, 6]; <= 0 means all inside."""
    lo = seg_boxes[:, :, None, 0:3] - ctrl
    hi = ctrl - seg_boxes[:, :, None, 3:6]
    return float(np.max(np.maximum(lo, hi)))


def dynamic_limit_violation(vel: np.ndarray, acc: np.ndarray,
                            max_vel: np.ndarray, max_acc: np.ndarray) -> float:
    """Max of |v|-v_max and |a|-a_max per axis; <= 0 means feasible.

    vel/acc [N, S, 3], limits [N, 3]."""
    ev = np.abs(vel) - max_vel[:, None, :]
    ea = np.abs(acc) - max_acc[:, None, :]
    return float(max(ev.max(), ea.max()))
