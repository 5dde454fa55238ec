"""Device-mesh sharding for the planner's two parallel axes.

The framework scales along:
  * ``scenario`` — independent planning problems (Monte-Carlo maps,
    missions, replans).  Embarrassingly parallel; DCN-friendly across
    hosts (the 50-map sweep of swarm_traj_planner_rbp_test_all.cpp as a
    batch dimension).
  * ``batch`` — the agent groups of sequential batch planning
    (rbp_planner.hpp:849-872).  Groups couple through the shared dummy
    trajectories, so each Jacobi round ends with an all-gather of the
    refreshed dummy state over ICI — the collective form of the
    reference's dummy write-back (rbp_planner.hpp:183).

Everything here is a thin layer over jit + NamedSharding: the solver
itself (qp/admm.py) is already vmap/pjit-polymorphic.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..qp import admm, assemble


def make_mesh(n_scenario: int | None = None, n_batch: int | None = None,
              devices=None) -> Mesh:
    """Factor available devices into a (scenario, batch) mesh."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_scenario is None and n_batch is None:
        n_batch = 1
        for cand in (4, 2, 1):
            if n % cand == 0:
                n_batch = cand
                break
        n_scenario = n // n_batch
    elif n_scenario is None:
        n_scenario = n // n_batch
    elif n_batch is None:
        n_batch = n // n_scenario
    devs = np.array(devices[: n_scenario * n_batch]).reshape(
        n_scenario, n_batch)
    return Mesh(devs, axis_names=("scenario", "batch"))


def shard_stacked(data: assemble.QPData, mesh: Mesh,
                  axes: tuple[str | None, ...] = ("batch",)) -> assemble.QPData:
    """Place a stacked QPData (leading axes = ``axes``) onto the mesh."""
    spec = P(*axes)
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, spec)), data)


@partial(jax.jit, static_argnames=("settings", "rounds", "kkt_chunk"))
def gauss_seidel_sweep(stacked: assemble.QPData, dummy: jnp.ndarray,
                       settings: admm.ADMMSettings,
                       rounds: int = 1, kkt_chunk: int = 4):
    """The reference's sequential batch planning as ONE compiled program.

    lax.scan over agent batches with the dummy control points carried
    on-device: each step refreshes its coupling rhs from the current
    dummy, solves, and scatters its solution back — exactly the
    Gauss-Seidel semantics of rbp_planner.hpp:140-204, with zero host
    round-trips per cycle (a single device dispatch per sweep; on remote
    backends per-dispatch overhead dominates a host-driven loop).

    Returns (dummy [N, M, n+1, 3], stacked infos of the last round).
    """
    import dataclasses

    N, M, npp, _ = dummy.shape

    with jax.default_matmul_precision("highest"):
        prep = jax.lax.map(lambda d: admm._prepare(d, settings), stacked,
                           batch_size=kkt_chunk)
        sdatas, scals, ops = prep

        def batch_step(dummy, inputs):
            data_l, sd, scal, op = inputs
            d = assemble.refresh_from_dummy(data_l, dummy)
            if scal is not None:
                rhs = jnp.where(
                    d.pair_mask[:, None] > 0,
                    d.pair_rhs * scal.pair_row,
                    jnp.asarray(-assemble.BIG, d.pair_rhs.dtype))
                sd = dataclasses.replace(sd, pair_rhs=rhs, x0=d.x0 / scal.d)
            else:
                sd = dataclasses.replace(sd, pair_rhs=d.pair_rhs, x0=d.x0)
            x, info = admm._iterate(d, sd, scal, op, settings)
            B = x.shape[0]
            ctrl = x.transpose(0, 2, 1).reshape(B, M, npp, 3)
            dummy = dummy.at[data_l.agents].set(
                ctrl.astype(dummy.dtype), mode="drop")
            return dummy, info

        def round_fn(dummy, _):
            dummy, infos = jax.lax.scan(
                batch_step, dummy, (stacked, sdatas, scals, ops))
            return dummy, infos

        dummy, infos = jax.lax.scan(round_fn, dummy, None, length=rounds)
    return dummy, jax.tree.map(lambda x: x[-1], infos)


@partial(jax.jit, static_argnames=("settings", "rounds", "kkt_chunk",
                                   "iters_schedule", "carry_state",
                                   "tighten_schedule"))
def jacobi_sweep(stacked: assemble.QPData, dummy: jnp.ndarray,
                 settings: admm.ADMMSettings,
                 rounds: int = 1, kkt_chunk: int = 4,
                 iters_schedule: tuple[int, ...] | None = None,
                 carry_state: bool = False,
                 tighten_schedule: tuple[float, ...] | None = None):
    """Fully on-device Jacobi sequential-batch planning.

    stacked: QPData with a leading batch-group axis [L, ...] (shard it
    over the mesh's "batch" axis with shard_stacked); dummy: [N, M, n+1, 3]
    global control points.  Each round refreshes every group's coupling
    rhs from the shared dummy, solves all groups in parallel, and
    scatter-gathers the solutions back into the dummy — XLA inserts the
    all-gather across the batch-sharded axis automatically.

    The expensive per-group KKT factorization/equilibration depends only
    on problem *structure* (costs, continuity, boxes, pair normals), not
    on the dummy state, so it is computed once and reused by every round;
    each round only rescales the refreshed coupling rhs.

    iters_schedule: optional per-round max_iter override, len == rounds.
    Every round warm-starts from the refreshed dummy, so later rounds
    converge in a fraction of the first round's iterations (measured on
    the 64-agent bench problem: round 0 needs <= 725, round 1 <= 275);
    a decreasing budget cuts the sweep's critical path accordingly.

    carry_state (requires iters_schedule): carry the full scaled ADMM
    state (x, z, y) across rounds instead of re-initializing the duals
    to zero — the coupling rhs is the only thing a round changes, so the
    previous duals sit near the updated fixed point and later rounds
    need fewer iterations still.

    tighten_schedule (knot-state solver only): per-round constraint
    tightening margin.  Jacobi rounds enforce cross-batch pair
    constraints against the PREVIOUS round's positions; a decreasing
    margin absorbs the per-round movement (which contracts geometrically)
    so intermediate rounds stay pairwise safe against the staleness.

    Returns (ctrl [N, M, n+1, 3], info of the last round).
    """
    import dataclasses

    from ..qp import nullspace

    N, M, npp, _ = dummy.shape
    if iters_schedule is not None and len(iters_schedule) != rounds:
        raise ValueError(
            f"iters_schedule has {len(iters_schedule)} entries for "
            f"{rounds} rounds")
    if carry_state and iters_schedule is None:
        raise ValueError("carry_state requires iters_schedule")
    is_ns = isinstance(settings, nullspace.NSSettings)

    with jax.default_matmul_precision("highest"):
        if is_ns:
            # knot-state solver: no equilibration; the whole NSOp
            # (maps + KKT inverse ladder) is dummy-independent
            ops = jax.lax.map(
                lambda d: nullspace.prepare_ns(d, settings), stacked,
                batch_size=kkt_chunk)
        else:
            prep = jax.lax.map(lambda d: admm._prepare(d, settings),
                               stacked, batch_size=kkt_chunk)
            sdatas, scals, Kinvs = prep

        def round_fn(dummy, s_round, state=None):
            datas = jax.vmap(assemble.refresh_from_dummy,
                             in_axes=(0, None))(stacked, dummy)

            if is_ns:
                def one_ns(d, op, st=None):
                    return nullspace._iterate_ns(
                        d, op, s_round, init=st,
                        return_state=carry_state)

                if state is None:
                    out = jax.vmap(one_ns)(datas, ops)
                else:
                    out = jax.vmap(one_ns)(datas, ops, state)
                if carry_state:
                    xs, info, state = out
                else:
                    xs, info = out
                    state = None
                L, B = xs.shape[0], xs.shape[1]
                ctrl = xs.transpose(0, 1, 3, 2).reshape(L * B, M, npp, 3)
                agents = stacked.agents.reshape(L * B)
                new_dummy = dummy.at[agents].set(
                    ctrl.astype(dummy.dtype), mode="drop")
                return new_dummy, info, state

            def one(d, sd, scal, Kinv, st=None):
                if scal is not None:  # rescale refreshed rhs + warm start
                    rhs = jnp.where(
                        d.pair_mask[:, None] > 0,
                        d.pair_rhs * scal.pair_row,
                        jnp.asarray(-assemble.BIG, d.pair_rhs.dtype))
                    sd = dataclasses.replace(sd, pair_rhs=rhs,
                                             x0=d.x0 / scal.d)
                else:
                    sd = dataclasses.replace(sd, pair_rhs=d.pair_rhs,
                                             x0=d.x0)
                return admm._iterate(d, sd, scal, Kinv, s_round,
                                     init=st, return_state=carry_state)

            if state is None:
                out = jax.vmap(one)(datas, sdatas, scals, Kinvs)
            else:
                out = jax.vmap(one)(datas, sdatas, scals, Kinvs, state)
            if carry_state:
                xs, info, state = out
            else:
                xs, info = out
                state = None
            # xs: [L, B, 3, D] -> control points [L*B, M, npp, 3]
            L, B = xs.shape[0], xs.shape[1]
            ctrl = xs.transpose(0, 1, 3, 2).reshape(L * B, M, npp, 3)
            agents = stacked.agents.reshape(L * B)
            new_dummy = dummy.at[agents].set(
                ctrl.astype(dummy.dtype), mode="drop")
            return new_dummy, info, state

        if iters_schedule is None:
            dummy, infos = jax.lax.scan(
                lambda dm, _: round_fn(dm, settings)[:2], dummy, None,
                length=rounds)
            info = jax.tree.map(lambda x: x[-1], infos)
        else:  # unrolled: each round gets its own iteration budget
            if tighten_schedule is not None and (
                    not is_ns or len(tighten_schedule) != rounds):
                raise ValueError("tighten_schedule needs the knot-state "
                                 "solver and one entry per round")
            state = None
            for r, mi in enumerate(iters_schedule):
                s_round = dataclasses.replace(settings, max_iter=mi)
                if tighten_schedule is not None:
                    s_round = dataclasses.replace(
                        s_round, tighten=tighten_schedule[r])
                dummy, info, state = round_fn(dummy, s_round, state)
    return dummy, info
