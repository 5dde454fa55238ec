"""Joint all-agent trajectory optimization: the production TPU path.

Where the reference decomposes the swarm QP into sequential CPLEX
batches with dummy coupling (rbp_planner.hpp:140-204), the TPU path
solves the WHOLE swarm as ONE QP — every SFC box and every RSFC pair
constraint simultaneously active — via the knot-state ADMM over the
block-tridiagonal banded KKT (qp/nullspace.py, kkt_mode="banded").
This removes the sequential path's stale-coupling consensus error
(measured 82x in objective at 256 agents) and is the benchmark
headline path (bench.py).

The recipe:
  1. assemble the joint QP on host (one bulk device transfer),
  2. host-f64 KKT rung inventory (prepare_ns_np), rounded once to f32,
  3. phased rho schedule (feasibility -> polish -> restore) on device.

Outer corridor iteration (replans): the reference's outer loop
re-solves with refreshed coupling (rbp_planner.hpp:140); here a replan
rebuilds the RSFC normals from the previous solution and re-solves
WITHOUT re-running the expensive prep — refresh_ns_op_np recomputes
the endpoint-dependent leaves in milliseconds and NSSettings.kkt_refine
(preconditioned-CG w-updates against the fresh constraints) absorbs
the stale inventory metric (tools/staleop_study.py).
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial

import jax
import numpy as np

from ..core.types import Mission, Param, PlanResult
from . import assemble, convert, nullspace

#: phase budgets tuned on the canonical 64-agent forest
#: (tools/schedule_study.py: (200, 600, 100) passes ten forest seeds;
#: shorter schedules fail seeds 4/8 — see bench.py ns_phases)
PRODUCTION_BUDGETS = (200, 600, 100)

#: margin-triggered escalation (round-4): when a solution's objective
#: margin vs the IPM best-response oracle exceeds ESCALATION_TRIGGER,
#: re-solve warm-started from it (x0 <- solution) with these budgets —
#: a polish extension reusing the replan mechanism, no new solver
#: features.  Measured on forest seeds 0-9
#: (benchmarks/margin_escalation_cpu.json): triggering seeds drop
#: below the bound at ~0.67x the base solve's extra cost.  The bench
#: gate applies this; production callers without an oracle can trigger
#: on their own margin estimate.
ESCALATION_TRIGGER = 1.15
ESCALATION_BUDGETS = (100, 400, 100)


def budgets_for_swarm(qn: int) -> tuple[int, int, int]:
    """Default phase budgets by swarm size.  <= 64 agents keep the
    10-seed-tuned PRODUCTION_BUDGETS.  Larger swarms currently keep the
    same schedule — tools/oracle256_study.py measures what the budget
    dial (benchmarks/budget256_study_tpu.json) costs against the
    rotating IPM best-response oracle at 256 agents; a cheaper schedule
    is only adopted here once that margin is <= the 1.25 gate bound."""
    del qn
    return PRODUCTION_BUDGETS


def polish_rounds_for_swarm(qn: int) -> int:
    """Default warm polish extensions after the cold solve.  Big swarms
    (>= 128 agents) NEED them to reach the 64-agent objective-margin
    standard: the 256-agent rotating IPM best-response oracle measured
    cold margin 1.52, cold+polish(4) margin 1.242 <= the 1.25 bar
    (benchmarks/oracle256_polish_tpu.json) — so polish(4) IS the
    production default there, not an opt-in flag (round-5; matches the
    reference's always-optimal CPLEX solve, rbp_planner.hpp:158).
    Small swarms already land ~1.06 without polish (BENCH_r04)."""
    return 4 if qn >= 128 else 0


#: short per-round replan budgets for big swarms (>= 128 agents),
#: EXPLICIT OPT-IN ONLY (the production default remains the FULL
#: phase budgets).  Round-5 re-measured the budget/margin frontier on
#: the v5e with an 8-batch rotating oracle
#: (benchmarks/replan256_chain_tpu.json): per-round worst margin is a
#: pure function of the iteration budget — 300 iters -> 3.50, 600 ->
#: 1.80, 800 CONTIGUOUS -> 1.37 (round 1), while 300 + a 600-iter
#: polish extension lands WORSE (1.67; the split restarts the
#: feasibility phases) — so the short schedule is the best contiguous
#: point (100, 600, 100) at ~14.8 s/round warm, replacing round-4's
#: (50, 200, 50)/8.3 s whose margins were 1.8-3.9.  No arm met the
#: 1.25 licensing bar; benchmarks/oracle256_anchor.json calibrates
#: how much of the residual margin is looseness of the best-response
#: BOUND itself (a rotating 4-agent best-response optimum is a lower
#: bound the exact joint optimum also cannot reach).
REPLAN_BUDGETS_LARGE = (100, 600, 100)

#: per-round warm polish extensions when the short large-swarm replan
#: schedule is chosen (solve_trajectories replan_polish auto).
#: Round-5 measured SPLIT budgets strictly worse than the same budget
#: spent contiguously (chain arms 300+600-polish = 1.67 vs 800
#: contiguous = 1.37), so the auto default is 0; the mechanism stays
#: for callers escalating a specific round on a margin estimate.
REPLAN_POLISH_LARGE = 0


def escalation_phases(base_phases) -> tuple:
    """Warm polish-extension schedule derived from ``base_phases``:
    same kernel routing, ESCALATION_BUDGETS, warm_start='x0' (callers
    set data.x0 to the solution being escalated)."""
    b = dataclasses.replace(base_phases[1], warm_start="x0")
    return tuple(
        dataclasses.replace(b, max_iter=mi, rho_lo=lo)
        for mi, lo in zip(ESCALATION_BUDGETS, (1e-3, None, 1e-2)))


def production_settings(max_iter: int = 1500,
                        check_every: int = 50) -> nullspace.NSSettings:
    """The production joint-solver settings (bench.py's gate-passing
    configuration): banded KKT, 5-rung rho ladder, tighten margin for
    first-order residual infeasibility at the strict ratio >= 1 gate.

    Ladder: logspace(1e-5, 1e-2, 5) — the exact bottom five rungs of
    the original 9-rung logspace(1e-5, 1e1, 9).  tools/rung_usage.py
    (seeds 0-4, production phases): the ADAPTIVE walk only ever visits
    rungs {1e-5, 5.6e-5, 1.78e-3, 1e-2}.  One behavioral change rides
    along: the warm-start rung (nearest to NSSettings.rho=0.1) was
    5.6e-2 on the old ladder and is 1e-2 here, so the first
    check_every chunk runs one rung lower — covered by the 10-seed
    gate re-validation (benchmarks/rung5_gate10_cpu.log)."""
    return nullspace.NSSettings(
        max_iter=max_iter, check_every=check_every,
        eps_abs=2e-4, eps_rel=2e-4, eps_dual_abs=5e-3, tighten=2e-3,
        warm_start="x0", kkt_mode="banded",
        rho_min=1e-5, rho_max=1e-2, n_rungs=5,
        # two-dot mantissa split on the fused kernel's MXU pair
        # contractions: ~10 us/iter (~20% of the device-side solve)
        # faster on the v5e, gate-validated on forest seeds 0-9
        # (BENCH_r03 + benchmarks/seeds59_gate_split2_tpu.log); the
        # NSSettings default stays 3 (max accuracy) for non-recipe use
        fused_pair_split=2)


def production_phases(budgets: tuple[int, int, int] = PRODUCTION_BUDGETS,
                      base: nullspace.NSSettings | None = None,
                      kkt_refine: int = 0,
                      fused: bool | None = None,
                      ) -> tuple[nullspace.NSSettings, ...]:
    """Phased rho schedule: feasibility-first (low rungs fenced out) ->
    objective polish (unfenced) -> feasibility restore (fenced high).

    fused: run each check_every chunk as ONE VMEM-resident Pallas
    kernel (ops/pallas_nsfused.py).  MEASURED on the real v5e
    (tools/fused_bench.py, 2026-08-19): 4.17x the XLA scan path on the
    gate-passing 64-agent cycle (0.345 s -> 0.083 s), both paths
    passing the full acceptance gate — so it is the PRODUCTION DEFAULT
    on accelerator backends.  None = auto: True unless the backend is
    CPU (Mosaic is TPU-only; the interpret fallback is for tests, and
    prep falls back to the flat layout when the working set exceeds
    VMEM or segment durations are non-uniform)."""
    b = base if base is not None else production_settings()
    if fused is None:
        # auto applies even over an explicit base (pass fused=
        # base.fused_chunk to preserve a caller's choice): replan
        # schedules derived from the cold phases re-resolve to the
        # same backend and stay consistent
        fused = jax.default_backend() != "cpu"
    if b.thomas_kernel:
        # the streaming-Thomas path (big aligned swarms, see
        # solve_trajectories) is mutually exclusive with the fused
        # chunk kernel — a derived schedule keeps the base's path
        fused = False
    b = dataclasses.replace(b, fused_chunk=bool(fused),
                            kkt_refine=kkt_refine)
    if kkt_refine:
        # the fused kernel has no fresh-K apply; a refined (replan)
        # schedule derived from fused base phases drops the kernel —
        # and routes its PCG preconditioner applies through the
        # streaming Thomas kernel instead (measured 2.4x the XLA scan
        # on the 64-agent refine-1 solve, 1.53 -> 0.64 s;
        # benchmarks/profile256_kkt_paths_tpu.json carries the
        # 96/256-agent points).  CPU keeps the XLA scan (Mosaic is
        # TPU-only; interpret mode is for tests).
        thomas = b.thomas_kernel or (bool(fused)
                                     and jax.default_backend() != "cpu")
        b = dataclasses.replace(b, fused_chunk=False,
                                thomas_kernel=thomas)
    return (dataclasses.replace(b, max_iter=budgets[0], rho_lo=1e-3),
            dataclasses.replace(b, max_iter=budgets[1]),
            dataclasses.replace(b, max_iter=budgets[2], rho_lo=1e-2))


def rescue_box_batches(plan, mission, param, ctrl, tol: float = 1e-3):
    """f64 IPM best-response rescue for box-stalled agents.

    SFC boxes can be DEGENERATE (a 1-cell corridor minus the agent
    clearance collapses to a zero-width slot, e.g. 64-agent forest
    seed 17 agent 61 segment 13: y in [1.5, 1.5]).  The instance stays
    FEASIBLE — CPLEX/IPM solve it exactly (rbp_planner.hpp:158) — but
    first-order ADMM converges sublinearly against a measure-zero face
    (measured: box residual 8.2e-3 at 900 iters, 4.5e-3 at 4200; a
    high-rho rescue ladder also stalls).  Production response, the
    reference's own sequential-batch architecture as a FALLBACK: find
    agents violating their boxes beyond ``tol``, re-solve ONLY their
    batches' best-response QPs with the exact f64 interior-point
    solver (everyone else fixed at the joint solution — identical
    one-sided pair rows to rbp_planner.hpp:638-684), splice, and let
    the caller re-gate.  Cost: ~3 s per rescued batch at 64 agents on
    host CPU; rescued agents leave with IPM-exact boxes AND a
    per-batch optimal objective.

    Returns (ctrl, rescued_batch_indices)."""
    from ..parallel import seqbatch
    from . import ipm

    boxes = np.asarray(plan.seg_boxes)
    dm = np.asarray(ctrl, np.float64)
    viol = np.maximum(boxes[:, :, None, :3] - dm,
                      dm - boxes[:, :, None, 3:]).max(axis=(1, 2, 3))
    bad = np.where(viol > tol)[0]
    if bad.size == 0:
        return dm, []
    batches, _ = seqbatch.make_batches(mission.qn, param)
    bad_b = sorted({i for i, b in enumerate(batches)
                    if np.intersect1d(np.asarray(b), bad).size})
    out = dm.copy()
    for bi in bad_b:
        agents = np.asarray(batches[bi])
        data_b = assemble.assemble_batch(plan, mission, param, agents,
                                         out, device=False)
        data_b = jax.tree.map(
            lambda v: np.asarray(v, np.float64)
            if np.asarray(v).dtype in (np.float32, np.float64)
            else np.asarray(v), data_b)
        # relax zero-width duplicated knot rows by 5e-4 (IPM needs
        # positive slack on every inequality; the residual face
        # excursion stays under the 1e-3 gate bound).  Do NOT relax or
        # tighten any other row — a blanket lb+t/ub-t collides with the
        # equality-pinned endpoints sitting on box faces and the IPM
        # diverges (mu -> inf, an infeasibility certificate)
        lb_r, ub_r = assemble.relax_thin_knot_rows(
            np.asarray(data_b.lb), np.asarray(data_b.ub), param.n)
        data_b = dataclasses.replace(data_b, lb=lb_r, ub=ub_r)
        res = ipm.solve_ipm_reduced(data_b)
        ipm.verify_optimal(data_b, res, tol=1e-5)
        out[agents] = convert.x_to_ctrl(res.x, plan.M, param.n)
    return out, bad_b


def select_kkt_path(phases, qn: int, M: int, n_pairs: int, phi: int,
                    backend: str | None = None):
    """KKT-apply path auto-selection past the fused VMEM bound: the
    fused chunk kernel covers swarms whose working set fits VMEM
    (<= ~85 agents; prep falls back to the flat layout beyond it).
    Past that bound the XLA scan only achieves ~half the achievable
    pivot-stream bandwidth at big [bs, bs] block shapes (measured
    23.7 -> 6.5 ms per 256-agent KKT apply on the v5e,
    tools/profile_256_solve.py), so aligned big swarms route to the
    double-buffered streaming Thomas kernel (ops/pallas_thomas.py)
    instead (prep pads the pivots to the 128-lane grid when bs is not
    naturally aligned — measured 4x even padded at 96 agents,
    bs = 864 -> 896).  Only rewrites schedules that requested the
    fused kernel (i.e. the accelerator production default); explicit
    XLA-path or CPU schedules pass through untouched."""
    backend = backend if backend is not None else jax.default_backend()
    if backend == "cpu" or not any(p.fused_chunk for p in phases):
        return phases
    from ..ops.pallas_nsfused import fused_fits
    if not fused_fits(qn, M, n_pairs):
        return tuple(dataclasses.replace(p, fused_chunk=False,
                                         thomas_kernel=True)
                     for p in phases)
    return phases


def assemble_joint(plan: PlanResult, mission: Mission, param: Param,
                   dummy: np.ndarray | None = None):
    """The joint all-agent QP as host numpy (one bulk device transfer
    later).  dummy (the warm start, build_dummy's initTraj midpoint
    interpolation by default — rbp_planner.hpp:513-549) also seeds
    x0."""
    if dummy is None:
        dummy = assemble.build_dummy(plan.init_traj, param.n, plan.M)
    data = assemble.assemble_batch(plan, mission, param,
                                   np.arange(mission.qn), dummy,
                                   device=False)
    return data, dummy


@partial(jax.jit, static_argnames=("phases",))
def _solve_phases_jit(data, op, phases):
    """Each distinct phase schedule compiles once per process; replan
    rounds and repeated solves reuse the executable."""
    return nullspace.solve_ns_phases(data, phases, op=op)


@partial(jax.jit, static_argnames=("s_base",))
def _solve_schedule_jit(data, op, s_base, it_k, lo_k, hi_k):
    """Schedule-array solve: budgets/fences are jit ARGUMENTS, so the
    cold, warm-polish, and escalation schedules (same normalized
    s_base) share ONE executable — the round-5 cold-compile cure
    (BENCH_r04 measured 192.6 s for the three-phase-body program)."""
    return nullspace.solve_ns_schedule(data, op, s_base, it_k, lo_k,
                                       hi_k)


#: device-resident schedule arrays per phase tuple (tiny; avoids 3
#: host->device transfers through the tunnel on every dispatch)
_SCHED_CACHE: dict = {}


def _run_schedule(data_dev, op_dev, phases):
    """Dispatch: schedule-compatible phase tuples go through the
    shared-executable path; anything else falls back to the static
    per-phase program."""
    cached = _SCHED_CACHE.get(phases)
    if cached is None:
        sched = nullspace.schedule_arrays(phases)
        if sched is not None:
            sched = (sched[0],) + tuple(jax.device_put(a)
                                        for a in sched[1:])
        _SCHED_CACHE[phases] = cached = (sched,)
    (sched,) = cached
    if sched is not None:
        s0, it_k, lo_k, hi_k = sched
        return _solve_schedule_jit(data_dev, op_dev, s0, it_k, lo_k,
                                   hi_k)
    return _solve_phases_jit(data_dev, op_dev, phases=phases)


def solve_trajectories(plan: PlanResult, mission: Mission, param: Param,
                       phases: tuple[nullspace.NSSettings, ...] | None = None,
                       replan_budgets: tuple[int, int, int] | None = None,
                       replan_polish: int | None = None,
                       replan_prep: str | None = None,
                       cold_prep: str = "host",
                       dummy: np.ndarray | None = None,
                       polish_rounds: int | None = None,
                       exact_polish: bool = False,
                       ) -> PlanResult:
    """Pipeline entry for Param.solver == "nullspace": fills plan.ctrl /
    plan.coef / plan.solver_info like seqbatch.solve_trajectories.

    exact_polish: finish every round (cold solve and each replan) with
    the host-f64 ACTIVE-SET polish (qp/activeset.py): the ADMM-
    identified active set defines an equality-constrained QP solved by
    one sparse KKT factorization — the KKT-certified EXACT optimum when
    the certificate holds, i.e. what CPLEX returns every solve
    (rbp_planner.hpp:158).  The polish only ever replaces the solution
    with a feasible, certified-or-improving point; its cost and
    certificate land in plan.solver_info["exact_polish"].

    polish_rounds None = auto (polish_rounds_for_swarm: 4 for >= 128
    agents, 0 below).  > 0 runs warm polish extensions after the cold
    solve:
    x0 <- the previous solution (only the x0 leaf changes — the KKT
    inventory stays device-resident, the pair data is unchanged), with
    the ESCALATION_BUDGETS schedule.  The 256-agent oracle study
    (benchmarks/oracle256_esc_tpu.json) measures what each round buys
    against rotating IPM best-response optima — this is how big swarms
    reach the 64-agent objective-margin standard.

    param.iteration > 1 runs the outer corridor iteration: each extra
    round rebuilds the RSFC separating planes from the PREVIOUS round's
    trajectories (tighter coupling than the initTraj planes, the joint
    analog of the reference's dummy refresh, rbp_planner.hpp:140-204)
    and re-solves warm-started from that round's solution.

    replan_prep — how each round's KKT rung inventory is produced:
      "device"  ON-DEVICE f32 prep of the FRESH operator + kkt_refine=1
                PCG w-updates.  The round-3 measured production mode
                (benchmarks/replan_study_tpu.log): 0.78 s replan cycle
                at 64 agents vs 6.6 s for fresh host prep, objective
                1.029 vs 0.959 — the precondition quality lost to f32
                inverses is recovered by PCG against the fresh
                operator.  (prepare_ns pins matmul precision itself —
                without it the low-rho rung inverses come out 1e4x
                wrong and the solve NaNs.)
      "fresh"   re-runs the host-f64 prep each round — maximum polish
                quality (the bench-headline cold-start mode).
      "stale"   reuses the round-0 inventory via refresh_ns_op_np +
                kkt_refine=1 — milliseconds, but ONLY safe for small
                corridor perturbations; a full RSFC refresh fails the
                gate on the stale inventory (tools/staleop_study.py).
      None      auto: "device" on accelerator backends, "fresh" on CPU.

    cold_prep — the ROUND-0 inventory:
      "host"    host-f64 prep (default): the maximum-polish operator
                (bench headline; objective 0.959-class) at a 2.5-6 s
                64-agent prep+transfer cost.
      "device"  on-device f32 prep + kkt_refine=1 phases for round 0
                too: time-to-first-plan collapses (64 agents: ~0.2 s
                prep + 0.58 s solve; 256 agents: 1.1 s prep vs 8 min —
                benchmarks/devprep256_tpu.json, objective parity with
                host prep under refine) at a modestly slower warm
                cycle (the refine path cannot run the fused kernel).
    """
    import jax.numpy as jnp

    from ..corridor.rsfc import build_rsfc

    if polish_rounds is None:
        polish_rounds = polish_rounds_for_swarm(mission.qn)
    if phases is None:
        phases = production_phases()
    phases = select_kkt_path(phases, mission.qn, plan.M,
                             len(np.asarray(plan.pair_idx)), param.phi)
    if replan_prep is None:
        replan_prep = ("device" if jax.default_backend() != "cpu"
                       else "fresh")
    if replan_prep not in ("fresh", "stale", "device"):
        raise ValueError(f"replan_prep: unknown mode {replan_prep!r}")
    if replan_prep == "stale" and any(p.fused_chunk for p in phases):
        # stale replans need kkt_refine (fresh-K PCG), which the fused
        # kernel cannot run, and a fused-prepped (grouped) operator
        # cannot feed the XLA path either — reject upfront
        raise ValueError("replan_prep='stale' is incompatible with "
                         "fused_chunk phases; use replan_prep='fresh'")
    n, M, N = param.n, plan.M, mission.qn

    if cold_prep not in ("host", "device"):
        raise ValueError(f"cold_prep: unknown mode {cold_prep!r}")
    if cold_prep == "device" and replan_prep == "stale":
        raise ValueError("replan_prep='stale' needs the host-resident "
                         "round-0 operator (cold_prep='host')")
    # dummy: the warm start (and x0 seed).  None = the reference's
    # initTraj midpoint interpolation; callers escalating or streaming
    # replans pass the PREVIOUS solution's control points here
    data, dummy = assemble_joint(plan, mission, param, dummy=dummy)
    if cold_prep == "device":
        # low-latency first plan: f32 prep on device + refine-1 phases
        # (quality recovered by PCG against the fresh operator — same
        # recipe as replan_prep="device")
        phases = production_phases(
            tuple(s.max_iter for s in phases), base=phases[1],
            kkt_refine=1)
        t0 = time.perf_counter()
        op = None
        op_dev = jax.jit(
            lambda d: nullspace.prepare_ns(d, phases[0]))(
            jax.tree.map(jnp.asarray, data))
        jax.block_until_ready(op_dev.Dinvs)
        prep_s = time.perf_counter() - t0
    else:
        t0 = time.perf_counter()
        op = nullspace.prepare_ns_np(data, phases[0])   # host f64, once
        prep_s = time.perf_counter() - t0
        op_dev = jax.device_put(op)     # pivot inventory uploaded ONCE

    def run(data_h, op_d, ph):
        x, info = _run_schedule(jax.tree.map(jnp.asarray, data_h),
                                op_d, ph)
        return convert.x_to_ctrl(np.asarray(x, np.float64), M, n), info

    def run_exact_polish(data_h, ctrl_in):
        from . import activeset
        ctrl2, ainfo = activeset.polish_ctrl(data_h, ctrl_in)
        keep = {k: ainfo.get(k) for k in (
            "accepted", "kkt_optimal", "passes", "n_active", "obj_in",
            "obj_out", "worst_slack_out", "pinned_box_viol", "t_s")}
        return np.asarray(ctrl2, np.float64), keep

    ctrl, info = run(data, op_dev, phases)

    as_info = None
    polish_s = 0.0
    if polish_rounds:
        # warm polish extensions: same problem, same device-resident
        # operator — only the x0 leaf changes (dummy only seeds x0 in
        # the joint solve; there are no fixed-agent pair rows to fold)
        pphases = escalation_phases(phases)
        data_dev = jax.tree.map(jnp.asarray, data)
        for _ in range(polish_rounds):
            t0 = time.perf_counter()
            x0n = jnp.asarray(
                ctrl.reshape(N, M * (n + 1), 3).transpose(0, 2, 1),
                jnp.float32)
            data_dev = dataclasses.replace(data_dev, x0=x0n)
            x, info = _run_schedule(data_dev, op_dev, pphases)
            ctrl = convert.x_to_ctrl(np.asarray(x, np.float64), M, n)
            polish_s += time.perf_counter() - t0

    if exact_polish:
        ctrl, as_info = run_exact_polish(data, ctrl)

    replan_rounds = 0

    if param.iteration > 1:
        # replan phases compile once and are reused across rounds.
        # DEFAULT = the cold phases' FULL budgets at every swarm size:
        # the round-5 budget/margin frontier (benchmarks/
        # replan256_chain_tpu.json) shows per-round oracle margin is a
        # pure function of iteration budget (300 -> 3.5, 800 -> 1.37),
        # no short arm met the 1.25 licensing bar, so short schedules
        # are explicit opt-in via replan_budgets (best contiguous
        # point: REPLAN_BUDGETS_LARGE) — and then forced to
        # kkt_refine>=1 at >= 128 agents (refine-1 recovers host-prep
        # quality exactly; precision_probe_cpu.json).  State-warm
        # (carrying ADMM duals) measured indistinguishable from
        # x0-warm under refine-1.
        rb = (replan_budgets if replan_budgets is not None
              else tuple(s.max_iter for s in phases))
        short = (replan_budgets is not None
                 and sum(rb) < sum(s.max_iter for s in phases))
        rphases = production_phases(
            rb, base=phases[1],
            kkt_refine=1 if (replan_prep in ("stale", "device")
                             or (short and mission.qn >= 128)) else 0)
        prep_jit = (jax.jit(lambda d: nullspace.prepare_ns(d, rphases[0]))
                    if replan_prep == "device" else None)
        # per-round warm polish extensions (round-5): the controlled
        # probe (benchmarks/precision_probe_cpu.json) showed replan
        # margin is ITERATION-BUDGET-limited, not precision-limited —
        # polish extensions on the round's own operator are how a
        # short round reaches the licensed margin (see
        # REPLAN_BUDGETS_LARGE / replan256_chain_tpu.json)
        rp_polish = (replan_polish
                     if replan_polish is not None
                     else (REPLAN_POLISH_LARGE
                           if mission.qn >= 128 and short else 0))
        rpol_phases = escalation_phases(rphases) if rp_polish else None
        for _ in range(param.iteration - 1):
            knots = np.concatenate(
                [ctrl[:, :, 0, :], ctrl[:, -1:, -1, :]], axis=1)
            try:
                pair_idx, normals = build_rsfc(knots, param.downwash)
            except ValueError:
                # a residually-colliding pair leaves no separating
                # plane — keep the best solved round instead of dying
                break
            assert np.array_equal(pair_idx, np.asarray(plan.pair_idx))
            plan.pair_normals = np.asarray(normals, np.float64)
            data, _ = assemble_joint(plan, mission, param, dummy=ctrl)
            if replan_prep == "stale":
                # only the endpoint-dependent leaves change; the
                # multi-100MB pivot inventory stays device-resident
                op = nullspace.refresh_ns_op_np(op, data)
                op_dev = op_dev._replace(
                    x_pin=jnp.asarray(op.x_pin),
                    g=jnp.asarray(op.g))
            elif replan_prep == "device":
                # fresh-operator prep ON DEVICE (f32 inverses; the
                # kkt_refine=1 PCG in rphases recovers the polish
                # quality against the fresh operator).  Release the
                # PREVIOUS round's inventory first: at 256 agents each
                # is 7.5 GB, and holding both while the fresh one is
                # computed exceeds the 16 GB HBM (measured
                # RESOURCE_EXHAUSTED at the first replan round)
                t0 = time.perf_counter()
                op_dev = None
                op_dev = prep_jit(jax.tree.map(jnp.asarray, data))
                jax.block_until_ready(op_dev.Dinvs)
                prep_s += time.perf_counter() - t0
            else:
                t0 = time.perf_counter()
                op = nullspace.prepare_ns_np(data, rphases[0])
                prep_s += time.perf_counter() - t0
                op_dev = None          # see replan_prep="device" note
                op_dev = jax.device_put(op)
            ctrl, info = run(data, op_dev, rphases)
            for _ in range(rp_polish):
                # x0 <- the round's solution; same round operator
                data = dataclasses.replace(
                    data, x0=np.asarray(
                        ctrl.reshape(N, M * (n + 1), 3).transpose(
                            0, 2, 1), np.float32))
                ctrl, info = run(data, op_dev, rpol_phases)
            if exact_polish:
                ctrl, as_info = run_exact_polish(data, ctrl)
            replan_rounds += 1

    plan.ctrl = ctrl
    plan.coef = convert.ctrl_to_coef(ctrl, plan.T, n)

    from ..utils.timing import ProblemSize
    psize = ProblemSize.of_batch(N, M, n, param.phi,
                                 len(np.asarray(plan.pair_idx)))
    if param.log:
        print(psize)
        from pathlib import Path
        Path("log").mkdir(exist_ok=True)
        assemble.export_qp_npz("log/qp_joint.npz", data)
    plan.solver_info = {
        "iters": [int(np.asarray(info.iters))],
        "r_prim": [float(np.asarray(info.r_prim))],
        "r_dual": [float(np.asarray(info.r_dual))],
        "obj": [float(np.asarray(info.obj))],
        "mode": "joint-nullspace",
        "solved": np.ones(N, dtype=bool),
        "prep_s": prep_s,
        "polish_rounds": polish_rounds,
        "polish_s": polish_s,
        "replan_rounds": replan_rounds,
        "problem_size": str(psize),
    }
    if as_info is not None:
        plan.solver_info["exact_polish"] = as_info
    return plan
