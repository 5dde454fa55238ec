"""Cross-device decomposition of ONE joint knot-state ADMM solve.

Round-2 gap (VERDICT): the production joint solve ran single-device —
multi-chip meant scenario replication.  This module partitions the ONE
banded KKT solve across a device mesh axis, so the pivot inventory
(the memory wall: ~232 MB at 64 agents, ~7.5 GB at 256 in the 5-rung
recipe) and the O(N^2 M) pair-constraint work (the FLOPs wall at 256
agents) are both sharded, with XLA collectives over ICI carrying the
coupling — the TPU-native generalization of the reference's
sequential-batch dummy exchange (rbp_planner.hpp:140-204) to the JOINT
all-pair QP.

Two decompositions of the Thomas sweeps (per mesh axis of n devices):

``mode="chunk"`` (default, round 4) — the KNOT axis is sharded into n
contiguous chunks (``op.Dinvs [R, Mi_p, bs, bs]`` split on dim 1,
zero-block padded to a multiple of n).  The sweeps flow
device-to-device: each device runs its local chunk — THROUGH THE
PRODUCTION STREAMING THOMAS KERNEL (ops/pallas_thomas chunk kernels)
when the phase requests ``thomas_kernel`` on TPU, else the same XLA
scan as the single-device path — then hands one [bs] boundary row to
its neighbor via ``ppermute``.  Collectives per KKT apply: n fwd + n
bwd ppermutes of [bs] floats + ONE tiled all_gather of the [Mi_p/n,
bs] solution chunks — CONSTANT in M (the block-row mode pays
2(Mi-1) per-knot gathers).  The chain itself stays sequential (that
is the algorithm's critical path; cyclic reduction was measured-
rejected, see ARCHITECTURE.md), so wall-clock tracks the single-chip
kernel speed while per-device pivot HBM drops by n and the pair-axis
MXU work divides.  Works for ANY bs (no divisibility constraint).

``mode="blockrow"`` (round 3, kept) — each device holds bs/n ROWS of
every pivot inverse; every knot's matvec is reassembled with a tiled
all_gather.  2(Mi-1)+2 collectives per iteration of bs/n floats: on
real ICI (~us latency) this divides the dominant HBM pivot stream n
ways and can beat the chunk mode at large bs; on the virtual CPU mesh
the per-knot rendezvous dominates (measured inverting 2x at n=8,
benchmarks/shard_scale_cpu.json) — which is why it is no longer the
default.  Requires bs % n == 0 and supports the plain XLA scan only.

Both modes shard the pair leaves (``pair_n/pair_rhs/...`` and the pair
halves of the ADMM z/y state) along P (dim 0, padded to a multiple of
n with inactive rows): A^T y needs one ``psum`` per apply; A x is
row-local.  Everything else (w, z.box, y.box, x_pin, N, g, Qseg,
bounds) is replicated — the [B, 3, D] state is sub-MB even at 256
agents.

Numerics: identical algorithm to nullspace._iterate_ns (same rung
ladder, same phased schedule); sums are re-associated by psum /
all_gather so results match the single-device path to f32 reduction
tolerance, not bitwise.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .admm import SolveInfo, _pair_op
from .assemble import BIG, QPData
from .nullspace import (NSConstr, NSOp, NSSettings, _apply_Qseg, _bounds,
                        _w_from_x, _x_of)


def pad_pairs(data: QPData, mult: int) -> QPData:
    """Pad the pair axis to a multiple of ``mult`` with INACTIVE rows
    (mask 0, zero normals, -BIG rhs -> bounds clamp to (-BIG, BIG), the
    constraint never binds and its dual stays 0).  Host-side numpy; a
    tree whose pair axis is already a multiple (e.g. placed via
    ``place``) returns unchanged without touching the leaves."""
    Pq = data.pair_n.shape[0]
    Pp = ((Pq + mult - 1) // mult) * mult
    if Pp == Pq:
        return data
    pad = Pp - Pq

    def padi(a, val):
        a = np.asarray(a)
        return np.concatenate(
            [a, np.full((pad,) + a.shape[1:], val, a.dtype)], axis=0)

    return dataclasses.replace(
        data,
        pair_bi=padi(data.pair_bi, -1), pair_bj=padi(data.pair_bj, -1),
        pair_n=padi(data.pair_n, 0.0),
        pair_rhs=padi(data.pair_rhs, -BIG),
        pair_mask=padi(data.pair_mask, 0.0),
        pair_qi=padi(data.pair_qi, -1), pair_qj=padi(data.pair_qj, -1),
        pair_rsum=padi(data.pair_rsum, 0.0))


def pad_knots(op: NSOp, mult: int) -> NSOp:
    """Zero-block pad the pivot inventory's KNOT axis to a multiple of
    ``mult`` (chunk mode).  Zero pivot blocks + zero rhs rows propagate
    exact zeros through both sweeps, so the padded chain solves the
    original system with x = 0 on the pad knots — this also makes the
    last-pivot step uniform (the real last knot's backward correction
    multiplies the pad's x = 0).  Host numpy or jax arrays; idempotent
    when the knot axis already divides."""
    Mi = op.Dinvs.shape[1]
    Mp = ((Mi + mult - 1) // mult) * mult
    if Mp == Mi:
        return op
    if isinstance(op.Dinvs, jax.Array):
        R, _, b1, b2 = op.Dinvs.shape
        d = jnp.zeros((R, Mp, b1, b2), op.Dinvs.dtype)
        d = d.at[:, :Mi].set(op.Dinvs)
    else:
        d = np.zeros((op.Dinvs.shape[0], Mp) + op.Dinvs.shape[2:],
                     op.Dinvs.dtype)
        d[:, :Mi] = op.Dinvs
    return op._replace(Dinvs=d)


def _specs(data: QPData, op: NSOp, axis: str, mode: str = "chunk"):
    """(data_specs, op_specs) PartitionSpec pytrees: pair leaves over
    ``axis`` (dim 0), pivot inventory over its knot axis (chunk mode)
    or block-row dim (blockrow mode), the rest replicated."""
    dspec = jax.tree.map(lambda _: P(), data)
    dspec = dataclasses.replace(
        dspec, pair_bi=P(axis), pair_bj=P(axis), pair_n=P(axis),
        pair_rhs=P(axis), pair_mask=P(axis), pair_qi=P(axis),
        pair_qj=P(axis), pair_rsum=P(axis))
    ospec = jax.tree.map(lambda _: P(), op)
    if mode == "chunk":
        ospec = ospec._replace(Dinvs=P(None, axis))
    else:
        ospec = ospec._replace(Dinvs=P(None, None, axis))
    return dspec, ospec


def _iterate_ns_sharded(data: QPData, op: NSOp, s: NSSettings, axis: str,
                        n: int = 1, mode: str = "blockrow",
                        interpret: bool = False, init=None):
    """shard_map body: one phase of the knot-state ADMM with LOCAL pair
    shards and sharded pivots (knot-chunk pipeline or block-row).
    Mirrors nullspace._iterate_ns incl. kkt_refine PCG (fresh-K applies
    ride the sharded A/A^T); no AA / fused paths — asserted by the
    entry."""
    B, K3, D = data.lb.shape
    dt_ = data.lb.dtype
    M = op.F0.shape[0]
    phi = op.F0.shape[1]
    nw = op.N.shape[1]
    Mi = M - 1
    B3 = B * K3
    bs = B3 * phi

    pop = _pair_op(data)          # local: S [Pl, B], n_d [Pl, 3, D]
    l, u = _bounds(data, s.tighten)
    tmap = jax.tree.map

    sigma = jnp.asarray(s.sigma, dt_)
    alpha = jnp.asarray(s.alpha, dt_)
    eps_abs = jnp.asarray(s.eps_abs, dt_)
    eps_dual = jnp.asarray(
        s.eps_abs if s.eps_dual_abs is None else s.eps_dual_abs, dt_)
    eps_rel = jnp.asarray(s.eps_rel, dt_)

    lad_log = jnp.log(op.ladder)
    idx_lo = (jnp.argmin(jnp.abs(lad_log - jnp.log(s.rho_lo)))
              if s.rho_lo is not None else 0)
    idx_hi = (jnp.argmin(jnp.abs(lad_log - jnp.log(s.rho_hi)))
              if s.rho_hi is not None else op.ladder.shape[0] - 1)

    def A_x(x):
        # pair rows are shard-local; box is the replicated identity
        xs = jnp.einsum("pb,bkd->pkd", pop.S, x)
        return NSConstr(box=x, pair=jnp.einsum("pkd,pkd->pd", pop.n_d, xs))

    def AT_x(y):
        # ONE psum gathers the pair-shard contributions; the box term is
        # replicated and must be added exactly once (outside the psum)
        contrib = pop.n_d * y.pair[:, None, :]
        part = jnp.einsum("pb,pkd->bkd", pop.S, contrib)
        return y.box + jax.lax.psum(part, axis)

    def koT(Ho_k, v):
        return jnp.einsum("ai,xa->xi", Ho_k,
                          v.reshape(B3, phi)).reshape(v.shape)

    def ko(Ho_k, v):
        return jnp.einsum("ab,xb->xa", Ho_k,
                          v.reshape(B3, phi)).reshape(v.shape)

    def kinv_apply_blockrow(rho_idx, rhs):
        # block-tridiagonal Thomas over knots with block-ROW-sharded
        # pivots: each device computes its bs/n rows of Dinv @ v, one
        # tiled all_gather per knot reassembles the full block vector
        Dinv = op.Dinvs[rho_idx]               # [Mi, bs/n, bs] local
        Ho = op.Kos                            # [Mi-1, phi, phi] repl.
        b = rhs.reshape(B, K3, Mi, phi).transpose(2, 0, 1, 3)
        b = b.reshape(Mi, bs)

        def gather(v_loc):
            return jax.lax.all_gather(v_loc, axis, tiled=True)

        def fwd(y_prev, inp):
            b_k, Ho_prev, Dinv_prev = inp
            t = gather(Dinv_prev @ y_prev)
            y_k = b_k - koT(Ho_prev, t)
            return y_k, y_k

        _, ys = jax.lax.scan(fwd, b[0], (b[1:], Ho, Dinv[:-1]), unroll=4)
        y = jnp.concatenate([b[:1], ys], axis=0)
        x_last = gather(Dinv[-1] @ y[-1])

        def bwd(x_next, inp):
            y_k, Ho_k, Dinv_k = inp
            x_k = gather(Dinv_k @ (y_k - ko(Ho_k, x_next)))
            return x_k, x_k

        _, xs = jax.lax.scan(bwd, x_last, (y[:-1], Ho, Dinv[:-1]),
                             reverse=True, unroll=4)
        x = jnp.concatenate([xs, x_last[None]], axis=0)
        x = x.reshape(Mi, B, K3, phi).transpose(1, 2, 0, 3)
        return x.reshape(rhs.shape)

    def kinv_apply_chunk(rho_idx, rhs):
        # knot-chunk pipeline: each device solves its contiguous chunk
        # of the chain (production Thomas kernel on TPU, the XLA scan
        # otherwise) and hands one [bs] boundary row to its neighbor —
        # n fwd + n bwd ppermutes + ONE all_gather per apply, constant
        # in M (see module docstring)
        Dloc = op.Dinvs[rho_idx]               # [L, bsp, bsp] local
        L = Dloc.shape[0]
        bsp = Dloc.shape[-1]
        Mp = L * n
        kernel = bool(s.thomas_kernel)
        # both paths run at the operator's (possibly lane-padded) width:
        # zero pivot rows/cols propagate exact zeros, and the Kronecker
        # couplings act on the true bs prefix only
        bw = bsp

        def koT_w(Ho_k, v):
            if bw == bs:
                return koT(Ho_k, v)
            return jnp.zeros(bw, v.dtype).at[:bs].set(koT(Ho_k, v[:bs]))

        def ko_w(Ho_k, v):
            if bw == bs:
                return ko(Ho_k, v)
            return jnp.zeros(bw, v.dtype).at[:bs].set(ko(Ho_k, v[:bs]))

        idx = jax.lax.axis_index(axis)
        # per-knot incoming/outgoing couplings, zero at the global ends
        # and on pad knots (op.Kos is [Mi-1, phi, phi], replicated/tiny)
        zpad = jnp.zeros((Mp - Mi + 1,) + op.Kos.shape[1:], op.Kos.dtype)
        kin = jnp.concatenate([zpad[:1], op.Kos, zpad[1:]], axis=0)
        kout = jnp.concatenate([op.Kos, zpad], axis=0)
        kin_l = jax.lax.dynamic_slice_in_dim(kin, idx * L, L)
        kout_l = jax.lax.dynamic_slice_in_dim(kout, idx * L, L)

        b = rhs.reshape(B, K3, Mi, phi).transpose(2, 0, 1, 3)
        b = b.reshape(Mi, bs)
        b_full = jnp.zeros((Mp, bw), dt_).at[:Mi, :bs].set(b)
        b_loc = jax.lax.dynamic_slice_in_dim(b_full, idx * L, L)

        if kernel:
            from ..ops.pallas_thomas import (thomas_chunk_bwd,
                                             thomas_chunk_fwd)
            koM = jnp.kron(jnp.eye(B3, dtype=op.Kos.dtype), op.Kos[0])
            koM = jnp.zeros((bsp, bsp), koM.dtype).at[:bs, :bs].set(koM)

            def chunk_fwd(t_in):
                T = thomas_chunk_fwd(op.Dinvs, koM, b_loc, t_in, rho_idx,
                                     interpret=interpret)
                return T[-1], T

            def chunk_bwd(x_in, T):
                x = thomas_chunk_bwd(op.Dinvs, koM, T, x_in, rho_idx,
                                     interpret=interpret)
                return x[0], x
        else:
            def chunk_fwd(t_in):
                # y-form scan (single-device make_kinv_apply math): step
                # k uses Dinv_{k-1}; the chunk's first step consumes the
                # carried t = Dinv y of the neighbor's last knot
                y0 = b_loc[0] - koT_w(kin_l[0], t_in)

                def f(y_prev, inp):
                    b_k, kin_k, Dinv_prev = inp
                    y_k = b_k - koT_w(kin_k, Dinv_prev @ y_prev)
                    return y_k, y_k

                _, ys = jax.lax.scan(
                    f, y0, (b_loc[1:], kin_l[1:], Dloc[:-1]), unroll=4)
                ys = jnp.concatenate([y0[None], ys], axis=0)
                t_out = Dloc[-1] @ ys[-1]
                return t_out, ys

            def chunk_bwd(x_in, ys):
                def f(x_next, inp):
                    y_k, kout_k, Dinv_k = inp
                    x_k = Dinv_k @ (y_k - ko_w(kout_k, x_next))
                    return x_k, x_k

                _, xs = jax.lax.scan(f, x_in, (ys, kout_l, Dloc),
                                     reverse=True, unroll=4)
                return xs[0], xs

        fwd_perm = [(d, (d + 1) % n) for d in range(n)]
        bwd_perm = [(d, (d - 1) % n) for d in range(n)]
        zrow = jnp.zeros(bw, dt_)
        zrows = jnp.zeros((L, bw), dt_)

        def fwd_step(step, carry):
            t_carry, rows = carry
            t_new, rows_new = jax.lax.cond(
                step == idx, chunk_fwd, lambda t: (t, rows), t_carry)
            rows = jnp.where(step == idx, rows_new, rows)
            t_carry = jax.lax.ppermute(t_new, axis, fwd_perm)
            return t_carry, rows

        _, rows_loc = jax.lax.fori_loop(0, n, fwd_step, (zrow, zrows))

        def bwd_step(j, carry):
            step = n - 1 - j
            x_carry, xs_acc = carry
            x_new, xs_new = jax.lax.cond(
                step == idx, lambda x: chunk_bwd(x, rows_loc),
                lambda x: (x, xs_acc), x_carry)
            xs_acc = jnp.where(step == idx, xs_new, xs_acc)
            x_carry = jax.lax.ppermute(x_new, axis, bwd_perm)
            return x_carry, xs_acc

        _, xs_loc = jax.lax.fori_loop(0, n, bwd_step, (zrow, zrows))

        x = jax.lax.all_gather(xs_loc, axis, tiled=True)  # [Mp, bw]
        x = x[:Mi, :bs].reshape(Mi, B, K3, phi).transpose(1, 2, 0, 3)
        return x.reshape(rhs.shape)

    kinv_apply = (kinv_apply_chunk if mode == "chunk"
                  else kinv_apply_blockrow)

    if init is None:
        if s.warm_start == "x0":
            w = _w_from_x(op, data.x0, phi)
        else:
            w = jnp.zeros((B, K3, nw), dt_)
        z = tmap(jnp.clip, A_x(_x_of(op, w)), l, u)
        y = tmap(jnp.zeros_like, z)
        rho_idx = jnp.argmin(jnp.abs(lad_log
                                     - jnp.log(jnp.asarray(s.rho, dt_))))
    else:
        w, z, y, rho_idx = init
        z = tmap(jnp.clip, z, l, u)
    rho_idx = jnp.clip(rho_idx, idx_lo, idx_hi)

    def K_fresh(v, rho_s):
        # matrix-free fresh-operator apply (mirrors nullspace._iterate_ns
        # K_fresh); the pair coupling inside A^T A rides the sharded
        # AT_x's psum
        x_v = jnp.einsum("da,bka->bkd", op.N, v)
        qx = op.c_s * _apply_Qseg(data.Qseg, x_v)
        aax = AT_x(A_x(x_v))
        return sigma * v + jnp.einsum("da,bkd->bka", op.N,
                                      qx + rho_s * aax)

    def admm_step(carry, _):
        w, z, y, rho_idx = carry
        rho_s = op.ladder[rho_idx]
        rhs_x = tmap(lambda zz, yy: rho_s * zz - yy, z, y)
        rhs_w = sigma * w - op.g + jnp.einsum(
            "da,bkd->bka", op.N, AT_x(rhs_x))
        w_t = kinv_apply(rho_idx, rhs_w)
        if s.kkt_refine:
            # PCG against the fresh operator, preconditioned by the
            # prepared inventory (nullspace._iterate_ns semantics); the
            # r/z/p iterates are replicated, so the vdots need no
            # collectives
            tiny = jnp.asarray(1e-30, dt_)
            r_c = rhs_w - K_fresh(w_t, rho_s)
            z_c = kinv_apply(rho_idx, r_c)
            p_c = z_c
            rz = jnp.vdot(r_c, z_c)
            for _ in range(s.kkt_refine):
                Kp = K_fresh(p_c, rho_s)
                a_c = rz / jnp.maximum(jnp.vdot(p_c, Kp), tiny)
                w_t = w_t + a_c * p_c
                r_c = r_c - a_c * Kp
                z_c = kinv_apply(rho_idx, r_c)
                rz_new = jnp.vdot(r_c, z_c)
                b_c = rz_new / jnp.maximum(rz, tiny)
                p_c = z_c + b_c * p_c
                rz = rz_new
        x_t = _x_of(op, w_t)
        ax_t = A_x(x_t)
        w_new = alpha * w_t + (1 - alpha) * w
        v = tmap(lambda a_, zz, yy: alpha * a_ + (1 - alpha) * zz
                 + yy / rho_s, ax_t, z, y)
        z_new = tmap(jnp.clip, v, l, u)
        y_new = tmap(lambda vv, zz: rho_s * (vv - zz), v, z_new)
        return (w_new, z_new, y_new, rho_idx), None

    def pmax(v):
        return jax.lax.pmax(v, axis)

    def residuals(w, z, y):
        x = _x_of(op, w)
        ax = A_x(x)
        px = _apply_Qseg(data.Qseg, x)
        aty = AT_x(y) / op.c_s
        grad_w = jnp.einsum("da,bkd->bka", op.N, px + aty)

        def nmax(c):
            # box part replicated, pair part shard-local -> pmax
            vb = (jnp.max(jnp.abs(c.box)) if c.box.size else
                  jnp.asarray(0.0, dt_))
            vp = (pmax(jnp.max(jnp.abs(c.pair))) if c.pair.size else
                  jnp.asarray(0.0, dt_))
            return jnp.maximum(vb, vp)

        r_prim = nmax(tmap(lambda a_, zz: a_ - zz, ax, z))
        r_dual = jnp.max(jnp.abs(grad_w))
        n_prim = jnp.maximum(nmax(ax), nmax(z))
        n_dual = jnp.maximum(
            jnp.max(jnp.abs(jnp.einsum("da,bkd->bka", op.N, px))),
            jnp.max(jnp.abs(jnp.einsum("da,bkd->bka", op.N, aty))))
        return r_prim, r_dual, n_prim, n_dual

    def rho_update(rho_idx, done, r_prim, r_dual, n_prim, n_dual):
        if not s.adaptive_rho:
            return rho_idx
        tiny = jnp.asarray(1e-10, dt_)
        rho_s = op.ladder[rho_idx]
        ratio = jnp.sqrt(
            (r_prim / jnp.maximum(n_prim, tiny))
            / jnp.maximum(r_dual / jnp.maximum(n_dual, tiny), tiny))
        cand = jnp.clip(rho_s * ratio, s.rho_min, s.rho_max)
        change = (cand > s.adapt_threshold * rho_s) | \
                 (cand < rho_s / s.adapt_threshold)
        cand_idx = jnp.clip(
            jnp.argmin(jnp.abs(lad_log - jnp.log(cand))),
            idx_lo, idx_hi)
        return jnp.where(done | ~change, rho_idx, cand_idx)

    def outer_body(state):
        w, z, y, rho_idx, it, _ = state
        (w, z, y, _), _ = jax.lax.scan(
            admm_step, (w, z, y, rho_idx), None, length=s.check_every)
        r_prim, r_dual, n_prim, n_dual = residuals(w, z, y)
        done = (r_prim <= eps_abs + eps_rel * n_prim) & \
               (r_dual <= eps_dual + eps_rel * n_dual)
        rho_idx = rho_update(rho_idx, done, r_prim, r_dual,
                             n_prim, n_dual)
        return w, z, y, rho_idx, it + s.check_every, done

    def outer_cond(state):
        it, done = state[4], state[5]
        return (it < s.max_iter) & ~done

    state = (w, z, y, rho_idx, jnp.asarray(0), jnp.asarray(False))
    w, z, y, rho_idx, it, _ = jax.lax.while_loop(
        outer_cond, outer_body, state)

    r_prim, r_dual, _, _ = residuals(w, z, y)
    x = _x_of(op, w)
    obj = 0.5 * jnp.vdot(x, _apply_Qseg(data.Qseg, x))
    info = SolveInfo(iters=it, r_prim=r_prim, r_dual=r_dual, obj=obj)
    return x, info, (w, z, y, rho_idx)


def _check_phases(phases, mode: str):
    for p in phases:
        if p.fused_chunk or p.aa_depth:
            raise ValueError(
                "sharded joint solve does not support fused_chunk / "
                "aa_depth phases (the fused kernel is the "
                "whole-solve-in-VMEM single-chip path; shard the knot "
                "chunks through thomas_kernel phases instead)")
        if p.thomas_kernel and mode != "chunk":
            raise ValueError("thomas_kernel phases shard in mode='chunk' "
                             "only (blockrow splits inside the matvec)")
        if p.kkt_mode != "banded":
            raise ValueError("sharded joint solve requires kkt_mode="
                             "'banded' (knot-chunk / block-row sharding)")


#: jitted solvers keyed on (mesh, axis, phases, mode, interpret):
#: rebuilding the shard_map closure per call would defeat the jit cache
#: — every solve would re-trace the 3-phase while-loop program
_JIT_CACHE: dict = {}


def _jitted(mesh, axis: str, phases, dspec, ospec, mode: str,
            interpret: bool):
    key = (mesh, axis, phases, mode, interpret)
    fn = _JIT_CACHE.get(key)
    if fn is not None:
        return fn

    try:
        from jax import shard_map
    except ImportError:          # older JAX
        from jax.experimental.shard_map import shard_map

    n = mesh.shape[axis]

    def body(d, o):
        with jax.default_matmul_precision("highest"):
            state = None
            x = info = None
            iters_total = 0
            for s in phases:
                x, info, state = _iterate_ns_sharded(
                    d, o, s, axis, n=n, mode=mode, interpret=interpret,
                    init=state)
                iters_total = iters_total + info.iters
            # TOTAL iterations across phases (mirrors solve_ns_phases)
            info = info._replace(iters=iters_total)
        return x, info

    try:                          # jax >= 0.8: check_vma
        sm = shard_map(body, mesh=mesh, in_specs=(dspec, ospec),
                       out_specs=(P(), P()), check_vma=False)
    except TypeError:             # older jax: check_rep
        sm = shard_map(body, mesh=mesh, in_specs=(dspec, ospec),
                       out_specs=(P(), P()), check_rep=False)
    fn = jax.jit(sm)
    _JIT_CACHE[key] = fn
    return fn


def place(data: QPData, op: NSOp, mesh, axis: str = "kkt",
          mode: str = "chunk"):
    """Pad the pair axis (and, chunk mode, the knot axis) and device_put
    (data, op) onto the mesh ONCE — callers that solve repeatedly
    (replans, timing reps) should place once and pass the placed trees
    to solve_ns_phases_sharded, or the multi-GB pivot inventory
    re-uploads every call."""
    n = mesh.shape[axis]
    data = pad_pairs(data, n)
    if mode == "chunk":
        op = pad_knots(op, n)
    dspec, ospec = _specs(data, op, axis, mode)

    def put(leaf, spec):
        sh = NamedSharding(mesh, spec)
        if isinstance(leaf, jax.Array) and leaf.sharding == sh:
            return leaf
        return jax.device_put(jnp.asarray(leaf), sh)

    return (jax.tree.map(put, data, dspec),
            jax.tree.map(put, op, ospec))


def solve_ns_phases_sharded(data: QPData, phases, op: NSOp, mesh,
                            axis: str = "kkt", mode: str = "chunk",
                            interpret: bool = False):
    """Run the phased knot-state ADMM with ONE problem partitioned over
    ``mesh[axis]``: pivot inventory knot-chunk-sharded (mode="chunk",
    default — runs the production streaming Thomas kernel per device
    when the phases request it) or block-row-sharded (mode="blockrow"),
    pair constraints P-sharded, coupling carried by ppermute / psum /
    all_gather collectives.

    data/op: HOST leaves (numpy) as produced by assemble + prepare_ns_np
    (flat banded layout; prepare with thomas_kernel=True for the kernel
    path's lane-padded pivots), or trees already placed via ``place``
    (these skip padding/transfer).  ``interpret`` runs the Pallas chunk
    kernels in interpret mode (CPU tests only — orders of magnitude
    slower).  Returns (x [B, 3, D], SolveInfo), replicated.  The jitted
    program is cached per (mesh, axis, phases, mode).
    """
    _check_phases(phases, mode)
    if mode not in ("chunk", "blockrow"):
        raise ValueError(f"unknown shard mode {mode!r}")
    n = mesh.shape[axis]
    bsp = int(op.Dinvs.shape[-1])
    bs_true = (int(np.prod(np.asarray(data.lb).shape[:2]))
               * int(op.F0.shape[1]))
    if mode == "blockrow" and bsp != bs_true:
        raise ValueError(
            "mode='blockrow' needs an UNPADDED operator (prepared with "
            f"thomas_kernel=False); got Dinvs[..., {bsp}] vs bs={bs_true}"
            " — use mode='chunk'")
    if mode == "blockrow" and bsp % n != 0:
        raise ValueError(f"pivot block size {bsp} must divide over "
                         f"{n} devices (pad agents, change the mesh, or "
                         "use mode='chunk')")
    if op.Dinvs.ndim != 4:
        raise ValueError("op must be prepared in the FLAT banded layout "
                         "(fused_chunk grouped preps cannot shard)")
    if any(p.thomas_kernel for p in phases) and bsp % 128 != 0:
        raise ValueError(
            "thomas_kernel phases need an operator prepared with "
            "NSSettings.thomas_kernel=True (lane-padded pivots); got "
            f"Dinvs[..., {bsp}]")
    d_dev, o_dev = place(data, op, mesh, axis, mode)
    dspec, ospec = _specs(d_dev, o_dev, axis, mode)
    return _jitted(mesh, axis, tuple(phases), dspec, ospec, mode,
                   interpret)(d_dev, o_dev)
