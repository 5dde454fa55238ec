"""Pallas TPU kernel: a whole ADMM chunk with the KKT pivot inventory
resident in VMEM.

The XLA banded path (qp/nullspace.py make_kinv_apply) is
HBM-bandwidth-bound: every iteration re-streams the active rho rung's
~46 MB of dense pivot-block inverses (measured 359 us per apply at the
achievable ~250 GB/s — tools/pallas_debug/thomas_prim_bench.py), and
the double-buffered streaming Thomas kernel (ops/pallas_thomas.py)
can only tie that roofline.  But the adaptive rho walk DWELLS: the
production phased solve changes rungs every few hundred iterations
(tools/rung_usage.py), while rung selection only happens at
check_every boundaries.  So this kernel runs the ENTIRE
check_every-sized inner loop in one invocation:

  * the active rung's pivots are DMA'd HBM->VMEM ONCE per chunk
    (~62 MB, ~0.25 ms) and every inner iteration reads them from VMEM
    — the dominant per-iteration HBM stream disappears;
  * the full ADMM step (constraint applies, clips, dual updates) runs
    in-kernel so no state crosses the kernel boundary between
    iterations;
  * pair-constraint contractions run on the MXU via the 3-way bf16
    mantissa split (f32-class accuracy; see ops/pallas_admm.py — plain
    f32 dot_generals silently run single-pass bf16 in Mosaic);
  * the block-tridiagonal solve runs on the VPU in true f32 with
    GROUP-PADDED flat rows: knot vectors live as [1, phi*256] rows
    where derivative order f occupies lanes [256 f, 256 f + B3) — all
    slices 128-aligned (Mosaic rejects lane-dim reshapes and unaligned
    lane slices, which rules out both the naive [bs] flat layout and
    [phi, B3] tiles).

Layouts (B=64 agents, M=36 segments: B3=192, D=216, GW=768, PL=2048):

  d6     [R, Mi, phi, B3, GW]  pivot inverses, input-index regrouped:
         d6[r,k,f,b3, 256 f'+b3'] = Dinv_flat[r,k, b3 phi+f, b3' phi+f']
  w/g    [Mi, GW]   knot-state rows (group-padded)
  box    [D, B3]    control-point arrays (x_pin, bounds, z, y)
  pair   [D, PL]    pair arrays transposed: PAIRS ON LANES (P pads to
                    PL); padded pairs have n=0, l=-BIG -> inert
  ndT    [phi, D, PL]  pair normals per axis k
  skT    [phi, B3, PL] signed agent-selection: skT[k, b*3+kk, p] =
                       S[p, b] if kk==k else 0  (exact in bf16)

Replaces the hot loop of rbp_planner.hpp:111-206 (the CPLEX solve) at
the chunk level.  When the working set does not fit VMEM (fused_fits:
the 64-agent production problem fits at ~85 MB; 256 agents does not)
prep keeps the flat pivot layout and the solve silently falls back to
the XLA scan path; non-uniform segment durations raise at prep.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..qp.assemble import BIG

f32 = jnp.float32
GROUP = 256          # lane stride per derivative-order group
LANE = 128


def _ceil(a, m):
    return -(-a // m) * m


def fused_vmem_bytes(B: int, M: int, P: int) -> int:
    """Rough VMEM bill of the kernel working set (pivot buffer + pair
    arrays + temporaries) used to gate the fused path."""
    B3, Mi = 3 * B, M - 1
    D = M * 6
    GW = 3 * GROUP
    PL = _ceil(max(P, 1), LANE)
    dbuf = Mi * 3 * B3 * GW * 4
    pair = 9 * D * PL * 4          # ndT(3) + z/y/l in+out + temporaries
    skt = 2 * 3 * B3 * PL * 4      # skT + skB f32 (cast to bf16 in-kernel)
    box = 10 * D * _ceil(B3, LANE) * 4
    rows = 6 * Mi * GW * 4
    return dbuf + pair + skt + box + rows + (1 << 22)


def fused_fits(B: int, M: int, P: int,
               budget: int = 112 * 1024 * 1024) -> bool:
    """Whether the fused kernel can run this problem COMPILED.  Rejects:
      * swarms whose 3B agent-axis lanes exceed one GROUP (the row
        layout stores all (agent, axis) lanes inside a 256-lane group);
      * 3B not a multiple of 8: Mosaic requires slices along the
        grouped-pivot sublane dimension aligned to the 8-sublane tile
        ("Slice shape along dimension 3 must be aligned to tiling (8)"
        — hit compiling a 2-agent swarm, B3=6, on the real v5e; the
        interpreter accepts it, so CI alone did not catch this);
      * working sets that exceed the VMEM budget.
    Callers fall back to the flat layout / XLA scan path."""
    B3 = 3 * B
    if B3 > GROUP or B3 % 8 != 0:
        return False
    return fused_vmem_bytes(B, M, P) <= budget


def prep_pivots_grouped(dinvs, phi: int):
    """[R, Mi, bs, bs] flat pivots -> [R, Mi, phi, B3, GW] group-padded
    (once at operator prep; numpy or jax array — the host prep calls
    with numpy, the device prep under jit with jnp).  bs ordering is
    (b3, f) f-minor (see prepare_ns_np).

    INVARIANT (relied on by the kernel's ho_comb linear combinations):
    the pad lanes [B3, GROUP) of every f'-group are ZERO.  Every row
    producer feeding the kernel maintains it — this zero-fill here,
    rows_from_state's zero-padded groups, and the in-kernel updates
    (pure linear combinations of zero-padded rows, e.g.
    w_new = alpha*w_t + (1-alpha)*w).  A producer that writes nonzero
    pad lanes would silently corrupt ho_comb's combos."""
    R, Mi, bs, _ = dinvs.shape
    B3 = bs // phi
    GW = phi * GROUP
    xp = jnp if isinstance(dinvs, jnp.ndarray) else np
    # input side: s = b3*phi + f  ->  [.., B3, phi, bs] -> [.., phi, B3, bs]
    d = dinvs.reshape(R, Mi, B3, phi, bs).transpose(0, 1, 3, 2, 4)
    ds = d.reshape(R, Mi, phi, B3, B3, phi)
    # output side: s' = b3'*phi + f' -> group f' at lanes [256 f', ..+B3)
    if xp is jnp:
        out = jnp.zeros((R, Mi, phi, B3, GW), dinvs.dtype)
        for fp in range(phi):
            out = out.at[..., fp * GROUP:fp * GROUP + B3].set(ds[..., fp])
        return out
    out = np.zeros((R, Mi, phi, B3, GW), dtype=dinvs.dtype)
    for fp in range(phi):
        out[..., fp * GROUP:fp * GROUP + B3] = ds[..., fp]
    return out


def rows_from_state(v: jnp.ndarray, Mi: int, phi: int) -> jnp.ndarray:
    """[B, K3, nw] knot-state -> group-padded rows [Mi, GW] (XLA side)."""
    B, K3, nw = v.shape
    t = v.reshape(B, K3, Mi, phi).transpose(2, 3, 0, 1).reshape(Mi, phi,
                                                                B * K3)
    out = jnp.zeros((Mi, phi, GROUP), v.dtype)
    out = out.at[:, :, :B * K3].set(t)
    return out.reshape(Mi, phi * GROUP)


def state_from_rows(r: jnp.ndarray, B: int, K3: int, phi: int) -> jnp.ndarray:
    """Inverse of rows_from_state."""
    Mi = r.shape[0]
    t = r.reshape(Mi, phi, GROUP)[:, :, :B * K3]
    return t.reshape(Mi, phi, B, K3).transpose(2, 3, 0, 1).reshape(
        B, K3, Mi * phi)


def box_tiles(v: jnp.ndarray) -> jnp.ndarray:
    """[B, K3, D] -> [D, B3] (d-major rows, (b, k) lanes)."""
    B, K3, D = v.shape
    return v.reshape(B * K3, D).T


def box_untile(t: jnp.ndarray, B: int, K3: int) -> jnp.ndarray:
    D = t.shape[0]
    return t.T.reshape(B, K3, D)


def pair_tiles(v: jnp.ndarray, PL: int, fill: float = 0.0) -> jnp.ndarray:
    """[P, D] -> [D, PL] (pairs on lanes, padded with `fill`)."""
    P, D = v.shape
    out = jnp.full((D, PL), jnp.asarray(fill, v.dtype))
    return out.at[:, :P].set(v.T)


def pair_untile(t: jnp.ndarray, P: int) -> jnp.ndarray:
    return t[:, :P].T


def _kernel(rho_ref, d6_ref, scal_ref, xpin_ref, g_ref, lb_ref, ub_ref,
            ndT_ref, skT_ref, skB_ref, pl_ref, w_ref, zb_ref, zp_ref, yb_ref,
            yp_ref, wo_ref, zbo_ref, zpo_ref, ybo_ref, ypo_ref,
            dbuf, sem, eye_ref, t_ref, y_ref, wt_ref,
            *, n_inner: int, Mi: int, B3: int, phi: int, M: int,
            npp: int, PL: int, pair_split: int = 3, ablate: tuple = ()):
    # pair_split: mantissa-split depth of the MXU pair contractions
    # (see NSSettings.fused_pair_split).
    # ablate: STATIC profiling hook (tools/pallas_debug/
    # nsfused_component_bench.py) — "thomas" skips the banded solve,
    # "pair" skips the MXU pair contractions.  Results are numerically
    # meaningless; default () compiles the identical production kernel.
    r = rho_ref[0]
    GW = phi * GROUP
    D = M * npp

    cp = pltpu.make_async_copy(d6_ref.at[r], dbuf, sem)
    cp.start()

    ii = jax.lax.broadcasted_iota(jnp.int32, (B3, B3), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (B3, B3), 1)
    eye_ref[:] = (ii == jj).astype(f32)

    sigma = scal_ref[0]
    alpha = scal_ref[1]
    L = [[scal_ref[2 + i * phi + f] for f in range(phi)]
         for i in range(phi)]
    Rm = [[scal_ref[2 + phi * phi + i * phi + f] for f in range(phi)]
          for i in range(phi)]
    Ho = [[scal_ref[2 + 2 * phi * phi + a * phi + c] for c in range(phi)]
          for a in range(phi)]
    rho = scal_ref[2 + 3 * phi * phi + r]
    big = f32(BIG)

    bf = jnp.bfloat16
    u32 = jnp.uint32
    mask = u32(0xFFFF0000)

    def split3(a):
        ua = jax.lax.bitcast_convert_type(a, u32)
        a0 = jax.lax.bitcast_convert_type(ua & mask, f32)
        rr_ = a - a0
        ur = jax.lax.bitcast_convert_type(rr_, u32)
        a1 = jax.lax.bitcast_convert_type(ur & mask, f32)
        a2 = rr_ - a1
        return a0.astype(bf), a1.astype(bf), a2.astype(bf)

    def dot3(a, s_bf, dn):
        # a f32 (split 3-way), s exact in bf16 (0/+-1 entries).
        # precision MUST be pinned to DEFAULT: the enclosing solve runs
        # under default_matmul_precision("highest"), which Mosaic
        # rejects for bf16 operands ("Bad lhs type" at contract
        # precision fp32 — first seen compiling on the real v5e).  The
        # f32 accumulation comes from preferred_element_type, not the
        # contract precision; the 3-way split supplies the accuracy.
        d = lambda u: jax.lax.dot_general(
            u, s_bf, dn, precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=f32)
        a0, a1, a2 = split3(a)
        if pair_split == 2:
            # two dots: ~16 mantissa bits on the A-applies, ~10 us/iter
            # faster on the v5e; the dropped a2 term is ~1e-5 relative
            return d(a0) + d(a1)
        return d(a0) + d(a1) + d(a2)

    # both contractions are standard [M, K] @ [K, N]: Mosaic rejects
    # bf16 dot_generals that contract rhs dim 1 ("Bad lhs type"), so the
    # backward apply uses a pre-transposed selection operand skB
    dn_fwd = (((1,), (0,)), ((), ()))   # [D, B3] @ [B3, PL]

    def grp(row, f):
        return row[:, f * GROUP:f * GROUP + B3]

    def grp0(row, f):
        # group f materialized at LANE OFFSET 0: Mosaic cannot broadcast
        # a slice living at a non-zero lane offset along sublanes
        # (vector.broadcast relayout fails), so rotate the row first
        # (tools/pallas_debug/mosaic_patterns.py P10)
        if f == 0:
            return row[:, :B3]
        return jnp.roll(row, -f * GROUP, axis=1)[:, :B3]

    def tcol(row192):
        # [1, B3] row -> [B3, 1] column (VPU transpose via identity)
        return jnp.sum(eye_ref[:] * row192, axis=1, keepdims=True)

    def dapply(k, y_row):
        # [1, GW] -> [1, GW]: all output groups at once per input group
        acc = jnp.zeros((1, GW), f32)
        for f in range(phi):
            col = tcol(grp0(y_row, f))
            acc = acc + jnp.sum(dbuf[k, f] * col, axis=0, keepdims=True)
        return acc

    def ho_comb(row, coef):
        # out group a = sum_c coef[a][c] * grpG(row, c), assembled by
        # lane concat of full-GROUP slices (dynamic_update_slice on
        # values does not lower in Mosaic TC kernels — probed in
        # tools/pallas_debug/mosaic_patterns.py); padding lanes
        # [B3, GROUP) are zero on input so linear combos keep them zero
        parts = []
        for a in range(phi):
            v = coef[a][0] * row[:, 0:GROUP]
            for c in range(1, phi):
                v = v + coef[a][c] * row[:, c * GROUP:(c + 1) * GROUP]
            parts.append(v)
        return jnp.concatenate(parts, axis=1)

    HoT = [[Ho[f][fp] for f in range(phi)] for fp in range(phi)]

    def thomas(rhs_ref_read):
        if "thomas" in ablate:
            wt_ref[:] = rhs_ref_read[:]
            return
        # forward: y_k = b_k - (I x Ho)^T Dinv_{k-1} y_{k-1}
        y_ref[0:1] = rhs_ref_read[0:1]

        def fwd(k, _):
            t = dapply(k - 1, y_ref[pl.ds(k - 1, 1)])
            t_ref[pl.ds(k - 1, 1)] = t
            y_ref[pl.ds(k, 1)] = rhs_ref_read[pl.ds(k, 1)] - ho_comb(t, HoT)
            return 0

        jax.lax.fori_loop(1, Mi, fwd, 0, unroll=False)
        wt_ref[pl.ds(Mi - 1, 1)] = dapply(Mi - 1, y_ref[pl.ds(Mi - 1, 1)])

        def bwd(j, _):
            k = Mi - 2 - j
            w_next = wt_ref[pl.ds(k + 1, 1)]
            wt_ref[pl.ds(k, 1)] = (t_ref[pl.ds(k, 1)]
                                   - dapply(k, ho_comb(w_next, Ho)))
            return 0

        jax.lax.fori_loop(0, Mi - 1, bwd, 0, unroll=False)

    cp.wait()

    def body(_, carry):
        w, zb, zp, yb, yp = carry
        # rhs_x = rho z - y
        rxb = rho * zb - yb                    # [D, B3]
        rxp = rho * zp - yp                    # [D, PL]
        # at = A^T rhs_x
        at = rxb
        if "pair" not in ablate:
            for k in range(phi):
                contrib = ndT_ref[k] * rxp
                at = at + dot3(contrib, skB_ref[k].astype(bf), dn_fwd)
        # rhs_w rows = sigma w - g + N^T at, assembled group-by-group
        # via lane concat (no value dynamic_update_slice in Mosaic)
        at4 = at.reshape(M, npp, B3)
        base = sigma * w - g_ref[:]
        parts = []
        for f in range(phi):
            v = jnp.zeros((Mi, B3), f32)
            for i in range(phi):
                v = v + L[i][f] * at4[1:M, i, :]
                v = v + Rm[i][f] * at4[0:M - 1, phi + i, :]
            if B3 < GROUP:
                v = jnp.pad(v, ((0, 0), (0, GROUP - B3)))
            parts.append(base[:, f * GROUP:(f + 1) * GROUP] + v)
        rhs = jnp.concatenate(parts, axis=1)
        # w_t = K^{-1} rhs (resident-pivot Thomas).  rhs is staged in
        # t_ref and SAFELY aliased with the T rows: forward step k
        # reads rhs[k] strictly after it overwrites slot k-1 (whose rhs
        # was consumed at step k-1), so one [Mi, GW] buffer serves both.
        t_ref[:] = rhs
        thomas(t_ref)
        w_t = wt_ref[:]
        # x_t = x_pin + N w_t: the N-apply delta is assembled as
        # [M, 1, B3] pieces concatenated along the middle dim (scatter-
        # add on values does not lower in Mosaic TC kernels)
        x4 = xpin_ref[:].reshape(M, npp, B3)
        zero1 = jnp.zeros((1, B3), f32)
        dparts = []
        for i in range(phi):
            vl = sum(L[i][f] * grp(w_t, f) for f in range(phi))
            dparts.append(
                jnp.concatenate([zero1, vl], axis=0)[:, None, :])
        for i in range(phi):
            vr = sum(Rm[i][f] * grp(w_t, f) for f in range(phi))
            dparts.append(
                jnp.concatenate([vr, zero1], axis=0)[:, None, :])
        xt = (x4 + jnp.concatenate(dparts, axis=1)).reshape(D, B3)
        # ax pair
        axp = jnp.zeros((D, PL), f32)
        if "pair" not in ablate:
            for k in range(phi):
                xs = dot3(xt, skT_ref[k].astype(bf), dn_fwd)
                axp = axp + ndT_ref[k] * xs
        # relaxation + projection + duals
        w_new = alpha * w_t + (1.0 - alpha) * w
        vb = alpha * xt + (1.0 - alpha) * zb + yb / rho
        vp = alpha * axp + (1.0 - alpha) * zp + yp / rho
        zb_n = jnp.clip(vb, lb_ref[:], ub_ref[:])
        zp_n = jnp.clip(vp, pl_ref[:], big)
        yb_n = rho * (vb - zb_n)
        yp_n = rho * (vp - zp_n)
        return w_new, zb_n, zp_n, yb_n, yp_n

    carry = (w_ref[:], zb_ref[:], zp_ref[:], yb_ref[:], yp_ref[:])
    carry = jax.lax.fori_loop(0, n_inner, body, carry)
    wo_ref[:], zbo_ref[:], zpo_ref[:], ybo_ref[:], ypo_ref[:] = carry


class FusedOperands:
    """Static kernel operands for one problem (built once per solve)."""

    def __init__(self, d6, scal, xpin, g_rows, lb_t, ub_t, ndT, skT,
                 skB, pl_t, dims):
        self.d6 = d6
        self.scal = scal
        self.xpin = xpin
        self.g_rows = g_rows
        self.lb_t = lb_t
        self.ub_t = ub_t
        self.ndT = ndT
        self.skT = skT
        self.skB = skB
        self.pl_t = pl_t
        self.dims = dims

    def tree(self):
        return (self.d6, self.scal, self.xpin, self.g_rows, self.lb_t,
                self.ub_t, self.ndT, self.skT, self.skB, self.pl_t)


def build_operands(data, op, pop, l, u, phi: int) -> FusedOperands:
    """Assembly of the static kernel operands — trace-safe (runs under
    the solve's jit; every piece is a jnp op on traced leaves).  The
    pivot inventory must already be group-padded at prep
    (prepare_ns_np with fused_chunk=True, which also asserts uniform
    segment durations — L/R/Ho constant over knots)."""
    B, K3, D = data.lb.shape
    M = data.Qseg.shape[0]
    npp = D // M
    Mi = M - 1
    B3 = B * K3
    P = data.pair_n.shape[0]
    PL = _ceil(max(P, 1), LANE)

    d6 = op.Dinvs
    if d6.ndim != 5:
        raise ValueError("fused chunk needs group-padded pivots "
                         "(prepare with NSSettings.fused_chunk=True)")

    # uniform dt (asserted at prep): the knot maps of segment 0 hold
    # everywhere.  L = F0^-1, R = FT^-1 (see knot_maps)
    Lm = jnp.linalg.inv(op.F0[0].astype(f32))
    Rm = jnp.linalg.inv(op.FT[0].astype(f32))
    scal = jnp.concatenate([
        jnp.zeros(2, f32),                # sigma, alpha filled per call
        Lm.reshape(-1), Rm.reshape(-1),
        op.Kos[0].astype(f32).reshape(-1),
        op.ladder.astype(f32),
    ])

    xpin = box_tiles(op.x_pin.astype(f32))
    g_rows = rows_from_state(op.g.astype(f32), Mi, phi)
    lb_t = box_tiles(l.box.astype(f32))
    ub_t = box_tiles(u.box.astype(f32))
    pl_t = pair_tiles(l.pair.astype(f32), PL, fill=-BIG)

    nd = pop.n_d.astype(f32)                          # [P, 3, D]
    ndT = jnp.zeros((phi, D, PL), f32)
    ndT = ndT.at[:, :, :P].set(nd.transpose(1, 2, 0))
    skT = jnp.zeros((phi, B3, PL), f32)
    for k in range(K3):
        skT = skT.at[k, k::K3, :P].set(pop.S.astype(f32).T)
    skB = jnp.swapaxes(skT, 1, 2)                     # [phi, PL, B3]
    dims = dict(Mi=Mi, B3=B3, phi=phi, M=M, npp=npp, PL=PL, B=B, K3=K3,
                P=P, D=D)
    return FusedOperands(d6, scal, xpin, g_rows, lb_t, ub_t,
                         ndT, skT, skB, pl_t, dims)


@functools.partial(jax.jit, static_argnames=("n_inner", "dims_key",
                                             "interpret", "pair_split",
                                             "ablate"))
def _chunk_jit(rho_idx, operands, sigma, alpha, w_rows, zb, zp, yb, yp,
               n_inner: int, dims_key, interpret: bool = False,
               pair_split: int = 3, ablate: tuple = ()):
    (d6, scal, xpin, g_rows, lb_t, ub_t, ndT, skT, skB,
     pl_t) = operands
    dims = dict(dims_key)
    Mi, B3, phi = dims["Mi"], dims["B3"], dims["phi"]
    M, npp, PL = dims["M"], dims["npp"], dims["PL"]
    D = M * npp
    GW = phi * GROUP
    scal = scal.at[0].set(sigma).at[1].set(alpha)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # d6 (HBM)
            pl.BlockSpec(memory_space=pltpu.SMEM),    # scal
            pl.BlockSpec(memory_space=pltpu.VMEM),    # xpin
            pl.BlockSpec(memory_space=pltpu.VMEM),    # g rows
            pl.BlockSpec(memory_space=pltpu.VMEM),    # lb
            pl.BlockSpec(memory_space=pltpu.VMEM),    # ub
            pl.BlockSpec(memory_space=pltpu.VMEM),    # ndT
            pl.BlockSpec(memory_space=pltpu.VMEM),    # skT
            pl.BlockSpec(memory_space=pltpu.VMEM),    # skB
            pl.BlockSpec(memory_space=pltpu.VMEM),    # pair l
            pl.BlockSpec(memory_space=pltpu.VMEM),    # w
            pl.BlockSpec(memory_space=pltpu.VMEM),    # zb
            pl.BlockSpec(memory_space=pltpu.VMEM),    # zp
            pl.BlockSpec(memory_space=pltpu.VMEM),    # yb
            pl.BlockSpec(memory_space=pltpu.VMEM),    # yp
        ],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(5)),
        scratch_shapes=[
            pltpu.VMEM((Mi, phi, B3, GW), f32),       # resident pivots
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((B3, B3), f32),                # identity
            pltpu.VMEM((Mi, GW), f32),                # t rows
            pltpu.VMEM((Mi, GW), f32),                # y rows
            pltpu.VMEM((Mi, GW), f32),                # w_t rows
        ],
    )
    kern = functools.partial(_kernel, n_inner=n_inner, Mi=Mi, B3=B3,
                             phi=phi, M=M, npp=npp, PL=PL,
                             pair_split=pair_split, ablate=ablate)
    out_shapes = (
        jax.ShapeDtypeStruct((Mi, GW), f32),
        jax.ShapeDtypeStruct((D, B3), f32),
        jax.ShapeDtypeStruct((D, PL), f32),
        jax.ShapeDtypeStruct((D, B3), f32),
        jax.ShapeDtypeStruct((D, PL), f32),
    )
    return pl.pallas_call(
        kern, out_shape=out_shapes, grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(jnp.asarray(rho_idx, jnp.int32).reshape(1), d6, scal, xpin,
      g_rows, lb_t, ub_t, ndT, skT, skB, pl_t, w_rows, zb, zp, yb, yp)


def run_chunk(ops_f: FusedOperands, rho_idx, sigma, alpha, w, z, y,
              n_inner: int, interpret: bool | None = None,
              pair_split: int = 3, ablate: tuple = ()):
    """XLA-facing entry: takes/returns solver-layout state
    (w [B, K3, nw], z/y as NSConstr trees), converts to kernel tiles,
    runs one fused chunk.  interpret=None auto-selects the Pallas
    interpreter on the CPU backend (Mosaic is TPU-only), which is what
    the CPU unit tests exercise."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    d = ops_f.dims
    B, K3, phi, Mi, P = d["B"], d["K3"], d["phi"], d["Mi"], d["P"]
    PL = d["PL"]
    w_rows = rows_from_state(w.astype(f32), Mi, phi)
    zb = box_tiles(z.box.astype(f32))
    zp = pair_tiles(z.pair.astype(f32), PL)
    yb = box_tiles(y.box.astype(f32))
    yp = pair_tiles(y.pair.astype(f32), PL)
    dims_key = tuple(sorted(d.items()))
    w_o, zb_o, zp_o, yb_o, yp_o = _chunk_jit(
        rho_idx, ops_f.tree(), jnp.asarray(sigma, f32),
        jnp.asarray(alpha, f32), w_rows, zb, zp, yb, yp,
        n_inner=n_inner, dims_key=dims_key, interpret=interpret,
        pair_split=pair_split, ablate=ablate)
    from ..qp.nullspace import NSConstr
    w_new = state_from_rows(w_o, B, K3, phi).astype(w.dtype)
    z_new = NSConstr(box=box_untile(zb_o, B, K3).astype(z.box.dtype),
                     pair=pair_untile(zp_o, P).astype(z.pair.dtype))
    y_new = NSConstr(box=box_untile(yb_o, B, K3).astype(y.box.dtype),
                     pair=pair_untile(yp_o, P).astype(y.pair.dtype))
    return w_new, z_new, y_new
