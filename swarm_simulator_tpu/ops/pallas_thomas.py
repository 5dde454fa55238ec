"""Pallas TPU kernel: block-tridiagonal (Thomas) solve with explicit
HBM->VMEM double-buffered streaming of the pivot-block inverses.

This is the hot memory op of the joint knot-state ADMM
(qp/nullspace.py, kkt_mode="banded", replacing the CPLEX hot spot
rbp_planner.hpp:111-206).  The measured roofline on the 64-agent
operator (tools/thomas_bench.py, v5e): one KKT apply streams ~93 MB of
dense pivot inverses (forward + backward sweep) for a ~113 us byte
floor; the XLA lax.scan path pays 359 us.  Kernel design:

  * only the Mi dense pivot blocks stream from HBM (double-buffered,
    prefetch-one-ahead async DMA, so the copy overlaps compute);
  * the off-diagonal blocks are I_B3 (x) Ho; with UNIFORM segment
    durations Ho is constant over knots, so the dense [bs, bs]
    expansion KoM = I (x) Ho is hoisted into VMEM ONCE for the whole
    solve — zero per-step HBM traffic for it;
  * the rho rung index enters as a scalar-prefetch argument and the DMA
    slices Dinvs[rho_idx, k] directly from HBM — no 45 MB gather of the
    selected rung ever materializes;
  * matvecs run on the VPU as broadcast-multiply + cross-dim reduction
    in TRUE f32 (an MXU formulation is weight-load bound at ~1.85 ms:
    each [1,bs]x[bs,bs] dot streams the whole block through the
    systolic array for one useful row, x6 for the bf16-split passes;
    the VPU does the same 0.33 MFLOP at full f32 in ~1 us).  Each
    reduction flips the vector between row [1,bs] and column [bs,1]
    orientation, so the sweeps are arranged to need no transposes:
    the forward pass stores T_k = y_k @ Dinv_k (the row-oriented
    by-product of its own recursion), which is exactly the term the
    backward pass needs: x_k = T_k - (x_{k+1} @ Ko^T) @ Dinv_k.
    The one orientation flip per knot goes through a VMEM-resident
    identity ("multiply by I" = transpose on the VPU).  The pivot
    inverses are symmetrized at prep (prepare_ns_np), so v @ Dinv
    equals Dinv @ v and both reduce directions are exact.

Falls back to the XLA scan path (make_kinv_apply) for non-uniform
segment durations or batched (vmapped) solves.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32


def _mv_rc(v_row, A):
    """row [1, bs] x [bs, bs] -> column [bs, 1]: out[s] = sum_l A[s,l] v[l].
    For symmetric A this is (v @ A) in column orientation."""
    return jnp.sum(A * v_row, axis=1, keepdims=True)


def _mv_cr(v_col, A):
    """column [bs, 1] x [bs, bs] -> row [1, bs]: out[j] = sum_r v[r] A[r,j]
    = (v @ A) in row orientation."""
    return jnp.sum(A * v_col, axis=0, keepdims=True)


def _kernel(rho_ref, dinvs_ref, koM_ref, b_ref, x_ref,
            buf_ref, sem_ref, t_ref, eye_ref, *, Mi: int, bs: int,
            fwd_only: bool = False):
    r = rho_ref[0]

    # identity, built once: "multiply by I" is the VPU transpose
    ii = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
    eye_ref[:] = (ii == jj).astype(f32)

    def dma(slot, k):
        return pltpu.make_async_copy(dinvs_ref.at[r, k],
                                     buf_ref.at[slot], sem_ref.at[slot])

    def row(ref, k):
        return ref[pl.ds(k, 1), :]

    # ---- forward elimination: y_k = b_k - (y_{k-1} Dinv_{k-1}) KoM ----
    # y rows live in x_ref (the backward pass overwrites slot k only
    # after its last read); T_k = y_k Dinv_k rows live in t_ref
    x_ref[pl.ds(0, 1), :] = row(b_ref, 0)
    if Mi > 1:          # Mi == 1: the last-pivot section issues block 0
        dma(0, 0).start()

    def fwd(k, _):
        @pl.when(k < Mi - 1)
        def _():
            dma(k % 2, k).start()      # consumed by iteration k+1
        slot = (k - 1) % 2
        dma(slot, k - 1).wait()
        t_col = _mv_rc(row(x_ref, k - 1), buf_ref[slot])
        t_ref[pl.ds(k - 1, 1), :] = _mv_cr(t_col, eye_ref[:])
        x_ref[pl.ds(k, 1), :] = row(b_ref, k) - _mv_cr(t_col, koM_ref[:])
        return 0

    jax.lax.fori_loop(1, Mi, fwd, 0, unroll=False)

    if fwd_only:    # debug probe (tools/pallas_debug/thomas_probe.py)
        return

    # ---- last pivot: x_{Mi-1} = y_{Mi-1} Dinv_{Mi-1} ----
    slot_last = (Mi - 1) % 2
    dma(slot_last, Mi - 1).start()
    dma(slot_last, Mi - 1).wait()
    t_col = _mv_rc(row(x_ref, Mi - 1), buf_ref[slot_last])
    x_ref[pl.ds(Mi - 1, 1), :] = _mv_cr(t_col, eye_ref[:])

    # ---- back substitution: x_k = T_k - (x_{k+1} KoM^T) Dinv_k ----
    # w = x_{k+1} KoM^T in column form is sum_l KoM[s,l] x[l] (_mv_rc
    # with KoM directly); then (w Dinv_k) in row form closes the step.
    @pl.when(Mi > 1)
    def _():
        dma((Mi - 2) % 2, Mi - 2).start()

        def bwd(j, _):
            k = Mi - 2 - j

            @pl.when(k > 0)
            def _():
                dma((k - 1) % 2, k - 1).start()
            slot = k % 2
            w_col = _mv_rc(row(x_ref, k + 1), koM_ref[:])
            dma(slot, k).wait()
            x_ref[pl.ds(k, 1), :] = (row(t_ref, k)
                                     - _mv_cr(w_col, buf_ref[slot]))
            return 0

        jax.lax.fori_loop(0, Mi - 1, bwd, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("interpret",))
def thomas_solve_pallas(dinvs: jnp.ndarray, koM: jnp.ndarray,
                        koMT: jnp.ndarray, b: jnp.ndarray,
                        rho_idx: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """Solve the block-tridiagonal system for one rung.

    dinvs: [R, Mi, bs, bs] pivot inverses (all rungs, stays in HBM),
           symmetrized at prep
    koM:   [bs, bs] = I_B3 (x) Ho (uniform off-diagonal), VMEM-resident
    koMT:  koM transpose (unused by the VPU kernel; kept for interface
           stability with the XLA fallback path)
    b:     [Mi, bs] right-hand side
    rho_idx: scalar int32 rung selector
    Returns x [Mi, bs].

    Mosaic requires HBM DMA slices 128-aligned in the lane dim; bs is
    typically not (64 agents -> bs=576).  The zero tail rows/cols of
    padded operands propagate exact zeros through the sweeps.  Pad
    `dinvs` ONCE at operator prep (pad_pivots / prepare_ns_np with
    thomas_kernel=True): an in-trace pad of the ~0.5 GB rung inventory
    costs a full HBM copy per solve dispatch if XLA fails to hoist it.
    The small per-call operands (koM, b) are padded here.
    """
    del koMT
    R, Mi, bsp, _ = dinvs.shape
    bs = b.shape[-1]
    if bsp % 128:                      # unpadded inventory (small/tests)
        dinvs = pad_pivots(dinvs)
        bsp = dinvs.shape[-1]
    if bs != bsp:
        koM = jnp.zeros((bsp, bsp), koM.dtype).at[:bs, :bs].set(koM)
        b = jnp.zeros((Mi, bsp), b.dtype).at[:, :bs].set(b)
        return _call(dinvs, koM, b, rho_idx, interpret)[:, :bs]
    return _call(dinvs, koM, b, rho_idx, interpret)


def pad_pivots(dinvs):
    """Zero-pad the pivot-block inventory [R, Mi, bs, bs] to the 128-lane
    grid in BOTH block dims (done once at prep; numpy or jax array)."""
    bs = dinvs.shape[-1]
    pad = (-bs) % 128
    if not pad:
        return dinvs
    if isinstance(dinvs, jnp.ndarray):
        R, Mi = dinvs.shape[:2]
        return jnp.zeros((R, Mi, bs + pad, bs + pad), dinvs.dtype
                         ).at[:, :, :bs, :bs].set(dinvs)
    import numpy as onp
    return onp.pad(dinvs, [(0, 0), (0, 0), (0, pad), (0, pad)])


# ----------------------------------------------------------------------
# Chunked sweeps for the CROSS-DEVICE pipeline (qp/nullspace_shard,
# mode="chunk"): the knot axis is sharded into contiguous chunks, the
# sweeps flow device-to-device via [bs]-carry ppermutes, and each device
# runs these kernels on ITS local pivot slab — the production streaming
# path inside shard_map.  Same VPU/DMA design as the full kernel; the
# boundary state enters/leaves as one row:
#   fwd:  carry in t_{k0-1} (= Dinv y of the previous chunk's last knot),
#         emit the T rows (t_k = Dinv_k y_k) of this chunk; carry out is
#         T[-1].  Chunk 0 feeds zeros (y_0 = b_0 exactly).
#   bwd:  carry in x_{k0+L} (the next chunk's first solution row), emit
#         x rows; carry out is x[0].  The knot axis is zero-padded
#         (pad_knots: Dinv = 0 blocks, b = 0 rows), which makes the
#         global-last-pivot case uniform: pads propagate exact zeros.


def _chunk_fwd_kernel(rho_ref, dinvs_ref, koM_ref, b_ref, tin_ref, T_ref,
                      buf_ref, sem_ref, eye_ref, *, L: int, bs: int):
    r = rho_ref[0]
    ii = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
    eye_ref[:] = (ii == jj).astype(f32)

    def dma(slot, k):
        return pltpu.make_async_copy(dinvs_ref.at[r, k],
                                     buf_ref.at[slot], sem_ref.at[slot])

    def row(ref, k):
        return ref[pl.ds(k, 1), :]

    dma(0, 0).start()

    def fwd(k, _):
        @pl.when(k < L - 1)
        def _():
            dma((k + 1) % 2, k + 1).start()
        # t_{k-1} as column: the carry row for k == 0, else T[k-1]
        t_prev = tin_ref[:] if L == 1 else \
            jnp.where(k == 0, tin_ref[:], row(T_ref, jnp.maximum(k - 1, 0)))
        t_col = _mv_rc(t_prev, eye_ref[:])
        y_row = row(b_ref, k) - _mv_cr(t_col, koM_ref[:])
        slot = k % 2
        dma(slot, k).wait()
        tk_col = _mv_rc(y_row, buf_ref[slot])
        T_ref[pl.ds(k, 1), :] = _mv_cr(tk_col, eye_ref[:])
        return 0

    jax.lax.fori_loop(0, L, fwd, 0, unroll=False)


def _chunk_bwd_kernel(rho_ref, dinvs_ref, koM_ref, T_in_ref, xin_ref, x_ref,
                      buf_ref, sem_ref, *, L: int, bs: int):
    r = rho_ref[0]

    def dma(slot, k):
        return pltpu.make_async_copy(dinvs_ref.at[r, k],
                                     buf_ref.at[slot], sem_ref.at[slot])

    def row(ref, k):
        return ref[pl.ds(k, 1), :]

    dma((L - 1) % 2, L - 1).start()

    def bwd(j, _):
        k = L - 1 - j

        @pl.when(k > 0)
        def _():
            dma((k - 1) % 2, k - 1).start()
        x_next = xin_ref[:] if L == 1 else \
            jnp.where(k == L - 1, xin_ref[:],
                      row(x_ref, jnp.minimum(k + 1, L - 1)))
        w_col = _mv_rc(x_next, koM_ref[:])
        slot = k % 2
        dma(slot, k).wait()
        x_ref[pl.ds(k, 1), :] = row(T_in_ref, k) - _mv_cr(w_col,
                                                          buf_ref[slot])
        return 0

    jax.lax.fori_loop(0, L, bwd, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("interpret",))
def thomas_chunk_fwd(dinvs: jnp.ndarray, koM: jnp.ndarray, b: jnp.ndarray,
                     t_in: jnp.ndarray, rho_idx: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """Forward sweep over ONE knot chunk: T rows [L, bs] (t_k = Dinv_k y_k);
    the carry out for the next chunk is T[-1].  Operands must already be
    lane-padded (dinvs [R, L, bsp, bsp] via pad_pivots; koM/b/t_in to
    bsp)."""
    R, L, bs, _ = dinvs.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # dinvs (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # koM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b
            pl.BlockSpec(memory_space=pltpu.VMEM),   # t_in
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, bs, bs), dinvs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((bs, bs), f32),               # identity
        ],
    )
    return pl.pallas_call(
        functools.partial(_chunk_fwd_kernel, L=L, bs=bs),
        out_shape=jax.ShapeDtypeStruct((L, bs), f32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(jnp.asarray(rho_idx, jnp.int32).reshape(1), dinvs, koM, b,
      t_in.reshape(1, bs))


@functools.partial(jax.jit, static_argnames=("interpret",))
def thomas_chunk_bwd(dinvs: jnp.ndarray, koM: jnp.ndarray, T: jnp.ndarray,
                     x_in: jnp.ndarray, rho_idx: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """Backward sweep over ONE knot chunk: x rows [L, bs] from the fwd
    sweep's T rows and the next chunk's first solution row x_in; the
    carry out for the previous chunk is x[0]."""
    R, L, bs, _ = dinvs.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # dinvs (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # koM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # T
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x_in
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, bs, bs), dinvs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_chunk_bwd_kernel, L=L, bs=bs),
        out_shape=jax.ShapeDtypeStruct((L, bs), f32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(jnp.asarray(rho_idx, jnp.int32).reshape(1), dinvs, koM, T,
      x_in.reshape(1, bs))


def _call(dinvs, koM, b, rho_idx, interpret):
    R, Mi, bs, _ = dinvs.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # dinvs (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # koM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            # double buffer matches the inventory dtype (bf16 halves
            # the HBM stream in precond_dtype="bfloat16" mode; the
            # VPU promotes bf16 slabs to f32 at the multiply)
            pltpu.VMEM((2, bs, bs), dinvs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((Mi, bs), f32),               # T_k rows
            pltpu.VMEM((bs, bs), f32),               # identity
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, Mi=Mi, bs=bs),
        out_shape=jax.ShapeDtypeStruct((Mi, bs), f32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # generous: double buffer + koM + identity + temporaries;
            # a tight limit trips "scoped vmem" stack OOM (measured
            # 100.14M needed at 256-agent shapes when the call sits
            # inside an outer loop body)
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(jnp.asarray(rho_idx, jnp.int32).reshape(1), dinvs, koM, b)
