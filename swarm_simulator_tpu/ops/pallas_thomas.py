"""Pallas TPU kernel: block-tridiagonal (Thomas) solve with explicit
HBM->VMEM double-buffered streaming of the pivot-block inverses.

This is the hot memory op of the joint knot-state ADMM
(qp/nullspace.py, kkt_mode="banded", replacing the CPLEX hot spot
rbp_planner.hpp:111-206).  The measured roofline
(benchmarks/stack_study_tpu.json): the iteration is HBM-bandwidth-bound
streaming ~45 MB of dense pivot inverses per sweep; the XLA lax.scan
pays ~0.36 ms/iteration against a ~110 us byte floor.  This kernel
closes the scheduling gap:

  * only the Mi dense pivot blocks stream from HBM (double-buffered,
    prefetch-one-ahead DMA, so DMA overlaps the MXU matvecs);
  * the off-diagonal blocks are I_B3 (x) Ho; with UNIFORM segment
    durations Ho is constant over knots, so the two dense [bs, bs]
    expansions (KoM = I (x) Ho and its transpose) are hoisted into VMEM
    ONCE for the whole solve — zero per-step HBM traffic for them;
  * the rho rung index enters as a scalar-prefetch argument and the DMA
    slices Dinvs[rho_idx, k] directly from HBM — no 45 MB gather of the
    selected rung ever materializes;
  * matvecs run as row-vector [1, bs] @ [bs, bs] MXU dots in the 3-way
    bf16-split scheme (see ops/pallas_admm.py provenance): Mosaic feeds
    the MXU bf16 regardless of the f32 precision request, and the split
    recovers f32-class accuracy.  The pivot inverses are symmetrized at
    prep (prepare_ns_np), so v @ Dinv is exactly the column-form apply.

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
bf16 = jnp.bfloat16


def _split3(a):
    """f32 -> three bf16 parts on the bf16 grid via top-16-bit masking
    (plain bf16 round-trips get elided under --xla_allow_excess_precision,
    silently degrading to single-pass bf16)."""
    u32 = jnp.uint32
    mask = u32(0xFFFF0000)
    ua = jax.lax.bitcast_convert_type(a, u32)
    a0 = jax.lax.bitcast_convert_type(ua & mask, f32)
    r = a - a0
    ur = jax.lax.bitcast_convert_type(r, u32)
    a1 = jax.lax.bitcast_convert_type(ur & mask, f32)
    a2 = r - a1
    return a0.astype(bf16), a1.astype(bf16), a2.astype(bf16)


def _mv(v, M):
    """[1, bs] @ [bs, bs] with f32-via-bf16 3-way split (6 cross terms)."""
    a0, a1, a2 = _split3(v)
    b0, b1, b2 = _split3(M)
    dns = (((1,), (0,)), ((), ()))
    d = lambda u, w: jax.lax.dot_general(u, w, dns,
                                         preferred_element_type=f32)
    return (d(a0, b0)
            + (d(a0, b1) + d(a1, b0))
            + (d(a0, b2) + d(a1, b1) + d(a2, b0)))


def _kernel(rho_ref, dinvs_ref, koM_ref, koMT_ref, b_ref, x_ref,
            buf_ref, sem_ref, *, Mi: int, bs: int,
            fwd_only: bool = False):
    r = rho_ref[0]

    def dma(slot, k):
        return pltpu.make_async_copy(dinvs_ref.at[r, k],
                                     buf_ref.at[slot], sem_ref.at[slot])

    def row(ref, k):
        return ref[pl.ds(k, 1), :]

    # ---- forward elimination: y_k = b_k - (y_{k-1} Dinv_{k-1}) KoM ----
    # y is stored in x_ref (the backward pass overwrites slot k only
    # after its last read of y_k)
    x_ref[pl.ds(0, 1), :] = row(b_ref, 0)
    dma(0, 0).start()

    def fwd(k, _):
        @pl.when(k < Mi - 1)
        def _():
            dma(k % 2, k).start()      # consumed by iteration k+1
        slot = (k - 1) % 2
        dma(slot, k - 1).wait()
        t = _mv(row(x_ref, k - 1), buf_ref[slot])
        x_ref[pl.ds(k, 1), :] = row(b_ref, k) - _mv(t, koM_ref[:])
        return 0

    jax.lax.fori_loop(1, Mi, fwd, 0, unroll=False)

    if fwd_only:    # debug probe (tools/pallas_debug/thomas_probe.py)
        return

    # ---- last pivot: x_{Mi-1} = y_{Mi-1} Dinv_{Mi-1} ----
    slot_last = (Mi - 1) % 2
    dma(slot_last, Mi - 1).start()
    dma(slot_last, Mi - 1).wait()
    x_ref[pl.ds(Mi - 1, 1), :] = _mv(row(x_ref, Mi - 1),
                                     buf_ref[slot_last])

    # ---- back substitution: x_k = (y_k - x_{k+1} KoM^T) Dinv_k ----
    @pl.when(Mi > 1)
    def _():
        dma((Mi - 2) % 2, Mi - 2).start()

        def bwd(j, _):
            k = Mi - 2 - j

            @pl.when(k > 0)
            def _():
                dma((k - 1) % 2, k - 1).start()
            slot = k % 2
            dma(slot, k).wait()
            z = row(x_ref, k) - _mv(row(x_ref, k + 1), koMT_ref[:])
            x_ref[pl.ds(k, 1), :] = _mv(z, buf_ref[slot])
            return 0

        jax.lax.fori_loop(0, Mi - 1, bwd, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("interpret",))
def thomas_solve_pallas(dinvs: jnp.ndarray, koM: jnp.ndarray,
                        koMT: jnp.ndarray, b: jnp.ndarray,
                        rho_idx: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """Solve the block-tridiagonal system for one rung.

    dinvs: [R, Mi, bs, bs] pivot inverses (all rungs, stays in HBM)
    koM:   [bs, bs] = I_B3 (x) Ho (uniform off-diagonal), VMEM-resident
    koMT:  koM transpose
    b:     [Mi, bs] right-hand side
    rho_idx: scalar int32 rung selector
    Returns x [Mi, bs].

    Mosaic requires HBM DMA slices 128-aligned in the lane dim; bs is
    typically not (64 agents -> bs=576).  We zero-pad every operand to
    the lane grid — under jit the pads are loop-invariant, so XLA hoists
    the one-time padded copy out of the ADMM iteration loop, and the
    zero tail rows/cols propagate exact zeros through the sweeps.
    """
    R, Mi, bs, _ = dinvs.shape
    pad = (-bs) % 128
    if pad:
        bsp = bs + pad
        dinvs = jnp.zeros((R, Mi, bsp, bsp), dinvs.dtype
                          ).at[:, :, :bs, :bs].set(dinvs)
        koM = jnp.zeros((bsp, bsp), koM.dtype).at[:bs, :bs].set(koM)
        koMT = jnp.zeros((bsp, bsp), koMT.dtype).at[:bs, :bs].set(koMT)
        b = jnp.zeros((Mi, bsp), b.dtype).at[:, :bs].set(b)
        return thomas_solve_pallas(dinvs, koM, koMT, b, rho_idx,
                                   interpret=interpret)[:, :bs]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # dinvs (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # koM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # koMT
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, bs, bs), f32),            # double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, Mi=Mi, bs=bs),
        out_shape=jax.ShapeDtypeStruct((Mi, bs), f32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # generous: double buffer + koM/koMT + their bf16 split
            # temporaries; a tight limit trips "scoped vmem" stack OOM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(jnp.asarray(rho_idx, jnp.int32).reshape(1), dinvs, koM, koMT, b)
