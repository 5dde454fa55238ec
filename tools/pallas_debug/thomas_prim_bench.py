"""In-kernel primitive timing for the Thomas kernel redesign: which ops
actually cost what on the v5e, measured with enough in-kernel repetition
to swamp dispatch overhead.

Modes (one compiled kernel each, REPS x Mi inner steps):
  dma     : double-buffered HBM->VMEM streaming only (the byte floor)
  mv_sub  : dma + broadcast-mult + SUBLANE reduce (axis=0)  [_mv_cr]
  mv_lane : dma + broadcast-mult + LANE reduce (axis=1)     [_mv_rc]
  mv_mxu  : dma + [1,bs]@[bs,bs] single-pass bf16 MXU dot
  trans   : dma + jnp.transpose of the streamed [bs, bs] block
  fwd     : the production forward-elimination step (3 VPU ops)

Usage: python tools/pallas_debug/thomas_prim_bench.py [--reps 20]
"""
from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=640)
    ap.add_argument("--mi", type=int, default=35)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--modes",
                    default="dma,mv_sub,mv_lane,mv_mxu,trans,fwd")
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Mi, bs, REPS = args.mi, args.bs, args.reps
    f32 = jnp.float32
    rng = np.random.default_rng(0)
    dinvs = (0.01 * rng.standard_normal((1, Mi, bs, bs))).astype(np.float32)
    koM = (0.1 * rng.standard_normal((bs, bs))).astype(np.float32)
    b = rng.standard_normal((Mi, bs)).astype(np.float32)

    def make(mode, nbuf=2):
        grp = nbuf if mode in ("dmag", "dmaq") else 1

        def kern(rho_ref, dinvs_ref, koM_ref, b_ref, out_ref,
                 buf_ref, sem_ref, acc_ref, gbuf_ref, gsem_ref):
            r = rho_ref[0]
            out_ref[...] = jnp.zeros_like(out_ref)

            def dma(slot, k):
                return pltpu.make_async_copy(
                    dinvs_ref.at[r, k], buf_ref.at[slot],
                    sem_ref.at[slot])

            def dmaq(slot, k, q):
                """block k split into `q` parallel row-range copies."""
                rows = bs // q
                return [pltpu.make_async_copy(
                    dinvs_ref.at[r, k, pl.ds(i * rows, rows)],
                    gbuf_ref.at[slot, 0, pl.ds(i * rows, rows)],
                    gsem_ref.at[slot, i]) for i in range(q)]

            def sweep_q(rep, _):
                for c in dmaq(0, 0, grp):
                    c.start()

                def body(k, _):
                    @pl.when(k < Mi - 1)
                    def _():
                        for c in dmaq((k + 1) % 2, k + 1, grp):
                            c.start()
                    slot = k % 2
                    for c in dmaq(slot, k, grp):
                        c.wait()
                    A = gbuf_ref[slot, 0]
                    acc_ref[pl.ds(0, 1), :] = (acc_ref[pl.ds(0, 1), :]
                                               + A[0:1, :])
                    return 0
                jax.lax.fori_loop(0, Mi, body, 0)
                return 0

            def dmag(slot, g):
                return pltpu.make_async_copy(
                    dinvs_ref.at[r, pl.ds(g * grp, grp)],
                    gbuf_ref.at[slot], gsem_ref.at[slot, 0])

            def sweep_grouped(rep, _):
                ng = Mi // grp
                dmag(0, 0).start()

                def body(g, _):
                    @pl.when(g < ng - 1)
                    def _():
                        dmag((g + 1) % 2, g + 1).start()
                    slot = g % 2
                    dmag(slot, g).wait()
                    A = gbuf_ref[slot, 0]
                    acc_ref[pl.ds(0, 1), :] = (acc_ref[pl.ds(0, 1), :]
                                               + A[0:1, :])
                    return 0
                jax.lax.fori_loop(0, ng, body, 0)
                return 0

            def sweep(rep, _):
                def prologue(k, _):
                    @pl.when(k < Mi)
                    def _():
                        dma(k % nbuf, k).start()
                    return 0
                jax.lax.fori_loop(0, nbuf - 1, prologue, 0)

                def body(k, _):
                    @pl.when(k + nbuf - 1 < Mi)
                    def _():
                        dma((k + nbuf - 1) % nbuf, k + nbuf - 1).start()
                    slot = k % nbuf
                    dma(slot, k).wait()
                    A = buf_ref[slot]
                    vrow = acc_ref[pl.ds(0, 1), :]
                    if mode == "dma":
                        acc_ref[pl.ds(0, 1), :] = vrow + A[0:1, :]
                    elif mode == "mv_sub":
                        vcol = acc_ref[:, 0:1]    # static col slice
                        acc_ref[pl.ds(0, 1), :] = jnp.sum(
                            A * vcol, axis=0, keepdims=True)
                    elif mode == "mv_lane":
                        acc_ref[:, 0:1] = jnp.sum(
                            A * vrow, axis=1, keepdims=True)
                    elif mode == "mv_mxu":
                        d = jax.lax.dot_general(
                            vrow.astype(jnp.bfloat16),
                            A.astype(jnp.bfloat16),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=f32,
                            precision=jax.lax.Precision.DEFAULT)
                        acc_ref[pl.ds(0, 1), :] = d
                    elif mode == "trans":
                        acc_ref[...] = acc_ref[...] * 0.5 + jnp.transpose(A)
                    elif mode == "fwd":
                        t_col = jnp.sum(A * vrow, axis=1, keepdims=True)
                        row2 = jnp.sum(A * t_col, axis=0, keepdims=True)
                        acc_ref[pl.ds(0, 1), :] = (
                            b_ref[pl.ds(k, 1), :]
                            - jnp.sum(koM_ref[...] * t_col, axis=0,
                                      keepdims=True) + row2 * 1e-30)
                    return 0
                jax.lax.fori_loop(0, Mi, body, 0)
                return 0

            jax.lax.fori_loop(0, REPS,
                              {"dmag": sweep_grouped,
                               "dmaq": sweep_q}.get(mode, sweep),
                              0)
            out_ref[pl.ds(0, 1), :] = acc_ref[pl.ds(0, 1), :]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((nbuf, bs, bs), f32),
                            pltpu.SemaphoreType.DMA((nbuf,)),
                            pltpu.VMEM((bs, bs), f32),
                            pltpu.VMEM((2, grp, bs, bs), f32),
                            pltpu.SemaphoreType.DMA((2, max(grp, 1)))],
        )

        @jax.jit
        def run(dv, km, bb):
            return pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct((Mi, bs), f32),
                grid_spec=grid_spec, interpret=args.interpret,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(jnp.int32(0).reshape(1), dv, km, bb)
        return run

    dv = jnp.asarray(dinvs)
    km = jnp.asarray(koM)
    bb = jnp.asarray(b)
    for mode in args.modes.split(","):
        nbuf = 2
        if "@" in mode:
            mode, nb = mode.split("@")
            nbuf = int(nb)
        try:
            fn = make(mode, nbuf)
            fn(dv, km, bb).block_until_ready()
            times = []
            for rep in range(3):
                b2 = bb + 1e-6 * (rep + 1)
                t0 = time.perf_counter()
                np.asarray(fn(dv, km, b2))
                times.append(time.perf_counter() - t0)
            per_step = min(times) / (REPS * Mi)
            log(f"{mode:>8}: {per_step * 1e6:8.2f} us/step "
                f"({min(times) * 1e3:.1f} ms total, reps={REPS})")
        except Exception as e:  # noqa
            log(f"{mode:>8}: FAILED {str(e)[:300]}")


if __name__ == "__main__":
    main()
