"""Compiled-TPU probes for ops/pallas_thomas.py: isolate which stage of
the kernel breaks on hardware (interpret mode runs the same program on
CPU and is the reference).

Synthetic small operands (no planner prep), aligned bs by default so the
padding path is out of the picture.  Probes:

  1. dma:    copy dinvs[r, k] -> out for each k (DMA + scalar-prefetch
             indexing only)
  2. mv:     out[k] = b[k] @ dinvs[r, k]  (DMA + VPU matvec + identity
             transpose)
  3. fwd:    forward elimination only
  4. full:   the production kernel vs numpy Thomas

Usage: python tools/pallas_debug/thomas_probe.py [--bs 256] [--mi 4]
"""
from __future__ import annotations

import argparse
import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=256)
    ap.add_argument("--mi", type=int, default=4)
    ap.add_argument("--rungs", type=int, default=2)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--probes", default="dma,mv,fwd,full")
    args = ap.parse_args()

    import jax
    if args.interpret:      # interpret mode = CPU emulation; don't drive
        jax.config.update("jax_platforms", "cpu")   # the axon tunnel
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from swarm_simulator_tpu.ops import pallas_thomas as T

    R, Mi, bs = args.rungs, args.mi, args.bs
    rng = np.random.default_rng(0)
    # well-conditioned blocks ~ scaled identities + noise
    dinvs = np.stack([np.eye(bs) * (1 + 0.1 * r) for r in range(R)])
    dinvs = dinvs[:, None] + 0.01 * rng.standard_normal((R, Mi, bs, bs))
    dinvs = dinvs.astype(np.float32)
    koM = (0.1 * rng.standard_normal((bs, bs))).astype(np.float32)
    b = rng.standard_normal((Mi, bs)).astype(np.float32)
    r_sel = 1 % R

    dinvs_j = jnp.asarray(dinvs)
    koM_j = jnp.asarray(koM)
    b_j = jnp.asarray(b)
    interp = args.interpret
    probes = args.probes.split(",")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, bs, bs), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.VMEM((Mi, bs), jnp.float32),
                        pltpu.VMEM((bs, bs), jnp.float32)],
    )

    def run(kernel):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((Mi, bs), jnp.float32),
            grid_spec=grid_spec, interpret=interp,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(jnp.int32(r_sel).reshape(1), dinvs_j, koM_j, b_j)

    # ---- probe 1: DMA each block's row 0 out --------------------------
    if "dma" in probes:
        def k_dma(rho_ref, dinvs_ref, koM_ref, b_ref, out_ref,
                  buf_ref, sem_ref, t_ref, eye_ref):
            r = rho_ref[0]

            def body(k, _):
                cp = pltpu.make_async_copy(dinvs_ref.at[r, k],
                                           buf_ref.at[k % 2],
                                           sem_ref.at[k % 2])
                cp.start()
                cp.wait()
                out_ref[pl.ds(k, 1), :] = buf_ref[k % 2][0:1, :]
                return 0
            jax.lax.fori_loop(0, Mi, body, 0)

        got = np.asarray(run(k_dma))
        want = dinvs[r_sel, :, 0, :]
        log(f"dma probe: max err {np.abs(got - want).max():.2e}")

    # ---- probe 2: matvec + identity transpose per block ---------------
    if "mv" in probes:
        def k_mv(rho_ref, dinvs_ref, koM_ref, b_ref, out_ref,
                 buf_ref, sem_ref, t_ref, eye_ref):
            r = rho_ref[0]
            ii = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
            eye_ref[:] = (ii == jj).astype(jnp.float32)

            def body(k, _):
                cp = pltpu.make_async_copy(dinvs_ref.at[r, k],
                                           buf_ref.at[k % 2],
                                           sem_ref.at[k % 2])
                cp.start()
                cp.wait()
                t_col = T._mv_rc(b_ref[pl.ds(k, 1), :], buf_ref[k % 2])
                out_ref[pl.ds(k, 1), :] = T._mv_cr(t_col, eye_ref[:])
                return 0
            jax.lax.fori_loop(0, Mi, body, 0)

        got = np.asarray(run(k_mv))
        # _mv_rc(v, A) = sum_l A[s,l] v[l] = A @ v; symmetrize NOT
        # applied to synthetic blocks, so reference is D @ b_k
        want = np.einsum("kbc,kc->kb", dinvs[r_sel].astype(np.float64),
                         b.astype(np.float64))
        rel = np.abs(got - want).max() / np.abs(want).max()
        log(f"mv probe: max rel err {rel:.2e}")

    # ---- probe 3: forward elimination only ----------------------------
    if "fwd" in probes:
        def k_fwd(rho_ref, dinvs_ref, koM_ref, b_ref, out_ref,
                  buf_ref, sem_ref, t_ref, eye_ref):
            T._kernel(rho_ref, dinvs_ref, koM_ref, b_ref, out_ref,
                      buf_ref, sem_ref, t_ref, eye_ref, Mi=Mi, bs=bs,
                      fwd_only=True)

        got = np.asarray(run(k_fwd))
        want = np.zeros((Mi, bs))
        want[0] = b[0]
        # the VPU kernel computes y_{k-1} @ Dinv as Dinv @ y (symmetric
        # in production); mirror ITS convention for synthetic blocks
        d64 = dinvs[r_sel].astype(np.float64)
        k64 = koM.astype(np.float64)
        for k in range(1, Mi):
            want[k] = b[k] - (d64[k - 1] @ want[k - 1]) @ k64
        rel = np.abs(got - want).max() / np.abs(want).max()
        log(f"fwd probe: max rel err {rel:.2e}")

    # ---- probe 4: full kernel vs numpy Thomas -------------------------
    if "full" in probes:
        dsym = 0.5 * (dinvs + dinvs.transpose(0, 1, 3, 2))
        got = np.asarray(T.thomas_solve_pallas(
            jnp.asarray(dsym), koM_j, koM_j.T, b_j, jnp.int32(r_sel),
            interpret=interp))
        d64 = dsym[r_sel].astype(np.float64)
        k64 = koM.astype(np.float64)
        y = np.zeros((Mi, bs))
        y[0] = b[0]
        for k in range(1, Mi):
            y[k] = b[k] - (y[k - 1] @ d64[k - 1]) @ k64
        x = np.zeros((Mi, bs))
        x[Mi - 1] = y[Mi - 1] @ d64[Mi - 1]
        for k in range(Mi - 2, -1, -1):
            x[k] = (y[k] - x[k + 1] @ k64.T) @ d64[k]
        rel = np.abs(got - x).max() / np.abs(x).max()
        log(f"full probe: max rel err {rel:.2e}")


if __name__ == "__main__":
    main()
