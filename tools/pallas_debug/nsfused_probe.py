"""Feasibility probes for the fused VMEM-resident ADMM chunk kernel.

The plan (ops/pallas_nsfused.py): hold ONE rho rung's pivot-block
inventory resident in VMEM across a whole check_every-sized chunk of
ADMM iterations, eliminating the per-iteration ~90 MB HBM pivot stream
that bounds the XLA path (359 us/iter at the measured ~250 GB/s
ceiling).  Risky Mosaic pieces probed here, smallest first:

  P1  sublane reshape [216, 192] <-> [36, 6, 192] in-kernel
  P2  tile-form Dinv apply: scratch [Mi, 3, 3, 192, 192] in VMEM,
      DMA'd once from an HBM inventory, y' = Dinv y with y [3, 192]
      (per-(f, f') block broadcast-mult + sublane reduce)
  P3  pair matmul [216, 192] @ [192, 2048] via 3-way bf16 split
  P4  TIMING: 50-iteration fori_loop of full fwd+bwd Thomas sweeps
      (35 knots) on the resident inventory -> the per-iteration floor

Usage: python tools/pallas_debug/nsfused_probe.py [--interpret] [--probe N]
"""
from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

f32 = None  # set after jax import


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--probe", type=int, default=0, help="0 = all")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    global f32
    f32 = jnp.float32
    interp = args.interpret
    rng = np.random.default_rng(0)

    Mi, B3, phi = 35, 192, 3
    MP, PL = 216, 2048       # (M*npp) rows, padded pair lanes

    # ---------------- P1: sublane reshape ----------------
    if args.probe in (0, 1):
        def k1(x_ref, o_ref):
            x4 = x_ref[:].reshape(36, 6, 192)
            o_ref[:] = (x4[:, 0:3, :] + 2.0 * x4[:, 3:6, :]
                        ).reshape(108, 192)

        x = rng.standard_normal((216, 192)).astype(np.float32)
        out = pl.pallas_call(
            k1, out_shape=jax.ShapeDtypeStruct((108, 192), f32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interp)(x)
        ref = (x.reshape(36, 6, 192)[:, 0:3] +
               2.0 * x.reshape(36, 6, 192)[:, 3:6]).reshape(108, 192)
        err = np.abs(np.asarray(out) - ref).max()
        log(f"P1 sublane reshape: err={err:.2e} {'OK' if err < 1e-6 else 'FAIL'}")

    # ---------------- P2: resident Dinv apply ----------------
    if args.probe in (0, 2):
        R = 2

        def k2(rho_ref, d6_ref, y_ref, o_ref, dbuf, sem, eye_ref):
            r = rho_ref[0]
            cp = pltpu.make_async_copy(d6_ref.at[r], dbuf, sem)
            cp.start()
            cp.wait()
            ii = jax.lax.broadcasted_iota(jnp.int32, (B3, B3), 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, (B3, B3), 1)
            eye_ref[:] = (ii == jj).astype(f32)

            def dapply(k, ytile):
                cols = [jnp.sum(eye_ref[:] * ytile[f:f + 1, :], axis=1,
                                keepdims=True) for f in range(phi)]
                rows = []
                for fp in range(phi):
                    acc = jnp.zeros((1, B3), f32)
                    for f in range(phi):
                        acc = acc + jnp.sum(dbuf[k, f, fp] * cols[f],
                                            axis=0, keepdims=True)
                    rows.append(acc)
                return jnp.concatenate(rows, axis=0)

            o_ref[:] = dapply(3, y_ref[:])

        d6 = rng.standard_normal((R, Mi, phi, phi, B3, B3)).astype(np.float32)
        y = rng.standard_normal((phi, B3)).astype(np.float32)
        out = pl.pallas_call(
            k2,
            out_shape=jax.ShapeDtypeStruct((phi, B3), f32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((Mi, phi, phi, B3, B3), f32),
                                pltpu.SemaphoreType.DMA(()),
                                pltpu.VMEM((B3, B3), f32)]),
            interpret=interp,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(jnp.asarray([1], jnp.int32), d6, y)
        # reference: out[f', b3'] = sum_{f, b3} D6[1, 3, f, f', b3, b3'] y[f, b3]
        ref = np.einsum("fgbc,fb->gc", d6[1, 3], y)
        err = np.abs(np.asarray(out) - ref).max() / max(np.abs(ref).max(), 1)
        log(f"P2 resident Dinv apply: rel={err:.2e} "
            f"{'OK' if err < 1e-5 else 'FAIL'}")

    # ---------------- P3: split-precision pair matmul ----------------
    if args.probe in (0, 3):
        def k3(x_ref, s_ref, o_ref):
            bf = jnp.bfloat16
            u32 = jnp.uint32
            mask = u32(0xFFFF0000)

            def split3(a):
                ua = jax.lax.bitcast_convert_type(a, u32)
                a0 = jax.lax.bitcast_convert_type(ua & mask, f32)
                rres = a - a0
                ur = jax.lax.bitcast_convert_type(rres, u32)
                a1 = jax.lax.bitcast_convert_type(ur & mask, f32)
                a2 = rres - a1
                return a0.astype(bf), a1.astype(bf), a2.astype(bf)

            x0, x1, x2 = split3(x_ref[:])
            s = s_ref[:].astype(bf)   # 0/+-1 entries: exact in bf16
            d = lambda u: jax.lax.dot_general(
                u, s, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            o_ref[:] = d(x0) + d(x1) + d(x2)

        x = (rng.standard_normal((MP, B3)) * 3).astype(np.float32)
        s = np.zeros((B3, PL), np.float32)
        cols = rng.integers(0, PL, size=B3)
        for b, c in enumerate(cols):
            s[b, c] = 1.0 if b % 2 else -1.0
        s[:, :64] = rng.integers(-1, 2, size=(B3, 64))
        out = pl.pallas_call(
            k3, out_shape=jax.ShapeDtypeStruct((MP, PL), f32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interp)(x, s)
        ref = x.astype(np.float64) @ s.astype(np.float64)
        err = np.abs(np.asarray(out, np.float64) - ref).max() / max(
            np.abs(ref).max(), 1)
        log(f"P3 split pair matmul: rel={err:.2e} "
            f"{'OK' if err < 3e-6 else 'FAIL'}")

    # ---------------- P4: resident Thomas timing ----------------
    if args.probe in (0, 4):
        INNER = 50

        def k4(rho_ref, d6_ref, ho_ref, b_ref, o_ref, dbuf, sem, eye_ref,
               t_ref, y_ref):
            r = rho_ref[0]
            cp = pltpu.make_async_copy(d6_ref.at[r], dbuf, sem)
            cp.start()
            cp.wait()
            ii = jax.lax.broadcasted_iota(jnp.int32, (B3, B3), 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, (B3, B3), 1)
            eye_ref[:] = (ii == jj).astype(f32)
            ho = [[ho_ref[a, c] for c in range(phi)] for a in range(phi)]

            def dapply(k, ytile):
                cols = [jnp.sum(eye_ref[:] * ytile[f:f + 1, :], axis=1,
                                keepdims=True) for f in range(phi)]
                rows = []
                for fp in range(phi):
                    acc = jnp.zeros((1, B3), f32)
                    for f in range(phi):
                        acc = acc + jnp.sum(dbuf[k, f, fp] * cols[f],
                                            axis=0, keepdims=True)
                    rows.append(acc)
                return jnp.concatenate(rows, axis=0)

            def hoT(t):   # out[f'] = sum_f ho[f, f'] t[f]
                return jnp.concatenate(
                    [sum(ho[f][fp] * t[f:f + 1, :] for f in range(phi))
                     for fp in range(phi)], axis=0)

            def ho_(t):   # out[f] = sum_f' ho[f, f'] t[f']
                return jnp.concatenate(
                    [sum(ho[f][fp] * t[fp:fp + 1, :] for fp in range(phi))
                     for f in range(phi)], axis=0)

            def one_iter(i, sgn):
                # forward
                y_ref[0] = b_ref[0] + sgn
                def fwd(k, _):
                    t = dapply(k - 1, y_ref[k - 1])
                    t_ref[k - 1] = t
                    y_ref[k] = b_ref[k] - hoT(t)
                    return 0
                jax.lax.fori_loop(1, Mi, fwd, 0, unroll=False)
                o_ref[Mi - 1] = dapply(Mi - 1, y_ref[Mi - 1])
                def bwd(j, _):
                    k = Mi - 2 - j
                    o_ref[k] = t_ref[k] - dapply(k, ho_(o_ref[k + 1]))
                    return 0
                jax.lax.fori_loop(0, Mi - 1, bwd, 0, unroll=False)
                return sgn

            jax.lax.fori_loop(
                0, INNER, lambda i, c: one_iter(i, c * 0.0), 0.0)

        R = 1
        d6 = (rng.standard_normal((R, Mi, phi, phi, B3, B3)) * 0.1
              ).astype(np.float32)
        hom = rng.standard_normal((phi, phi)).astype(np.float32) * 0.1
        b = rng.standard_normal((Mi, phi, B3)).astype(np.float32)

        call = pl.pallas_call(
            k4,
            out_shape=jax.ShapeDtypeStruct((Mi, phi, B3), f32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                          pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((Mi, phi, phi, B3, B3), f32),
                                pltpu.SemaphoreType.DMA(()),
                                pltpu.VMEM((B3, B3), f32),
                                pltpu.VMEM((Mi, phi, B3), f32),
                                pltpu.VMEM((Mi, phi, B3), f32)]),
            interpret=interp,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )
        rr = jnp.asarray([0], jnp.int32)
        x = call(rr, d6, hom, b)
        np.asarray(x)
        reps = 1 if interp else 5
        t0 = time.perf_counter()
        for i in range(reps):
            x = call(rr, d6, hom, b + np.float32(1e-6 * i))
            np.asarray(x)
        dt = (time.perf_counter() - t0) / reps
        per_iter = (dt - 0.0) / INNER
        log(f"P4 resident Thomas x{INNER}: {dt * 1e3:.1f} ms/call -> "
            f"{per_iter * 1e6:.0f} us/iter (XLA streaming path: 359 us)")

    log("probes done")


if __name__ == "__main__":
    main()
