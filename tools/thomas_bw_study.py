"""HBM bandwidth study of the streaming Thomas kernel (round-4 ask #5).

The 256-agent KKT apply streams 2 x 1.51 GB of pivot inverses per
solve iteration; the round-3 kernel achieved ~460 GB/s vs the v5e's
~819 GB/s spec.  This study isolates where the remaining 1.8x lives:

  dma-only:   a kernel that ONLY streams the pivot blocks (same
              double-buffered pattern, one reduce per block to keep the
              copy live) — the achievable ceiling for this access
              pattern.
  dma-only-k4:  same with a 4-slot ring buffer (deeper prefetch).
  dma-only-split: two half-block DMAs per step on separate semaphores
              (parallel copy engines).
  thomas:     the production kernel (baseline).

Timings use the slope method (k solves in ONE jitted loop via
lax.fori_loop; big operands as jit args) per the axon-tunnel rules in
ARCHITECTURE.md.  Writes benchmarks/thomas_bw_tpu.json.

Usage: python tools/thomas_bw_study.py [--agents 256] [--reps 20]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_dma_kernel(Mi: int, bs: int, slots: int, split: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    h = bs // 2

    def kernel(rho_ref, dinvs_ref, out_ref, buf_ref, sem_ref):
        r = rho_ref[0]

        if split:
            def dma(slot, k, half):
                return pltpu.make_async_copy(
                    dinvs_ref.at[r, k, pl.ds(half * h, h)],
                    buf_ref.at[slot, pl.ds(half * h, h)],
                    sem_ref.at[slot, half])
        else:
            def dma(slot, k, half):
                del half
                return pltpu.make_async_copy(dinvs_ref.at[r, k],
                                             buf_ref.at[slot],
                                             sem_ref.at[slot])

        def start(slot, k):
            dma(slot, k, 0).start()
            if split:
                dma(slot, k, 1).start()

        def wait(slot, k):
            dma(slot, k, 0).wait()
            if split:
                dma(slot, k, 1).wait()

        for s in range(min(slots, Mi)):
            start(s, s)
        out_ref[:] = jnp.zeros((1, bs), f32)

        def body(k, _):
            wait(k % slots, k)
            # one cheap reduce per block keeps the data dependency live
            out_ref[:] = out_ref[:] + jnp.sum(
                buf_ref[k % slots], axis=0, keepdims=True)

            @pl.when(k + slots < Mi)
            def _():
                start((k + slots) % slots, k + slots)
            return 0

        jax.lax.fori_loop(0, Mi, body, 0, unroll=False)

    def run(dinvs, rho_idx):
        R, Mi_, bs_, _ = dinvs.shape
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((slots, bs, bs), dinvs.dtype),
                pltpu.SemaphoreType.DMA((slots, 2) if split
                                        else (slots,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, bs), jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(jnp.asarray(rho_idx, jnp.int32).reshape(1), dinvs)

    return run


def slope_time(fn, dinvs, reps: int):
    """Device-side seconds per call by the k-calls-in-one-executable
    slope (tunnel-safe)."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("k",))
    def loop(d, k):
        def body(i, acc):
            return acc + fn(d, i % d.shape[0])[0, 0]
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    for k in (2, reps):       # compile both trip counts
        float(np.asarray(loop(dinvs, k)))
    ts = {}
    for k in (2, reps):
        t0 = time.perf_counter()
        float(np.asarray(loop(dinvs, k)))
        ts[k] = time.perf_counter() - t0
    return (ts[reps] - ts[2]) / (reps - 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--agents", type=int, default=256)
    ap.add_argument("--M", type=int, default=72)
    ap.add_argument("--reps", type=int, default=22)
    ap.add_argument("--out", default="benchmarks/thomas_bw_tpu.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sys.path.insert(0, "/root/repo")
    from swarm_simulator_tpu.ops.pallas_thomas import thomas_solve_pallas

    B = args.agents
    Mi = args.M - 1
    bs = B * 3 * 3
    bsp = -(-bs // 128) * 128
    R = 2                      # rungs; bytes scale with Mi*bsp^2 only
    rng = np.random.default_rng(0)
    log(f"B={B} Mi={Mi} bs={bs}->{bsp}: rung stream "
        f"{Mi * bsp * bsp * 4 / 1e9:.2f} GB")
    dinvs = jnp.asarray(
        rng.standard_normal((R, Mi, bsp, bsp)).astype(np.float32) * 0.01)
    koM = jnp.asarray(np.eye(bsp, dtype=np.float32))
    b = jnp.asarray(rng.standard_normal((Mi, bsp)).astype(np.float32))

    stream_gb = Mi * bsp * bsp * 4 / 1e9
    out = {"agents": B, "Mi": Mi, "bsp": bsp,
           "stream_gb_per_sweep": round(stream_gb, 3), "variants": {}}

    # production kernel: 2 sweeps per solve -> 2x the stream
    def thomas_fn(d, r):
        return thomas_solve_pallas(d, koM, koM.T, b, r)[:1, :1]

    dt = slope_time(thomas_fn, dinvs, args.reps)
    gbps = 2 * stream_gb / dt
    out["variants"]["thomas"] = dict(s_per_solve=round(dt, 5),
                                     gbps=round(gbps, 1))
    log(f"thomas: {dt * 1e3:.2f} ms/solve -> {gbps:.0f} GB/s")

    for name, slots, split in (("dma2", 2, False), ("dma4", 4, False),
                               ("dma2split", 2, True),
                               ("dma4split", 4, True)):
        fn = make_dma_kernel(Mi, bsp, slots, split)
        dt = slope_time(lambda d, r, fn=fn: fn(d, r)[:1, :1],
                        dinvs, args.reps)
        gbps = stream_gb / dt
        out["variants"][name] = dict(s_per_sweep=round(dt, 5),
                                     gbps=round(gbps, 1))
        log(f"{name}: {dt * 1e3:.2f} ms/sweep -> {gbps:.0f} GB/s")

    os.makedirs("benchmarks", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
