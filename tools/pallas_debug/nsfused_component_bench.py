"""Per-component timing of the PRODUCTION fused ADMM chunk kernel.

Builds the exact bench.py 64-agent seed-0 problem, preps the fused
(grouped-pivot) operator, then times chains of chunks INSIDE ONE
EXECUTABLE under static ablations (ops/pallas_nsfused._kernel's
`ablate` hook):

  full          the production kernel
  no-thomas     banded solve replaced by identity (isolates the
                sequential VPU Thomas sweeps)
  no-pair       MXU pair contractions skipped (isolates the 3-way
                bf16-split dot_generals over the [D, PL] pair tensors)

Measurement protocol (hard-won; see ARCHITECTURE.md "round-3
continuation"): through the axon tunnel jax.block_until_ready is a
NO-OP and a synchronous dispatch+readback round trip costs ~30 ms, so
(a) execution is forced by materializing a scalar, (b) per-chunk and
per-iteration costs come from SLOPES across (n_chunks, n_inner)
inside one jitted lax.scan, and (c) the operand tree is passed as a
jit ARGUMENT (a closure constant serializes the ~300 MB pivot
inventory into the remote-compile HTTP request -> 413).

Ablated kernels are numerically meaningless — timing only.

Measured 2026-08-19 (v5e, production shapes B=64 M=36 P=2016):
  per-iteration ~45 us = thomas ~21 + pair dots ~21 + elementwise ~3;
  per-chunk XLA overhead (layout conversion, residuals) ~0.3 ms;
  device-side 900-iter solve ~44 ms of the 80 ms synchronous cycle —
  the other ~32 ms is tunnel dispatch/readback, which the bench's
  depth-2 pipelined protocol overlaps.

Usage: python tools/pallas_debug/nsfused_component_bench.py [--reps 6]
"""
from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--pair-split", type=int, default=3)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, ".")
    import bench
    from swarm_simulator_tpu.ops import pallas_nsfused as nf
    from swarm_simulator_tpu.qp import nullspace
    from swarm_simulator_tpu.qp.nullspace import NSConstr

    plan, mission, param = bench.build_problem(args.seed)
    data, _ = bench.assemble_joint(plan, mission, param)
    phases = tuple(dataclasses.replace(p, fused_chunk=True)
                   for p in bench.ns_phases())
    s = phases[1]
    t0 = time.perf_counter()
    op = nullspace.prepare_ns_np(data, s)
    log(f"prep {time.perf_counter() - t0:.1f}s")
    op_dev = jax.device_put(op)
    data_dev = jax.tree.map(jnp.asarray, data)
    pop = nullspace._pair_op(data_dev)
    l, u = nullspace._bounds(data_dev, s.tighten)
    ops_f = nf.build_operands(data_dev, op_dev, pop, l, u, param.phi)
    d = ops_f.dims
    nw = d["Mi"] * d["phi"]

    rng = np.random.default_rng(0)
    w0 = jnp.asarray(rng.normal(size=(d["B"], d["K3"], nw)) * 0.01,
                     jnp.float32)
    z0 = NSConstr(
        box=jnp.asarray(rng.normal(size=(d["B"], d["K3"], d["D"])) * 0.01,
                        jnp.float32),
        pair=jnp.zeros((d["P"], d["D"]), jnp.float32))
    y0 = NSConstr(box=jnp.zeros((d["B"], d["K3"], d["D"]), jnp.float32),
                  pair=jnp.zeros((d["P"], d["D"]), jnp.float32))
    tree0 = ops_f.tree()

    @functools.partial(jax.jit,
                       static_argnames=("n_chunks", "n_inner", "ablate"))
    def many_chunks(tree, w, z, y, n_chunks, n_inner, ablate=()):
        of = nf.FusedOperands(*tree, d)

        def step(carry, _):
            w_, z_, y_ = carry
            w_, z_, y_ = nf.run_chunk(
                of, 4, s.sigma, s.alpha, w_, z_, y_, n_inner=n_inner,
                pair_split=args.pair_split, ablate=ablate)
            return (w_, z_, y_), 0

        (w, z, y), _ = jax.lax.scan(step, (w, z, y), None,
                                    length=n_chunks)
        return w

    def timed(n_chunks, n_inner, ablate=()):
        o = many_chunks(tree0, w0, z0, y0, n_chunks=n_chunks,
                        n_inner=n_inner, ablate=ablate)
        float(np.asarray(jnp.sum(o)))          # warm (compile)
        ts = []
        for j in range(args.reps):
            wj = w0 + jnp.float32(1e-7 * (j + 1))
            t0 = time.perf_counter()
            o = many_chunks(tree0, wj, z0, y0, n_chunks=n_chunks,
                            n_inner=n_inner, ablate=ablate)
            float(np.asarray(jnp.sum(o)))      # force execution
            ts.append(time.perf_counter() - t0)
        m = min(ts)
        log(f"chunks={n_chunks:3d} n_inner={n_inner:4d} "
            f"ablate={ablate}: {m*1e3:8.2f} ms")
        return m

    # per-chunk cost from the chunk-count slope at production n_inner
    a = timed(2, 50)
    b = timed(18, 50)
    per_chunk_ms = (b - a) / 16 * 1e3
    # per-iteration cost from the n_inner slope at fixed chunk count
    c = timed(8, 50)
    e = timed(8, 150)
    per_iter_us = (e - c) / (8 * 100) * 1e6
    # component attribution (all marginal vs the same fixed call cost)
    f_ = timed(8, 50, ())
    g = timed(8, 50, ("thomas",))
    h = timed(8, 50, ("pair",))
    thomas_us = (f_ - g) / (8 * 50) * 1e6
    pair_us = (f_ - h) / (8 * 50) * 1e6
    log(f"per-chunk {per_chunk_ms:.2f} ms, per-iter {per_iter_us:.1f} us"
        f" = thomas {thomas_us:.1f} + pair {pair_us:.1f} + other "
        f"{per_iter_us - thomas_us - pair_us:.1f}")
    print(json.dumps(dict(
        seed=args.seed, pair_split=args.pair_split,
        per_chunk_ms=round(per_chunk_ms, 3),
        per_iter_us=round(per_iter_us, 2),
        thomas_us=round(thomas_us, 2), pair_us=round(pair_us, 2),
        other_us=round(per_iter_us - thomas_us - pair_us, 2),
        call_overhead_ms=round((a - 2 * (b - a) / 16) * 1e3, 2))))


if __name__ == "__main__":
    main()
