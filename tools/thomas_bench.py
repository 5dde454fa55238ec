"""Measure the Pallas Thomas kernel (ops/pallas_thomas.py) against the
XLA lax.scan banded apply at PRODUCTION shapes on the real TPU.

The joint 64-agent banded KKT apply is the HBM-roofline op of the
production solve (benchmarks/stack_study_tpu.json): Dinvs is
[R=9, Mi, 576, 576] f32 (~420 MB) and each ADMM iteration streams one
rung's Mi pivot blocks twice (forward + backward sweep) = ~93 MB, a
~116 us byte floor at v5e HBM bandwidth.  This tool reports:

  * compiled-TPU max relative error Pallas vs XLA (every rung),
  * per-apply seconds for both paths (chained applies inside one jit,
    output feeding the next rhs, so the axon tunnel cannot cache and
    dispatch overhead amortizes).

Usage: python tools/thomas_bench.py [--seed 0] [--chain 50] [--reps 3]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--chain", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import assemble_joint, build_problem, ns_settings

    from swarm_simulator_tpu.ops.pallas_thomas import thomas_solve_pallas
    from swarm_simulator_tpu.qp import nullspace

    plan, mission, param = build_problem(args.seed)
    data, _ = assemble_joint(plan, mission, param)
    s = ns_settings()
    t0 = time.perf_counter()
    op = nullspace.prepare_ns_np(data, s)
    log(f"prep {time.perf_counter() - t0:.1f}s")

    B = mission.qn
    K3, phi, M = 3, 3, plan.M
    Mi = M - 1
    bs = B * K3 * phi
    log(f"shapes: B={B} M={M} Mi={Mi} bs={bs} "
        f"Dinvs {op.Dinvs.shape} = "
        f"{op.Dinvs.nbytes / 1e6:.0f} MB")

    t0 = time.perf_counter()
    op_dev = jax.device_put(op)
    jax.block_until_ready(op_dev.Dinvs)
    # kernel-path op with the pivot inventory pre-padded to the DMA lane
    # grid (production does this at prep via thomas_kernel=True)
    from swarm_simulator_tpu.ops.pallas_thomas import pad_pivots
    op_pl = jax.device_put(op._replace(Dinvs=pad_pivots(
        np.asarray(op.Dinvs))))
    jax.block_until_ready(op_pl.Dinvs)
    log(f"transfer {time.perf_counter() - t0:.1f}s")

    # op must be a jit ARGUMENT, not a closure: closed-over device arrays
    # are baked into the HLO as constants and the 418 MB Dinvs blows the
    # axon remote-compile request limit (HTTP 413)
    # production traces the apply under HIGHEST matmul precision; a bare
    # trace lowers the scan's einsums to single-pass bf16 and rung 0
    # departs by >100% (tools/pallas_debug/thomas_rung_analysis.py)
    @jax.jit
    def apply_xla(o, r, v):
        with jax.default_matmul_precision("highest"):
            return nullspace.make_kinv_apply(o, B, K3, M, phi)(r, v)

    @jax.jit
    def apply_pl(o, r, v):
        with jax.default_matmul_precision("highest"):
            return nullspace.make_kinv_apply(o, B, K3, M, phi,
                                             thomas_kernel=True)(r, v)

    rng = np.random.default_rng(int(time.time()))   # defeat the tunnel's
    rhs = jnp.asarray(rng.standard_normal((B, K3, Mi * phi)),  # execution
                      jnp.float32)                             # cache

    # ---- accuracy, compiled on the real backend, every rung ----
    # rung 0 (smallest rho) is the worst-conditioned pivot chain: the
    # interpret-mode kernel itself sits at ~2e-4 vs the XLA scan there
    # (cancellation, not a kernel bug); the solver only ever uses rungs
    # the rho adaptation selects, and ADMM tolerates consistent
    # inexactness in the KKT apply
    for r in range(op.Dinvs.shape[0]):
        want = np.asarray(apply_xla(op_dev, jnp.int32(r), rhs))
        got = np.asarray(apply_pl(op_pl, jnp.int32(r), rhs))
        scale = max(np.abs(want).max(), 1.0)
        err = np.abs(got - want).max() / scale
        log(f"rung {r}: rel err {err:.2e}")
        assert err < 2e-3, (r, err)
    log("accuracy OK on all rungs")

    # ---- timing: chained applies (output -> next rhs) ----
    def chained(thomas):
        @jax.jit
        def run(o, rhs0, r):
            with jax.default_matmul_precision("highest"):
                fn = nullspace.make_kinv_apply(o, B, K3, M, phi,
                                               thomas_kernel=thomas)

                def body(i, v):
                    return fn(r, v) * 0.99 + rhs0 * 0.01
                return jax.lax.fori_loop(0, args.chain, body, rhs0)
        return run

    out = {}
    for name, fn, oo in (("xla_scan", chained(False), op_dev),
                         ("pallas", chained(True), op_pl)):
        fn(oo, rhs, jnp.int32(4)).block_until_ready()   # compile
        times = []
        for rep in range(args.reps):
            r2 = rhs + 1e-6 * (rep + 1)
            t0 = time.perf_counter()
            np.asarray(fn(oo, r2, jnp.int32(4)))
            times.append(time.perf_counter() - t0)
        per = min(times) / args.chain
        out[name] = per
        log(f"{name}: {per * 1e6:.0f} us/apply (chain={args.chain}, "
            f"best of {args.reps})")

    # the XLA scan streams unpadded [bs, bs] blocks; the kernel streams
    # 128-lane-padded [bsp, bsp] blocks — its own floor is ~(bsp/bs)^2
    # higher (23% at bs=576)
    bsp = bs + (-bs) % 128
    for tag, w in (("xla", bs), ("pallas(padded)", bsp)):
        floor = 2 * Mi * w * w * 4 / 8.2e11
        log(f"byte floor {tag} (~820 GB/s spec): "
            f"{floor * 1e6:.0f} us/apply; at the measured ~250 GB/s "
            f"achievable: {floor * 1e6 * 8.2 / 2.5:.0f} us/apply")
    log(f"speedup: {out['xla_scan'] / out['pallas']:.2f}x")


if __name__ == "__main__":
    main()
