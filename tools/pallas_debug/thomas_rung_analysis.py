"""Per-rung accuracy of BOTH compiled banded-solve paths (XLA scan and
Pallas Thomas kernel) against an f64 host Thomas on the REAL 64-agent
operator (saved by the snippet in the session log to /tmp/real_op.npz).

Answers: is the compiled Pallas kernel WRONG, or is rung 0 (rho=1e-5,
worst-conditioned pivot chain) simply ill-conditioned enough that ANY
f32/bf16-pass solve departs — including the XLA scan the production
solver already trusts?

Usage: python tools/pallas_debug/thomas_rung_analysis.py
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from swarm_simulator_tpu.ops.pallas_thomas import thomas_solve_pallas
    from swarm_simulator_tpu.qp import nullspace

    z = np.load("/tmp/real_op.npz")
    Dinvs = z["Dinvs"]                       # [R, Mi, bs, bs] f32
    Kos = z["Kos"]                           # [Mi-1, phi, phi] f32
    R, Mi, bs, _ = Dinvs.shape
    phi = Kos.shape[-1]
    B3 = bs // phi
    B, K3 = B3 // 3, 3
    M = Mi + 1
    print(f"R={R} Mi={Mi} bs={bs}", file=sys.stderr, flush=True)

    op32 = nullspace.NSOp(
        N=None, x_pin=None, g=None, F0=None, FT=None, c_s=None,
        ladder=jnp.zeros((R,), jnp.float32),
        Kinvs=None, Dinvs=jnp.asarray(Dinvs), Kos=jnp.asarray(Kos))

    # match production: _iterate_ns traces the apply under HIGHEST
    # matmul precision (without it the scan's einsums lower to
    # single-pass bf16 and rung 0 is off by >100% — measured here)
    @jax.jit
    def apply_xla(o, r, v):
        with jax.default_matmul_precision("highest"):
            return nullspace.make_kinv_apply(o, B, K3, M, phi)(r, v)

    @jax.jit
    def apply_pl(o, r, v):
        with jax.default_matmul_precision("highest"):
            return nullspace.make_kinv_apply(o, B, K3, M, phi,
                                             thomas_kernel=True)(r, v)

    op_dev = jax.device_put(op32)
    rng = np.random.default_rng(123)
    rhs_np = rng.standard_normal((B, K3, Mi * phi)).astype(np.float32)
    rhs = jnp.asarray(rhs_np)

    # f64 host Thomas on the SAME f32 blocks (the system both device
    # paths solve is defined by the f32-stored inverses)
    koM64 = np.kron(np.eye(B3), Kos[0].astype(np.float64))
    b64 = rhs_np.astype(np.float64).reshape(B, K3, Mi, phi)
    b64 = b64.transpose(2, 0, 1, 3).reshape(Mi, bs)

    print(f"{'rung':>4} {'xla_vs_f64':>12} {'pl_vs_f64':>12} "
          f"{'pl_vs_xla':>12} {'cond_proxy':>12}", flush=True)
    for r in range(R):
        d64 = Dinvs[r].astype(np.float64)
        y = np.zeros((Mi, bs))
        y[0] = b64[0]
        for k in range(1, Mi):
            y[k] = b64[k] - (y[k - 1] @ d64[k - 1]) @ koM64
        x = np.zeros((Mi, bs))
        x[Mi - 1] = y[Mi - 1] @ d64[Mi - 1]
        for k in range(Mi - 2, -1, -1):
            x[k] = (y[k] - x[k + 1] @ koM64.T) @ d64[k]
        ref = x.reshape(Mi, B, K3, phi).transpose(1, 2, 0, 3)
        ref = ref.reshape(B, K3, Mi * phi)
        scale = np.abs(ref).max()
        # growth of the forward chain = conditioning proxy
        cond = np.abs(y).max() / np.abs(b64).max()

        xla = np.asarray(apply_xla(op_dev, jnp.int32(r), rhs))
        pls = np.asarray(apply_pl(op_dev, jnp.int32(r), rhs))
        print(f"{r:>4} {np.abs(xla - ref).max() / scale:>12.2e} "
              f"{np.abs(pls - ref).max() / scale:>12.2e} "
              f"{np.abs(pls - xla).max() / scale:>12.2e} "
              f"{cond:>12.2e}", flush=True)


if __name__ == "__main__":
    main()
