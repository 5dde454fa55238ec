"""Profile the host-f64 banded KKT prep (qp/nullspace.prepare_ns_np).

The prep is the dominant non-amortized host cost of the joint path
(~15-60 s at 64 agents, ~21 min at 256; ARCHITECTURE.md "Known costs").
This tool breaks it down stage by stage on the canonical bench problem
so optimization targets the measured hot spot, not a guess.

Usage:  python tools/prep_profile.py [--seed 0] [--agents 64]
"""
from __future__ import annotations

import argparse
import cProfile
import io
import pstats
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cprofile", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, ".")
    from bench import assemble_joint, build_problem, ns_phases

    from swarm_simulator_tpu.qp import nullspace

    plan, mission, param = build_problem(args.seed)
    data, _ = assemble_joint(plan, mission, param)
    s = ns_phases()[0]

    B = np.asarray(data.lb).shape[0]
    M = np.asarray(data.Qseg).shape[0]
    print(f"B={B} M={M} rungs={s.n_rungs} kkt_mode={s.kkt_mode}",
          file=sys.stderr)

    t0 = time.perf_counter()
    if args.cprofile:
        pr = cProfile.Profile()
        pr.enable()
    op = nullspace.prepare_ns_np(data, s)
    if args.cprofile:
        pr.disable()
    dt = time.perf_counter() - t0
    print(f"prepare_ns_np total: {dt:.2f}s", file=sys.stderr)
    print(f"Dinvs {op.Dinvs.shape} {op.Dinvs.nbytes / 1e6:.0f} MB",
          file=sys.stderr)

    if args.cprofile:
        buf = io.StringIO()
        ps = pstats.Stats(pr, stream=buf).sort_stats("cumulative")
        ps.print_stats(25)
        print(buf.getvalue(), file=sys.stderr)


if __name__ == "__main__":
    main()
