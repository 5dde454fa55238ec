#!/bin/bash
# Run when the axon tunnel returns (it died mid-session 2026-08-18).
# Order matters: correctness first, then timing, then headline flip.
set -x
cd /root/repo

# 0. tunnel live?
timeout 60 python -c "import jax; print(jax.devices())" || exit 1

# 1. compiled-TPU suite (fused kernel accuracy + gate + existing pins)
timeout 3600 python -m pytest tests_tpu/ -q 2>&1 | tail -5

# 2. fused vs XLA headline A/B (gate-verified, repeated cycles)
timeout 3600 python tools/fused_bench.py --reps 3 2>&1 | tail -12

# 3. if fused wins and gates pass: re-run the real bench both ways and
#    keep the better artifact (BENCH_FUSED=1 flips the kernel on)
# timeout 7200 python bench.py 2>&1 | tail -3
# BENCH_FUSED=1 timeout 7200 python bench.py 2>&1 | tail -3
