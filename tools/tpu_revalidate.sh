#!/usr/bin/env bash
# TPU revalidation sequence (run after solver changes, tunnel up).
# Each stage appends to /tmp/tpu_revalidate.log; stages are ordered so an
# early compile failure of a kernel surfaces before the long bench
# capture. Stage 5 regenerates the doc perf tables from the fresh
# artifact (they are AUTOGEN; see tools/render_perf_tables.py).
set -x
LOG=/tmp/tpu_revalidate.log
cd "$(dirname "$0")/.." || exit 1
{
  echo "=== $(date) stage 1: kernel stress (fused CG on by default) ==="
  timeout 1800 python tools/stress_parity.py 6

  echo "=== $(date) stage 2: fused-vs-unfused flagship profile (20 LM iters) ==="
  timeout 2400 python benchmarks/profile_flagship.py 20
  echo "--- unfused A/B ---"
  BENCH_FUSED_CG=0 timeout 2400 python benchmarks/profile_flagship.py 20

  echo "=== $(date) stage 3: full bench recapture ==="
  timeout 5400 python bench.py

  echo "=== $(date) stage 4: SCALING.json refresh (reads the stage-2 flagship_profile.json phase split; runs the HLO invariance gate) ==="
  JAX_PLATFORMS=cpu PYTHONPATH= XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    timeout 1800 python benchmarks/scaling.py --impl pm --mode weak

  echo "=== $(date) stage 5: regenerate doc perf tables from the capture ==="
  python tools/render_perf_tables.py

  echo "=== $(date) done ==="
} >>"$LOG" 2>&1
