#!/usr/bin/env bash
# Round-5 phase 1b: re-run the two phase-1 steps that failed on the
# scoped-vmem compile OOM (fixed: pallas_dia now sets an only-raise
# vmem_limit_bytes) and the fixed roofline ceiling probe (x-chained so
# the rep loop has a real data dependency); repeat the walltime column
# with the new dispatch-event artifact (compiles are cached, so this is
# minutes).
set -u
cd "$(dirname "$0")/.."
mkdir -p results/round5_logs

echo "=== spmv formats refresh (retry) $(date +%T) ==="
( cd experiments/benchmarks/spmv_formats && timeout 3600 python -u benchmark.py )
echo "=== spmv rc=$? $(date +%T) ==="

echo "=== DIA roofline sweep (retry) $(date +%T) ==="
( cd experiments/benchmarks/spmv_formats && timeout 3600 python -u dia_roofline.py )
echo "=== roofline rc=$? $(date +%T) ==="

echo "=== walltime full-reortho with dispatch events $(date +%T) ==="
( cd experiments/benchmarks/wall_times_vjp_through_lanczos_arnoldi && \
  timeout 3600 python -u benchmark.py --which lanczos --reortho full \
    --depths 10 30 90 250 --backprop_until 30 )
echo "=== walltime rc=$? $(date +%T) ==="

echo "=== scaling local-step re-measurement (retry; 1024-aligned rows) $(date +%T) ==="
( cd experiments/benchmarks/multihost_scaling && \
  timeout 3600 python -u benchmark.py --measure_local )
echo "=== scaling rc=$? $(date +%T) ==="

echo "PHASE1B DONE"
