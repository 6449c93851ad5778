#!/usr/bin/env bash
# Round-5 TPU phase 1: the evidence runs the round-4 verdict asked for,
# in crash-safe order (cheap benchmarks first, the 400k scale demo is
# phase 2).  Each step is bounded; a worker crash fails one step, not
# the chain.
set -u
cd "$(dirname "$0")/.."
mkdir -p results/round5_logs

echo "=== spmv formats refresh $(date +%T) ==="
( cd experiments/benchmarks/spmv_formats && timeout 3600 python -u benchmark.py )
echo "=== spmv rc=$? $(date +%T) ==="

echo "=== DIA roofline sweep $(date +%T) ==="
( cd experiments/benchmarks/spmv_formats && timeout 3600 python -u dia_roofline.py )
echo "=== roofline rc=$? $(date +%T) ==="

echo "=== walltime: fused full-reortho Lanczos column $(date +%T) ==="
( cd experiments/benchmarks/wall_times_vjp_through_lanczos_arnoldi && \
  timeout 3600 python -u benchmark.py --which lanczos --reortho full \
    --depths 10 30 90 250 --backprop_until 30 )
echo "=== walltime rc=$? $(date +%T) ==="

echo "=== 3.7M-param rank-50 calibration + budget-capped timing $(date +%T) ==="
# The step that crashed the worker 3/3 in round 4 (unbounded rep
# escalation); slope_time now budget-caps, so this must COMPLETE.
( cd experiments/applications/linearised_laplace && \
  timeout 3600 python -u callibration.py --seed 1 --hidden 2048,1536 \
    --data_dim 256 --num_classes 10 --lanczos_rank 50 \
    --slq_num_samples 10 --slq_num_batches 10 --num_epochs 30 --time )
echo "=== calibration rc=$? $(date +%T) ==="

echo "=== scaling local-step re-measurement (dense grid) $(date +%T) ==="
( cd experiments/benchmarks/multihost_scaling && \
  timeout 3600 python -u benchmark.py --measure_local )
echo "=== scaling rc=$? $(date +%T) ==="

echo "PHASE1 DONE"
