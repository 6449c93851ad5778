#!/usr/bin/env bash
# Round-4 TPU phase 2: SpMV format refresh, DIA roofline sweep, the
# fused full-reortho walltime column, and the N=400k GP scale demo.
set -u
cd "$(dirname "$0")/.."
mkdir -p results/round4_logs

echo "=== spmv formats refresh ==="
( cd experiments/benchmarks/spmv_formats && timeout 3600 python benchmark.py )

echo "=== DIA roofline sweep ==="
( cd experiments/benchmarks/spmv_formats && timeout 3600 python dia_roofline.py )

echo "=== walltime: fused full-reortho Lanczos column ==="
( cd experiments/benchmarks/wall_times_vjp_through_lanczos_arnoldi && \
  timeout 3600 python benchmark.py --which lanczos --reortho full \
    --depths 10 30 90 250 --backprop_until 30 )

echo "=== GP at N_train=400,000 (reference scale ceiling) ==="
# Crash-resilient: checkpoint every 2 epochs + resume + bounded attempts
# (the known worker-crash mode, CLAUDE.md).
common="--rank_precon 500 --num_partitions 50 --num_matvecs 15 \
  --num_samples 15 --num_epochs 12 --cg_tol 1.0 --checkpoint_every 2 --resume \
  --slq blocked --matvec fused --precon_block 64"
done_file="results/applications/gaussian_process/train/optim_logml_adjoints_adaptive/adj400k_synthetic_gp500k_s1_test_rmses.npy"
for attempt in 1 2 3 4 5 6; do
  if [ -f "$done_file" ]; then break; fi
  echo "=== 400k attempt $attempt $(date +%T) ==="
  timeout 5400 python \
    experiments/applications/gaussian_process/train/optim_logml_adjoints_adaptive.py \
    --name adj400k --seed 1 --dataset synthetic_gp500k $common
  echo "=== 400k attempt $attempt rc=$? $(date +%T) ==="
  [ -f "$done_file" ] && break
  sleep 60
done
echo "PHASE2 DONE"
