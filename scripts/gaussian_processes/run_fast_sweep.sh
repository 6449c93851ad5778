#!/bin/bash
# Fast-config sweep: blocked multi-RHS SLQ + fused Pallas Gram matvec +
# block-greedy pivoted Cholesky.  Same budgets as the reference
# adjoints75 config; see RESULTS.md for parity and wall-clock tables.
set -u
cd "$(dirname "$0")/../.."
mkdir -p logs

common="--rank_precon 500 --num_matvecs 15 --num_samples 15 \
  --num_epochs 75 --cg_tol 1.0 --precon_block 64 --slq blocked --matvec fused"

for seed in 1 2 3; do
  for dataset in elevators pol bike pumadyn32nm; do
    echo "=== $dataset s$seed $(date +%T) ===" >> logs/fast_sweep.log
    timeout 3600 python \
      experiments/applications/gaussian_process/train/optim_logml_adjoints_adaptive.py \
      --name adjfast75b --seed "$seed" --dataset "$dataset" $common \
      --num_partitions 10 \
      >"logs/gp_${dataset}_s${seed}_fast.log" 2>&1
    echo "=== $dataset s$seed rc=$? $(date +%T) ===" >> logs/fast_sweep.log
  done
done
for seed in 2 3; do
  echo "=== protein s$seed $(date +%T) ===" >> logs/fast_sweep.log
  timeout 3600 python \
    experiments/applications/gaussian_process/train/optim_logml_adjoints_adaptive.py \
    --name adjfast75b --seed "$seed" --dataset protein $common \
    --num_partitions 50 \
    >"logs/gp_protein_s${seed}_fast.log" 2>&1
  echo "=== protein s$seed rc=$? $(date +%T) ===" >> logs/fast_sweep.log
done
echo "FAST SWEEP DONE $(date +%T)" >> logs/fast_sweep.log
