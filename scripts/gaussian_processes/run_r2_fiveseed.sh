#!/bin/bash
# Extend the flagship datasets to 5 seeds (reference parity: the V100
# numbers are 5-seed means) and validate the blocked preconditioner in
# a full training run.
set -u
cd "$(dirname "$0")/../.."
mkdir -p logs

common="--rank_precon 500 --num_partitions 10 --num_matvecs 15 \
  --num_samples 15 --num_epochs 75 --cg_tol 1.0"

for seed in 4 5; do
  echo "=== elevators s$seed $(date +%T) ===" >> logs/fiveseed_r2.log
  timeout 3600 python \
    experiments/applications/gaussian_process/train/optim_logml_adjoints_adaptive.py \
    --name adjoints75 --seed "$seed" --dataset elevators $common \
    >"logs/gp_elevators_s${seed}.log" 2>&1
  echo "=== elevators s$seed rc=$? $(date +%T) ===" >> logs/fiveseed_r2.log
done

for seed in 4 5; do
  echo "=== protein s$seed $(date +%T) ===" >> logs/fiveseed_r2.log
  timeout 3600 python \
    experiments/applications/gaussian_process/train/optim_logml_adjoints_adaptive.py \
    --name adjoints75 --seed "$seed" --dataset protein $common \
    --num_partitions 50 --checkpoint_every 5 --resume \
    >"logs/gp_protein_s${seed}.log" 2>&1
  echo "=== protein s$seed rc=$? $(date +%T) ===" >> logs/fiveseed_r2.log
done

# Blocked-preconditioner validation: same config as the committed
# elevators s1 row but with block-greedy pivoting.
echo "=== elevators s1 blocked $(date +%T) ===" >> logs/fiveseed_r2.log
timeout 3600 python \
  experiments/applications/gaussian_process/train/optim_logml_adjoints_adaptive.py \
  --name adjblk75 --seed 1 --dataset elevators $common --precon_block 64 \
  >"logs/gp_elevators_s1_blocked.log" 2>&1
echo "=== elevators s1 blocked rc=$? $(date +%T) ===" >> logs/fiveseed_r2.log
echo "FIVESEED DONE $(date +%T)" >> logs/fiveseed_r2.log
