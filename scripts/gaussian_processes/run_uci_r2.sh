#!/bin/bash
# Round-2 UCI GP sweep: the reference's adjoints75 configuration
# (reference scripts/gaussian_processes/run_uci.sh:24-53) on the
# bundled datasets, 3 seeds each.  kin40k/kegg_* are not bundled in
# this offline environment; pol/bike/pumadyn32nm are extra breadth.
# Runs sequentially: one TPU chip, parallel jobs would serialize
# through the relay anyway.
set -u
cd "$(dirname "$0")/../.."
mkdir -p logs

common="--rank_precon 15 --num_partitions 10 --num_matvecs 10 \
  --num_samples 10 --num_epochs 75 --cg_tol 1.0"

for seed in 1 2 3; do
  for dataset in elevators pol bike pumadyn32nm; do
    echo "=== $dataset s$seed $(date +%T) ==="
    timeout 3600 python experiments/applications/gaussian_process/train/optim_logml_adjoints_adaptive.py \
      --name adjoints75 --seed "$seed" --dataset "$dataset" $common \
      --checkpoint_every 25 --resume \
      >"logs/gp_${dataset}_s${seed}.log" 2>&1
    echo "=== $dataset s$seed rc=$? $(date +%T) ==="
  done
done

for seed in 1 2 3; do
  echo "=== protein s$seed $(date +%T) ==="
  timeout 7200 python experiments/applications/gaussian_process/train/optim_logml_adjoints_adaptive.py \
    --name adjoints75 --seed "$seed" --dataset protein $common \
    --checkpoint_every 10 --resume \
    >"logs/gp_protein_s${seed}.log" 2>&1
  echo "=== protein s$seed rc=$? $(date +%T) ==="
done
echo "SWEEP DONE $(date +%T)"
