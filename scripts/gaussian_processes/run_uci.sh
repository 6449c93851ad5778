#!/usr/bin/env bash
# GP hyperparameter training sweep over bundled UCI datasets.
# Mirrors the reference's scripts/gaussian_processes/run_uci.sh sweep
# structure (hyperparameters per dataset size); the LSF bsub headers are
# dropped -- run directly on a TPU host.
set -euo pipefail
cd "$(dirname "$0")/../../experiments/applications/gaussian_process/train"

NAME="${NAME:-adjoints75}"
EPOCHS="${EPOCHS:-75}"
SEEDS="${SEEDS:-1 2 3 4 5}"
# FAST=1 selects the TPU-native fast configuration (blocked multi-RHS
# SLQ + fused Pallas Gram matvec + block-greedy preconditioner):
# 1.9-4.5x faster epochs at RMSE parity (RESULTS.md).
EXTRA=""
if [ "${FAST:-0}" = "1" ]; then
  EXTRA="--slq blocked --matvec fused --precon_block 64"
fi

for seed in $SEEDS; do
  # Small datasets: full preconditioner, single partition.
  for ds in concrete power_plant; do
    python optim_logml_adjoints_adaptive.py \
      --name "$NAME" --seed "$seed" --dataset "$ds" \
      --rank_precon 100 --num_partitions 1 \
      --num_matvecs 15 --num_samples 15 --num_epochs "$EPOCHS" \
      --cg_tol 1.0 $EXTRA
  done

  # Medium datasets: partitioned Gram matvec.
  for ds in elevators bike pol pumadyn32nm; do
    python optim_logml_adjoints_adaptive.py \
      --name "$NAME" --seed "$seed" --dataset "$ds" \
      --rank_precon 500 --num_partitions 10 \
      --num_matvecs 15 --num_samples 15 --num_epochs "$EPOCHS" \
      --cg_tol 1.0 $EXTRA
  done

  # Large datasets.
  for ds in kin40k protein; do
    python optim_logml_adjoints_adaptive.py \
      --name "$NAME" --seed "$seed" --dataset "$ds" \
      --rank_precon 500 --num_partitions 50 \
      --num_matvecs 15 --num_samples 15 --num_epochs "$EPOCHS" \
      --cg_tol 1.0 $EXTRA
  done
done

python show_table.py --name "$NAME"
