#!/usr/bin/env bash
# Round-4 TPU phase 1: 3.7M-param GGN calibration (rank 10 + 50) and the
# FAST-config 250-epoch elevators sweep at measured wall-clock.
set -uo pipefail
cd "$(dirname "$0")/.."

# slq_num_batches: the vmapped probe batch times the (rank+1, 3.7M)
# Lanczos basis (plus the adjoint's working copies) must fit 16 GB HBM;
# 2 probes per batch at rank 10, 1 at rank 50.
echo "=== calibration rank 10 (3.7M params) ==="
( cd experiments/applications/linearised_laplace && \
  python callibration.py --seed 1 --hidden 2048,1536 --data_dim 256 \
    --num_classes 10 --lanczos_rank 10 --slq_num_batches 5 \
    --num_epochs 30 --time )

echo "=== calibration rank 50 (3.7M params) ==="
( cd experiments/applications/linearised_laplace && \
  python callibration.py --seed 1 --hidden 2048,1536 --data_dim 256 \
    --num_classes 10 --lanczos_rank 50 --slq_num_batches 10 \
    --num_epochs 30 --time )

echo "=== elevators FAST 250 epochs, 5 seeds, wall-clock measured ==="
cd experiments/applications/gaussian_process/train
for seed in 1 2 3 4 5; do
  start=$(date +%s.%N)
  python optim_logml_adjoints_adaptive.py \
    --name adjfast250 --seed "$seed" --dataset elevators \
    --rank_precon 500 --num_partitions 10 \
    --num_matvecs 15 --num_samples 15 --num_epochs 250 \
    --cg_tol 1.0 --slq blocked --matvec fused --precon_block 64
  end=$(date +%s.%N)
  echo "WALL seed $seed: $(echo "$end - $start" | bc) s"
done
echo "PHASE1 DONE"
