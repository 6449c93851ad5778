#!/usr/bin/env bash
# Round-4 TPU phase 1b: the 3.7M-param GGN calibration re-run under the
# fixed slq_num_batches semantics (batches DIVIDE the 10-probe total;
# remat keeps both passes one batch wide), plus the elevators FAST sweep
# at the reference's own 126 s wall budget.
set -u
cd "$(dirname "$0")/.."

run_with_retry() {  # bounded attempts around transient chip errors
  local tries=$1; shift
  for attempt in $(seq 1 "$tries"); do
    echo "=== attempt $attempt: $* $(date +%T) ==="
    timeout 3600 "$@" && return 0
    echo "=== attempt $attempt failed rc=$? ==="
    sleep 30
  done
  return 1
}

echo "=== calibration rank 10 (3.7M params, 10 probes as 5x2) ==="
( cd experiments/applications/linearised_laplace && \
  run_with_retry 3 python callibration.py --seed 1 --hidden 2048,1536 \
    --data_dim 256 --num_classes 10 --lanczos_rank 10 \
    --slq_num_samples 10 --slq_num_batches 5 --num_epochs 30 --time )

echo "=== calibration rank 50 (3.7M params, 10 probes as 10x1) ==="
( cd experiments/applications/linearised_laplace && \
  run_with_retry 3 python callibration.py --seed 1 --hidden 2048,1536 \
    --data_dim 256 --num_classes 10 --lanczos_rank 50 \
    --slq_num_samples 10 --slq_num_batches 10 --num_epochs 30 --time )

echo "=== elevators FAST at the reference wall budget (150 epochs) ==="
cd experiments/applications/gaussian_process/train
for seed in 1 2 3 4 5; do
  start=$(date +%s)
  python optim_logml_adjoints_adaptive.py \
    --name adjfast150 --seed "$seed" --dataset elevators \
    --rank_precon 500 --num_partitions 10 \
    --num_matvecs 15 --num_samples 15 --num_epochs 150 \
    --cg_tol 1.0 --slq blocked --matvec fused --precon_block 64
  end=$(date +%s)
  echo "WALL seed $seed: $((end - start)) s"
done
echo "PHASE1B DONE"
