#!/usr/bin/env bash
# Run the full benchmark suite.
# Mirrors the reference's scripts/benchmarks/*.sh drivers.
set -euo pipefail
cd "$(dirname "$0")/../../experiments/benchmarks"

python gram_matvec/benchmark.py --data_sizes 4096 16384 65536 --data_dim 1
python value_and_grad_of_mll/benchmark.py --num_data 16384
python vjp_through_matvec/benchmark.py --num_data 16384
python wall_times_vjp_through_lanczos_arnoldi/benchmark.py \
  --which lanczos --reortho none --depths 10 30 50 90 150 250
python wall_times_vjp_through_lanczos_arnoldi/benchmark.py \
  --which arnoldi --reortho full --depths 10 30 50 90
python loss_of_orthogonality/measure.py
python multihost_scaling/benchmark.py --num_rows 1048576 --depth 30
