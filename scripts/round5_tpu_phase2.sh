#!/usr/bin/env bash
# Round-5 TPU phase 2: the N_train=400,000 GP scale demonstration
# (reference ceiling: rank-500 preconditioner, 15 matvecs x 15 probes,
# reference scripts/gaussian_processes/_train_gp.sh:17-20).  Run AFTER
# phase 1 -- one chip, jobs serialize through the relay.
# Crash-resilient: checkpoint every 2 epochs + resume + bounded attempts
# (the known worker-crash modes, CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
mkdir -p results/round5_logs

# --split_step: this relay kills executables running >~90 s on-device
# (measured round 5: a content-independent chained-matmul probe at
# ~150 s crashes the worker, ~80 s passes); the single-call step at
# N=400k is past that boundary (3/3 worker crashes, phase2.log attempts
# 1-3).  The split computes the same value/gradient as three shorter
# calls; --cg_maxiter bounds the CG executable at ~2*25 matvecs.
common="--rank_precon 500 --num_partitions 50 --num_matvecs 15 \
  --num_samples 15 --num_epochs 12 --cg_tol 1.0 --checkpoint_every 2 --resume \
  --slq blocked --matvec fused --precon_block 64 --split_step --cg_maxiter 25 --slq_host_batches 5"
done_file="results/applications/gaussian_process/train/optim_logml_adjoints_adaptive/adj400k_synthetic_gp500k_s1_test_rmses.npy"
for attempt in 1 2 3 4 5 6; do
  if [ -f "$done_file" ]; then break; fi
  echo "=== 400k attempt $attempt $(date +%T) ==="
  timeout 5400 python -u \
    experiments/applications/gaussian_process/train/optim_logml_adjoints_adaptive.py \
    --name adj400k --seed 1 --dataset synthetic_gp500k $common
  echo "=== 400k attempt $attempt rc=$? $(date +%T) ==="
  [ -f "$done_file" ] && break
  sleep 60
done
echo "PHASE2 DONE"
