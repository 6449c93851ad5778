#!/bin/bash
# Protein (N_train=36,584) GP training with crash resilience.
#
# Round-1 observation (RESULTS.md): this config reproducibly crashed the
# TPU worker around epoch 60, causing a 1-2 h chip outage.  Mitigations:
#   - checkpoint every 5 epochs + --resume, so crashes lose <=5 epochs;
#   - bounded process lifetime (timeout per attempt) so one hung client
#     never wedges the sweep;
#   - retry loop that keeps re-attaching until the run completes; the
#     first compile of a fresh attempt absorbs the >300 s first-connect
#     latency after worker recovery.
set -u
cd "$(dirname "$0")/../.."
mkdir -p logs

common="--rank_precon 500 --num_partitions 50 --num_matvecs 15 \
  --num_samples 15 --num_epochs 75 --cg_tol 1.0 --checkpoint_every 5 --resume"

for seed in "$@"; do
  done_file="results/applications/gaussian_process/train/optim_logml_adjoints_adaptive/adjoints75_protein_s${seed}_test_rmses.npy"
  for attempt in $(seq 1 14); do
    if [ -f "$done_file" ]; then break; fi
    echo "=== protein s$seed attempt $attempt $(date +%T) ===" >> logs/protein_r2.log
    timeout 3600 python \
      experiments/applications/gaussian_process/train/optim_logml_adjoints_adaptive.py \
      --name adjoints75 --seed "$seed" --dataset protein $common \
      >"logs/gp_protein_s${seed}_a${attempt}.log" 2>&1
    echo "=== protein s$seed attempt $attempt rc=$? $(date +%T) ===" >> logs/protein_r2.log
    [ -f "$done_file" ] && break
    sleep 60
  done
done
echo "PROTEIN DONE $(date +%T)" >> logs/protein_r2.log
