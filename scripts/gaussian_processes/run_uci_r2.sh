#!/bin/bash
# Round-2 UCI GP sweep, reference adjoints75 configuration
# (reference scripts/gaussian_processes/run_uci.sh:24-53) on the
# bundled datasets.  kin40k/kegg_* csvs are empty in this offline
# environment; pol/bike/pumadyn32nm add breadth beyond the reference's
# five datasets.  Runs sequentially: one TPU chip, parallel jobs would
# serialize through the relay anyway.
#
# Phase 1 (medium datasets, reliable): elevators/pol s2-s3, bike and
# pumadyn32nm s1-s3.  Phase 2 (protein, known to crash the TPU worker
# around epoch 60 in round 1): checkpoint every 10 epochs and retry
# with --resume across worker crashes.
set -u
cd "$(dirname "$0")/../.."
mkdir -p logs

common="--rank_precon 500 --num_partitions 10 --num_matvecs 15 \
  --num_samples 15 --num_epochs 75 --cg_tol 1.0"

run_one() {
  local dataset="$1" seed="$2" tmo="$3"
  shift 3
  echo "=== $dataset s$seed $(date +%T) ==="
  timeout "$tmo" python \
    experiments/applications/gaussian_process/train/optim_logml_adjoints_adaptive.py \
    --name adjoints75 --seed "$seed" --dataset "$dataset" $common "$@" \
    >"logs/gp_${dataset}_s${seed}.log" 2>&1
  echo "=== $dataset s$seed rc=$? $(date +%T) ==="
}

for seed in 2 3; do
  for dataset in elevators pol; do
    run_one "$dataset" "$seed" 3600
  done
done
for seed in 1 2 3; do
  for dataset in bike pumadyn32nm; do
    run_one "$dataset" "$seed" 3600
  done
done
touch logs/PHASE1_DONE

# Gate: protein can crash the TPU worker (1-2 h chip outage); wait for
# an explicit go-signal so interactive benchmarking can use the chip
# between phases.
while [ ! -f logs/PROTEIN_GO ]; do sleep 30; done

# Protein: retry across TPU-worker crashes.  Each attempt resumes from
# the last checkpoint; a crashed worker needs up to ~2 h to re-grant
# the chip, which the next attempt's first compile absorbs.
for seed in 1 2 3; do
  for attempt in 1 2 3 4; do
    run_one protein "$seed" 10800 \
      --num_partitions 50 --checkpoint_every 10 --resume
    if [ -f "results/applications/gaussian_process/train/optim_logml_adjoints_adaptive/adjoints75_protein_s${seed}_test_rmses.npy" ]; then
      break
    fi
    echo "=== protein s$seed attempt $attempt failed; waiting for chip ==="
    sleep 120
  done
done
echo "SWEEP DONE $(date +%T)"
