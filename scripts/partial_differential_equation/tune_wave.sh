#!/usr/bin/env bash
# Wave-equation inverse-problem training sweep.
# Mirrors the reference's scripts/partial_differential_equation/tune_wave.sh:
# data generation followed by training with the Arnoldi expm and the
# explicit-integrator baseline.
set -euo pipefail
cd "$(dirname "$0")/../../experiments/applications/partial_differential_equation"

RESOLUTION="${RESOLUTION:-128}"
EPOCHS="${EPOCHS:-3000}"
SEED="${SEED:-1}"

python make_data.py --resolution "$RESOLUTION" --num_data 80 --seed "$SEED"

python train.py --resolution "$RESOLUTION" --method arnoldi \
  --num_matvecs 10 --num_epochs "$EPOCHS" --seed "$SEED"

python train.py --resolution "$RESOLUTION" --method euler \
  --num_matvecs 40 --num_epochs "$EPOCHS" --seed "$SEED"

python workprecision.py --resolution "$RESOLUTION" --seed "$SEED"
