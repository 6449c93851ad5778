#!/usr/bin/env bash
# Wait for phase 1b to finish, then run phase 2.
cd "$(dirname "$0")/.."
while ! grep -q "PHASE1B DONE" results/round4_logs/phase1b.log 2>/dev/null; do
  sleep 60
done
bash scripts/round4_tpu_phase2.sh > results/round4_logs/phase2.log 2>&1
