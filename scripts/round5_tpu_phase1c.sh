#!/usr/bin/env bash
# Round-5 phase 1c: the roofline artifact with resolved-only best/pct
# and the HBM-floor diagnosis, at two sizes: n=1M (value stream fits
# VMEM -- documents the above-spec readings) and n=4.2M (189 MB of
# per-call traffic, values cannot be VMEM-promoted: the honest
# HBM-bound %-of-attainable).
set -u
cd "$(dirname "$0")/.."
mkdir -p results/round5_logs

echo "=== DIA roofline n_side=1024 $(date +%T) ==="
( cd experiments/benchmarks/spmv_formats && timeout 3600 python -u dia_roofline.py --n_side 1024 )
echo "=== roofline1024 rc=$? $(date +%T) ==="

echo "=== DIA roofline n_side=2048 $(date +%T) ==="
( cd experiments/benchmarks/spmv_formats && timeout 3600 python -u dia_roofline.py --n_side 2048 )
echo "=== roofline2048 rc=$? $(date +%T) ==="

echo "PHASE1C DONE"
