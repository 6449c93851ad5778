#!/bin/bash
# Tail benchmark batch: runs after the fast-config GP sweep releases
# the chip.  Persists the two benchmark families that still lacked
# artifacts, then the headline bench.
set -u
cd "$(dirname "$0")/../.."
mkdir -p logs

while ! grep -q "FAST SWEEP DONE" logs/fast_sweep.log 2>/dev/null; do sleep 60; done

echo "=== mll grad $(date +%T) ===" >> logs/bench_tail.log
timeout 3000 python experiments/benchmarks/value_and_grad_of_mll/benchmark.py \
  > logs/bench_mll.log 2>&1
echo "=== mll rc=$? $(date +%T) ===" >> logs/bench_tail.log

echo "=== vjp_through_matvec $(date +%T) ===" >> logs/bench_tail.log
timeout 3000 python experiments/benchmarks/vjp_through_matvec/benchmark.py \
  > logs/bench_vjpmv.log 2>&1
echo "=== vjp rc=$? $(date +%T) ===" >> logs/bench_tail.log

echo "=== bench.py $(date +%T) ===" >> logs/bench_tail.log
timeout 3000 python bench.py > logs/bench_headline_final.log 2>&1
echo "=== bench rc=$? $(date +%T) ===" >> logs/bench_tail.log
echo "TAIL DONE $(date +%T)" >> logs/bench_tail.log
