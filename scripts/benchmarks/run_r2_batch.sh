#!/bin/bash
# Round-2 TPU benchmark batch: runs sequentially after the protein GP
# sweep releases the chip (one chip; parallel jobs serialize through
# the relay).
set -u
cd "$(dirname "$0")/../.."
mkdir -p logs

while ! grep -q "PROTEIN DONE" logs/protein_r2.log 2>/dev/null; do sleep 60; done

echo "=== spmv_formats $(date +%T) ===" >> logs/bench_r2.log
timeout 3000 python experiments/benchmarks/spmv_formats/benchmark.py \
  > logs/bench_spmv_r2.log 2>&1
echo "=== spmv rc=$? $(date +%T) ===" >> logs/bench_r2.log

for which in lanczos arnoldi; do
  echo "=== wall_times $which $(date +%T) ===" >> logs/bench_r2.log
  timeout 3000 python \
    experiments/benchmarks/wall_times_vjp_through_lanczos_arnoldi/benchmark.py \
    --which "$which" --depths 10 30 50 90 150 250 --backprop_until 100 \
    > "logs/bench_walltimes_${which}.log" 2>&1
  echo "=== wall_times $which rc=$? $(date +%T) ===" >> logs/bench_r2.log
done

echo "=== gram sweep $(date +%T) ===" >> logs/bench_r2.log
timeout 3000 python experiments/benchmarks/gram_matvec/benchmark.py \
  --data_sizes 4096 16384 65536 --data_dims 2 4 8 16 \
  --datasets bike elevators \
  > logs/bench_gram_r2.log 2>&1
echo "=== gram rc=$? $(date +%T) ===" >> logs/bench_r2.log

echo "=== bench.py $(date +%T) ===" >> logs/bench_r2.log
timeout 3000 python bench.py > logs/bench_headline_r2.log 2>&1
echo "=== bench.py rc=$? $(date +%T) ===" >> logs/bench_r2.log
echo "BATCH DONE $(date +%T)" >> logs/bench_r2.log
