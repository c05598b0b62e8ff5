#!/bin/bash
# Round-3 stage 3b: batch-folded attention A/B (with the scoped-VMEM
# auto-shrink), its sampled variant, and the on-TPU kernel smoke matrix.
set -u
cd /root/repo
OUT=${1:-/tmp/r3stage3b}
mkdir -p "$OUT"

run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 2400 "$@" > "$OUT/$name.out" 2> "$OUT/$name.log"
  echo "    exit=$? ($(date +%H:%M:%S))"
  sleep 30
}

run bfold2 env BENCH_DENSE=0 BENCH_ATTN=bfold python bench.py
run bfold2_temp env BENCH_DENSE=0 BENCH_ATTN=bfold BENCH_TEMP=0.7 python bench.py
run kernel_smoke python tools/tpu_kernel_smoke.py --out TPU_KERNEL_SMOKE.json
echo "STAGE3B DONE"
