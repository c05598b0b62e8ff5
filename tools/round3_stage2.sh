#!/bin/bash
# Round-3 stage 2: recorded perf sweeps on the full bench (round-2
# VERDICT items 3 and 6 demand recorded win/loss, not just implemented
# candidates). Strictly sequential, one TPU process at a time.
set -u
cd /root/repo
OUT=${1:-/tmp/r3stage2}
mkdir -p "$OUT"

run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 1800 "$@" > "$OUT/$name.out" 2> "$OUT/$name.log"
  echo "    exit=$? ($(date +%H:%M:%S))"
  sleep 20
}

# Current-code baseline (engine/sampling changes landed since r2 bench).
run base           env BENCH_DENSE=0 python bench.py
# Attention candidates implemented in round 2, never recorded.
run attn_ew        env BENCH_DENSE=0 BENCH_ATTN=ew python bench.py
run kv_chunk8      env BENCH_DENSE=0 BENCH_KV_CHUNK=8 python bench.py
run ew_kv8         env BENCH_DENSE=0 BENCH_ATTN=ew BENCH_KV_CHUNK=8 python bench.py
# Weight-stream push: larger K blocks + ARBITRARY dim semantics
# (double-buffer headroom), now that the scan pays real HBM latency.
run pair_kb512d1   env BENCH_DENSE=0 BENCH_PAIR_TUNE=kb512s0d1 python bench.py
run pair_kb512d0   env BENCH_DENSE=0 BENCH_PAIR_TUNE=kb512s0d0 python bench.py
run pair_kb128     env BENCH_DENSE=0 BENCH_PAIR_TUNE=kb128s0d0 python bench.py
# Fused sampled decode throughput (must be within ~10% of greedy).
run temp07         env BENCH_DENSE=0 BENCH_TEMP=0.7 python bench.py
# Component trace for the journal.
run profile_13b    python -m sleekit_tpu.experiments.profile_decode --model opt-1.3b --nbits 4
# Other geometries.
run opt27b         env BENCH_DENSE=0 BENCH_MODEL=opt-2.7b python bench.py
run llama8b_int3   env BENCH_DENSE=0 BENCH_MODEL=llama3-8b BENCH_NBITS=3 python bench.py
echo "STAGE2 DONE"
