#!/bin/bash
# Round-3 stage 3: batch-folded attention A/B, correctly-sized pair-
# kernel kb sweep (kb counts TILES of pair_group word rows; auto=8 for
# int4 -> kb16/kb32 = 512/1024 word rows per grid step), then CLEAN
# quantization wall-clock re-runs (no concurrent host load!) with the
# batched offload/save fixes.
set -u
cd /root/repo
OUT=${1:-/tmp/r3stage3}
mkdir -p "$OUT"

run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 2400 "$@" > "$OUT/$name.out" 2> "$OUT/$name.log"
  echo "    exit=$? ($(date +%H:%M:%S))"
  sleep 30
}

run bfold env BENCH_DENSE=0 BENCH_ATTN=bfold python bench.py
run bfold_temp env BENCH_DENSE=0 BENCH_ATTN=bfold BENCH_TEMP=0.7 python bench.py
run pair_kb16d1 env BENCH_DENSE=0 BENCH_PAIR_TUNE=kb16s0d1 python bench.py
run pair_kb32d1 env BENCH_DENSE=0 BENCH_PAIR_TUNE=kb32s0d1 python bench.py
run pair_kb16d0 env BENCH_DENSE=0 BENCH_PAIR_TUNE=kb16s0d0 python bench.py
run quant_light2 python -m sleekit_tpu.experiments.quantize_model_cli \
  /tmp/qckpt_light2 --model opt-1.3b --preset light --nbits 3 --samples 16
run quant_heavy2 python -m sleekit_tpu.experiments.quantize_model_cli \
  /tmp/qckpt_heavy2 --model opt-1.3b --preset heavy --nbits 3 --samples 16
echo "STAGE3 DONE"
