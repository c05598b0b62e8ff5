#!/bin/bash
# Remaining round-2 TPU measurements, priority order: measured
# light/heavy whole-model quantization wall-clocks (VERDICT item 5),
# Llama3-8B bench + profile (item 4), then attention-kernel A/Bs and
# OPT-2.7B. Strictly sequential, ONE TPU process at a time, with a
# cool-down between processes (rapid reconnects after a client exit
# have wedged the axon tunnel).
set -u
cd /root/repo
OUT=${1:-/tmp/r2sweep3}
mkdir -p "$OUT"

run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 3000 "$@" > "$OUT/$name.out" 2> "$OUT/$name.log"
  echo "    exit=$? ($(date +%H:%M:%S))"
  sleep 30
}

run quant_light python -m sleekit_tpu.experiments.quantize_model_cli \
  /tmp/qckpt_light --model opt-1.3b --preset light --nbits 3 --samples 16
run bench_llama8b   env BENCH_MODEL=llama3-8b BENCH_DENSE=0 python bench.py
run profile_llama8b python -m sleekit_tpu.experiments.profile_decode \
  --model llama3-8b --nbits 4
run quant_heavy python -m sleekit_tpu.experiments.quantize_model_cli \
  /tmp/qckpt_heavy --model opt-1.3b --preset heavy --nbits 3 --samples 16
run bench_attn_ew   env BENCH_ATTN=ew python bench.py
run bench_kvc8      env BENCH_KV_CHUNK=8 python bench.py
run bench_opt27b    env BENCH_MODEL=opt-2.7b python bench.py
echo "SWEEP DONE"
