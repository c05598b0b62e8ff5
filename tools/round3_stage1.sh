#!/bin/bash
# Round-3 stage 1: the measurements VERDICT ranked top — end-to-end
# quantization wall-clocks (light AND heavy, OPT-1.3B 3-bit) and the
# Llama3-8B serving bench + component profile. Strictly sequential,
# ONE TPU process at a time, cool-down between processes (rapid
# reconnects after a client exit have wedged the axon tunnel).
set -u
cd /root/repo
OUT=${1:-/tmp/r3stage1}
mkdir -p "$OUT"

run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 3300 "$@" > "$OUT/$name.out" 2> "$OUT/$name.log"
  echo "    exit=$? ($(date +%H:%M:%S))"
  sleep 30
}

run quant_light python -m sleekit_tpu.experiments.quantize_model_cli \
  /tmp/qckpt_light --model opt-1.3b --preset light --nbits 3 --samples 16
run bench_llama8b env BENCH_MODEL=llama3-8b BENCH_DENSE=0 python bench.py
run profile_llama8b python -m sleekit_tpu.experiments.profile_decode \
  --model llama3-8b --nbits 4
run quant_heavy python -m sleekit_tpu.experiments.quantize_model_cli \
  /tmp/qckpt_heavy --model opt-1.3b --preset heavy --nbits 3 --samples 16
echo "STAGE1 DONE"
