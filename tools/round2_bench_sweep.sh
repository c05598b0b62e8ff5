#!/bin/bash
# Sequential TPU measurement sweep for the round-2 deliverables
# (VERDICT items 3/4/5): int4 + int3 OPT-1.3B decode benches, the
# Llama3-8B int4 bench + per-component profile, and measured (not
# projected) whole-model quantization wall-clocks for the light and
# heavy presets.  Runs strictly sequentially: ONE TPU process at a time.
set -u
cd /root/repo
OUT=${1:-/tmp/r2sweep}
mkdir -p "$OUT"

run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 3600 "$@" > "$OUT/$name.out" 2> "$OUT/$name.log"
  echo "    exit=$? ($(date +%H:%M:%S))"
}

run bench_int4  python bench.py
run bench_int3  env BENCH_NBITS=3 python bench.py
run bench_llama8b env BENCH_MODEL=llama3-8b BENCH_DENSE=0 python bench.py
run profile_llama8b python -m sleekit_tpu.experiments.profile_decode \
  --model llama3-8b --nbits 4
run quant_light python -m sleekit_tpu.experiments.quantize_model_cli \
  /tmp/qckpt_light --model opt-1.3b --preset light --nbits 3 --samples 16
run quant_heavy python -m sleekit_tpu.experiments.quantize_model_cli \
  /tmp/qckpt_heavy --model opt-1.3b --preset heavy --nbits 3 --samples 16
echo "SWEEP DONE"
