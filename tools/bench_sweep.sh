#!/bin/bash
# Generic sequential TPU bench sweep: one TPU process at a time (the
# axon tunnel starves concurrent clients - BENCH_NOTES.md rules).
#
# Usage:  tools/bench_sweep.sh OUTDIR  "name1:ENV=V [ENV=V...]"  ...
# e.g.    tools/bench_sweep.sh /tmp/sweep \
#           "int4:" \
#           "int3:BENCH_NBITS=3" \
#           "int3_pair:BENCH_NBITS=3 BENCH_LAYOUT=pair" \
#           "split:BENCH_ATTN=split"
# Every A/B knob is a BENCH_* env var documented in bench.py.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/bench_sweep}; shift || true
mkdir -p "$OUT"
for spec in "$@"; do
  name=${spec%%:*}
  envs=${spec#*:}
  echo "=== $name: [$envs] ($(date +%H:%M:%S))"
  # shellcheck disable=SC2086
  timeout 3600 env $envs python bench.py > "$OUT/$name.out" 2> "$OUT/$name.log"
  echo "    exit=$? $(tail -1 "$OUT/$name.out" 2>/dev/null)"
done
