#!/bin/bash
# Launch the 2-process GSPMD smoke (tools/multiprocess_smoke.py): two OS
# processes x 2 virtual CPU devices, gloo collectives, coordinator on
# localhost. Green = both ranks print MULTIPROCESS SMOKE OK.
set -u
cd "$(dirname "$0")/.."
PORT=${1:-$((12000 + RANDOM % 20000))}
OUT=$(mktemp -d)
trap 'kill $P0 $P1 2>/dev/null; rm -rf "$OUT"' EXIT

timeout 600 python tools/multiprocess_smoke.py --proc-id 0 --port "$PORT" \
  > "$OUT/rank0.log" 2>&1 &
P0=$!
timeout 600 python tools/multiprocess_smoke.py --proc-id 1 --port "$PORT" \
  > "$OUT/rank1.log" 2>&1 &
P1=$!
wait $P0; RC0=$?
wait $P1; RC1=$?

cat "$OUT/rank0.log" "$OUT/rank1.log"
if [ "$RC0" -ne 0 ] || [ "$RC1" -ne 0 ]; then
  echo "MULTIPROCESS SMOKE FAILED (rc0=$RC0 rc1=$RC1)"
  exit 1
fi
grep -q "MULTIPROCESS SMOKE OK" "$OUT/rank0.log" \
  && grep -q "MULTIPROCESS SMOKE OK" "$OUT/rank1.log" \
  && echo "MULTIPROCESS SMOKE PASSED"
