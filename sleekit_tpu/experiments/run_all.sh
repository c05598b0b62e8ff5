#!/bin/bash
# Canonical full-experiment driver (re-creation of ref results/run.sh:1-33):
# every ablation x codebook sizes 8/4/3/2 (= 3/2/1.5/1-bit).
# Usage: run_all.sh <data_dir> <results_dir>
set -e
DATA=${1:-data/}
OUT=${2:-results/}
mkdir -p "$OUT"
# Make the script runnable from anywhere without installing the package.
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/../.." && pwd)"
export PYTHONPATH="$REPO_ROOT${PYTHONPATH:+:$PYTHONPATH}"
PY="python -m sleekit_tpu.experiments"

declare -A SIZES=( [3b]=8 [2b]=4 [1.5b]=3 [1b]=2 )

for b in 3b 2b 1.5b 1b; do
  sz=${SIZES[$b]}
  $PY.correction "$DATA" --codebook-size $sz | tee "$OUT/correction_$b.csv"
  $PY.ordering "$DATA" --codebook-size $sz | tee "$OUT/ordering_$b.csv"
  $PY.scaling "$DATA" --codebook-size $sz --run-diag --run-obq-aware --run-hessian | tee "$OUT/scaling_$b.csv"
  $PY.local_search "$DATA" --codebook-size $sz | tee "$OUT/local_search_$b.csv"
  $PY.dampening "$DATA" --codebook-size $sz | tee "$OUT/dampening_$b.csv"
  $PY.compare "$DATA" --codebook-size $sz | tee "$OUT/compare_$b.csv"
done

$PY.bits "$DATA" | tee "$OUT/bits.csv"
$PY.results "$OUT"/compare_*.csv "$OUT"/ordering_*.csv "$OUT"/correction_*.csv
