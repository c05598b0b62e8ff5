"""Result aggregation: THE headline metric of the reference - geometric
mean of per-layer error ratios vs the first (baseline) column, reported as
a percentage change (ref results/graph.py:14-21, README tables).

Usage: python -m sleekit_tpu.experiments.results results/compare_3b.csv ...
Plotting of sorted relative-error curves is available with --plot when
matplotlib is present (ref graph.py sorted-curve plots).
"""

from __future__ import annotations

import argparse
import csv
from typing import Dict, List

import numpy as np


def read_tsv(path: str) -> Dict[str, List[float]]:
    with open(path) as f:
        rows = list(csv.reader(f, delimiter="\t"))
    header = rows[0]
    cols: Dict[str, List[float]] = {h: [] for h in header}
    for row in rows[1:]:
        for h, v in zip(header, row):
            try:
                cols[h].append(float(v))
            except ValueError:
                cols[h].append(np.nan)
    return cols


def geomean_delta(ratios: np.ndarray) -> float:
    """100 * exp(mean(log r)) - 100 (ref graph.py:17-18)."""
    ratios = ratios[np.isfinite(ratios) & (ratios > 0)]
    if len(ratios) == 0:
        return float("nan")
    return float(100 * np.exp(np.mean(np.log(ratios))) - 100)


def summarize(path: str, baseline: str | None = None, plot: str | None = None):
    cols = read_tsv(path)
    numeric = {k: np.asarray(v) for k, v in cols.items()
               if k not in ("Data", "Scaling") and len(v)
               and np.isfinite(np.asarray(v)).any()}
    if not numeric:
        print(f"{path}: no numeric columns")
        return
    base_key = baseline or next(iter(numeric))
    base = numeric[base_key]
    print(f"{path} (baseline: {base_key}, {len(base)} layers)")
    curves = {}
    for k, v in numeric.items():
        if k == base_key:
            continue
        ratios = v / base
        curves[k] = np.sort(ratios)[::-1]
        print(f"  {k:24s} {geomean_delta(ratios):+8.2f}%")
    if plot:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            print("matplotlib unavailable; skipping plot")
            return
        plt.title(f"{path}: error relative to {base_key} (lower is better)")
        plt.xlabel("Layers")
        plt.ylabel(f"Error relative to {base_key}")
        plt.yscale("log")
        plt.plot(np.ones(len(base)), label=base_key)
        for k, c in curves.items():
            plt.plot(c, label=k)
        plt.legend()
        plt.savefig(plot)
        plt.clf()
        print(f"  plot -> {plot}")


def main(argv=None):
    parser = argparse.ArgumentParser(description="Aggregate experiment TSVs")
    parser.add_argument("files", nargs="+")
    parser.add_argument("--baseline", type=str, default=None,
                        help="Baseline column (default: first numeric)")
    parser.add_argument("--plot", action="store_true",
                        help="Also write <file>.png sorted-ratio curves")
    args = parser.parse_args(argv)
    for path in args.files:
        summarize(path, args.baseline,
                  plot=path.rsplit(".", 1)[0] + ".png" if args.plot else None)


if __name__ == "__main__":
    main()
