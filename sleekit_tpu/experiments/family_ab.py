"""Family-level A/B vs the reference: reproduce the published tables.

The reference's headline results are per-experiment-family geomean
tables (ref README.md:139-174) produced by results/run.sh:1-33 +
results/graph.py:8-301 over a tree of per-layer ``.npy`` dumps. Real HF
model dumps are unreachable offline, so this driver reproduces the
*pipeline* on a synthetic tree: it runs the REFERENCE experiment
scripts (``/root/reference/experiments/*.py``, NumPy/torch, as
subprocesses) AND our CLIs (``sleekit_tpu.experiments.*``, JAX on CPU)
over the SAME dump tree at every bit-width of run.sh, aggregates both
sides with the reference's geomean-of-ratios metric
(ref results/graph.py:14-21, our ``results.family_curves``), and emits
a side-by-side markdown report with the per-method disagreement.

This extends the per-layer A/B of ``ab_reference.py`` to the full
L5 (experiment CLIs) + L6 (aggregation) stack: if these tables agree,
every published reference table is reproducible with our code.

Usage:
    python -m sleekit_tpu.experiments.family_ab \
        [--out RESULTS_SYNTH.md] [--workdir DIR] [--variants N] [--quick]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

from sleekit_tpu.experiments.ab_reference import gen_layers, write_dump_tree
from sleekit_tpu.experiments.results import (
    BITS_SWEEP,
    FAMILIES,
    family_curves,
    geomean_ratio,
    numeric_columns,
    read_tsv,
)

# (family, extra flags) in the order of ref results/run.sh:3-33.
# scaling's canonical flags per run.sh:14 (--run-obq is an argparse
# prefix of --run-obq-aware in BOTH implementations).
FAMILY_RUNS = [
    ("correction", []),
    ("ordering", []),
    ("scaling", ["--run-diag", "--run-obq-aware", "--run-hessian"]),
    ("local_search", []),
    ("dampening", []),
    ("compare", []),
]
SIZE_TO_B = {8: "3", 4: "2", 3: "1.5", 2: "1"}

# Discrete-path columns: local search / OBQ-aware scaling take
# data-dependent discrete decisions where f32-vs-f64 rounding can flip a
# move, so per-method geomeans may differ more than the continuous
# pipelines (same caveat as ab_reference --heavy-tol).
LOOSE_LABELS = {"10 moves", "100 moves", "exhaustive", "sleekit heavy"}


def run_cli(side: str, family: str, flags, tree: str, out_csv: str,
            ref_path: str, size=None):
    """Run one experiment CLI (reference subprocess or ours on CPU) and
    tee its TSV to ``out_csv``. Returns wall-clock seconds."""
    env = dict(os.environ)
    if side == "ref":
        cmd = [sys.executable,
               os.path.join(ref_path, "experiments", f"{family}.py"), tree]
        env["PYTHONPATH"] = ref_path + os.pathsep + env.get("PYTHONPATH", "")
    else:
        # Never touch the TPU from this harness (one TPU client at a
        # time through the axon tunnel; BENCH_NOTES.md rules). The
        # session sitecustomize pins jax_platforms to "axon,cpu" and env
        # vars can NOT override it (tests/conftest.py) - force CPU via
        # jax.config before any backend initializes.
        cmd = [sys.executable, "-c",
               "import sys, jax; "
               "jax.config.update('jax_platforms', 'cpu'); "
               f"from sleekit_tpu.experiments.{family} import main; "
               "sys.exit(main(sys.argv[1:]))", tree]
    cmd += list(flags)
    if size is not None:
        cmd += ["--codebook-size", str(size)]
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                          timeout=7200)
    if proc.returncode != 0:
        raise RuntimeError(
            f"{side} {family} failed:\n{proc.stderr[-2000:]}")
    with open(out_csv, "w") as f:
        f.write(proc.stdout)
    return time.time() - t0


def bits_geomeans(path: str):
    """Bits family: error ratio of each width vs the 3-bit standard run
    (ref graph.py:246-286), for both Standard and SleekitLight columns."""
    data = numeric_columns(read_tsv(path))
    base = data["Standard3-bit"]
    out = {}
    for prefix in ("Standard", "SleekitLight"):
        for b in ["3"] + BITS_SWEEP:
            col = f"{prefix}{b}-bit"
            if col in data:
                out[f"{prefix} {b}b"] = geomean_ratio(data[col] / base)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ref-path", default="/root/reference")
    parser.add_argument("--out", default="RESULTS_SYNTH.md")
    parser.add_argument("--workdir", default="/tmp/family_ab")
    parser.add_argument("--variants", type=int, default=3,
                        help="synthetic layer-set replicas (5 layers each)")
    parser.add_argument("--tol", type=float, default=1.0,
                        help="max |ref-tpu| geomean disagreement, in "
                             "percentage points, for continuous pipelines")
    parser.add_argument("--loose-tol", type=float, default=4.0,
                        help="tolerance for discrete-path methods "
                             "(local search / OBQ-aware scaling)")
    parser.add_argument("--quick", action="store_true",
                        help="2 layers x 1 size x {ordering,correction}")
    args = parser.parse_args(argv)

    layers = gen_layers(quick=args.quick, variants=1 if args.quick else
                        args.variants)
    tree = os.path.join(args.workdir, "data")
    os.makedirs(tree, exist_ok=True)
    write_dump_tree(layers, tree)
    dirs = {s: os.path.join(args.workdir, s) for s in ("ref", "tpu")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    runs = FAMILY_RUNS[:2] if args.quick else FAMILY_RUNS
    sizes = [4] if args.quick else [8, 4, 3, 2]

    rows = []       # (family, b, label, ref%, tpu%, diff_pp, loose)
    for family, flags in runs:
        for size in sizes:
            b = SIZE_TO_B[size]
            name = f"{family}_{b}b.csv"
            for side in ("ref", "tpu"):
                dt = run_cli(side, family, flags, tree,
                             os.path.join(dirs[side], name),
                             args.ref_path, size)
                print(f"{side:>3} {name}: {dt:.1f}s", flush=True)
            geo = {}
            for side in ("ref", "tpu"):
                _, geo[side], _ = family_curves(
                    os.path.join(dirs[side], name), family)
            for label in geo["ref"]:
                r, t = 100 * geo["ref"][label] - 100, \
                    100 * geo["tpu"][label] - 100
                rows.append((family, b, label, r, t, abs(r - t),
                             label in LOOSE_LABELS))

    bits_rows = []
    if not args.quick:
        for side in ("ref", "tpu"):
            dt = run_cli(side, "bits", [], tree,
                         os.path.join(dirs[side], "bits.csv"),
                         args.ref_path)
            print(f"{side:>3} bits.csv: {dt:.1f}s", flush=True)
        gr = bits_geomeans(os.path.join(dirs["ref"], "bits.csv"))
        gt = bits_geomeans(os.path.join(dirs["tpu"], "bits.csv"))
        for k in gr:
            if k in gt:
                bits_rows.append((k, gr[k], gt[k], abs(gr[k] - gt[k])))

    # ---- report ----
    n_layers = len(layers)
    lines = [
        "# RESULTS_SYNTH — full experiment-family A/B vs /root/reference",
        "",
        f"Both implementations' experiment CLIs over the same synthetic "
        f"dump tree ({n_layers} layers, `ab_reference.gen_layers`), every "
        f"bit-width of ref results/run.sh, aggregated with the "
        f"reference's geomean-of-ratios metric (ref results/graph.py:"
        f"14-21). Reference = NumPy/float64 promotion; ours = JAX f32 "
        f"(CPU backend). Columns are geomean error change vs each "
        f"family's baseline, as in ref README.md:139-174.",
        "",
        "| family | bits | method | ref Δ% | tpu Δ% | diff (pp) |",
        "|---|---|---|---|---|---|",
    ]
    worst = worst_loose = 0.0
    for family, b, label, r, t, d, loose in rows:
        lines.append(f"| {family} | {b}b | {label} | {r:+.2f}% | "
                     f"{t:+.2f}% | {d:.2f}{' *' if loose else ''} |")
        if loose:
            worst_loose = max(worst_loose, d)
        else:
            worst = max(worst, d)
    lines += ["", "`*` discrete-path method (local search / OBQ-aware "
              "scaling): f32-vs-f64 rounding can flip individual moves.",
              ""]
    if bits_rows:
        lines += ["## Bits family (error ratio vs 3-bit standard, "
                  "ref graph.py:246-286)", "",
                  "| column | ref x | tpu x | diff |",
                  "|---|---|---|---|"]
        for k, r, t, d in bits_rows:
            lines.append(f"| {k} | {r:.3f} | {t:.3f} | {d:.3f} |")
        lines.append("")
    ok = worst <= args.tol and worst_loose <= args.loose_tol
    lines.append(f"Worst disagreement: {worst:.2f} pp (continuous), "
                 f"{worst_loose:.2f} pp (discrete) — "
                 f"{'PASS' if ok else 'FAIL'} at tol {args.tol}/"
                 f"{args.loose_tol} pp.")
    report = "\n".join(lines) + "\n"
    with open(args.out, "w") as f:
        f.write(report)
    print(report[-500:])
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
