"""Real-model reproduction driver: HF checkpoints -> reference CSVs.

One command per model takes a LOCAL HuggingFace checkpoint through the
full published-results pipeline (ref results/run.sh:3-33,
results/graph.py:14-21):

  1. ``dump_stats --model M --checkpoint <hf_dir> --tokens wikitext2``
     writes the reference's ``data/<layer>/{weight,hessian,mean,bias}.npy``
     tree from REAL weights + WikiText-2 calibration;
  2. the REFERENCE compare CLI (/root/reference/experiments/compare.py,
     as a subprocess) and OUR compare CLI run over the SAME tree at each
     codebook size of run.sh (8/4/3/2 = 3/2/1.5/1-bit);
  3. both sides aggregate with the geomean-of-ratios metric and must
     agree to ~0 pp (the same exactness contract as family_ab.py, now on
     real weights); the run also prints our geomeans next to the
     PUBLISHED per-model rows from /root/reference/results/compare_*.csv
     (approximate match only - the published calibration batches are not
     recoverable, README.md:183);
  4. optionally (--eval-ppl) quantize with the light preset and report
     WikiText-2 perplexity fp32 vs quantized (acceptance: <= 0.1 ppl
     delta at 4-bit per BASELINE.md).

Offline this exits early with a clear gate message: the ONLY missing
ingredients are the HF checkpoint directory and a tokenizer/datasets
cache (zero-egress image). Everything downstream is wired and tested on
synthetic dumps (RESULTS_SYNTH.md).

Usage:
  python tools/reproduce_real_models.py --checkpoints /path/to/hf \
      [--models opt-125m opt-350m bloom-560m] [--sizes 8 4 3 2] \
      [--out /tmp/real_repro] [--eval-ppl]

  # expects <checkpoints>/<model>/ with config.json + *.safetensors|.bin
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZE_TO_B = {8: "3", 4: "2", 3: "1.5", 2: "1"}
# Reference results row prefixes per model (ref results/compare_3b.csv
# column 1: e.g. "opt-125m/model.decoder.layers.0.fc1").
PUBLISHED_PREFIX = {"opt-125m": "opt-125m", "opt-350m": "opt-350m",
                    "bloom-560m": "bloom-560m"}


def gate(ok: bool, what: str, how: str) -> bool:
    if not ok:
        print(f"GATED: {what}\n  -> {how}")
    return ok


def published_geomeans(ref_path: str, model: str, size: int):
    """Geomean of each method column over the published per-layer rows
    for ``model`` (ref results/graph.py:14-21 metric)."""
    import numpy as np

    path = os.path.join(ref_path, "results",
                        f"compare_{SIZE_TO_B[size]}b.csv")
    if model not in PUBLISHED_PREFIX or not os.path.exists(path):
        return None
    with open(path) as f:
        header = f.readline().strip().split("\t")
        rows = [ln.strip().split("\t") for ln in f]
    rows = [r for r in rows if r[0].startswith(PUBLISHED_PREFIX[model])]
    if not rows:
        return None
    out = {}
    vals = np.asarray([[float(x) for x in r[1:]] for r in rows])
    base = vals[:, 0]  # "Standard" (GPTQ baseline) column
    for j, name in enumerate(header[1:]):
        out[name] = float(np.exp(np.mean(np.log(vals[:, j] / base))) - 1) * 100
    return out


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--checkpoints", required=True,
                        help="dir containing <model>/ HF checkpoint dirs")
    parser.add_argument("--models", nargs="*",
                        default=["opt-125m", "opt-350m", "bloom-560m"])
    parser.add_argument("--sizes", nargs="*", type=int, default=[8, 4, 3, 2])
    parser.add_argument("--samples", type=int, default=128,
                        help="calibration sequences (ref used 128 x 2048)")
    parser.add_argument("--seq-len", type=int, default=2048)
    parser.add_argument("--tokens", default="wikitext2",
                        help="'wikitext2' | .npy pre-tokenized stream")
    parser.add_argument("--out", default="/tmp/real_repro")
    parser.add_argument("--ref-path", default="/root/reference")
    parser.add_argument("--eval-ppl", action="store_true")
    parser.add_argument("--tol-pp", type=float, default=0.5,
                        help="max ref-vs-ours geomean disagreement (pp)")
    parser.add_argument("--allow-random-init", action="store_true",
                        help="self-test mode: run the FULL pipeline with "
                             "random-init weights + synthetic tokens "
                             "(no checkpoint/tokenizer gates); published "
                             "columns are then informative only")
    args = parser.parse_args(argv)

    from sleekit_tpu.experiments.family_ab import run_cli
    from sleekit_tpu.experiments.results import (geomean_ratio,
                                                 numeric_columns, read_tsv)

    any_fail = False
    for model in args.models:
        ckpt = os.path.join(args.checkpoints, model)
        if not args.allow_random_init and not gate(
                os.path.isdir(ckpt), f"{model}: no checkpoint at {ckpt}",
                f"download the HF checkpoint into {ckpt} "
                "(config.json + weights)"):
            continue
        tree = os.path.join(args.out, model, "data")
        os.makedirs(tree, exist_ok=True)
        print(f"== {model}: dumping calibration artifacts -> {tree}")
        dump_args = [tree, "--model", model, "--samples",
                     str(args.samples), "--seq-len", str(args.seq_len)]
        if not args.allow_random_init:
            dump_args += ["--checkpoint", ckpt, "--tokens", args.tokens]
        rc = subprocess.run(
            [sys.executable, "-c",
             "import sys, jax; jax.config.update('jax_platforms', 'cpu'); "
             "from sleekit_tpu.experiments.dump_stats import main; "
             "sys.exit(main(sys.argv[1:]))", *dump_args],
            cwd=REPO, text=True, capture_output=True)
        if rc.returncode != 0:
            gate(False, f"{model}: dump_stats failed",
                 "if the message below says wikitext2/tokenizer is "
                 "unavailable, pre-tokenize once with network and pass "
                 f"--tokens stream.npy\n{rc.stderr[-1500:]}")
            any_fail = True
            continue

        for size in args.sizes:
            b = SIZE_TO_B[size]
            csvs = {}
            for side in ("ref", "tpu"):
                out_csv = os.path.join(args.out, model,
                                       f"compare_{b}b.{side}.csv")
                secs = run_cli(side, "compare", [], tree, out_csv,
                               args.ref_path, size=size)
                csvs[side] = out_csv
                print(f"  {side} compare {b}b: {secs:.0f}s -> {out_csv}")
            ours = numeric_columns(read_tsv(csvs["tpu"]))
            ref = numeric_columns(read_tsv(csvs["ref"]))
            pub = published_geomeans(args.ref_path, model, size)
            print(f"  {model} {b}b geomean vs GPTQ "
                  "(ours | ref-on-same-dumps | published):")
            for col in ours:
                if col not in ref:
                    continue
                g_t = (geomean_ratio(ours[col] / ours["Standard"]) - 1) * 100
                g_r = (geomean_ratio(ref[col] / ref["Standard"]) - 1) * 100
                g_p = pub.get(col) if pub else None
                flag = "" if abs(g_t - g_r) <= args.tol_pp else "  <-- MISMATCH"
                any_fail |= abs(g_t - g_r) > args.tol_pp
                pubs = f"{g_p:+.2f}%" if g_p is not None else "n/a"
                print(f"    {col:28s} {g_t:+.2f}% | {g_r:+.2f}% | {pubs}{flag}")

        if args.eval_ppl:
            print(f"== {model}: light-preset 4-bit quantize + perplexity")
            q_args = [os.path.join(args.out, model, "ckpt4b"), "--model",
                      model, "--preset", "light", "--nbits", "4",
                      "--eval-ppl"]
            if not args.allow_random_init:
                q_args += ["--checkpoint", ckpt, "--tokens", args.tokens]
            rc = subprocess.run(
                [sys.executable, "-c",
                 "import sys, jax; jax.config.update('jax_platforms', 'cpu'); "
                 "from sleekit_tpu.experiments.quantize_model_cli import main; "
                 "sys.exit(main(sys.argv[1:]))", *q_args],
                cwd=REPO, text=True)
            any_fail |= rc.returncode != 0

    if any_fail:
        print("REPRODUCTION INCOMPLETE (gates or mismatches above)")
        return 1
    print("REPRODUCTION DRIVER OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
