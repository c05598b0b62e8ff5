"""Ordering-heuristic ablation: diag vs err vs sqerr (re-creation of ref
experiments/ordering.py:60-91)."""

import argparse

from sleekit_tpu.experiments.common import (
    add_common_args, corrected, iter_layers, make_codebook)
from sleekit_tpu.scaling import compute_scaling, quantize_with_scaling
from sleekit_tpu.solver import quantization_error


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Analysis of the effect of column ordering on the error")
    add_common_args(parser)
    parser.add_argument("--scaling", type=str, default="mse")
    parser.add_argument("--correct-bias", action="store_true")
    args = parser.parse_args(argv)
    cb = make_codebook(args.codebook_size)
    gk = dict(grid_size=args.grid_size, min_factor=args.min_factor,
              max_factor=args.max_factor)

    print("Data\tScaling\tDiag\tDiagErr\tDiagSqErr")
    for name, W, H, mean in iter_layers(args):
        if args.correct_bias:
            H = corrected(H, mean)
        sc = compute_scaling(W, cb, H, mode=args.scaling, **gk)
        row = f"{name}\t{args.scaling}"
        for order in ("diag", "err", "sqerr"):
            q = quantize_with_scaling(W, sc, cb, H=H, act_order=order,
                                      damp=args.damp)
            row += f"\t{quantization_error(W, q, H)}"
        print(row, flush=True)


if __name__ == "__main__":
    main()
