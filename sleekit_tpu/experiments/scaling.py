"""Scaling-mode ablation (re-creation of ref experiments/scaling.py:88-139)."""

import argparse

from sleekit_tpu.experiments.common import (
    add_common_args, corrected, iter_layers, make_codebook)
from sleekit_tpu.scaling import compute_scaling, quantize_with_scaling
from sleekit_tpu.solver import quantization_error

MODE_FLAGS = [("max", "Max"), ("diag", "Diag"), ("diag1", "Diag1"),
              ("diag3", "Diag3"), ("diag10", "Diag10"),
              ("hessian", "Hessian"), ("obq", "OBQAware")]


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Analysis of the effect of scaling method on the error")
    add_common_args(parser)
    parser.add_argument("--correct-bias", action="store_true",
                        help="Use the bias-corrected hessian")
    for mode, label in MODE_FLAGS:
        flag = "--run-obq-aware" if mode == "obq" else f"--run-{mode}"
        parser.add_argument(flag, action="store_true",
                            help=f"Run experiments with {mode} mode")
    args = parser.parse_args(argv)
    cb = make_codebook(args.codebook_size)
    gk = dict(grid_size=args.grid_size, min_factor=args.min_factor,
              max_factor=args.max_factor)

    modes = ["mse"]
    header = "Data\tMSE"
    for mode, label in MODE_FLAGS:
        attr = "run_obq_aware" if mode == "obq" else f"run_{mode}"
        if getattr(args, attr):
            modes.append(mode)
            header += f"\t{label}"
    print(header)

    for name, W, H, mean in iter_layers(args):
        if args.correct_bias:
            H = corrected(H, mean)
        row = name
        for mode in modes:
            sc = compute_scaling(W, cb, H, mode=mode, **gk)
            q = quantize_with_scaling(W, sc, cb, H=H, damp=args.damp)
            row += f"\t{quantization_error(W, q, H)}"
        print(row, flush=True)


if __name__ == "__main__":
    main()
