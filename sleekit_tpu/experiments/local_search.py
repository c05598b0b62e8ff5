"""Local-search ablation: 0 vs 10 vs 100 moves (re-creation of ref
experiments/local_search.py:45-88)."""

import argparse

from sleekit_tpu.experiments.common import (
    add_common_args, corrected, iter_layers, make_codebook)
from sleekit_tpu.scaling import compute_scaling, quantize_with_scaling
from sleekit_tpu.solver import quantization_error


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Analysis of the effect of local search on the error")
    add_common_args(parser)
    parser.add_argument("--scaling", type=str, default="mse")
    parser.add_argument("--correct-bias", action="store_true")
    args = parser.parse_args(argv)
    cb = make_codebook(args.codebook_size)
    gk = dict(grid_size=args.grid_size, min_factor=args.min_factor,
              max_factor=args.max_factor)

    print("Data\tScaling\tGPTQ\tGPTQ+LS10\tGPTQ+LS100")
    for name, W, H, mean in iter_layers(args):
        if args.correct_bias:
            H = corrected(H, mean)
        sc = compute_scaling(W, cb, H, mode=args.scaling, **gk)
        row = f"{name}\t{args.scaling}"
        for moves in (0, 10, 100):
            q = quantize_with_scaling(W, sc, cb, H=H, damp=args.damp,
                                      nb_ls_moves=moves)
            row += f"\t{quantization_error(W, q, H)}"
        print(row, flush=True)


if __name__ == "__main__":
    main()
