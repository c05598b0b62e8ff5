"""Bias-correction ablation: none vs after-optimization vs during
(re-creation of ref experiments/correction.py:55-85)."""

import argparse

from sleekit_tpu.experiments.common import (
    add_common_args, corrected, iter_layers, make_codebook)
from sleekit_tpu.scaling import compute_scaling, quantize_with_scaling
from sleekit_tpu.solver import quantization_error


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Analysis of the effect of bias correction on the error")
    add_common_args(parser)
    parser.add_argument("--scaling", type=str, default="mse",
                        help="Scaling mode for the experiment")
    args = parser.parse_args(argv)
    cb = make_codebook(args.codebook_size)
    gk = dict(grid_size=args.grid_size, min_factor=args.min_factor,
              max_factor=args.max_factor)

    print("Data\tScaling\tGPTQ\tGPTQ+BiasCorrection\tGPTQWithBiasCorrection")
    for name, W, H, mean in iter_layers(args):
        Hc = corrected(H, mean)
        sc = compute_scaling(W, cb, H, mode=args.scaling, **gk)
        gptq = quantize_with_scaling(W, sc, cb, H=H, damp=args.damp)
        with_bias = quantize_with_scaling(W, sc, cb, H=Hc, damp=args.damp)
        e_gptq = quantization_error(W, gptq, H)
        e_after = quantization_error(W, gptq, Hc)
        e_during = quantization_error(W, with_bias, Hc)
        print(f"{name}\t{args.scaling}\t{e_gptq}\t{e_after}\t{e_during}",
              flush=True)


if __name__ == "__main__":
    main()
