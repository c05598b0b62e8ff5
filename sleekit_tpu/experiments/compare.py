"""Headline experiment: standard GPTQ vs correction-only vs scaling-only vs
Sleekit light vs Sleekit heavy (re-creation of ref experiments/compare.py,
identical TSV schema and pipeline hyperparameters, compare.py:45-135)."""

import argparse

import jax.numpy as jnp

from sleekit_tpu.experiments.common import (
    add_common_args, corrected, iter_layers, make_codebook)
from sleekit_tpu.scaling import (
    compute_min_mse_scaling, compute_obq_scaling, quantize_with_scaling)
from sleekit_tpu.solver import quantization_error


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Comparison of standard GPTQ against Sleekit variants")
    add_common_args(parser)
    args = parser.parse_args(argv)
    cb = make_codebook(args.codebook_size)
    gk = dict(grid_size=args.grid_size, min_factor=args.min_factor,
              max_factor=args.max_factor)

    print("Data\tStandard\tCorrection\tScaling\tSleekitLight\tSleekitHeavy")
    for name, W, H, mean in iter_layers(args):
        Hc = corrected(H, mean)

        sc = compute_min_mse_scaling(W, cb, **gk)
        std = quantize_with_scaling(W, sc, cb, H=H, act_order="diag", damp=0.01)
        e_std = quantization_error(W, std, H)
        corr = quantize_with_scaling(W, sc, cb, H=Hc, act_order="diag", damp=0.01)
        e_corr = quantization_error(W, corr, Hc)

        sc = compute_min_mse_scaling(W, cb, H=jnp.diagonal(H), **gk)
        scl = quantize_with_scaling(W, sc, cb, H=H, damp=0.01)
        e_scl = quantization_error(W, scl, H)

        sc = compute_min_mse_scaling(W, cb, H=jnp.diagonal(Hc), **gk)
        light = quantize_with_scaling(W, sc, cb, H=Hc, act_order="sqerr", damp=0.03)
        e_light = quantization_error(W, light, Hc)

        sc = compute_obq_scaling(W, cb, 0, H=Hc, act_order="sqerr", damp=0.03, **gk)
        heavy = quantize_with_scaling(W, sc, cb, H=Hc, act_order="sqerr",
                                      damp=0.03, nb_ls_moves=100)
        e_heavy = quantization_error(W, heavy, Hc)

        print(f"{name}\t{e_std}\t{e_corr}\t{e_scl}\t{e_light}\t{e_heavy}",
              flush=True)


if __name__ == "__main__":
    main()
