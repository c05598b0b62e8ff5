"""Shared harness for the ablation experiment CLIs.

Re-creates the reference experiment-script skeleton (argparse flags, the
``data/<model>/<layer>/{weight,hessian,mean}.npy`` tree walk, TSV-to-stdout
rows; ref /root/reference/experiments/compare.py:10-50) so result files are
schema-compatible with the published CSVs in the reference's results/.
"""

from __future__ import annotations

import argparse
import os
from typing import Iterator, List, Tuple

import numpy as np
import jax.numpy as jnp

from sleekit_tpu.codebooks import UniformCodebook
from sleekit_tpu.hessian import remove_dead_values, remove_input_bias


def honor_platform_env() -> None:
    """Re-pin jax_platforms from JAX_PLATFORMS when it asks for cpu.

    The axon sitecustomize pins jax_platforms to "axon,cpu" at import
    time, so the env var alone cannot put a CLI on the virtual-device
    CPU backend (needed for --replicas/--tp testing without a pod).
    Call BEFORE first jax use."""
    import os

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        import jax

        jax.config.update("jax_platforms", "cpu")


def add_common_args(parser: argparse.ArgumentParser,
                    codebook_size: int = 4) -> None:
    parser.add_argument("dir", type=str, help="Directory containing the weights")
    parser.add_argument("--codebook-size", type=int, default=codebook_size,
                        help="Size of the codebook to use")
    parser.add_argument("--damp", type=float, default=0.01,
                        help="Hessian dampening")
    gp = parser.add_argument_group("Optimization")
    gp.add_argument("--grid-size", type=int, default=100,
                    help="Grid size for error minimization")
    gp.add_argument("--min-factor", type=float, default=0.05,
                    help="Minimum scaling factor for error minimization")
    gp.add_argument("--max-factor", type=float, default=1.0,
                    help="Maximum scaling factor for error minimization")


def find_layer_dirs(root: str) -> List[str]:
    """All directories holding a {weight,hessian,mean}.npy triple
    (ref compare.py:37-43)."""
    out = []
    for dirpath, _, filenames in sorted(os.walk(root)):
        names = set(filenames)
        if {"weight.npy", "hessian.npy", "mean.npy"} <= names:
            out.append(dirpath)
    return out


def load_layer(path: str) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Load and repair one layer's artifacts: returns (W, H, mean) with
    dead columns fixed (ref compare.py:51-54)."""
    weight = np.load(os.path.join(path, "weight.npy")).astype(np.float32)
    weight = weight.reshape(weight.shape[0], -1)
    hessian = np.load(os.path.join(path, "hessian.npy")).astype(np.float32)
    mean = np.load(os.path.join(path, "mean.npy")).astype(np.float32)
    H, W = remove_dead_values(jnp.asarray(hessian), jnp.asarray(weight))
    return W, H, jnp.asarray(mean)


def corrected(H: jnp.ndarray, mean: jnp.ndarray) -> jnp.ndarray:
    return remove_input_bias(H, mean)


def make_codebook(size: int) -> UniformCodebook:
    """The experiment codebook: symmetric uniform over [-1, 1]
    (ref compare.py:44 equivalent)."""
    return UniformCodebook(size, -1.0, 1.0)


def iter_layers(args) -> Iterator[Tuple[str, jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    roots = find_layer_dirs(args.dir)
    if not roots:
        raise SystemExit(f"no layer artifacts under {args.dir}")
    for root in roots:
        name = os.path.relpath(root, args.dir)
        W, H, mean = load_layer(root)
        yield name, W, H, mean
