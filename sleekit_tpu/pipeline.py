"""Layer quantization pipeline: statistics -> scaling -> solve -> bias fix.

Re-design of the reference orchestrator (/root/reference/sleekit/statistics.py:12-199)
without any torch dependency: a ``LayerQuantizer`` accumulates on-device
statistics for one linear/conv layer and a single jitted ``quantize_layer``
program runs the full per-layer pipeline (scaling search, GPTQ solve, local
search, bias correction). Presets reproduce the reference hyperparameters
exactly (``basic`` / ``sleekit light`` / ``sleekit heavy``,
ref statistics.py:107-144).

Artifact I/O keeps the reference's per-layer ``data/<layer>/{weight,hessian,
mean,bias}.npy`` layout (ref statistics.py:89-105) so statistics dumped by
either implementation are interchangeable, and quantization can resume from
the filesystem (the reference's de-facto checkpoint system, SURVEY.md §5.4).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sleekit_tpu.codebooks import Codebook, UniformCodebook
from sleekit_tpu.hessian import (
    LayerStats,
    init_stats,
    prepare_input_conv1d,
    prepare_input_conv2d,
    prepare_input_linear,
    remove_input_bias,
    update_stats,
)
from sleekit_tpu.scaling import compute_scaling, quantize_with_scaling
from sleekit_tpu.solver import channelwise_error


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """All knobs of the per-layer pipeline (ref statistics.py:146-160 kwargs).

    Hashable + frozen so it can be a static jit argument.
    """

    nbits: float = 3
    codebook_size: Optional[int] = None  # overrides 2**nbits when set
    # 'uniform' (ref statistics.py:161), 'nf4' (ref codebook.py:296-320),
    # or 'lloyd' (per-layer Lloyd-Max-trained codebook, ref codebook.py:338).
    codebook_kind: str = "uniform"
    scaling_mode: str = "mse"
    order_mode: str = "diag"
    bias_correction: bool = False
    damp: float = 0.01
    nb_ls_moves: int = 0
    grid_size: int = 100
    min_factor: float = 0.05
    max_factor: float = 1.0
    block_size: int = 128
    # >0: coarse-then-fine OBQ-aware scaling search (2*obq_refine GPTQ
    # sweeps instead of grid_size; scaling.compute_obq_scaling). 0 keeps
    # the reference-exact flat grid.
    obq_refine: int = 0

    def resolved_codebook_size(self) -> int:
        if self.codebook_size is not None:
            return self.codebook_size
        return int(round(2 ** self.nbits))

    def make_codebook(self, weight=None):
        """Codebook per ``codebook_kind``.

        'uniform': symmetric over [-1, 1] (ref statistics.py:161).
        'nf4': the NormalFloat4 table.
        'lloyd': Lloyd-Max trained on the norm-scaled weights (host-side,
        requires ``weight``).
        """
        if self.codebook_kind == "uniform":
            return UniformCodebook(self.resolved_codebook_size(), -1.0, 1.0)
        if self.codebook_kind == "nf4":
            return Codebook.nf4()
        if self.codebook_kind == "lloyd":
            from sleekit_tpu.codebooks import lloyd_max
            from sleekit_tpu.scaling import compute_norm_scaling
            assert weight is not None, "lloyd codebook needs the weights"
            w = jnp.asarray(weight, jnp.float32)
            sc = compute_norm_scaling(w, 0)
            return lloyd_max(np.asarray(w / sc[:, None]),
                             self.resolved_codebook_size(),
                             sample_count=4096)
        raise ValueError(f"unknown codebook_kind {self.codebook_kind}")


# The three reference presets (ref statistics.py:107-144). Note the heavy
# preset uses 100 local-search moves - the code value, not the README's
# "1000" (SURVEY.md §2.1 quirk 2).
PRESETS = {
    "basic": dict(scaling_mode="mse", order_mode="diag",
                  bias_correction=False, damp=0.01, nb_ls_moves=0),
    "light": dict(scaling_mode="diag", order_mode="sqerr",
                  bias_correction=True, damp=0.03, nb_ls_moves=0),
    "heavy": dict(scaling_mode="hessian", order_mode="sqerr",
                  bias_correction=True, damp=0.03, nb_ls_moves=100),
}


def preset_config(name: str, nbits: float = 3, **overrides) -> QuantConfig:
    kw = dict(PRESETS[name])
    kw.update(overrides)
    return QuantConfig(nbits=nbits, **kw)


@partial(jax.jit, static_argnames=("config",))
def quantize_layer(
    weight: jnp.ndarray,
    hessian: jnp.ndarray,
    mean: jnp.ndarray,
    config: QuantConfig,
    codebook=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One jitted program for the full per-layer pipeline.

    Returns (quantized weight [dequantized f32], bias delta, per-channel
    scale, per-channel error). Flow mirrors ref statistics.py:146-190:
    optional H <- H - mu mu^T, scaling search, scale/solve/rescale, and the
    post-hoc bias update b += (W - Q) @ mu. ``codebook`` overrides the
    config-derived codebook (needed for data-trained Lloyd-Max codebooks,
    which are built host-side).
    """
    cb = codebook if codebook is not None else config.make_codebook()
    W = weight.astype(jnp.float32)
    H = hessian.astype(jnp.float32)
    mean = mean.astype(jnp.float32)

    if config.bias_correction:
        H = remove_input_bias(H, mean)

    scale = compute_scaling(
        W, cb, H, mode=config.scaling_mode,
        grid_size=config.grid_size, min_factor=config.min_factor,
        max_factor=config.max_factor, block_size=config.block_size,
        obq_refine=config.obq_refine)
    Q = quantize_with_scaling(
        W, scale, cb, H=H, act_order=config.order_mode,
        damp=config.damp, nb_ls_moves=config.nb_ls_moves,
        block_size=config.block_size)

    bias_delta = jnp.sum((W - Q) * mean[None, :], axis=1)
    err = channelwise_error(W, Q, H)
    return Q, bias_delta, scale, err


class LayerQuantizer:
    """Statistics + quantization driver for one layer (ref Sleekit class).

    ``kind`` is 'linear', 'conv1d' or 'conv2d'; conv weights are flattened
    to (out, in*k...) exactly like the reference (ref statistics.py:20-24).
    """

    def __init__(self, weight, bias=None, kind: str = "linear",
                 kernel_size=None, dilation=None, padding=None, stride=None):
        weight = jnp.asarray(weight, jnp.float32)
        if kind not in ("linear", "conv1d", "conv2d"):
            raise ValueError(f"Unsupported layer kind {kind}")
        self.kind = kind
        self.weight_shape = weight.shape
        self.weight = weight.reshape(weight.shape[0], -1)
        self.bias = None if bias is None else jnp.asarray(bias, jnp.float32)
        self.kernel_size = kernel_size
        self.dilation = dilation
        self.padding = padding
        self.stride = stride
        self.stats = init_stats(self.weight.shape[1])

    @property
    def count(self) -> int:
        return int(self.stats.count)

    def _prepare_input(self, x) -> jnp.ndarray:
        x = jnp.asarray(x)
        if self.kind == "linear":
            return prepare_input_linear(x)
        if self.kind == "conv2d":
            return prepare_input_conv2d(
                x, self.kernel_size, self.dilation or (1, 1),
                self.padding or (0, 0), self.stride or (1, 1))
        return prepare_input_conv1d(
            x, self.kernel_size, self.dilation or 1,
            self.padding or 0, self.stride or 1)

    def add_batch(self, x) -> None:
        """Fold one activation batch into the running statistics."""
        self.stats = update_stats(self.stats, self._prepare_input(x))

    # ---- artifact I/O (reference-compatible layout) -------------------

    def export(self, path: str, npy_format: bool = True) -> None:
        """Dump weight/hessian/mean/bias artifacts, same files and layout
        as the reference export (ref statistics.py:89-105). ``npy_format``
        False writes torch ``.pt`` files instead (requires torch), for
        byte-compatibility with reference-side consumers."""
        os.makedirs(path, exist_ok=True)
        arrays = {
            "weight": np.asarray(self.weight, np.float32).reshape(
                self.weight_shape),
            "hessian": np.asarray(self.stats.hessian),
            "mean": np.asarray(self.stats.mean),
        }
        if self.bias is not None:
            arrays["bias"] = np.asarray(self.bias)
        if npy_format:
            for name, arr in arrays.items():
                np.save(os.path.join(path, f"{name}.npy"), arr)
        else:
            import torch

            for name, arr in arrays.items():
                torch.save(torch.from_numpy(np.ascontiguousarray(arr)),
                           os.path.join(path, f"{name}.pt"))

    @classmethod
    def load(cls, path: str) -> "LayerQuantizer":
        """Rebuild a quantizer from a reference-layout artifact directory."""
        weight = np.load(os.path.join(path, "weight.npy"))
        bias_path = os.path.join(path, "bias.npy")
        bias = np.load(bias_path) if os.path.exists(bias_path) else None
        lq = cls(weight, bias=bias)
        mean = jnp.asarray(np.load(os.path.join(path, "mean.npy")))
        hessian = jnp.asarray(np.load(os.path.join(path, "hessian.npy")))
        lq.stats = LayerStats(mean=mean, hessian=hessian,
                              count=jnp.ones((), jnp.float32))
        return lq

    # ---- quantization -------------------------------------------------

    def quantize(self, config: QuantConfig):
        """Run the pipeline; updates self.weight (dequantized f32, like the
        reference stores back into the torch layer, ref statistics.py:186)
        and self.bias. Returns (Q, scale, per-channel error)."""
        # Non-uniform codebooks are host-side constructs (table build /
        # Lloyd-Max training) - create outside jit and pass as a pytree.
        codebook = None
        if config.codebook_kind != "uniform":
            codebook = config.make_codebook(self.weight)
        Q, bias_delta, scale, err = quantize_layer(
            self.weight, self.stats.hessian, self.stats.mean, config,
            codebook)
        self.weight = Q
        if config.bias_correction and self.bias is not None:
            self.bias = self.bias + bias_delta
        return Q.reshape(self.weight_shape), scale, err

    def quantize_basic(self, nbits: float = 3, **overrides):
        return self.quantize(preset_config("basic", nbits, **overrides))

    def quantize_sleekit_light(self, nbits: float = 3, **overrides):
        return self.quantize(preset_config("light", nbits, **overrides))

    def quantize_sleekit_heavy(self, nbits: float = 3, **overrides):
        return self.quantize(preset_config("heavy", nbits, **overrides))

    def free(self) -> None:
        self.weight = None
        self.bias = None
        self.stats = None
