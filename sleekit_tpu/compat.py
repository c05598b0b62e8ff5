"""Drop-in torch-facing API: the reference's ``Sleekit`` class.

The reference's only torch-facing surface is ``sleekit.statistics.Sleekit``
(ref statistics.py:12-199): wrap one ``nn.Linear/Conv1d/Conv2d``, stream
activation batches from a forward hook, then quantize in place. External
harnesses (the GPTQ repo, ref README.md:183) depend on exactly this API:
``Sleekit(layer)``, ``add_batch(inp, out=None)``, ``export(path,
npy_format=False)``, ``quantize(nbits, ...)`` with the reference keyword
signature (ref statistics.py:146-160), the three presets, ``free()``, and
``mean`` / ``hessian`` / ``count`` / ``device`` attributes.

This module provides that class verbatim on top of the JAX pipeline: the
statistics and the solve run on-device through :class:`LayerQuantizer`;
only the layer mutation touches torch. Additionally supports
``transformers.Conv1D`` (HF GPT-2-style transposed linear), which the
reference acknowledges but does not handle (ref statistics.py:24 TODO).
"""

from __future__ import annotations

import numpy as np

from sleekit_tpu.pipeline import LayerQuantizer, QuantConfig, preset_config

__all__ = ["Sleekit"]


def _is_hf_conv1d(layer) -> bool:
    """Duck-typed transformers.Conv1D: 2-D weight stored (in, out) with an
    ``nf`` output-features attribute; avoids a hard transformers import."""
    return (type(layer).__name__ == "Conv1D" and hasattr(layer, "nf")
            and getattr(layer, "weight", None) is not None
            and layer.weight.ndim == 2)


class Sleekit:
    """Statistics of a layer, with an API compatible with GPTQ harnesses
    (ref statistics.py:12-15). Computation runs on-device via JAX."""

    def __init__(self, layer):
        import torch.nn as nn

        self.layer = layer
        self._hf_conv1d = _is_hf_conv1d(layer)
        if self._hf_conv1d:
            kind, kwargs = "linear", {}
            weight = layer.weight.t()  # HF Conv1D stores (in, out)
        elif isinstance(layer, nn.Linear):
            kind, kwargs = "linear", {}
            weight = layer.weight
        elif isinstance(layer, nn.Conv1d):
            kind = "conv1d"
            kwargs = dict(kernel_size=layer.kernel_size[0],
                          dilation=layer.dilation[0],
                          padding=layer.padding[0],
                          stride=layer.stride[0])
            weight = layer.weight
        elif isinstance(layer, nn.Conv2d):
            kind = "conv2d"
            kwargs = dict(kernel_size=tuple(layer.kernel_size),
                          dilation=tuple(layer.dilation),
                          padding=tuple(layer.padding),
                          stride=tuple(layer.stride))
            weight = layer.weight
        else:
            raise ValueError(f"Unsupported layer type {type(layer)}")
        bias = getattr(layer, "bias", None)
        self._lq = LayerQuantizer(
            weight.detach().cpu().float().numpy(),
            bias=None if bias is None else bias.detach().cpu().float().numpy(),
            kind=kind, **kwargs)

    # ---- reference attribute surface ----------------------------------

    @property
    def device(self):
        return self.layer.weight.device

    @property
    def count(self) -> int:
        return 0 if self._lq.stats is None else self._lq.count

    @property
    def mean(self):
        import torch

        return torch.from_numpy(np.array(self._lq.stats.mean))

    @property
    def hessian(self):
        import torch

        return torch.from_numpy(np.array(self._lq.stats.hessian))

    # ---- statistics ----------------------------------------------------

    def add_batch(self, inp, out=None) -> None:
        """Fold one activation batch into the running statistics
        (ref statistics.py:76-87). ``out`` is accepted for hook-signature
        compatibility and ignored, like the reference."""
        self._lq.add_batch(inp.detach().cpu().float().numpy())

    def export(self, path: str, npy_format: bool = False) -> None:
        """Dump bias/weight/mean/hessian artifacts (ref statistics.py:89-105;
        note the reference default is torch ``.pt``)."""
        self._lq.export(path, npy_format=npy_format)

    # ---- quantization ----------------------------------------------------

    def quantize(self, nbits, scaling_mode="mse", order_mode="diag",
                 bias_correction=False, damp=0.01, nb_ls_moves=0,
                 grid_size=100, min_factor=0.05, max_factor=1.0) -> None:
        """Quantize the layer in place to the required precision — the
        reference keyword signature and semantics (ref statistics.py:146-190):
        symmetric uniform 2**nbits codebook, dequantized f32 stored back into
        ``layer.weight``, bias updated by ``(W−Q)·mean`` when correcting."""
        import torch

        cfg = QuantConfig(
            nbits=nbits, scaling_mode=scaling_mode, order_mode=order_mode,
            bias_correction=bias_correction, damp=damp,
            nb_ls_moves=nb_ls_moves, grid_size=grid_size,
            min_factor=min_factor, max_factor=max_factor)
        Q, _, _ = self._lq.quantize(cfg)
        Q = np.asarray(Q, np.float32)
        if self._hf_conv1d:
            Q = Q.T
        with torch.no_grad():
            self.layer.weight.data = torch.from_numpy(
                Q.reshape(tuple(self.layer.weight.shape))).to(
                    self.layer.weight.dtype)
            if bias_correction and self.layer.bias is not None:
                self.layer.bias.data = torch.from_numpy(
                    np.asarray(self._lq.bias, np.float32)).to(
                        self.layer.bias.dtype)

    def quantize_basic(self, nbits) -> None:
        """Standard GPTQ, no sleekit improvements (ref statistics.py:107)."""
        p = preset_config("basic", nbits)
        self.quantize(nbits, scaling_mode=p.scaling_mode,
                      order_mode=p.order_mode,
                      bias_correction=p.bias_correction, damp=p.damp,
                      nb_ls_moves=p.nb_ls_moves)

    def quantize_sleekit_light(self, nbits) -> None:
        """Sleekit "light": no extra computational cost (ref statistics.py:120)."""
        p = preset_config("light", nbits)
        self.quantize(nbits, scaling_mode=p.scaling_mode,
                      order_mode=p.order_mode,
                      bias_correction=p.bias_correction, damp=p.damp,
                      nb_ls_moves=p.nb_ls_moves)

    def quantize_sleekit_heavy(self, nbits) -> None:
        """Sleekit "heavy": scaling grid over full GPTQ sweeps + local search
        (ref statistics.py:132)."""
        p = preset_config("heavy", nbits)
        self.quantize(nbits, scaling_mode=p.scaling_mode,
                      order_mode=p.order_mode,
                      bias_correction=p.bias_correction, damp=p.damp,
                      nb_ls_moves=p.nb_ls_moves)

    def free(self) -> None:
        """Release internal tensors (ref statistics.py:192-199)."""
        self.layer = None
        self._lq.free()
