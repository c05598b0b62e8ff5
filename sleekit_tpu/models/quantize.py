"""Whole-model quantization: calibrate -> per-layer solve -> packed params.

The model-level driver the reference delegates to an external GPTQ harness
(ref README.md:183): stream calibration batches through
:func:`~sleekit_tpu.models.transformer.calibrate_step` (statistics
accumulate on device), then run the jitted per-layer pipeline
(:func:`~sleekit_tpu.pipeline.quantize_layer`) for every linear and either
store dequantized f32 weights (reference semantics, for quality evaluation)
or pack to the serving format.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sleekit_tpu.hessian import LayerStats
from sleekit_tpu.ops.pack import PackedLinear, pack_quantized
from sleekit_tpu.pipeline import QuantConfig, quantize_layer
from sleekit_tpu.models.transformer import (
    TransformerConfig,
    calibrate_step,
    get_linear_param,
    init_calibration_stats,
    layer_names,
    set_linear_param,
)


@dataclasses.dataclass
class LayerReport:
    name: str
    error: float
    wall_s: float


def calibrate(cfg: TransformerConfig, params, batches: Iterable[jnp.ndarray],
              stats: Optional[Dict[str, LayerStats]] = None
              ) -> Dict[str, LayerStats]:
    """Accumulate Hessian statistics over calibration batches.

    Each batch is (B, T) int32 tokens. Statistics for all linears update
    inside one jitted forward per batch (no host activation transfer).
    """
    if stats is None:
        stats = init_calibration_stats(cfg)
    for tokens in batches:
        stats = calibrate_step(cfg, params, jnp.asarray(tokens), stats)
    return stats


def quantize_model(
    cfg: TransformerConfig,
    params,
    stats: Dict[str, LayerStats],
    qconfig: QuantConfig,
    pack: bool = False,
    verbose: bool = False,
) -> Tuple[Any, List[LayerReport]]:
    """Quantize every linear layer of the model.

    Returns (new params, per-layer reports). With ``pack=True`` linears
    become :class:`PackedLinear` (serving); otherwise weights stay dense
    dequantized f32 (reference semantics, ref statistics.py:186).
    """
    # tree_map rebuilds every container (leaves shared), so the per-layer
    # set_linear_param mutations below never touch the caller's tree.
    params = jax.tree_util.tree_map(lambda x: x, params)
    reports: List[LayerReport] = []
    per_layer_cb = qconfig.codebook_kind == "lloyd"
    explicit_cb = qconfig.codebook_kind != "uniform"
    cb = None if per_layer_cb else qconfig.make_codebook()
    for name in layer_names(cfg):
        t0 = time.time()
        p = get_linear_param(params, name)
        st = stats[name]
        W = p["kernel"].T  # (out, in), the quantizer's layout
        if per_layer_cb:
            cb = qconfig.make_codebook(W)
        Q, bias_delta, scale, err = quantize_layer(
            W, st.hessian, st.mean, qconfig, cb if explicit_cb else None)
        bias = p.get("bias")
        if qconfig.bias_correction and bias is not None:
            bias = bias + bias_delta
        if pack:
            new_p = pack_quantized(Q, scale, cb, bias=bias)
        else:
            new_p = {"kernel": Q.T}
            if bias is not None:
                new_p["bias"] = bias
        set_linear_param(params, name, new_p)
        wall = time.time() - t0
        report = LayerReport(name=name, error=float(jnp.sum(err)), wall_s=wall)
        reports.append(report)
        if verbose:
            print(f"  {name:24s} err={report.error:12.5g} {wall:6.2f}s")
    return params, reports


def pack_lm_head(cfg: TransformerConfig, params, nbits: int = 8):
    """Inject a packed serving unembed head.

    The unembed matmul streams the full (E, V) matrix every decode step;
    packing it (int8 by default - the output head is quality-sensitive)
    cuts that stream 2-4x. Round-to-nearest with per-vocab-channel
    non-saturating scales; the tied embedding GATHER keeps the dense
    table (reads only B rows per step).
    """
    from sleekit_tpu.codebooks import UniformCodebook
    from sleekit_tpu.scaling import compute_non_saturating_scaling

    params = jax.tree_util.tree_map(lambda x: x, params)
    if "lm_head" in params and not isinstance(params["lm_head"], PackedLinear):
        W = params["lm_head"]["kernel"].T          # (V, E)
    else:
        W = params["embed"]["tokens"]               # (V, E) tied
        if "project_out" in params["embed"]:
            raise ValueError("pack_lm_head does not support project_out "
                             "models (OPT-350M); unembed stays dense")
    W = jnp.asarray(W, jnp.float32)
    cb = UniformCodebook(2 ** nbits, -1.0, 1.0)
    scale = compute_non_saturating_scaling(W, cb)   # per vocab channel
    Q = cb(W / scale[:, None]) * scale[:, None]
    params["lm_head"] = pack_quantized(Q, scale, cb)
    return params


def quantize_model_from_batches(
    cfg: TransformerConfig,
    params,
    batches: Iterable[jnp.ndarray],
    qconfig: QuantConfig,
    pack: bool = False,
    verbose: bool = False,
):
    """Convenience: calibrate then quantize in one call."""
    stats = calibrate(cfg, params, batches)
    return quantize_model(cfg, params, stats, qconfig, pack=pack,
                          verbose=verbose)
