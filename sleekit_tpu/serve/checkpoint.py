"""Quantized-model checkpoints: serialize packed param pytrees.

The reference's only persistence is the per-layer statistics dump
(SURVEY.md §5.4); serving needs what it lacks - a packed-weight model
checkpoint. Format ("skq1" store): one ``manifest.json`` describing the
tree structure + static PackedLinear metadata, and one ``.npz`` with every
array leaf under a flat ``t<i>`` key. Loading restores the exact pytree
(packed int32 words, scales, LUTs, dense leaves) with no re-quantization.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Tuple

import numpy as np
import jax.numpy as jnp

from sleekit_tpu.ops.pack import PackedLinear

# skq2 = skq1 + persisted ``k_splits`` (the TP row-sharding format).
# skq1 checkpoints predate k_splits and are all k_splits=1, so they load
# unchanged; loaders reject unknown future formats.
FORMAT_VERSION = "skq2"
_READABLE_FORMATS = ("skq1", "skq2")


def _flatten(tree, path, arrays, spec_out):
    if isinstance(tree, PackedLinear):
        if tree.layer_sel is not None:
            # layer_sel is a traced scan-time index into the stacked
            # (L, kw, N) tensor - checkpointing one would freeze a
            # runtime value into the store. Callers save the stacked
            # container (layer_sel=None) and re-attach selection at
            # decode time (models/transformer scan setup).
            raise ValueError(
                f"cannot checkpoint PackedLinear at '{path}' with "
                "layer_sel set; save the stacked container instead")
        entry = {
            "__packed__": True,
            "in_features": tree.in_features,
            "out_features": tree.out_features,
            "nbits": tree.nbits,
            "affine": list(tree.affine) if tree.affine else None,
            "layout": tree.layout,
            "k_splits": tree.k_splits,
            "packed": _store(arrays, tree.packed),
            "scale": _store(arrays, tree.scale),
            "lut": _store(arrays, tree.lut),
            "bias": None if tree.bias is None else _store(arrays, tree.bias),
        }
        spec_out[path] = entry
        return entry
    if isinstance(tree, dict):
        return {k: _flatten(v, f"{path}/{k}", arrays, spec_out)
                for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_flatten(v, f"{path}/{i}", arrays, spec_out)
                for i, v in enumerate(tree)]
    if tree is None:
        return None
    return _store(arrays, tree)


def _store(arrays: List[np.ndarray], x) -> str:
    key = f"t{len(arrays)}"
    arrays.append(np.asarray(x))
    return key


def save_packed_params(path: str, params, meta: Dict[str, Any] = None) -> None:
    """Write a quantized (or mixed dense/packed) param tree to ``path``."""
    import jax

    os.makedirs(path, exist_ok=True)
    # One batched device_get up front: _flatten's per-leaf np.asarray
    # serializes D2H transfers, which through the axon tunnel turned the
    # OPT-1.3B checkpoint save into 95 s (round-3 journal); a single
    # device_get pipelines the whole tree.
    params = jax.device_get(params)
    arrays: List[np.ndarray] = []
    spec: Dict[str, Any] = {}
    tree_desc = _flatten(params, "", arrays, spec)
    manifest = {
        "format": FORMAT_VERSION,
        "tree": tree_desc,
        "meta": meta or {},
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    np.savez(os.path.join(path, "tensors.npz"),
             **{f"t{i}": a for i, a in enumerate(arrays)})


def _rebuild(desc, tensors):
    if isinstance(desc, dict):
        if desc.get("__packed__"):
            return PackedLinear(
                packed=jnp.asarray(tensors[desc["packed"]]),
                scale=jnp.asarray(tensors[desc["scale"]]),
                lut=jnp.asarray(tensors[desc["lut"]]),
                bias=None if desc["bias"] is None
                else jnp.asarray(tensors[desc["bias"]]),
                in_features=desc["in_features"],
                out_features=desc["out_features"],
                nbits=desc["nbits"],
                affine=None if desc["affine"] is None
                else tuple(desc["affine"]),
                layout=desc.get("layout", "linear"),
                k_splits=desc.get("k_splits", 1),
            )
        return {k: _rebuild(v, tensors) for k, v in desc.items()}
    if isinstance(desc, list):
        return [_rebuild(v, tensors) for v in desc]
    if desc is None:
        return None
    return jnp.asarray(tensors[desc])


def load_packed_params(path: str) -> Tuple[Any, Dict[str, Any]]:
    """Load a checkpoint written by :func:`save_packed_params`.
    Returns (params, meta)."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    if manifest.get("format") not in _READABLE_FORMATS:
        raise ValueError(f"unsupported checkpoint format {manifest.get('format')}")
    tensors = np.load(os.path.join(path, "tensors.npz"))
    params = _rebuild(manifest["tree"], tensors)
    return params, manifest.get("meta", {})
