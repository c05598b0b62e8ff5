"""Device mesh + sharding rules: DP calibration, TP serving.

The reference is single-process NumPy with no parallelism of any kind
(SURVEY.md §2.3); this module supplies the TPU-native design: one global
``Mesh`` with ``('data', 'model')`` axes, ``NamedSharding`` annotations on
the param/stats/cache pytrees, and GSPMD-inserted collectives - Hessian
statistics all-reduce over ``data``, tensor-parallel activations
all-reduce over ``model`` (Megatron-style column/row split pairs).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sleekit_tpu.models.transformer import TransformerConfig
from sleekit_tpu.ops.pack import PackedLinear


def make_mesh(data: int = 1, model: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the given (or all) devices."""
    devices = devices if devices is not None else jax.devices()
    n = data * model
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = mesh_utils.create_device_mesh((data, model),
                                        devices=devices[:n])
    return Mesh(arr, ("data", "model"))


# ---- partition specs -----------------------------------------------------

# Column-parallel linears: output dim sharded over 'model' (their outputs
# are head-/ff-sharded activations). Row-parallel linears: input dim
# sharded; GSPMD inserts the all-reduce on their output.
_COL_PARALLEL = ("q", "k", "v", "fc1", "gate", "up", "qkv", "gate_up")
_ROW_PARALLEL = ("o", "fc2", "down")


def _linear_spec(name: str, p) -> Any:
    col = name in _COL_PARALLEL
    if isinstance(p, PackedLinear):
        if col:
            return PackedLinear(
                packed=P(None, "model"), scale=P("model"), lut=P(),
                bias=None if p.bias is None else P("model"),
                in_features=p.in_features, out_features=p.out_features,
                nbits=p.nbits, affine=p.affine, layout=p.layout,
                k_splits=p.k_splits)
        # Row-parallel: word rows sharded. Packed words must be in the
        # split_packed_k format so every shard is a self-contained packing
        # (prepare_params_for_tp does this).
        return PackedLinear(
            packed=P("model", None), scale=P(), lut=P(),
            bias=None if p.bias is None else P(),
            in_features=p.in_features, out_features=p.out_features,
            nbits=p.nbits, affine=p.affine, layout=p.layout,
            k_splits=p.k_splits)
    spec = {}
    if col:
        spec["kernel"] = P(None, "model")
        if "bias" in p:
            spec["bias"] = P("model")
    else:
        spec["kernel"] = P("model", None)
        if "bias" in p:
            spec["bias"] = P()
    return spec


def _norm_spec(p) -> Dict[str, Any]:
    return {k: P() for k in p}


def param_specs(cfg: TransformerConfig, params) -> Any:
    """PartitionSpec pytree matching the param tree (TP over 'model')."""
    specs: Dict[str, Any] = {"embed": {"tokens": P()}}
    emb = params["embed"]
    if "pos" in emb:
        specs["embed"]["pos"] = P()
    if "ln" in emb:
        specs["embed"]["ln"] = _norm_spec(emb["ln"])
    if "project_in" in emb:
        specs["embed"]["project_in"] = {"kernel": P()}
    if "project_out" in emb:
        specs["embed"]["project_out"] = {"kernel": P()}
    layers = []
    for layer in params["layers"]:
        lspec: Dict[str, Any] = {
            "ln1": _norm_spec(layer["ln1"]),
            "ln2": _norm_spec(layer["ln2"]),
            "attn": {k: _linear_spec(k, v) for k, v in layer["attn"].items()},
            "mlp": {k: _linear_spec(k, v) for k, v in layer["mlp"].items()},
        }
        layers.append(lspec)
    specs["layers"] = layers
    if "final_ln" in params:
        specs["final_ln"] = _norm_spec(params["final_ln"])
    if "lm_head" in params:
        # Unembed is column-parallel over the vocab; the TP decode step
        # all-gathers the vocab-sharded logits (tp_decode.py).
        if isinstance(params["lm_head"], PackedLinear):
            specs["lm_head"] = _linear_spec("q", params["lm_head"])
        else:
            specs["lm_head"] = {"kernel": P(None, "model")}
    return specs


def prepare_params_for_tp(cfg: TransformerConfig, params, n: int):
    """Convert packed params to the tensor-parallel sharding format:
    row-parallel PackedLinears (attention out / MLP down) are re-packed
    with :func:`~sleekit_tpu.ops.pack.split_packed_k` so their word rows
    shard into ``n`` self-contained packings. Dense linears and
    column-parallel packed linears need no format change. Call on
    UNSTACKED params (before ``stack_layer_params``); fused qkv/gate_up
    params are rejected (fusion crosses the shard boundary)."""
    from sleekit_tpu.ops.pack import split_packed_k

    if n == 1:
        return params
    out = dict(params)
    layers = []
    for layer in params["layers"]:
        assert "qkv" not in layer["attn"], (
            "TP requires unfused q/k/v (fuse_qkv_params is single-shard "
            "serving only)")
        layer = {**layer, "attn": dict(layer["attn"]),
                 "mlp": dict(layer["mlp"])}
        for grp in ("attn", "mlp"):
            for name, p in layer[grp].items():
                if name in _ROW_PARALLEL and isinstance(p, PackedLinear):
                    layer[grp][name] = split_packed_k(p, n)
        layers.append(layer)
    out["layers"] = layers
    return out


def param_specs_stacked(cfg: TransformerConfig, params) -> Any:
    """param_specs for the scan_layers stacked layout: per-layer linear
    specs gain a leading (layer-axis) None dim."""
    stacked = params["layers"]

    def one_layer_specs(layer):
        return {
            "ln1": {k: P(None) for k in layer["ln1"]},
            "ln2": {k: P(None) for k in layer["ln2"]},
            "attn": {k: _prepend_dim(_linear_spec(k, v))
                     for k, v in layer["attn"].items()},
            "mlp": {k: _prepend_dim(_linear_spec(k, v))
                    for k, v in layer["mlp"].items()},
        }

    def _prepend_dim(spec):
        def pre(p):
            return P(None, *p) if isinstance(p, P) else p
        if isinstance(spec, PackedLinear):
            return dataclasses.replace(
                spec, packed=pre(spec.packed), scale=pre(spec.scale),
                lut=pre(spec.lut),
                bias=None if spec.bias is None else pre(spec.bias))
        return {k: pre(v) for k, v in spec.items()}

    specs = param_specs(cfg, {**params, "layers": []})
    specs["layers"] = one_layer_specs(stacked)
    return specs


def stats_specs(stats) -> Any:
    """Calibration statistics are replicated (psum'd over 'data' by GSPMD
    when the batch is data-sharded)."""
    return jax.tree_util.tree_map(lambda _: P(), stats)


def kv_cache_specs(cache) -> Any:
    """KV cache ((B, KV, S, D) per layer, or stacked (L, B, KV, S, D),
    plus per-token scale planes when int8-quantized): batch over 'data',
    kv heads over 'model'.

    Paged pools (dict with a "page_table") shard the pool's PAGE axis
    over 'data' and the KV-HEAD axis over 'model'; the page table's slot
    rows shard over 'data'. Each data replica owns an independent page
    sub-pool and its table rows hold REPLICA-LOCAL page ids (the engine
    allocates per replica, serve/engine.py), so inside shard_map every
    replica's kernels see a self-consistent local pool - and local page
    0 is that replica's trash page (all-zero table rows stay harmless)."""
    def leaf_spec(x, stacked):
        lead = (None,) if stacked else ()
        # values are (..., B, KV, S, D); scale planes (..., B, KV, S)
        tail = (None, None) if x.ndim == len(lead) + 4 else (None,)
        return P(*lead, "data", "model", *tail)

    if isinstance(cache, dict):
        if "page_table" in cache:  # paged pool layout
            def pool_spec(k, v):
                if k == "page_table":
                    return P("data", None)
                # pools (L, P, KV, PS, D); scale planes (L, P, KV, PS)
                tail = (None, None) if v.ndim == 5 else (None,)
                return P(None, "data", "model", *tail)
            return {k: pool_spec(k, v) for k, v in cache.items()}
        return {k: leaf_spec(v, True) for k, v in cache.items()}  # stacked
    return [{k: leaf_spec(v, False) for k, v in entry.items()}
            for entry in cache]


def shard_pytree(tree, specs, mesh: Mesh):
    """device_put a pytree with NamedShardings from a spec tree."""
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(
        put, tree, specs,
        is_leaf=lambda x: isinstance(x, jax.Array) or isinstance(x, np.ndarray))
