"""Tensor-parallel decode via ``shard_map``: explicit Megatron-style TP.

GSPMD (NamedSharding on params + pjit) handles the calibration and
full-forward paths, but the serving decode step uses Pallas kernels
(ops/attention.py, ops/dequant_matmul.py) which GSPMD cannot partition.
``tp_decode_step`` runs the SAME single-device decode code inside a
``shard_map`` block instead: every device executes the kernels on its
head/ff shard and exactly two ``psum``s per layer (after the attention
output projection and after the MLP down projection) ride the ICI -
the standard column-then-row parallel pattern, expressed TPU-native.

Sharding contract (mesh axes ('data', 'model'), SURVEY.md §2.3):
  * q/k/v, fc1 (gate/up): output-dim sharded over 'model' (heads / ff);
  * o, fc2 (down): input-dim sharded, partial outputs psum'd; their
    biases are replicated and added once after the psum;
  * KV cache: kv-head axis sharded; the flash kernels see local heads;
  * embed/unembed, norms: replicated; batch: sharded over 'data'.

Requires UNFUSED q/k/v params (fusion concatenates across the shard
boundary; use fuse_qkv_params only for single-shard serving).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sleekit_tpu.models.transformer import (
    TransformerConfig,
    _embed,
    _unembed,
    finalize_logits,
    alibi_slopes,
    apply_linear,
    apply_norm,
)
from sleekit_tpu.ops.attention import decode_attention
from sleekit_tpu.ops.pack import PackedLinear, localize_packed_shard
from sleekit_tpu.parallel.mesh import (
    _ROW_PARALLEL, param_specs, kv_cache_specs)


def _local_cfg(cfg: TransformerConfig, n: int) -> TransformerConfig:
    assert cfg.n_heads % n == 0 and cfg.kv_heads % n == 0, (
        f"{cfg.n_heads} heads / {cfg.kv_heads} kv heads not divisible by "
        f"model-parallel size {n}")
    return dataclasses.replace(cfg, n_heads=cfg.n_heads // n,
                               n_kv_heads=cfg.kv_heads // n)


def _localize_packed(params, n: int):
    """Fix PackedLinear static metadata inside the shard_map body: shard_map
    hands each device its local array shards but re-attaches the GLOBAL
    static fields, so a row-parallel split_packed_k matrix still claims the
    full K and a column-parallel one the full N. Works on both the
    per-layer-list and the stacked scan_layers layouts (statics are shared
    across the stacked axis)."""
    if n == 1:
        return params

    def fix_layer(layer):
        layer = {**layer, "attn": dict(layer["attn"]),
                 "mlp": dict(layer["mlp"])}
        for grp in ("attn", "mlp"):
            for name, p in layer[grp].items():
                if isinstance(p, PackedLinear):
                    layer[grp][name] = localize_packed_shard(
                        p, n, row_parallel=name in _ROW_PARALLEL)
        return layer

    out = dict(params)
    if isinstance(params["layers"], dict):
        out["layers"] = fix_layer(params["layers"])
    else:
        out["layers"] = [fix_layer(l) for l in params["layers"]]
    if isinstance(params.get("lm_head"), PackedLinear):
        out["lm_head"] = localize_packed_shard(params["lm_head"], n,
                                               row_parallel=False)
    return out


def _strip_row_bias(p):
    """Remove the bias from a row-parallel linear (added after the psum)."""
    if isinstance(p, dict) and "bias" in p:
        return {"kernel": p["kernel"]}, p["bias"]
    if hasattr(p, "bias") and p.bias is not None:
        return dataclasses.replace(p, bias=None), p.bias
    return p, None


def _tp_block(cfg, lcfg, layer, x, entry, pos_vec, lidx, axis, slopes):
    """One decode block on the LOCAL head shard; psums over ``axis``."""
    b = x.shape[0]
    hd = cfg.head_dim
    h_in = apply_norm(cfg, layer["ln1"], x) if cfg.pre_norm else x
    q = apply_linear(layer["attn"]["q"], h_in)
    k = apply_linear(layer["attn"]["k"], h_in)
    v = apply_linear(layer["attn"]["v"], h_in)
    q = q.reshape(b, 1, lcfg.n_heads, hd)
    k = k.reshape(b, 1, lcfg.kv_heads, hd)
    v = v.reshape(b, 1, lcfg.kv_heads, hd)

    if cfg.positional == "rope":
        from sleekit_tpu.models.transformer import apply_rope, rope_freqs
        cos, sin = rope_freqs(cfg, pos_vec[:, None])
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

    paged = "page_table" in entry
    common = dict(scale=1.0 / math.sqrt(hd), alibi_slopes=slopes,
                  k_scale=entry.get("k_scale"),
                  v_scale=entry.get("v_scale"))
    if paged:
        # Paged pool with the kv-head axis sharded over 'model': each
        # shard runs the paged kernels on its local heads against the
        # full (replicated) page table - same per-shard structure as the
        # dense cache path (mesh.kv_cache_specs).
        from sleekit_tpu.ops.paged_attention import paged_decode_attention
        res = paged_decode_attention(
            q[:, 0], k[:, 0], v[:, 0], entry["k"], entry["v"],
            entry["page_table"], pos_vec, lidx, **common)
    else:
        res = decode_attention(
            q[:, 0], k[:, 0], v[:, 0], entry["k"], entry["v"], pos_vec,
            lidx, **common)
    attn = res[0].reshape(b, 1, lcfg.n_heads * hd)
    new_entry = {"k": res[1], "v": res[2]}
    if len(res) == 5:
        new_entry["k_scale"], new_entry["v_scale"] = res[3], res[4]
    if paged:
        new_entry["page_table"] = entry["page_table"]

    o_p, o_bias = _strip_row_bias(layer["attn"]["o"])
    attn = lax.psum(apply_linear(o_p, attn), axis)
    if o_bias is not None:
        attn = attn + o_bias
    x = x + attn
    if not cfg.pre_norm:
        x = apply_norm(cfg, layer["ln1"], x)

    h = apply_norm(cfg, layer["ln2"], x) if cfg.pre_norm else x
    if cfg.activation == "silu_glu":
        gate = apply_linear(layer["mlp"]["gate"], h)
        up = apply_linear(layer["mlp"]["up"], h)
        h = jax.nn.silu(gate) * up
        d_p, d_bias = _strip_row_bias(layer["mlp"]["down"])
        h = lax.psum(apply_linear(d_p, h), axis)
        if d_bias is not None:
            h = h + d_bias
    else:
        h = apply_linear(layer["mlp"]["fc1"], h)
        h = jax.nn.relu(h) if cfg.activation == "relu" else jax.nn.gelu(h)
        f2_p, f2_bias = _strip_row_bias(layer["mlp"]["fc2"])
        h = lax.psum(apply_linear(f2_p, h), axis)
        if f2_bias is not None:
            h = h + f2_bias
    x = x + h
    if not cfg.pre_norm:
        x = apply_norm(cfg, layer["ln2"], x)
    return x, new_entry


def _prefill_bias(positions, k_pos, slopes):
    """(B, 1|H, T, S) additive causal (+local-ALiBi) bias for prefill on a
    head shard: ``slopes`` is the LOCAL slope shard or None."""
    mask = positions[..., :, None] >= k_pos[..., None, :]
    bias = jnp.where(mask, 0.0, jnp.float32(-1e9))[:, None]
    if slopes is not None:
        dist = (k_pos[..., None, :] - positions[..., :, None]
                ).astype(jnp.float32)[:, None]
        bias = bias + slopes[None, :, None, None] * dist
    return bias


def _tp_prefill_block(cfg, lcfg, layer, x, entry, positions, axis, slopes):
    """One prefill block on the LOCAL head shard (full-sequence attention,
    contiguous KV write from position 0); psums over ``axis``. Mirrors the
    prefill branch of transformer._block with local head counts."""
    from sleekit_tpu.models.transformer import _attention
    from sleekit_tpu.ops.attention import _quant_rows

    b, t, d = x.shape
    hd = cfg.head_dim
    h_in = apply_norm(cfg, layer["ln1"], x) if cfg.pre_norm else x
    q = apply_linear(layer["attn"]["q"], h_in).reshape(b, t, lcfg.n_heads, hd)
    k = apply_linear(layer["attn"]["k"], h_in).reshape(b, t, lcfg.kv_heads, hd)
    v = apply_linear(layer["attn"]["v"], h_in).reshape(b, t, lcfg.kv_heads, hd)

    if cfg.positional == "rope":
        from sleekit_tpu.models.transformer import apply_rope, rope_freqs
        cos, sin = rope_freqs(cfg, positions)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

    kt = k.transpose(0, 2, 1, 3)                       # (B, KVl, T, D)
    vt = v.transpose(0, 2, 1, 3)
    cache_k, cache_v = entry["k"], entry["v"]
    new_entry = {}
    if "k_scale" in entry:
        kq, ks = _quant_rows(kt.astype(jnp.float32))
        vq, vs = _quant_rows(vt.astype(jnp.float32))
        cache_k = lax.dynamic_update_slice(
            cache_k, kq.astype(cache_k.dtype), (0, 0, 0, 0))
        cache_v = lax.dynamic_update_slice(
            cache_v, vq.astype(cache_v.dtype), (0, 0, 0, 0))
        new_entry["k_scale"] = lax.dynamic_update_slice(
            entry["k_scale"], ks[..., 0].astype(entry["k_scale"].dtype),
            (0, 0, 0))
        new_entry["v_scale"] = lax.dynamic_update_slice(
            entry["v_scale"], vs[..., 0].astype(entry["v_scale"].dtype),
            (0, 0, 0))
        attn_k = (cache_k.astype(jnp.float32)
                  * new_entry["k_scale"][..., None]).astype(x.dtype)
        attn_v = (cache_v.astype(jnp.float32)
                  * new_entry["v_scale"][..., None]).astype(x.dtype)
    else:
        cache_k = lax.dynamic_update_slice(
            cache_k, kt.astype(cache_k.dtype), (0, 0, 0, 0))
        cache_v = lax.dynamic_update_slice(
            cache_v, vt.astype(cache_v.dtype), (0, 0, 0, 0))
        attn_k, attn_v = cache_k, cache_v
    new_entry["k"], new_entry["v"] = cache_k, cache_v

    s = cache_k.shape[2]
    k_pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    valid = k_pos <= positions[:, -1:]
    bias = _prefill_bias(positions, k_pos, slopes)
    bias = jnp.where(valid[:, None, None, :], bias, -1e9)
    attn = _attention(lcfg, q, attn_k, attn_v, bias)
    attn = attn.reshape(b, t, lcfg.n_heads * hd)

    o_p, o_bias = _strip_row_bias(layer["attn"]["o"])
    attn = lax.psum(apply_linear(o_p, attn), axis)
    if o_bias is not None:
        attn = attn + o_bias
    x = x + attn
    if not cfg.pre_norm:
        x = apply_norm(cfg, layer["ln1"], x)

    h = apply_norm(cfg, layer["ln2"], x) if cfg.pre_norm else x
    if cfg.activation == "silu_glu":
        gate = apply_linear(layer["mlp"]["gate"], h)
        up = apply_linear(layer["mlp"]["up"], h)
        h = jax.nn.silu(gate) * up
        d_p, d_bias = _strip_row_bias(layer["mlp"]["down"])
        h = lax.psum(apply_linear(d_p, h), axis)
        if d_bias is not None:
            h = h + d_bias
    else:
        h = apply_linear(layer["mlp"]["fc1"], h)
        h = jax.nn.relu(h) if cfg.activation == "relu" else jax.nn.gelu(h)
        f2_p, f2_bias = _strip_row_bias(layer["mlp"]["fc2"])
        h = lax.psum(apply_linear(f2_p, h), axis)
        if f2_bias is not None:
            h = h + f2_bias
    x = x + h
    if not cfg.pre_norm:
        x = apply_norm(cfg, layer["ln2"], x)
    return x, new_entry


def tp_prefill(cfg: TransformerConfig, params, tokens, cache,
               mesh: Mesh, axis: str = "model"):
    """Prefill under explicit shard_map tensor parallelism: same semantics
    as transformer.prefill; heads/ff sharded over ``axis``, batch over
    'data', two psums per layer. Returns (logits (B, T, V), cache)."""
    n = mesh.shape[axis]
    lcfg = _local_cfg(cfg, n)
    slopes_full = (jnp.asarray(alibi_slopes(cfg.n_heads))
                   if cfg.positional == "alibi" else None)

    from sleekit_tpu.parallel.mesh import param_specs_stacked
    if cfg.scan_layers:
        pspecs = param_specs_stacked(cfg, params)
    else:
        pspecs = param_specs(cfg, params)
    cspecs = kv_cache_specs(cache)
    gather_logits = "lm_head" in params

    def local(params, tokens, cache, slopes):
        params = _localize_packed(params, n)
        b, t = tokens.shape
        positions = jnp.broadcast_to(jnp.arange(t), (b, t))
        x = _embed(cfg, params, tokens, positions)
        if cfg.scan_layers:
            keys = sorted(cache.keys())

            def body(x, inp):
                layer = inp[0]
                entry = dict(zip(keys, inp[1:]))
                x, entry = _tp_prefill_block(cfg, lcfg, layer, x, entry,
                                             positions, axis, slopes)
                return x, tuple(entry[k] for k in keys)

            x, outs = lax.scan(
                body, x, (params["layers"], *[cache[k] for k in keys]))
            new_cache = dict(zip(keys, outs))
        else:
            new_cache = []
            for layer in params["layers"]:
                x, entry = _tp_prefill_block(cfg, lcfg, layer, x, cache[
                    len(new_cache)], positions, axis, slopes)
                new_cache.append(entry)
        logits = _unembed(cfg, params, x)
        if gather_logits and n > 1:
            logits = lax.all_gather(logits, axis, axis=2, tiled=True)
        return finalize_logits(cfg, logits), new_cache

    slope_args = () if slopes_full is None else (slopes_full,)
    slope_specs = () if slopes_full is None else (P(axis),)
    fn = shard_map(
        lambda p, t, c, *s: local(p, t, c, s[0] if s else None),
        mesh=mesh,
        in_specs=(pspecs, P("data", None), cspecs, *slope_specs),
        out_specs=(P("data"), cspecs),
        check_vma=False,
    )
    return fn(params, tokens, cache, *slope_args)


def tp_decode_step(cfg: TransformerConfig, params, tokens, cache, pos,
                   mesh: Mesh, axis: str = "model"):
    """One decode step, tensor-parallel over ``axis`` and batch-parallel
    over 'data'. Same semantics as transformer.decode_step; the Pallas
    kernels run per shard. tokens (B, 1); pos scalar or (B,)."""
    n = mesh.shape[axis]
    lcfg = _local_cfg(cfg, n)
    slopes_full = (jnp.asarray(alibi_slopes(cfg.n_heads))
                   if cfg.positional == "alibi" else None)

    from sleekit_tpu.parallel.mesh import param_specs_stacked
    if cfg.scan_layers:
        pspecs = param_specs_stacked(cfg, params)
    else:
        pspecs = param_specs(cfg, params)
    cspecs = kv_cache_specs(cache)
    dspec = P("data")
    pos = jnp.broadcast_to(jnp.asarray(pos), (tokens.shape[0],))

    # The unembed is vocab-sharded over 'model' (mesh.param_specs) whenever
    # an explicit lm_head exists; its local logits are all-gathered below.
    gather_logits = "lm_head" in params

    def local(params, tokens, cache, pos_vec, slopes):
        params = _localize_packed(params, n)
        x = _embed(cfg, params, tokens, pos_vec[:, None])
        if cfg.scan_layers:
            def body(carry, inp):
                x, entry = carry
                layer, lidx = inp
                x, entry = _tp_block(cfg, lcfg, layer, x, entry, pos_vec,
                                     lidx, axis, slopes)
                return (x, entry), None
            (x, entry), _ = lax.scan(
                body, (x, dict(cache)),
                (params["layers"], jnp.arange(cfg.n_layers)))
            new_cache = entry
        elif isinstance(cache, dict):
            # Paged (or otherwise stacked) cache with an unrolled layer
            # loop: the pools hold all layers; pass the layer index.
            entry = dict(cache)
            for i, layer in enumerate(params["layers"]):
                x, entry = _tp_block(cfg, lcfg, layer, x, entry, pos_vec,
                                     jnp.int32(i), axis, slopes)
            new_cache = entry
        else:
            new_cache = []
            for i, layer in enumerate(params["layers"]):
                entry = {k: v[None] for k, v in cache[i].items()}
                x, entry = _tp_block(cfg, lcfg, layer, x, entry, pos_vec,
                                     jnp.int32(0), axis, slopes)
                new_cache.append({k: v[0] for k, v in entry.items()})
        logits = _unembed(cfg, params, x)[:, 0, :]
        if gather_logits and n > 1:
            logits = lax.all_gather(logits, axis, axis=1, tiled=True)
        return finalize_logits(cfg, logits), new_cache

    slope_args = () if slopes_full is None else (slopes_full,)
    slope_specs = () if slopes_full is None else (P(axis),)
    fn = shard_map(
        lambda p, t, c, ps, *s: local(p, t, c, ps, s[0] if s else None),
        mesh=mesh,
        in_specs=(pspecs, dspec, cspecs, dspec, *slope_specs),
        out_specs=(P("data"), cspecs),
        check_vma=False,
    )
    return fn(params, tokens, cache, pos, *slope_args)
