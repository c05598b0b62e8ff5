"""Generic decoder-only transformer, pure functional JAX.

The reference never runs a model forward (it consumes pre-dumped per-layer
statistics; SURVEY.md §5.7) - this module supplies the calibration harness
and serving forward the reference outsources to the external GPTQ repo
(ref README.md:183), covering the OPT / BLOOM / Llama families through one
configurable implementation:

  * params are plain nested dicts of jnp arrays - a quantized model simply
    replaces a linear's ``{'kernel', 'bias'}`` leaf with a
    :class:`~sleekit_tpu.ops.pack.PackedLinear`, and every forward works
    unchanged through :func:`apply_linear`;
  * positional schemes: learned embeddings (OPT, incl. the +2 offset),
    ALiBi (BLOOM), rotary (Llama) with GQA;
  * calibration runs as ONE jitted on-device program per batch:
    :func:`calibrate_step` threads the per-linear ``LayerStats`` pytree
    through the forward, updating mean/Hessian inline - no host transfer
    of activations (TPU-native replacement for torch forward hooks).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sleekit_tpu.hessian import LayerStats, init_stats, update_stats
from sleekit_tpu.ops.pack import PackedLinear
from sleekit_tpu.ops.dequant_matmul import quantized_matmul


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int = 50272
    d_model: int = 768
    n_layers: int = 12
    n_heads: int = 12
    n_kv_heads: Optional[int] = None      # GQA; None -> n_heads
    d_ff: int = 3072
    max_seq_len: int = 2048
    activation: str = "relu"              # relu | gelu | silu_glu (SwiGLU)
    norm: str = "layernorm"               # layernorm | rmsnorm
    positional: str = "learned"           # learned | alibi | rope
    pre_norm: bool = True                 # pre-LN (OPT-125M) vs post-LN (OPT-350M)
    learned_pos_offset: int = 2           # OPT offsets positions by 2
    embed_ln: bool = False                # BLOOM: layernorm after embedding
    final_ln: bool = True
    tie_embeddings: bool = True
    embed_dim: Optional[int] = None       # OPT-350M word_embed_proj_dim
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    # Qwen2-style: q/k/v projections carry biases even though the model
    # is rmsnorm (where every other linear is bias-free).
    qkv_bias: bool = False
    dtype: Any = jnp.float32
    # Compile the layer stack as ONE block under lax.scan instead of an
    # unrolled python loop: ~n_layers x smaller HLO and compile time.
    # Requires stacked layer params (stack_layer_params) and the stacked
    # KV-cache layout; calibration capture requires scan_layers=False.
    scan_layers: bool = False

    @property
    def kv_heads(self) -> int:
        return self.n_kv_heads or self.n_heads

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


# ---- parameter initialization -------------------------------------------


def _init_linear(key, d_in, d_out, dtype, bias=True, scale=0.02):
    kk, _ = jax.random.split(key)
    p = {"kernel": (jax.random.normal(kk, (d_in, d_out)) * scale).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((d_out,), dtype)
    return p


def init_params(cfg: TransformerConfig, key,
                linear_factory=None) -> Dict[str, Any]:
    """Random-init parameters. ``linear_factory(key, d_in, d_out, dtype,
    bias=...)`` overrides how the quantizable linears are built (e.g.
    fake_quant constructs PackedLinears directly, never materializing the
    dense kernels - vital for 8B-class models)."""
    lin = linear_factory or _init_linear
    keys = jax.random.split(key, cfg.n_layers + 4)
    dtype = cfg.dtype
    d = cfg.d_model
    ed = cfg.embed_dim or d
    use_bias = cfg.norm == "layernorm"  # llama-style models drop biases

    def norm_p():
        p = {"scale": jnp.ones((d,), dtype)}
        if cfg.norm == "layernorm":
            p["bias"] = jnp.zeros((d,), dtype)
        return p

    params: Dict[str, Any] = {
        "embed": {"tokens": (jax.random.normal(keys[0], (cfg.vocab_size, ed))
                             * 0.02).astype(dtype)},
    }
    if cfg.positional == "learned":
        params["embed"]["pos"] = (jax.random.normal(
            keys[1], (cfg.max_seq_len + cfg.learned_pos_offset, d)) * 0.02
        ).astype(dtype)
    if cfg.embed_ln:
        params["embed"]["ln"] = norm_p()
    if ed != d:
        params["embed"]["project_in"] = _init_linear(keys[2], ed, d, dtype, bias=False)
        params["embed"]["project_out"] = _init_linear(keys[3], d, ed, dtype, bias=False)

    kv_dim = cfg.kv_heads * cfg.head_dim
    layers: List[Dict[str, Any]] = []
    for i in range(cfg.n_layers):
        lk = jax.random.split(keys[4 + i], 8)
        qb = use_bias or cfg.qkv_bias
        layer = {
            "ln1": norm_p(),
            "ln2": norm_p(),
            "attn": {
                "q": lin(lk[0], d, d, dtype, bias=qb),
                "k": lin(lk[1], d, kv_dim, dtype, bias=qb),
                "v": lin(lk[2], d, kv_dim, dtype, bias=qb),
                "o": lin(lk[3], d, d, dtype, bias=use_bias),
            },
        }
        if cfg.activation == "silu_glu":
            layer["mlp"] = {
                "gate": lin(lk[4], d, cfg.d_ff, dtype, bias=False),
                "up": lin(lk[5], d, cfg.d_ff, dtype, bias=False),
                "down": lin(lk[6], cfg.d_ff, d, dtype, bias=False),
            }
        else:
            layer["mlp"] = {
                "fc1": lin(lk[4], d, cfg.d_ff, dtype, bias=use_bias),
                "fc2": lin(lk[5], cfg.d_ff, d, dtype, bias=use_bias),
            }
        layers.append(layer)
    params["layers"] = layers
    if cfg.final_ln:
        params["final_ln"] = norm_p()
    if not cfg.tie_embeddings:
        params["lm_head"] = _init_linear(keys[-1], ed, cfg.vocab_size, dtype,
                                         bias=False)
    return params


# ---- primitive ops ------------------------------------------------------


def apply_linear(p, x: jnp.ndarray, stats: Optional[LayerStats] = None):
    """Linear layer dispatch: dense dict, or PackedLinear (quantized).

    When ``stats`` is given, folds the (flattened) input into the running
    Hessian statistics and returns (y, new_stats) - the on-device
    equivalent of the reference's forward hooks (ref statistics.py:76-87).
    """
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    if stats is not None:
        stats = update_stats(stats, x2)
    if isinstance(p, PackedLinear):
        y2 = quantized_matmul(x2, p)
    else:
        y2 = jnp.dot(x2, p["kernel"], preferred_element_type=jnp.float32)
        y2 = y2.astype(x.dtype)
        if "bias" in p:
            y2 = y2 + p["bias"]
    y = y2.reshape(*shape[:-1], y2.shape[-1])
    if stats is not None:
        return y, stats
    return y


def apply_norm(cfg: TransformerConfig, p, x: jnp.ndarray) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    if cfg.norm == "rmsnorm":
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + cfg.norm_eps)
        return (y * p["scale"]).astype(x.dtype)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + cfg.norm_eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _activation(cfg: TransformerConfig, x):
    if cfg.activation == "relu":
        return jax.nn.relu(x)
    if cfg.activation == "gelu":
        return jax.nn.gelu(x)
    raise ValueError(cfg.activation)


# Serving-path decode-glue fusion (ops/dequant_matmul._pair_kernel): fold
# the pre-norm / pre-activation / residual-add around each packed
# projection into the kernel itself - at decode shapes those XLA
# elementwise fusions are pure launch overhead (BENCH_NOTES.md round 2).
# Toggle for full-bench A/B (BENCH_GLUE=0).
GLUE_FUSE = True


def _fused_proj(cfg, p, x, ln=None, act: Optional[str] = None,
                residual=None):
    """One-launch packed projection ``[residual +] proj(pre(x))``.

    ``ln``: norm param dict applied as cfg.norm before the matmul;
    ``act``: 'relu'/'gelu' applied before the matmul. Falls back to the
    composed apply_norm/_activation/apply_linear path off the serving
    configuration (dense params, CPU backend, prefill-size batches)."""
    from sleekit_tpu.ops.dequant_matmul import (can_fuse_glue,
                                                fused_quantized_matmul)

    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    if (GLUE_FUSE and isinstance(p, PackedLinear) and x2.shape[0] <= 1024
            and can_fuse_glue(x2, p)
            and jax.default_backend() not in ("cpu",)):
        r2 = (residual.reshape(-1, residual.shape[-1])
              if residual is not None else None)
        y2 = fused_quantized_matmul(
            x2, p, pre=(cfg.norm if ln is not None else act),
            ln_scale=None if ln is None else ln["scale"],
            ln_bias=None if ln is None else ln.get("bias"),
            eps=cfg.norm_eps, residual=r2)
        return y2.reshape(*shape[:-1], y2.shape[-1])
    if ln is not None:
        x = apply_norm(cfg, ln, x)
    if act == "silu_glu":
        dff = x.shape[-1] // 2
        x = jax.nn.silu(x[..., :dff]) * x[..., dff:]
    elif act is not None:
        x = _activation(cfg, x)
    y = apply_linear(p, x)
    if residual is not None:
        y = y + residual
    return y


def alibi_slopes(n_heads: int) -> np.ndarray:
    """BLOOM ALiBi head slopes (public formula from the ALiBi paper)."""
    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(n_heads).is_integer():
        return np.asarray(pow2_slopes(n_heads), np.float32)
    closest = 2 ** math.floor(math.log2(n_heads))
    slopes = pow2_slopes(closest)
    extra = pow2_slopes(2 * closest)[0::2][: n_heads - closest]
    return np.asarray(slopes + extra, np.float32)


def rope_freqs(cfg: TransformerConfig, positions: jnp.ndarray):
    """Rotary embedding cos/sin tables for the given positions (B?, T)."""
    hd = cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # (..., hd/2)
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (B, T, H, hd); cos/sin: (T, hd/2) or (B, T, hd/2). Rotates in
    f32, returns x.dtype (a silent f32 promotion here flips the decode
    scan carry dtype on rope models)."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    if cos.ndim == 2:
        cos = cos[None, :, None, :]
        sin = sin[None, :, None, :]
    else:
        cos = cos[:, :, None, :]
        sin = sin[:, :, None, :]
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos],
                          axis=-1)
    return out.astype(x.dtype)


# ---- attention ----------------------------------------------------------


def _attention(cfg: TransformerConfig, q, k, v, bias):
    """q: (B, T, H, hd); k, v: (B, KV, S, hd); bias: (1|B, H, T, S).

    Used on the compute-bound full-sequence / prefill paths (the
    bandwidth-bound single-token decode path uses the fused Pallas kernel
    in ops/attention.py instead). The QK^T and PV contractions run at the
    input dtype (bf16 on the serving path - 4x MXU rate vs f32) with f32
    accumulation; mask-add and softmax always run in f32.
    """
    kv = cfg.kv_heads
    groups = cfg.n_heads // kv
    if groups > 1:
        k = jnp.repeat(k, groups, axis=1)
        v = jnp.repeat(v, groups, axis=1)
    scale = 1.0 / math.sqrt(cfg.head_dim)
    logits = jnp.einsum("bthd,bhsd->bhts", q, k.astype(q.dtype),
                        preferred_element_type=jnp.float32) * scale
    logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhts,bhsd->bthd", probs.astype(q.dtype),
                     v.astype(q.dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


# Prefill attention route on TPU: 'ours' = the in-repo GQA-native +
# ALiBi-capable flash kernel (ops/attention.flash_prefill_pallas);
# 'stock' = the stock Pallas kernel (non-ALiBi only, KV repeated for
# GQA); 'xla' = materialized-logits masked softmax. A/B via
# BENCH_PREFILL in experiments/prefill_bench.py.
PREFILL_MODE = "ours"


def _causal_attention(cfg: TransformerConfig, q, kT, vT, positions):
    """Causal self-attention for prefill / full-sequence forward:
    q (B, T, H, hd); kT, vT (B, KV, T, hd); positions strictly
    increasing per row (so the position mask IS the causal mask).

    On TPU (128-aligned T >= 256) this routes to the in-repo flash
    prefill kernel - GQA-native (no jnp.repeat KV copy) and ALiBi-
    capable, so BLOOM prefill no longer materializes (B, H, T, T) f32
    logits (round-4 VERDICT missing-item 4). The XLA path remains the
    fallback for ragged/short shapes and CPU."""
    T = q.shape[1]
    on_tpu = jax.default_backend() == "tpu"
    if (PREFILL_MODE == "ours" and on_tpu
            and T >= 256 and T % 128 == 0 and T == kT.shape[2]):
        from sleekit_tpu.ops.attention import flash_prefill_pallas

        slopes = (jnp.asarray(alibi_slopes(cfg.n_heads))
                  if cfg.positional == "alibi" else None)
        return flash_prefill_pallas(
            q, kT, vT, 1.0 / math.sqrt(cfg.head_dim),
            alibi_slopes=slopes)
    if (PREFILL_MODE == "stock" and on_tpu and cfg.positional != "alibi"
            and T >= 256 and T % 128 == 0 and T == kT.shape[2]):
        try:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention)

            kv = cfg.kv_heads
            groups = cfg.n_heads // kv
            k, v = kT, vT
            if groups > 1:
                k = jnp.repeat(k, groups, axis=1)
                v = jnp.repeat(v, groups, axis=1)
            qh = q.transpose(0, 2, 1, 3).astype(jnp.bfloat16)
            out = flash_attention(
                qh, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                causal=True, sm_scale=1.0 / math.sqrt(cfg.head_dim))
            return out.transpose(0, 2, 1, 3).astype(q.dtype)
        except Exception:  # noqa: BLE001 - geometry the stock kernel rejects
            pass
    bias = _causal_bias(cfg, positions, positions)
    return _attention(cfg, q, kT, vT, bias)


def _causal_bias(cfg: TransformerConfig, q_pos: jnp.ndarray, k_pos: jnp.ndarray):
    """(1|B, H, T, S) additive bias: causal mask (+ ALiBi if configured)."""
    mask = q_pos[..., :, None] >= k_pos[..., None, :]   # (..., T, S)
    neg = jnp.float32(-1e9)
    bias = jnp.where(mask, 0.0, neg)
    if bias.ndim == 2:
        bias = bias[None, None]
    else:
        bias = bias[:, None]
    if cfg.positional == "alibi":
        slopes = jnp.asarray(alibi_slopes(cfg.n_heads))  # (H,)
        dist = (k_pos[..., None, :] - q_pos[..., :, None]).astype(jnp.float32)
        if dist.ndim == 2:
            dist = dist[None, None]
        else:
            dist = dist[:, None]
        # ALiBi adds slope * key_position-style linear bias on allowed keys
        bias = bias + slopes[None, :, None, None] * dist
    return bias


# ---- block + model forward ----------------------------------------------

# Linear-layer names inside one block, in calibration order.
def block_linear_names(cfg: TransformerConfig) -> List[str]:
    if cfg.activation == "silu_glu":
        return ["q", "k", "v", "o", "gate", "up", "down"]
    return ["q", "k", "v", "o", "fc1", "fc2"]


def layer_names(cfg: TransformerConfig) -> List[str]:
    """Flat dotted names of every quantizable linear in the model."""
    names = []
    for i in range(cfg.n_layers):
        for ln in block_linear_names(cfg):
            names.append(f"layers.{i}.{ln}")
    return names


def _linear_param(params, name: str):
    i, ln = name.split(".")[1:]
    layer = params["layers"][int(i)]
    return layer["attn"][ln] if ln in ("q", "k", "v", "o") else layer["mlp"][ln]


def set_linear_param(params, name: str, value) -> None:
    """In-place update of one linear's params (params is a plain dict)."""
    i, ln = name.split(".")[1:]
    layer = params["layers"][int(i)]
    if ln in ("q", "k", "v", "o"):
        layer["attn"][ln] = value
    else:
        layer["mlp"][ln] = value


def get_linear_param(params, name: str):
    return _linear_param(params, name)


def _block(cfg, layer, x, positions, kv_write, stats, layer_idx):
    """One transformer block.

    ``kv_write`` selects the attention path:
      * None - full-sequence forward (no cache);
      * (cache_k, cache_v, write_pos) with per-layer (B, KV, S, D) caches
        and a scalar start position - prefill (contiguous DUS write);
      * (cache_k, cache_v, pos, lidx) with FULL (L, B, KV, S, D) caches,
        per-row positions (B,) and a layer index - single-token decode via
        the fused in-place Pallas kernels (ops/attention.py).
    Returns (x, new kv pair or None, stats)."""

    def lin(name, p, h):
        nonlocal stats
        key = f"layers.{layer_idx}.{name}"
        if stats is not None and key in stats:
            y, new = apply_linear(p, h, stats[key])
            stats = dict(stats)
            stats[key] = new
            return y
        return apply_linear(p, h)

    b, t, d = x.shape
    kv_dim = cfg.kv_heads * cfg.head_dim
    if "qkv" in layer["attn"]:
        # Serving-time fused projection (fuse_qkv_params): one matmul,
        # one HBM weight stream instead of three - with the pre-norm
        # folded into the kernel (decode-glue fusion).
        qkv = _fused_proj(cfg, layer["attn"]["qkv"], x,
                          ln=layer["ln1"] if cfg.pre_norm else None)
        q = qkv[..., :d]
        k = qkv[..., d:d + kv_dim]
        v = qkv[..., d + kv_dim:]
    else:
        h_attn_in = apply_norm(cfg, layer["ln1"], x) if cfg.pre_norm else x
        q = lin("q", layer["attn"]["q"], h_attn_in)
        k = lin("k", layer["attn"]["k"], h_attn_in)
        v = lin("v", layer["attn"]["v"], h_attn_in)
    q = q.reshape(b, t, cfg.n_heads, cfg.head_dim)
    k = k.reshape(b, t, cfg.kv_heads, cfg.head_dim)
    v = v.reshape(b, t, cfg.kv_heads, cfg.head_dim)

    if cfg.positional == "rope":
        cos, sin = rope_freqs(cfg, positions)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

    if kv_write is None:
        attn = _causal_attention(cfg, q, k.transpose(0, 2, 1, 3),
                                 v.transpose(0, 2, 1, 3), positions)
    elif len(kv_write) == 4:
        # Single-token decode against the FULL cache: in-place KV append +
        # flash attention, zero cache copies (ops/attention.py). With a
        # "page_table" in the entry the cache is a shared page pool
        # (ops/paged_attention.py).
        entry, pos_vec, lidx = kv_write[1], kv_write[2], kv_write[3]
        slopes = (jnp.asarray(alibi_slopes(cfg.n_heads))
                  if cfg.positional == "alibi" else None)
        paged = "page_table" in entry
        common = dict(scale=1.0 / math.sqrt(cfg.head_dim),
                      alibi_slopes=slopes,
                      k_scale=entry.get("k_scale"),
                      v_scale=entry.get("v_scale"))
        if paged:
            from sleekit_tpu.ops.paged_attention import paged_decode_attention
            res = paged_decode_attention(
                q[:, 0], k[:, 0], v[:, 0], entry["k"], entry["v"],
                entry["page_table"], pos_vec, lidx, **common)
        else:
            from sleekit_tpu.ops.attention import decode_attention
            res = decode_attention(
                q[:, 0], k[:, 0], v[:, 0], entry["k"], entry["v"],
                pos_vec, lidx, **common)
        attn = res[0][:, None]
        new_entry = {"k": res[1], "v": res[2]}
        if len(res) == 5:
            new_entry["k_scale"], new_entry["v_scale"] = res[3], res[4]
        if paged:
            new_entry["page_table"] = entry["page_table"]
        kv_write = new_entry
    else:
        # Prefill: contiguous slice write from a uniform start position.
        from sleekit_tpu.ops.attention import _quant_rows

        entry, write_pos = kv_write[1], kv_write[2]
        cache_k, cache_v = entry["k"], entry["v"]
        kt = k.transpose(0, 2, 1, 3)                       # (B, KV, T, D)
        vt = v.transpose(0, 2, 1, 3)
        new_entry = {}
        if "k_scale" in entry:
            kq, ks = _quant_rows(kt.astype(jnp.float32))
            vq, vs = _quant_rows(vt.astype(jnp.float32))
            cache_k = jax.lax.dynamic_update_slice(
                cache_k, kq.astype(cache_k.dtype), (0, 0, write_pos, 0))
            cache_v = jax.lax.dynamic_update_slice(
                cache_v, vq.astype(cache_v.dtype), (0, 0, write_pos, 0))
            new_entry["k_scale"] = jax.lax.dynamic_update_slice(
                entry["k_scale"], ks[..., 0].astype(entry["k_scale"].dtype),
                (0, 0, write_pos))
            new_entry["v_scale"] = jax.lax.dynamic_update_slice(
                entry["v_scale"], vs[..., 0].astype(entry["v_scale"].dtype),
                (0, 0, write_pos))
            attn_k = (cache_k.astype(jnp.float32)
                      * new_entry["k_scale"][..., None]).astype(x.dtype)
            attn_v = (cache_v.astype(jnp.float32)
                      * new_entry["v_scale"][..., None]).astype(x.dtype)
        else:
            cache_k = jax.lax.dynamic_update_slice(
                cache_k, kt.astype(cache_k.dtype), (0, 0, write_pos, 0))
            cache_v = jax.lax.dynamic_update_slice(
                cache_v, vt.astype(cache_v.dtype), (0, 0, write_pos, 0))
            attn_k, attn_v = cache_k, cache_v
        new_entry["k"], new_entry["v"] = cache_k, cache_v
        if isinstance(write_pos, int) and write_pos == 0:
            # From position 0 the valid cache columns are exactly the
            # just-written [0, t) rows: pure causal attention, which
            # takes the flash fast path on TPU (quadratic XLA logits
            # otherwise; attends the CACHE values so int8 round-trip
            # numerics match the masked path).
            attn = _causal_attention(cfg, q, attn_k[:, :, :t],
                                     attn_v[:, :, :t], positions)
        else:
            s = cache_k.shape[2]
            k_pos = jnp.arange(s)
            valid = k_pos[None, :] <= positions[:, -1:]  # (B, S)
            bias = _causal_bias(cfg, positions,
                                jnp.broadcast_to(k_pos, (b, s)))
            bias = jnp.where(valid[:, None, None, :], bias, -1e9)
            attn = _attention(cfg, q, attn_k, attn_v, bias)
        kv_write = new_entry

    attn = attn.reshape(b, t, d)
    if stats is None:
        x = _fused_proj(cfg, layer["attn"]["o"], attn, residual=x)
    else:
        x = x + lin("o", layer["attn"]["o"], attn)
    if not cfg.pre_norm:
        x = apply_norm(cfg, layer["ln1"], x)

    ln2 = layer["ln2"] if cfg.pre_norm else None
    if cfg.activation == "silu_glu":
        if "gate_up" in layer["mlp"]:
            gu = _fused_proj(cfg, layer["mlp"]["gate_up"], x, ln=ln2)
            x = _fused_proj(cfg, layer["mlp"]["down"], gu,
                            act="silu_glu", residual=x)
        else:
            h = apply_norm(cfg, layer["ln2"], x) if cfg.pre_norm else x
            gate = lin("gate", layer["mlp"]["gate"], h)
            up = lin("up", layer["mlp"]["up"], h)
            h = jax.nn.silu(gate) * up
            x = x + lin("down", layer["mlp"]["down"], h)
    elif stats is None:
        h = _fused_proj(cfg, layer["mlp"]["fc1"], x, ln=ln2)
        x = _fused_proj(cfg, layer["mlp"]["fc2"], h, act=cfg.activation,
                        residual=x)
    else:
        h = apply_norm(cfg, layer["ln2"], x) if cfg.pre_norm else x
        h = lin("fc1", layer["mlp"]["fc1"], h)
        h = _activation(cfg, h)
        x = x + lin("fc2", layer["mlp"]["fc2"], h)
    if not cfg.pre_norm:
        x = apply_norm(cfg, layer["ln2"], x)
    return x, kv_write, stats


def _embed(cfg, params, tokens, positions):
    emb = params["embed"]
    x = jnp.take(emb["tokens"], tokens, axis=0)
    if "project_in" in emb:
        x = apply_linear(emb["project_in"], x)
    if cfg.positional == "learned":
        x = x + jnp.take(emb["pos"], positions + cfg.learned_pos_offset, axis=0)
    if cfg.embed_ln:
        x = apply_norm(cfg, emb["ln"], x)
    return x


def _unembed(cfg, params, x):
    if (cfg.final_ln and "lm_head" in params
            and "project_out" not in params["embed"]):
        # Packed serving head: the final norm rides the unembed kernel's
        # prologue (decode-glue fusion; composed fallback otherwise).
        return _fused_proj(cfg, params["lm_head"], x,
                           ln=params["final_ln"]).astype(jnp.float32)
    if cfg.final_ln:
        x = apply_norm(cfg, params["final_ln"], x)
    if "project_out" in params["embed"]:
        x = apply_linear(params["embed"]["project_out"], x)
    if "lm_head" in params:
        # Untied head - or a packed serving head injected by
        # pack_lm_head() over tied embeddings (halves/quarters the
        # unembed HBM stream, the embedding gather stays dense).
        logits = apply_linear(params["lm_head"], x).astype(jnp.float32)
    else:
        logits = jnp.dot(x, params["embed"]["tokens"].T,
                         preferred_element_type=jnp.float32)
    return logits


def finalize_logits(cfg, logits):
    """THE single owner of the padded-vocab contract: int8-layout packed
    heads pad N to the kernel block at PACK time (ops/pack.py pack_indices)
    so the hot path never pads at runtime; every consumer must slice raw
    unembed output back to the true vocabulary before softmax/sampling.
    Sharded callers slice AFTER their logits all-gather (the pad columns
    ride through the gather). Two past regressions (commits 093a721,
    e3eb05d) came from scattered slice sites - route all of them here.
    """
    return logits[..., :cfg.vocab_size]


def unembed_logits(cfg, params, x):
    """_unembed + the padded-vocab slice, for single-device callers whose
    logits are complete (not vocab-sharded) straight out of the kernel."""
    return finalize_logits(cfg, _unembed(cfg, params, x))


def fuse_qkv_params(cfg: TransformerConfig, params):
    """Serving-time projection fusion: q|k|v -> one 'qkv' linear (and
    gate|up -> 'gate_up' for SwiGLU models). Exact - per-output-channel
    scales concatenate - and transparent to quantization (fuse AFTER the
    per-linear GPTQ solve + packing). Apply before stack_layer_params.
    """
    from sleekit_tpu.ops.pack import concat_packed

    def fuse(parts):
        if isinstance(parts[0], PackedLinear):
            return concat_packed(parts)
        kernel = jnp.concatenate([p["kernel"] for p in parts], axis=1)
        out = {"kernel": kernel}
        if any("bias" in p for p in parts):
            out["bias"] = jnp.concatenate([
                p.get("bias", jnp.zeros((p["kernel"].shape[1],),
                                        kernel.dtype)) for p in parts])
        return out

    out = dict(params)
    layers = []
    for layer in params["layers"]:
        layer = {**layer, "attn": dict(layer["attn"]),
                 "mlp": dict(layer["mlp"])}
        a = layer["attn"]
        layer["attn"] = {"qkv": fuse([a["q"], a["k"], a["v"]]), "o": a["o"]}
        m = layer["mlp"]
        if "gate" in m:
            layer["mlp"] = {"gate_up": fuse([m["gate"], m["up"]]),
                            "down": m["down"]}
        layers.append(layer)
    out["layers"] = layers
    return out


def stack_layer_params(params):
    """Convert the per-layer param list into one stacked pytree (leading
    axis = layer) for ``scan_layers`` models. Static PackedLinear metadata
    is shared, so packed layers stack transparently."""
    layers = params["layers"]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    out = dict(params)
    out["layers"] = stacked
    return out


def unstack_layer_params(params, n_layers: int):
    """Inverse of :func:`stack_layer_params`."""
    stacked = params["layers"]
    layers = [jax.tree_util.tree_map(lambda x: x[i], stacked)
              for i in range(n_layers)]
    out = dict(params)
    out["layers"] = layers
    return out


def forward(cfg: TransformerConfig, params, tokens: jnp.ndarray,
            stats: Optional[Dict[str, LayerStats]] = None):
    """Full-sequence causal forward. tokens: (B, T) int32 -> logits
    (B, T, V). With ``stats``, also returns the updated stats pytree."""
    b, t = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(t), (b, t))
    x = _embed(cfg, params, tokens, positions)
    if cfg.scan_layers:
        assert stats is None, "calibration capture requires scan_layers=False"

        def body(x, layer):
            x, _, _ = _block(cfg, layer, x, positions, None, None, 0)
            return x, None

        x, _ = jax.lax.scan(body, x, params["layers"])
    else:
        for i, layer in enumerate(params["layers"]):
            x, _, stats = _block(cfg, layer, x, positions, None, stats, i)
    logits = unembed_logits(cfg, params, x)
    if stats is not None:
        return logits, stats
    return logits


def init_calibration_stats(cfg: TransformerConfig) -> Dict[str, LayerStats]:
    """Fresh LayerStats for every quantizable linear."""
    kv_dim = cfg.kv_heads * cfg.head_dim
    dims = {"q": cfg.d_model, "k": cfg.d_model, "v": cfg.d_model,
            "o": cfg.d_model, "fc1": cfg.d_model, "fc2": cfg.d_ff,
            "gate": cfg.d_model, "up": cfg.d_model, "down": cfg.d_ff}
    out = {}
    for name in layer_names(cfg):
        short = name.split(".")[-1]
        out[name] = init_stats(dims[short])
    return out


@partial(jax.jit, static_argnames=("cfg",))
def calibrate_step(cfg: TransformerConfig, params, tokens,
                   stats: Dict[str, LayerStats]):
    """One fused on-device calibration step: forward + all Hessian updates."""
    _, stats = forward(cfg, params, tokens, stats)
    return stats


# ---- KV-cache decode ----------------------------------------------------


def init_kv_cache(cfg: TransformerConfig, batch: int, max_len: int,
                  dtype=jnp.float32, scale_dtype=None):
    """KV cache in (batch, kv_heads, seq, head_dim) layout (the decode
    kernels' layout, ops/attention.py); scan_layers stacks a leading
    layer axis so the decode scan carries ONE buffer per k/v.

    ``dtype=jnp.int8`` selects the quantized cache: int8 values plus
    per-(token, head) scales (halved HBM traffic and 2x context
    capacity; quantization happens inside the append kernels).
    ``scale_dtype`` defaults to BF16 for the int8 cache (the SERVING
    default since round 5): the scale planes are 1/3 of the int8 KV
    stream (round-3 journal; +2.5% tokens/s at ctx 1024) and scales are
    computed in f32 and rounded on store, adding <=2^-9 relative error
    on top of int8's 2^-8. Pass ``jnp.float32`` explicitly for exact
    f32 planes (A/B, parity oracles)."""
    shape = (batch, cfg.kv_heads, max_len, cfg.head_dim)
    quant = dtype == jnp.int8
    if scale_dtype is None:
        scale_dtype = jnp.bfloat16 if quant else jnp.float32
    if cfg.scan_layers:
        out = {"k": jnp.zeros((cfg.n_layers, *shape), dtype),
               "v": jnp.zeros((cfg.n_layers, *shape), dtype)}
        if quant:
            sshape = (cfg.n_layers, batch, cfg.kv_heads, max_len)
            out["k_scale"] = jnp.zeros(sshape, scale_dtype)
            out["v_scale"] = jnp.zeros(sshape, scale_dtype)
        return out
    layers = []
    for _ in range(cfg.n_layers):
        entry = {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
        if quant:
            sshape = (batch, cfg.kv_heads, max_len)
            entry["k_scale"] = jnp.zeros(sshape, scale_dtype)
            entry["v_scale"] = jnp.zeros(sshape, scale_dtype)
        layers.append(entry)
    return layers


def _split_stacked_packed(layers_tree):
    """Pull the big (L, kw, N) packed-word tensors OUT of a stacked layer
    pytree so ``lax.scan`` never slices them: scanning them as xs copies
    the entire packed model HBM->HBM every decode step (measured 0.9
    ms/step on OPT-1.3B). The kernels instead address the layer block
    in place via ``PackedLinear.layer_sel`` (scalar prefetch), exactly
    like the (L, ...) KV cache. Returns (big tensors, scannable rest)."""
    bigs = []
    is_pl = lambda v: isinstance(v, PackedLinear)  # noqa: E731

    def strip(p):
        if is_pl(p) and p.packed.ndim == 3:
            bigs.append(p.packed)
            ph = jnp.zeros((p.packed.shape[0], 1, 1), p.packed.dtype)
            return dataclasses.replace(p, packed=ph)
        return p

    rest = jax.tree_util.tree_map(strip, layers_tree, is_leaf=is_pl)
    return bigs, rest


def _merge_stacked_packed(bigs, layer_rest, lidx):
    """Rebuild one scan iteration's layer params: re-attach each full
    stacked packed tensor with ``layer_sel=lidx`` (zero-copy kernel-side
    layer addressing)."""
    it = iter(bigs)
    is_pl = lambda v: isinstance(v, PackedLinear)  # noqa: E731

    def put(p):
        if is_pl(p) and p.packed.shape[-2:] == (1, 1):
            return dataclasses.replace(p, packed=next(it), layer_sel=lidx)
        return p

    return jax.tree_util.tree_map(put, layer_rest, is_leaf=is_pl)


def _run_layers_decode(cfg, params, x, positions, cache, pos):
    """Single-token decode through all blocks. The FULL stacked cache is
    the scan carry (updated in place by the Pallas append kernel); per-row
    positions handle ragged continuous batching."""
    # A scalar pos stays scalar: the KV-append kernel's uniform fast path
    # (one program for the whole batch) keys on it; every attention
    # consumer broadcasts internally when it needs (B,).
    pos_vec = jnp.asarray(pos)
    if cfg.scan_layers:
        bigs, rest = _split_stacked_packed(params["layers"])

        def body(carry, inp):
            x, entry = carry
            layer_rest, lidx = inp
            layer = _merge_stacked_packed(bigs, layer_rest, lidx)
            x, entry, _ = _block(cfg, layer, x, positions,
                                 ("decode", entry, pos_vec, lidx), None, 0)
            return (x, entry), None

        (x, entry), _ = jax.lax.scan(
            body, (x, dict(cache)),
            (rest, jnp.arange(cfg.n_layers)))
        return x, entry
    if isinstance(cache, dict):
        # Paged (or otherwise stacked) cache with an unrolled layer loop:
        # the pools hold all layers; pass the layer index through.
        entry = dict(cache)
        for i, layer in enumerate(params["layers"]):
            x, entry, _ = _block(cfg, layer, x, positions,
                                 ("decode", entry, pos_vec, jnp.int32(i)),
                                 None, i)
        return x, entry
    new_cache = []
    for i, layer in enumerate(params["layers"]):
        entry = {k: v[None] for k, v in cache[i].items()}
        x, entry, _ = _block(cfg, layer, x, positions,
                             ("decode", entry, pos_vec, jnp.int32(0)),
                             None, i)
        new_cache.append({k: v[0] for k, v in entry.items()})
    return x, new_cache


def init_paged_kv_cache(cfg: TransformerConfig, total_pages: int,
                        page_size: int, slots: int, max_pages_per_seq: int,
                        dtype=jnp.float32, scale_dtype=None):
    """Paged KV cache: a shared page pool (L, P, KV, PS, D) plus a page
    table (slots, max_pages_per_seq) int32 (ops/paged_attention.py).
    ``dtype=jnp.int8`` adds per-token scale planes (BF16 by default,
    like init_kv_cache). Unallocated table entries hold page 0 (a valid
    address; their columns are masked)."""
    if scale_dtype is None:
        scale_dtype = jnp.bfloat16 if dtype == jnp.int8 else jnp.float32
    pool = (cfg.n_layers, total_pages, cfg.kv_heads, page_size,
            cfg.head_dim)
    out = {"k": jnp.zeros(pool, dtype), "v": jnp.zeros(pool, dtype),
           "page_table": jnp.zeros((slots, max_pages_per_seq), jnp.int32)}
    if dtype == jnp.int8:
        sshape = pool[:-1]
        out["k_scale"] = jnp.zeros(sshape, scale_dtype)
        out["v_scale"] = jnp.zeros(sshape, scale_dtype)
    return out


def _run_layers_prefill(cfg, params, x, positions, cache, write_pos):
    """Run all blocks against the KV cache from a uniform start position;
    returns (x, new cache)."""
    if cfg.scan_layers:
        keys = sorted(cache.keys())
        bigs, rest = _split_stacked_packed(params["layers"])

        def body(x, inp):
            layer = _merge_stacked_packed(bigs, inp[0], inp[1])
            entry = dict(zip(keys, inp[2:]))
            x, entry, _ = _block(cfg, layer, x, positions,
                                 ("prefill", entry, write_pos), None, 0)
            return x, tuple(entry[k] for k in keys)

        x, outs = jax.lax.scan(
            body, x, (rest, jnp.arange(cfg.n_layers),
                      *[cache[k] for k in keys]))
        return x, dict(zip(keys, outs))
    new_cache = []
    for i, layer in enumerate(params["layers"]):
        x, entry, _ = _block(cfg, layer, x, positions,
                             ("prefill", cache[i], write_pos), None, i)
        new_cache.append(entry)
    return x, new_cache


def decode_step(cfg: TransformerConfig, params, tokens: jnp.ndarray,
                cache, pos: jnp.ndarray):
    """One token of cached decode.

    tokens: (B, 1) int32; pos: scalar int32 (uniform batch) or (B,) int32
    per-slot positions (ragged continuous batching). Returns
    (logits (B, V), new cache).
    """
    b = tokens.shape[0]
    pos = jnp.asarray(pos)
    if pos.ndim == 0:
        positions = jnp.broadcast_to(pos, (b, 1))
    else:
        positions = pos[:, None]
    x = _embed(cfg, params, tokens, positions)
    x, new_cache = _run_layers_decode(cfg, params, x, positions, cache, pos)
    logits = unembed_logits(cfg, params, x)
    return logits[:, 0, :], new_cache


def prefill(cfg: TransformerConfig, params, tokens: jnp.ndarray, cache):
    """Process a full prompt, filling the KV cache from position 0.
    Returns (logits (B, T, V), cache)."""
    b, t = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(t), (b, t))
    x = _embed(cfg, params, tokens, positions)
    x, new_cache = _run_layers_prefill(cfg, params, x, positions, cache, 0)
    return unembed_logits(cfg, params, x), new_cache
