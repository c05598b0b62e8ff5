"""Decode attention over the KV cache: Pallas flash kernels + XLA oracle.

The serving decode step is HBM-bandwidth-bound on the KV cache, and the
naive XLA formulation pays ~5x the bandwidth bound (measured in
experiments/profile_decode.py): materialized bias tensors, scatter cache
updates, and per-layer cache slicing inside ``lax.scan`` all move full
cache copies. These kernels restore the speed-of-light path:

  * :func:`kv_append_pallas` - writes the new token's K/V vectors in place
    into the FULL (L, B, KV, S, D) cache via ``input_output_aliases`` and
    scalar-prefetch index maps (layer index + per-slot positions picked at
    DMA-address time). Traffic: O(token bytes), not O(cache bytes).
  * :func:`flash_decode_pallas` - grid (B, KV-heads); each program streams
    one head's (S, D) K/V block, computes masked softmax(q k^T) v for the
    head's GQA group in one pass, never materializing (B, H, S) logits in
    HBM. Reads exactly the cache bytes. ALiBi bias is applied in-kernel.

The cache layout is (layers, batch, kv_heads, seq, head_dim) - the layer
axis lives in the array so a ``lax.scan`` over layers carries ONE buffer
and the kernels address layer blocks directly (zero-copy; no per-layer
dynamic-slice of the cache ever happens on the fast path).

No reference analogue exists (the reference never runs a model forward,
/root/reference README.md:183 outsources harnessing; SURVEY.md §5.7).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---- in-place KV append ---------------------------------------------------


# Sublane-aligned window written around the append position (Mosaic
# requires the second-minor block dim to be a multiple of 8).
_APPEND_WIN = 8


def _append_kernel(pos_ref, layer_ref, knew_ref, vnew_ref,
                   ck_in, cv_in, ck_out, cv_out):
    # The (1, 1, KV, WIN, D) cache block was addressed at the aligned
    # window containing pos; copy it through and overwrite row pos%WIN.
    del layer_ref
    b = pl.program_id(0)
    r = pos_ref[b] % _APPEND_WIN
    # Full-block masked blend: Mosaic supports neither cross-tile vector
    # reshapes nor dynamically-indexed row stores, but sublane broadcasts
    # and selects are native. knew/vnew arrive as (1, KV, 1, D) so the
    # broadcast to (1, 1, KV, WIN, D) only expands untiled/sublane dims.
    row = lax.broadcasted_iota(jnp.int32, (_APPEND_WIN, 1), 0)
    mask = (row == r)[None, None, None]                 # (1,1,1,WIN,1)
    newk = knew_ref[...][None].astype(ck_out.dtype)     # (1,1,KV,1,D)
    newv = vnew_ref[...][None].astype(cv_out.dtype)
    ck_out[...] = jnp.where(mask, newk, ck_in[...])
    cv_out[...] = jnp.where(mask, newv, cv_in[...])


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_append_pallas(k_new, v_new, cache_k, cache_v, pos, layer,
                     interpret: bool = False):
    """Write k_new/v_new (B, KV, D) into cache (L, B, KV, S, D) at
    per-row positions ``pos`` (B,) of layer ``layer``, in place."""
    L, B, KV, S, D = cache_k.shape
    assert S % _APPEND_WIN == 0
    pos = jnp.clip(jnp.broadcast_to(pos, (B,)).astype(jnp.int32), 0, S - 1)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    k_new = k_new.reshape(B, KV, 1, D)
    v_new = v_new.reshape(B, KV, 1, D)

    def cache_map(b, pos_ref, layer_ref):
        return (layer_ref[0], b, 0, pos_ref[b] // _APPEND_WIN, 0)

    cache_spec = pl.BlockSpec((1, 1, KV, _APPEND_WIN, D), cache_map,
                              memory_space=pltpu.VMEM)
    new_spec = pl.BlockSpec((1, KV, 1, D), lambda b, p, l: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[new_spec, new_spec, cache_spec, cache_spec],
        out_specs=[cache_spec, cache_spec],
    )
    return pl.pallas_call(
        _append_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
                   jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype)],
        # inputs: [pos, layer, k_new, v_new, cache_k, cache_v]
        input_output_aliases={4: 0, 5: 1},
        interpret=interpret,
    )(pos, layer, k_new, v_new, cache_k, cache_v)


# ---- flash decode attention ----------------------------------------------


def _decode_kernel(pos_ref, layer_ref, q_ref, k_ref, v_ref, slopes_ref,
                   o_ref, *, scale, s_valid):
    b = pl.program_id(0)
    del layer_ref
    q = q_ref[0, 0].astype(jnp.float32)                    # (G, D)
    k = k_ref[0, 0, 0].astype(jnp.float32)                 # (S, D)
    # NT-form contraction over D: (G, D) x (S, D) -> (G, S); no transpose
    # of the (S, D) cache block ever materializes in VMEM.
    logits = lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    S = logits.shape[-1]
    col = lax.broadcasted_iota(jnp.int32, (1, S), 1)
    p = pos_ref[b]
    mask = (col <= p) & (col < s_valid)
    if slopes_ref is not None:
        slope = slopes_ref[0, 0].astype(jnp.float32)       # (G,)
        dist = (col - p).astype(jnp.float32)               # (1, S)
        logits = logits + slope[:, None] * dist
    logits = jnp.where(mask, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p_exp = jnp.exp(logits - m)
    denom = jnp.sum(p_exp, axis=-1, keepdims=True)
    probs = (p_exp / denom).astype(v_ref.dtype)
    v = v_ref[0, 0, 0]                                     # (S, D)
    out = jnp.dot(probs, v.astype(probs.dtype),
                  preferred_element_type=jnp.float32)
    o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def flash_decode_pallas(q, cache_k, cache_v, pos, layer,
                        scale: float,
                        alibi_slopes: Optional[jnp.ndarray] = None,
                        interpret: bool = False):
    """Masked decode attention out = softmax(q K^T / sqrt(D)) V.

    q: (B, H, D); cache: (L, B, KV, S, D); pos: (B,) int32 - the highest
    attendable position per row (inclusive); layer: scalar int32.
    Returns (B, H, D) in q.dtype. GQA: H = KV * G; q head h attends kv
    head h // G. ALiBi slopes: (H,) f32 or None.
    """
    L, B, KV, S, D = cache_k.shape
    Bq, H, Dq = q.shape
    assert (Bq, Dq) == (B, D) and H % KV == 0
    G = H // KV
    q4 = q.reshape(B, KV, G, D)
    pos = jnp.clip(jnp.broadcast_to(pos, (B,)).astype(jnp.int32), 0, S - 1)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)

    def cache_map(b, h, p, l):
        return (l[0], b, h, 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, G, D), lambda b, h, p, l: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, S, D), cache_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, S, D), cache_map, memory_space=pltpu.VMEM),
    ]
    args = [pos, layer, q4, cache_k, cache_v]
    if alibi_slopes is not None:
        # (KV, 1, G): the (1, G) minor dims match the block exactly
        # (Mosaic block-shape rule), the KV axis is indexed per program.
        slopes3 = jnp.asarray(alibi_slopes, jnp.float32).reshape(KV, 1, G)
        in_specs.append(pl.BlockSpec((1, 1, G), lambda b, h, p, l: (h, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(slopes3)
        kernel = functools.partial(_decode_kernel, scale=scale, s_valid=S)
    else:
        kernel = functools.partial(
            lambda pr, lr, qr, kr, vr, orf, **kw: _decode_kernel(
                pr, lr, qr, kr, vr, None, orf, **kw),
            scale=scale, s_valid=S)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, KV),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, G, D), lambda b, h, p, l: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KV, G, D), q.dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(B, H, D)


# ---- XLA oracle / portable fallback ---------------------------------------


def kv_append_xla(k_new, v_new, cache_k, cache_v, pos, layer):
    """Same semantics as :func:`kv_append_pallas` on plain XLA ops."""
    L, B, KV, S, D = cache_k.shape
    pos = jnp.clip(jnp.broadcast_to(pos, (B,)).astype(jnp.int32), 0, S - 1)
    rows = jnp.arange(B)
    lrow = jnp.broadcast_to(jnp.asarray(layer, jnp.int32), (B,))
    cache_k = cache_k.at[lrow, rows, :, pos].set(k_new.astype(cache_k.dtype))
    cache_v = cache_v.at[lrow, rows, :, pos].set(v_new.astype(cache_v.dtype))
    return cache_k, cache_v


def flash_decode_xla(q, cache_k, cache_v, pos, layer, scale,
                     alibi_slopes=None):
    """Same semantics as :func:`flash_decode_pallas` on plain XLA ops."""
    L, B, KV, S, D = cache_k.shape
    H = q.shape[1]
    G = H // KV
    pos = jnp.clip(jnp.broadcast_to(pos, (B,)).astype(jnp.int32), 0, S - 1)
    k = lax.dynamic_index_in_dim(cache_k, jnp.asarray(layer, jnp.int32),
                                 axis=0, keepdims=False)  # (B, KV, S, D)
    v = lax.dynamic_index_in_dim(cache_v, jnp.asarray(layer, jnp.int32),
                                 axis=0, keepdims=False)
    q4 = q.reshape(B, KV, G, D)
    logits = jnp.einsum("bkgd,bksd->bkgs", q4.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    col = jnp.arange(S)
    mask = col[None, :] <= pos[:, None]                     # (B, S)
    if alibi_slopes is not None:
        slopes = jnp.asarray(alibi_slopes, jnp.float32).reshape(KV, G)
        dist = (col[None, :] - pos[:, None]).astype(jnp.float32)
        logits = logits + slopes[None, :, :, None] * dist[:, None, None, :]
    logits = jnp.where(mask[:, None, None, :], logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bkgs,bksd->bkgd", probs, v.astype(q.dtype))
    return out.reshape(B, H, D).astype(q.dtype)


def use_pallas_default() -> bool:
    return jax.default_backend() == "tpu"


def decode_attention(q, k_new, v_new, cache_k, cache_v, pos, layer,
                     scale: Optional[float] = None,
                     alibi_slopes=None,
                     use_pallas: Optional[bool] = None,
                     interpret: bool = False):
    """Append the new token's K/V and attend over the cache (one decode
    step of one layer). Returns (out (B, H, D), cache_k, cache_v)."""
    if scale is None:
        scale = 1.0 / math.sqrt(cache_k.shape[-1])
    if use_pallas is None:
        use_pallas = use_pallas_default()
    if use_pallas or interpret:
        cache_k, cache_v = kv_append_pallas(
            k_new, v_new, cache_k, cache_v, pos, layer, interpret=interpret)
        out = flash_decode_pallas(q, cache_k, cache_v, pos, layer, scale,
                                  alibi_slopes, interpret=interpret)
    else:
        cache_k, cache_v = kv_append_xla(k_new, v_new, cache_k, cache_v,
                                         pos, layer)
        out = flash_decode_xla(q, cache_k, cache_v, pos, layer, scale,
                               alibi_slopes)
    return out, cache_k, cache_v
