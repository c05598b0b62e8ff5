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

# int8 KV quantization: symmetric per-(token, head) scale over head_dim.
_INT8_MAX = 127.0
_SCALE_FLOOR = 1e-8


def _quant_rows(x):
    """x (..., D) f32 -> (int8 values, f32 scale (..., 1))."""
    scale = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True)
                        / _INT8_MAX, _SCALE_FLOOR)
    q = jnp.clip(jnp.round(x / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


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


def _append_q_kernel(pos_ref, layer_ref, knew_ref, vnew_ref,
                     ck_in, cv_in, ks_in, vs_in,
                     ck_out, cv_out, ks_out, vs_out):
    """int8-cache append: quantize the new vectors in-kernel and blend
    values + per-token scales in place."""
    del layer_ref
    b = pl.program_id(0)
    r = pos_ref[b] % _APPEND_WIN
    row = lax.broadcasted_iota(jnp.int32, (_APPEND_WIN, 1), 0)
    mask = (row == r)[None, None, None]                 # (1,1,1,WIN,1)
    kq, ks = _quant_rows(knew_ref[...].astype(jnp.float32))  # (1,KV,1,D)
    vq, vs = _quant_rows(vnew_ref[...].astype(jnp.float32))
    ck_out[...] = jnp.where(mask, kq[None].astype(ck_out.dtype), ck_in[...])
    cv_out[...] = jnp.where(mask, vq[None].astype(cv_out.dtype), cv_in[...])
    # Scale planes are (1, 1, KV, S): blend column pos (lane mask).
    S = ks_in.shape[-1]
    col = lax.broadcasted_iota(jnp.int32, (1, S), 1)[None, None]
    smask = col == pos_ref[b]                           # (1,1,1,S)
    ks_out[...] = jnp.where(smask, ks[..., 0][None],
                            ks_in[...]).astype(ks_out.dtype)
    vs_out[...] = jnp.where(smask, vs[..., 0][None],
                            vs_in[...]).astype(vs_out.dtype)


def _append_kernel_u(pos_ref, layer_ref, knew_ref, vnew_ref,
                     ck_in, cv_in, ck_out, cv_out):
    """Uniform-position append: ONE program blends all batch rows (the
    common decode-synchronized case; a (B,) grid costs ~5x more in
    per-program overhead than it moves in bytes)."""
    del layer_ref
    r = pos_ref[0] % _APPEND_WIN
    row = lax.broadcasted_iota(jnp.int32, (_APPEND_WIN, 1), 0)
    mask = (row == r)[None, None, None]                 # (1,1,1,WIN,1)
    ck_out[...] = jnp.where(mask, knew_ref[...][None].astype(ck_out.dtype),
                            ck_in[...])
    cv_out[...] = jnp.where(mask, vnew_ref[...][None].astype(cv_out.dtype),
                            cv_in[...])


def _append_q_kernel_u(pos_ref, layer_ref, knew_ref, vnew_ref,
                       ck_in, cv_in, ks_in, vs_in,
                       ck_out, cv_out, ks_out, vs_out):
    """Uniform-position int8 append (see _append_kernel_u)."""
    del layer_ref
    r = pos_ref[0] % _APPEND_WIN
    row = lax.broadcasted_iota(jnp.int32, (_APPEND_WIN, 1), 0)
    mask = (row == r)[None, None, None]                 # (1,1,1,WIN,1)
    kq, ks = _quant_rows(knew_ref[...].astype(jnp.float32))  # (B,KV,1,D)
    vq, vs = _quant_rows(vnew_ref[...].astype(jnp.float32))
    ck_out[...] = jnp.where(mask, kq[None].astype(ck_out.dtype), ck_in[...])
    cv_out[...] = jnp.where(mask, vq[None].astype(cv_out.dtype), cv_in[...])
    S = ks_in.shape[-1]
    col = lax.broadcasted_iota(jnp.int32, (1, S), 1)[None, None]
    smask = col == pos_ref[0]                           # (1,1,1,S)
    ks_out[...] = jnp.where(smask, ks[..., 0][None],
                            ks_in[...]).astype(ks_out.dtype)
    vs_out[...] = jnp.where(smask, vs[..., 0][None],
                            vs_in[...]).astype(vs_out.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _kv_append_uniform(k_new, v_new, cache_k, cache_v, pos, layer,
                       k_scale=None, v_scale=None,
                       interpret: bool = False):
    """Uniform-position append: one program, full-batch window blend."""
    L, B, KV, S, D = cache_k.shape
    pos = jnp.clip(pos.astype(jnp.int32), 0, S - 1).reshape(1)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    k_new = k_new.reshape(B, KV, 1, D)
    v_new = v_new.reshape(B, KV, 1, D)

    cache_spec = pl.BlockSpec(
        (1, B, KV, _APPEND_WIN, D),
        lambda g, p, l: (l[0], 0, 0, p[0] // _APPEND_WIN, 0),
        memory_space=pltpu.VMEM)
    new_spec = pl.BlockSpec((B, KV, 1, D), lambda g, p, l: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    if k_scale is None:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(1,),
            in_specs=[new_spec, new_spec, cache_spec, cache_spec],
            out_specs=[cache_spec, cache_spec])
        return pl.pallas_call(
            _append_kernel_u, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
                       jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype)],
            input_output_aliases={4: 0, 5: 1},
            interpret=interpret,
        )(pos, layer, k_new, v_new, cache_k, cache_v)
    scale_spec = pl.BlockSpec((1, B, KV, S),
                              lambda g, p, l: (l[0], 0, 0, 0),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(1,),
        in_specs=[new_spec, new_spec, cache_spec, cache_spec,
                  scale_spec, scale_spec],
        out_specs=[cache_spec, cache_spec, scale_spec, scale_spec])
    return pl.pallas_call(
        _append_q_kernel_u, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
                   jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
                   jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
                   jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype)],
        input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3},
        interpret=interpret,
    )(pos, layer, k_new, v_new, cache_k, cache_v, k_scale, v_scale)


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_append_pallas(k_new, v_new, cache_k, cache_v, pos, layer,
                     k_scale=None, v_scale=None,
                     interpret: bool = False):
    """Write k_new/v_new (B, KV, D) into cache (L, B, KV, S, D) at
    per-row positions ``pos`` (B,) of layer ``layer``, in place.

    A SCALAR ``pos`` takes the uniform fast path (one program blends the
    whole batch); a (B,) vector handles ragged continuous batching with
    one program per row. With ``k_scale``/``v_scale`` (L, B, KV, S) the
    cache is int8 and the new vectors are quantized in-kernel
    (per-token symmetric scales).
    """
    L, B, KV, S, D = cache_k.shape
    assert S % _APPEND_WIN == 0
    if jnp.ndim(pos) == 0:
        return _kv_append_uniform(k_new, v_new, cache_k, cache_v, pos,
                                  layer, k_scale=k_scale, v_scale=v_scale,
                                  interpret=interpret)
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

    if k_scale is None:
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

    scale_spec = pl.BlockSpec(
        (1, 1, KV, S), lambda b, p, l: (l[0], b, 0, 0),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[new_spec, new_spec, cache_spec, cache_spec,
                  scale_spec, scale_spec],
        out_specs=[cache_spec, cache_spec, scale_spec, scale_spec],
    )
    return pl.pallas_call(
        _append_q_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
                   jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
                   jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
                   jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype)],
        # inputs: [pos, layer, k_new, v_new, ck, cv, ks, vs]
        input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3},
        interpret=interpret,
    )(pos, layer, k_new, v_new, cache_k, cache_v, k_scale, v_scale)


# ---- flash decode attention ----------------------------------------------


def _decode_kernel(pos_ref, layer_ref, q_ref, k_ref, v_ref, slopes_ref,
                   ks_ref, vs_ref, o_ref, acc_ref, m_ref, l_ref, *,
                   scale, kv, groups, s_blk):
    """One (batch-row, S-block) step of the one-big-dot flash decode.

    All KV heads are folded into a single MXU contraction: the (KV, SB, D)
    cache block collapses to (KV*SB, D) and logits (KV*G, KV*SB) are
    computed in one dot - cross-head products are killed by the
    block-diagonal mask. The wasted MXU flops are negligible (the kernel
    is HBM-bandwidth-bound); what matters is that per grid step there is
    ONE dot + ONE masked softmax + ONE dot instead of KV tiny ones.
    Online-softmax state (acc, m, l) carries across S blocks.
    """
    b = pl.program_id(0)
    ns = pl.program_id(2)
    n_s = pl.num_programs(2)
    del layer_ref
    rows, cols = kv * groups, kv * s_blk

    @pl.when(ns == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)

    D_ = q_ref.shape[-1]
    # bf16 operands take the fast MXU path on the serving dtype; f32
    # inputs keep full precision (parity with the XLA oracle).
    cdt = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    qf = q_ref[0].reshape(rows, D_)
    k = k_ref[0, 0].reshape(cols, D_)
    logits = lax.dot_general(qf.astype(cdt), k.astype(cdt),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    if ks_ref is not None:
        # int8 cache: per-token scales stored (KV, SB). A (1, cols) lane
        # vector would need a cross-tile relayout (unsupported); extract
        # each head's scale row with a one-hot sublane reduction and
        # concat the clean-layout (1, SB) vectors along lanes. (A flat
        # (1, KV*S) view of the scale plane passed from outside measures
        # FASTER in-kernel but forces a 6 MB relayout copy of the carried
        # cache scales per call - net 0.4 ms/step loss; round-2 journal.)
        kv_iota = lax.broadcasted_iota(jnp.int32, (kv, 1), 0)

        def lane_vec(ref):
            t = ref[0, 0]                                # (KV, SB)
            rows_ = [jnp.sum(jnp.where(kv_iota == i, t, 0.0), axis=0,
                             keepdims=True) for i in range(kv)]
            return jnp.concatenate(rows_, axis=1)        # (1, KV*SB)
        logits = logits * lane_vec(ks_ref)
    row_h = lax.broadcasted_iota(jnp.int32, (rows, cols), 0) // groups
    col_h = lax.broadcasted_iota(jnp.int32, (rows, cols), 1) // s_blk
    col_s = (lax.broadcasted_iota(jnp.int32, (rows, cols), 1) % s_blk
             + ns * s_blk)
    p = pos_ref[b]
    if slopes_ref is not None:
        slope = slopes_ref[...].astype(jnp.float32)          # (rows, 1)
        logits = logits + slope * (col_s - p).astype(jnp.float32)
    mask = (row_h == col_h) & (col_s <= p)
    logits = jnp.where(mask, logits, -jnp.inf)

    m_blk = jnp.max(logits, axis=-1, keepdims=True)          # (rows, 1)
    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, m_blk)
    alpha = jnp.exp(m_prev - m_new)                          # (rows, 1)
    p_exp = jnp.exp(logits - m_new)                          # (rows, cols)
    l_new = l_ref[:, :1] * alpha + jnp.sum(p_exp, axis=-1, keepdims=True)
    v = v_ref[0, 0].reshape(cols, D_)
    if vs_ref is not None:
        p_exp = p_exp * lane_vec(vs_ref)
    pv = jnp.dot(p_exp.astype(cdt), v.astype(cdt),
                 preferred_element_type=jnp.float32)         # (rows, D)
    acc_ref[...] = acc_ref[...] * alpha + pv
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ns == n_s - 1)
    def _():
        out = acc_ref[...] / l_ref[:, :1]
        o_ref[0] = out.reshape(kv, groups, D_).astype(o_ref.dtype)


def _decode_kernel_ew(pos_ref, layer_ref, q_ref, k_ref, v_ref, slopes_ref,
                      ks_ref, vs_ref, o_ref, acc_ref, m_ref, l_ref, *,
                      scale, kv, s_blk):
    """Elementwise (no-MXU) decode step for MHA (G == 1).

    The one-big-dot kernel (:func:`_decode_kernel`) folds all KV heads
    into one MXU contraction and pays VPU mask/softmax passes over a
    (KV, KV*SB) logits matrix that is KV-times larger than the useful
    block diagonal. With one query row per head the dot degenerates -
    logits[h, s] = sum_d q[h, d] * k[h, s, d] is a broadcast multiply +
    lane reduction over the (KV, SB, D) block, softmax runs on the tiny
    (KV, SB) matrix, and int8 scales broadcast directly (no one-hot
    sublane extraction). Online-softmax state carries across S blocks.
    """
    b = pl.program_id(0)
    ns = pl.program_id(2)
    n_s = pl.num_programs(2)
    del layer_ref

    @pl.when(ns == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)

    D_ = q_ref.shape[-1]
    qf = q_ref[0].reshape(kv, 1, D_).astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)                  # (KV, SB, D)
    if ks_ref is not None:
        k = k * ks_ref[0, 0][..., None]
    logits = jnp.sum(qf * k, axis=-1) * scale            # (KV, SB)
    p = pos_ref[b]
    col_s = (lax.broadcasted_iota(jnp.int32, logits.shape, 1)
             + ns * s_blk)
    if slopes_ref is not None:
        slope = slopes_ref[...].astype(jnp.float32)      # (KV, 1)
        logits = logits + slope * (col_s - p).astype(jnp.float32)
    logits = jnp.where(col_s <= p, logits, -jnp.inf)

    m_blk = jnp.max(logits, axis=-1, keepdims=True)      # (KV, 1)
    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, m_blk)
    alpha = jnp.exp(m_prev - m_new)
    p_exp = jnp.exp(logits - m_new)                      # (KV, SB)
    l_new = l_ref[:, :1] * alpha + jnp.sum(p_exp, axis=-1, keepdims=True)
    v = v_ref[0, 0].astype(jnp.float32)                  # (KV, SB, D)
    if vs_ref is not None:
        p_exp = p_exp * vs_ref[0, 0]
    pv = jnp.sum(p_exp[..., None] * v, axis=1)           # (KV, D)
    acc_ref[...] = acc_ref[...] * alpha + pv
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ns == n_s - 1)
    def _():
        out = acc_ref[...] / l_ref[:, :1]
        o_ref[0] = out.reshape(kv, 1, D_).astype(o_ref.dtype)


def _decode_kernel_bfold(pos_ref, layer_ref, q_ref, k_ref, v_ref,
                         slopes_ref, ks_ref, vs_ref, o_ref, acc_ref,
                         m_ref, l_ref, *, scale, kv, groups, s_blk, batch):
    """Batch-folded one-big-dot flash decode: ALL batch rows in one
    program per (kv-chunk, s-block) grid step, unrolled in-kernel.

    The (B, chunk, s-block) grid pays one program launch per batch row
    per layer (~384 launches/step on OPT-1.3B batch 8 - the round-3
    profile puts attention+append at 0.81 ms vs a 0.37 ms KV-stream
    bound, and launch overhead is the gap). Folding B into the block
    spec moves the whole layer's flash decode into ONE program per
    s-block; the per-row math is identical to :func:`_decode_kernel`
    and the VMEM block (B x kvc x s_blk x D int8 ~ 4 MB) double-buffers
    comfortably.
    """
    ns = pl.program_id(1)
    n_s = pl.num_programs(1)
    del layer_ref
    rows, cols = kv * groups, kv * s_blk

    @pl.when(ns == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)

    D_ = q_ref.shape[-1]
    cdt = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    row_h = lax.broadcasted_iota(jnp.int32, (rows, cols), 0) // groups
    col_h = lax.broadcasted_iota(jnp.int32, (rows, cols), 1) // s_blk
    col_s = (lax.broadcasted_iota(jnp.int32, (rows, cols), 1) % s_blk
             + ns * s_blk)
    kv_iota = lax.broadcasted_iota(jnp.int32, (kv, 1), 0)

    def lane_vec(t):
        rows_ = [jnp.sum(jnp.where(kv_iota == i, t, 0.0), axis=0,
                         keepdims=True) for i in range(kv)]
        return jnp.concatenate(rows_, axis=1)            # (1, KV*SB)

    for b in range(batch):
        r0 = b * rows
        qf = q_ref[b].reshape(rows, D_)
        k = k_ref[0, b].reshape(cols, D_)
        logits = lax.dot_general(qf.astype(cdt), k.astype(cdt),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        if ks_ref is not None:
            logits = logits * lane_vec(ks_ref[0, b])
        p = pos_ref[b]
        if slopes_ref is not None:
            slope = slopes_ref[...].astype(jnp.float32)  # (rows, 1)
            logits = logits + slope * (col_s - p).astype(jnp.float32)
        mask = (row_h == col_h) & (col_s <= p)
        logits = jnp.where(mask, logits, -jnp.inf)

        m_blk = jnp.max(logits, axis=-1, keepdims=True)
        m_prev = m_ref[r0:r0 + rows, :1]
        m_new = jnp.maximum(m_prev, m_blk)
        alpha = jnp.exp(m_prev - m_new)
        p_exp = jnp.exp(logits - m_new)
        l_new = (l_ref[r0:r0 + rows, :1] * alpha
                 + jnp.sum(p_exp, axis=-1, keepdims=True))
        v = v_ref[0, b].reshape(cols, D_)
        if vs_ref is not None:
            p_exp = p_exp * lane_vec(vs_ref[0, b])
        pv = jnp.dot(p_exp.astype(cdt), v.astype(cdt),
                     preferred_element_type=jnp.float32)
        acc_ref[r0:r0 + rows, :] = acc_ref[r0:r0 + rows, :] * alpha + pv
        m_ref[r0:r0 + rows, :] = jnp.broadcast_to(
            m_new, (rows, m_ref.shape[1]))
        l_ref[r0:r0 + rows, :] = jnp.broadcast_to(
            l_new, (rows, l_ref.shape[1]))

    @pl.when(ns == n_s - 1)
    def _():
        for b in range(batch):
            r0 = b * rows
            out = acc_ref[r0:r0 + rows, :] / l_ref[r0:r0 + rows, :1]
            o_ref[b] = out.reshape(kv, groups, D_).astype(o_ref.dtype)


def _fused_decode_kernel(pos_ref, layer_ref, q_ref, kn_ref, vn_ref,
                         k_ref, v_ref, slopes_ref, ks_ref, vs_ref,
                         o_ref, wk_ref, wv_ref, sk_ref, sv_ref,
                         acc_ref, m_ref, l_ref, *,
                         scale, kv, groups, s_blk, fold=1):
    """See the original docstring below. ``k_ref``/``v_ref`` (and the
    scale refs) may be TUPLES of refs: the paged path folds several
    logical pages into one program (grid step ns covers S positions
    [ns*pf*s_blk, (ns+1)*pf*s_blk) across pf page blocks) - per-program
    launch overhead was the measured gap between paged-PS-128 and the
    slot engine (92.9% at one page/program, round-5 journal)."""
    if not isinstance(k_ref, tuple):
        k_ref, v_ref = (k_ref,), (v_ref,)
        ks_ref = (ks_ref,)
        vs_ref = (vs_ref,)
    elif ks_ref is None:
        ks_ref = (None,) * len(k_ref)
        vs_ref = (None,) * len(v_ref)
    _fused_decode_kernel_impl(pos_ref, layer_ref, q_ref, kn_ref, vn_ref,
                              k_ref, v_ref, slopes_ref, ks_ref, vs_ref,
                              o_ref, wk_ref, wv_ref, sk_ref, sv_ref,
                              acc_ref, m_ref, l_ref, scale=scale, kv=kv,
                              groups=groups, s_blk=s_blk, fold=fold)


def _fused_decode_kernel_impl(pos_ref, layer_ref, q_ref, kn_ref, vn_ref,
                              k_refs, v_refs, slopes_ref, ks_refs, vs_refs,
                              o_ref, wk_ref, wv_ref, sk_ref, sv_ref,
                              acc_ref, m_ref, l_ref, *,
                              scale, kv, groups, s_blk, fold=1):
    """Append-fused flash decode: one kernel per layer does BOTH the
    in-place KV append and the masked flash attention.

    The round-3 profile put attention+append at 0.81 ms/step vs a
    0.37 ms KV-stream bound and exonerated everything except program
    count (BENCH_NOTES.md round-3 sweeps): the separate append
    ``pallas_call`` per layer costs a full launch + pipeline setup AND
    serializes with the flash call that must read its output. Fusing
    removes the dependency entirely: the new token's K/V ride in VMEM,
    its logit/value contribution is computed in-register at the first
    S-block (the streamed cache is masked to ``col_s < p`` since row p
    is stale), and the kernel persists the token via two small aliased
    side outputs - the 8-row append window of the cache and the scale-
    plane block containing p. Bonus: the old append kernel read+wrote
    the FULL (B, KV, S) scale planes every layer; the fused side output
    touches one S-block per row.

    Grid and per-block math are identical to :func:`_decode_kernel`
    (one-big-dot fold over KV heads, online softmax across S blocks).
    """
    b = pl.program_id(0)
    ns = pl.program_id(2)
    n_prog = pl.num_programs(2)
    del layer_ref
    rows, cols = kv * groups, kv * s_blk
    quantized = ks_refs[0] is not None
    pf = len(k_refs)

    @pl.when(ns == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)

    D_ = q_ref.shape[-1]
    cdt = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    kv_iota = lax.broadcasted_iota(jnp.int32, (kv, 1), 0)

    def lane_vec(t):
        # (KV, SB) -> (1, KV*SB) per-lane scale vector
        rows_ = [jnp.sum(jnp.where(kv_iota == i, t, 0.0), axis=0,
                         keepdims=True) for i in range(kv)]
        return jnp.concatenate(rows_, axis=1)

    # ``fold`` batch rows per program (uniform-position decode only):
    # halves/quarters the per-layer program count - per-program launch +
    # pipeline-setup overhead is the measured gap to the KV-stream bound
    # (BENCH_NOTES round-3/4). r indexes the row within the program; all
    # scratch carries are (fold*rows, .) slices. The inner pi loop walks
    # the pf S-blocks (pages) this program carries.
    for r in range(fold):
        sl = slice(r * rows, (r + 1) * rows)
        qf = q_ref[r].reshape(rows, D_)
        p = pos_ref[b * fold + r]

        # ---- the new token's column, from VMEM ---------------------------
        kn = kn_ref[r]                                   # (kv, 1, D)
        vn = vn_ref[r]
        if quantized:
            kq, ksc = _quant_rows(kn.astype(jnp.float32))  # int8, (kv,1,1)
            vq, vsc = _quant_rows(vn.astype(jnp.float32))
            # Parity with read-back: scales round-trip the stored dtype.
            ksc = ksc[..., 0].astype(sk_ref.dtype).astype(jnp.float32)
            vsc = vsc[..., 0].astype(sv_ref.dtype).astype(jnp.float32)
            k_tok = kq.astype(cdt)                       # (kv, 1, D)
            v_tok = vq.astype(cdt)
            ks_rows = jnp.broadcast_to(ksc[:, :, None],
                                       (kv, groups, 1)).reshape(rows, 1)
            vs_rows = jnp.broadcast_to(vsc[:, :, None],
                                       (kv, groups, 1)).reshape(rows, 1)
        else:
            k_tok = kn.astype(k_refs[0].dtype).astype(cdt)
            v_tok = vn.astype(v_refs[0].dtype).astype(cdt)
        knr = jnp.broadcast_to(k_tok, (kv, groups, D_)).reshape(rows, D_)
        vnr = jnp.broadcast_to(v_tok, (kv, groups, D_)).reshape(rows, D_)
        nl0 = jnp.sum(qf.astype(cdt).astype(jnp.float32)
                      * knr.astype(jnp.float32), axis=-1,
                      keepdims=True) * scale
        if quantized:
            nl0 = nl0 * ks_rows

        for pi in range(pf):
            k_ref, v_ref = k_refs[pi], v_refs[pi]
            ks_ref, vs_ref = ks_refs[pi], vs_refs[pi]
            ns_eff = ns * pf + pi
            k = k_ref[0, r].reshape(cols, D_)
            logits = lax.dot_general(
                qf.astype(cdt), k.astype(cdt), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if quantized:
                logits = logits * lane_vec(ks_ref[0, r])
            row_h = (lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
                     // groups)
            col_h = (lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
                     // s_blk)
            col_s = (lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
                     % s_blk + ns_eff * s_blk)
            if slopes_ref is not None:
                slope = slopes_ref[...].astype(jnp.float32)  # (rows, 1)
                logits = logits + slope * (col_s - p).astype(jnp.float32)
            # STRICT mask: the streamed cache row at p is stale
            # (pre-append); the new token's column comes from VMEM.
            mask = (row_h == col_h) & (col_s < p)
            logits = jnp.where(mask, logits, -jnp.inf)

            # ALiBi distance for the new token is 0 - no bias term.
            nl = jnp.where(ns_eff == 0, nl0, -jnp.inf)   # count it ONCE

            m_blk = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True),
                                nl)
            m_prev = m_ref[sl, :1]
            m_new = jnp.maximum(m_prev, m_blk)
            alpha = jnp.exp(m_prev - m_new)                  # (rows, 1)
            p_exp = jnp.exp(logits - m_new)                  # (rows, cols)
            p_tok = jnp.exp(nl - m_new)                      # (rows, 1)
            l_new = (l_ref[sl, :1] * alpha
                     + jnp.sum(p_exp, axis=-1, keepdims=True) + p_tok)
            v = v_ref[0, r].reshape(cols, D_)
            if quantized:
                p_exp = p_exp * lane_vec(vs_ref[0, r])
                p_tok = p_tok * vs_rows
            pv = jnp.dot(p_exp.astype(cdt), v.astype(cdt),
                         preferred_element_type=jnp.float32)  # (rows, D)
            pv = (pv + p_tok.astype(cdt).astype(jnp.float32)
                  * vnr.astype(jnp.float32))
            acc_ref[sl] = acc_ref[sl] * alpha + pv
            m_ref[sl] = jnp.broadcast_to(m_new, (rows, m_ref.shape[1]))
            l_ref[sl] = jnp.broadcast_to(l_new, (rows, l_ref.shape[1]))

            # ---- persist the token: append-window + scale-block outputs -
            # The output buffers are flushed ONCE per (b, chunk) - their
            # index maps are constant in ns - so write them at the
            # S-block containing p, where the stale window rows are
            # already in VMEM.
            @pl.when(ns_eff == p // s_blk)
            def _(r=r, p=p, kn=kn, vn=vn, ns_eff=ns_eff,
                  k_ref=k_ref, v_ref=v_ref, ks_ref=ks_ref, vs_ref=vs_ref,
                  kq=kq if quantized else None,
                  vq=vq if quantized else None,
                  ksc=ksc if quantized else None,
                  vsc=vsc if quantized else None):
                # The stale window rows are already in VMEM inside this
                # s-block: a dynamic SUBLANE slice (8-aligned) reads them
                # directly (probe-verified on v5e; a one-hot 3D
                # dot_general gather does NOT lower - Mosaic dots are
                # 2D-only).
                w0 = pl.multiple_of(
                    (p % s_blk) // _APPEND_WIN * _APPEND_WIN, _APPEND_WIN)
                wk0 = k_ref[0, r, :, pl.ds(w0, _APPEND_WIN), :]
                wv0 = v_ref[0, r, :, pl.ds(w0, _APPEND_WIN), :]
                if quantized:
                    k_store = kq.astype(jnp.float32)     # (kv, 1, D)
                    v_store = vq.astype(jnp.float32)
                else:
                    k_store = kn.astype(jnp.float32)
                    v_store = vn.astype(jnp.float32)
                rw = p % _APPEND_WIN
                roww = lax.broadcasted_iota(jnp.int32, (_APPEND_WIN, 1), 0)
                wmask = (roww == rw)[None]               # (1, WIN, 1)
                wk_ref[0, r] = jnp.where(
                    wmask, k_store,
                    wk0.astype(jnp.float32)).astype(wk_ref.dtype)
                wv_ref[0, r] = jnp.where(
                    wmask, v_store,
                    wv0.astype(jnp.float32)).astype(wv_ref.dtype)
                if quantized:
                    colv = (lax.broadcasted_iota(jnp.int32, (kv, s_blk), 1)
                            + ns_eff * s_blk)
                    smask = colv == p
                    sk_ref2 = jnp.where(
                        smask, jnp.broadcast_to(ksc, (kv, s_blk)),
                        ks_ref[0, r].astype(jnp.float32))
                    sk_ref[0, r] = sk_ref2.astype(sk_ref.dtype)
                    sv_ref2 = jnp.where(
                        smask, jnp.broadcast_to(vsc, (kv, s_blk)),
                        vs_ref[0, r].astype(jnp.float32))
                    sv_ref[0, r] = sv_ref2.astype(sv_ref.dtype)

    @pl.when(ns == n_prog - 1)
    def _():
        for r in range(fold):
            sl = slice(r * rows, (r + 1) * rows)
            out = acc_ref[sl] / l_ref[sl, :1]
            o_ref[r] = out.reshape(kv, groups, D_).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_s",
                                             "kv_chunk", "fold",
                                             "interpret"))
def fused_decode_append_pallas(q, k_new, v_new, cache_k, cache_v, pos,
                               layer, scale: float,
                               alibi_slopes: Optional[jnp.ndarray] = None,
                               k_scale=None, v_scale=None,
                               block_s: int = 256,
                               kv_chunk: Optional[int] = None,
                               fold: Optional[int] = None,
                               interpret: bool = False):
    """One-kernel decode step: appends k_new/v_new (B, KV, D) into the
    (L, B, KV, S, D) cache at ``pos`` of layer ``layer`` IN PLACE and
    returns the masked flash attention over the full post-append cache.

    Replaces the kv_append_pallas -> flash_decode_pallas pair (one fewer
    launch per layer, no serialization between them; see
    :func:`_fused_decode_kernel`). Returns ``(out, cache_k, cache_v)``
    plus ``(k_scale, v_scale)`` when the cache is int8.
    """
    L, B, KV, S, D = cache_k.shape
    Bq, H, Dq = q.shape
    assert (Bq, Dq) == (B, D) and H % KV == 0
    G = H // KV
    kvc = kv_chunk or FLASH_KV_CHUNK or KV
    if KV % kvc != 0:
        kvc = KV
    kvc = min(kvc, KV)
    while (kvc * G < 8 or KV % kvc != 0) and kvc < KV:
        kvc *= 2
    if KV % kvc != 0:
        kvc = KV
    n_c = KV // kvc
    rows = kvc * G
    s_blk = min(block_s, S)
    assert S % s_blk == 0 and s_blk % _APPEND_WIN == 0
    n_s = S // s_blk
    # Fold multiple batch rows into one program when positions are
    # UNIFORM (scalar pos - the append-window block index must be shared
    # by every row of a program). Fewer programs = less launch/pipeline-
    # setup overhead, the measured gap to the KV-stream bound. ``fold``
    # is jit-STATIC so DIRECT callers (tests, sweeps) get a fresh trace
    # per value; fold=None falls back to FLASH_FOLD *at this function's
    # trace time*, so a runtime change of the global is only picked up
    # by programs traced afterwards - any OUTER jit (decode_scan etc.)
    # that already baked this call in keeps its old value until its own
    # cache is invalidated (jax.clear_caches() / new avals). Bench A/B
    # knobs set the global before the first trace, which is why
    # BENCH_ATTN_FOLD works.
    if fold is None:
        fold = FLASH_FOLD
    fold = fold if jnp.ndim(pos) == 0 else 1
    while fold > 1 and B % fold:
        fold //= 2
    q4 = q.reshape(B, KV, G, D)
    k_new = k_new.reshape(B, KV, 1, D)
    v_new = v_new.reshape(B, KV, 1, D)
    pos = jnp.clip(jnp.broadcast_to(pos, (B,)).astype(jnp.int32), 0, S - 1)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)

    def cache_map(b, c, ns, p, l):
        return (l[0], b, c, ns, 0)

    def win_map(b, c, ns, p, l, _f=fold):
        return (l[0], b, c, p[b * _f] // _APPEND_WIN, 0)

    def sblk_map(b, c, ns, p, l, _sb=s_blk, _f=fold):
        # Index units are BLOCK counts: the p-block index divides by s_blk.
        return (l[0], b, c, p[b * _f] // _sb)

    q_map = lambda b, c, ns, p, l: (b, c, 0, 0)  # noqa: E731
    new_spec = pl.BlockSpec((fold, kvc, 1, D),
                            lambda b, c, ns, p, l: (b, c, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((fold, kvc, G, D), q_map, memory_space=pltpu.VMEM),
        new_spec, new_spec,
        pl.BlockSpec((1, fold, kvc, s_blk, D), cache_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, fold, kvc, s_blk, D), cache_map,
                     memory_space=pltpu.VMEM),
    ]
    args = [pos, layer, q4, k_new, v_new, cache_k, cache_v]
    has_slopes = alibi_slopes is not None
    has_scales = k_scale is not None
    if has_slopes:
        slopes2 = jnp.asarray(alibi_slopes, jnp.float32).reshape(KV * G, 1)
        in_specs.append(pl.BlockSpec((rows, 1),
                                     lambda b, c, ns, p, l: (c, 0),
                                     memory_space=pltpu.VMEM))
        args.append(slopes2)
    if has_scales:
        sspec = pl.BlockSpec((1, fold, kvc, s_blk),
                             lambda b, c, ns, p, l: (l[0], b, c, ns),
                             memory_space=pltpu.VMEM)
        in_specs += [sspec, sspec]
        args += [k_scale, v_scale]

    win_spec = pl.BlockSpec((1, fold, kvc, _APPEND_WIN, D), win_map,
                            memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((fold, kvc, G, D), q_map, memory_space=pltpu.VMEM),
        win_spec, win_spec,
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, KV, G, D), q.dtype),
        jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
        jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
    ]
    # args: [pos, layer, q, kn, vn, ck, cv, (slopes), (ks, vs)]
    aliases = {5: 1, 6: 2}
    if has_scales:
        sout = pl.BlockSpec((1, fold, kvc, s_blk), sblk_map,
                            memory_space=pltpu.VMEM)
        out_specs += [sout, sout]
        out_shape += [jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
                      jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype)]
        si = 8 if has_slopes else 7
        aliases[si] = 3
        aliases[si + 1] = 4

    def kernel(pr, lr, qr, knr, vnr, kr, vr, *rest):
        i = 0
        slopes = rest[0] if has_slopes else None
        i += int(has_slopes)
        ks = rest[i] if has_scales else None
        vs = rest[i + 1] if has_scales else None
        i += 2 * int(has_scales)
        outs = rest[i:]
        if has_scales:
            o, wk, wv, sk, sv = outs[:5]
            scratch = outs[5:]
        else:
            o, wk, wv = outs[:3]
            sk = sv = None
            scratch = outs[3:]
        _fused_decode_kernel(pr, lr, qr, knr, vnr, kr, vr, slopes, ks, vs,
                             o, wk, wv, sk, sv, *scratch,
                             scale=scale, kv=kvc, groups=G, s_blk=s_blk,
                             fold=fold)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // fold, n_c, n_s),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((fold * rows, D), jnp.float32),    # acc
            pltpu.VMEM((fold * rows, 128), jnp.float32),  # running max
            pltpu.VMEM((fold * rows, 128), jnp.float32),  # running denom
        ],
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
    )(*args)
    out = res[0].reshape(B, H, D)
    if has_scales:
        return out, res[1], res[2], res[3], res[4]
    return out, res[1], res[2]


# Fuse the KV append INTO the flash-decode kernel (one pallas_call per
# layer instead of append + flash; see _fused_decode_kernel). A/B knob
# BENCH_ATTN=split restores the two-kernel path.
FLASH_FUSED_APPEND = True

# Batch rows folded per fused-decode program when positions are uniform
# (scalar pos). 1 = one program per row (default); 2/4 halve/quarter the
# per-layer program count. Full fold (bfold) measured -7% because one
# program cannot overlap its own DMA with compute; small folds keep
# cross-program pipelining. A/B knob BENCH_ATTN_FOLD.
FLASH_FOLD = 1

# KV heads folded per flash-decode program; None = fold ALL heads into
# one dot per (batch, s-block) program. Folding inflates the logits
# matrix (and the VPU softmax/mask passes over it) by the fold factor,
# but the v5e sweep (experiments/attn_bench.py, OPT-1.3B geometry,
# int8 KV) shows grid-step overhead dominates the saved VPU work:
# kv_chunk 8 = 39.6 us/layer vs full fold 32.2 us/layer. Full fold
# stays the default; the knob remains for other geometries.
FLASH_KV_CHUNK = None

# MHA (G == 1) decode path: 'dot' = one-big-dot MXU kernel,
# 'ew' = elementwise kernel (_decode_kernel_ew). Swept on the full bench
# round 3: ew LOSES 2x (4.01 vs 2.09 ms/step - the VPU q*k multiplies
# replace one MXU dot); 'dot' stays the default.
FLASH_MHA_MODE = "dot"

# Fold ALL batch rows into one program per (chunk, s-block) grid step
# (_decode_kernel_bfold) instead of a (B, ...) grid - cuts flash-decode
# program launches by B per layer. Swept on the full bench (BENCH_ATTN=
# bfold).
FLASH_BATCH_FOLD = False


@functools.partial(jax.jit, static_argnames=("scale", "block_s",
                                             "kv_chunk", "interpret",
                                             "mha_mode", "batch_fold"))
def flash_decode_pallas(q, cache_k, cache_v, pos, layer,
                        scale: float,
                        alibi_slopes: Optional[jnp.ndarray] = None,
                        k_scale=None, v_scale=None,
                        block_s: int = 256,
                        kv_chunk: Optional[int] = None,
                        interpret: bool = False,
                        mha_mode: Optional[str] = None,
                        batch_fold: Optional[bool] = None):
    """Masked decode attention out = softmax(q K^T / sqrt(D)) V.

    q: (B, H, D); cache: (L, B, KV, S, D); pos: (B,) int32 - the highest
    attendable position per row (inclusive); layer: scalar int32.
    Returns (B, H, D) in q.dtype. GQA: H = KV * G; q head h attends kv
    head h // G. ALiBi slopes: (H,) f32 or None. Long contexts stream in
    ``block_s``-sized S blocks with online softmax. With
    ``k_scale``/``v_scale`` (L, B, KV, S) the cache holds int8 values
    dequantized on the fly (per-token symmetric scales). ``kv_chunk``
    KV heads fold into each program's dot (default FLASH_KV_CHUNK).
    """
    L, B, KV, S, D = cache_k.shape
    Bq, H, Dq = q.shape
    assert (Bq, Dq) == (B, D) and H % KV == 0
    G = H // KV
    kvc = kv_chunk or FLASH_KV_CHUNK or KV
    if KV % kvc != 0:
        kvc = KV
    kvc = min(kvc, KV)
    while (kvc * G < 8 or KV % kvc != 0) and kvc < KV:
        kvc *= 2          # keep >= 8 sublane rows and KV divisibility
    if KV % kvc != 0:
        kvc = KV
    n_c = KV // kvc
    rows = kvc * G
    s_blk = min(block_s, S)
    assert S % s_blk == 0
    n_s = S // s_blk
    q4 = q.reshape(B, KV, G, D)
    pos = jnp.clip(jnp.broadcast_to(pos, (B,)).astype(jnp.int32), 0, S - 1)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)

    def cache_map(b, c, ns, p, l):
        return (l[0], b, c, ns, 0)

    q_map = lambda b, c, ns, p, l: (b, c, 0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((1, kvc, G, D), q_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, kvc, s_blk, D), cache_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, kvc, s_blk, D), cache_map,
                     memory_space=pltpu.VMEM),
    ]
    args = [pos, layer, q4, cache_k, cache_v]
    has_slopes = alibi_slopes is not None
    has_scales = k_scale is not None
    if has_slopes:
        slopes2 = jnp.asarray(alibi_slopes, jnp.float32).reshape(KV * G, 1)
        in_specs.append(pl.BlockSpec((rows, 1),
                                     lambda b, c, ns, p, l: (c, 0),
                                     memory_space=pltpu.VMEM))
        args.append(slopes2)
    if has_scales:
        sspec = pl.BlockSpec((1, 1, kvc, s_blk),
                             lambda b, c, ns, p, l: (l[0], b, c, ns),
                             memory_space=pltpu.VMEM)
        in_specs += [sspec, sspec]
        args += [k_scale, v_scale]

    use_ew = G == 1 and (mha_mode or FLASH_MHA_MODE) == "ew"
    use_bfold = (batch_fold if batch_fold is not None
                 else FLASH_BATCH_FOLD) and not use_ew
    if use_bfold:
        # The folded cache block is (B, kvc, s_blk, D) x {k, v} x double
        # buffering and must fit the ~16 MB scoped-VMEM stack together
        # with the per-row loop's temporaries (int8->bf16 converted k/v
        # and f32 logits are NOT stack-reused across the unrolled B
        # iterations: measured 20.3 MB at s_blk=256 and still 16.9 MB at
        # s_blk=128 on v5e). Shrink the KV-CHUNK axis first (the scale
        # plane's LAST block dim is s_blk, which Mosaic requires to be a
        # multiple of 128 or the full S) down to 8 query rows, then the
        # s-block, against a 6 MB block budget that leaves ~10 MB for
        # the temporaries.
        def blk_bytes(c, s):
            return B * c * s * D * cache_k.dtype.itemsize * 2 * 2

        budget = 6 * 1024 * 1024
        while (blk_bytes(kvc, s_blk) > budget and kvc % 2 == 0
               and (kvc // 2) * G >= 8 and KV % (kvc // 2) == 0):
            kvc //= 2
        # Scale planes carry s_blk as their LAST block dim, which must be
        # a multiple of 128 or the full S - never halve below the floor,
        # and if ragged-S divisibility forces us under it, fall back to
        # full-S blocks (always legal).
        s_floor = 128 if has_scales else 32
        while blk_bytes(kvc, s_blk) > budget and s_blk // 2 >= s_floor:
            s_blk //= 2
        while S % s_blk:
            s_blk //= 2
        if has_scales and s_blk < s_floor and s_blk != S:
            s_blk = S
        n_c = KV // kvc
        rows = kvc * G
        n_s = S // s_blk

    def kernel(pr, lr, qr, kr, vr, *rest):
        i = 0
        slopes = rest[0] if has_slopes else None
        i += int(has_slopes)
        ks = rest[i] if has_scales else None
        vs = rest[i + 1] if has_scales else None
        i += 2 * int(has_scales)
        if use_bfold:
            _decode_kernel_bfold(pr, lr, qr, kr, vr, slopes, ks, vs,
                                 *rest[i:], scale=scale, kv=kvc, groups=G,
                                 s_blk=s_blk, batch=B)
        elif use_ew:
            _decode_kernel_ew(pr, lr, qr, kr, vr, slopes, ks, vs,
                              *rest[i:], scale=scale, kv=kvc, s_blk=s_blk)
        else:
            _decode_kernel(pr, lr, qr, kr, vr, slopes, ks, vs, *rest[i:],
                           scale=scale, kv=kvc, groups=G, s_blk=s_blk)

    if use_bfold:
        # One program per (chunk, s-block): the whole batch rides in the
        # block specs; the kernel unrolls over B.
        bf_cache = pl.BlockSpec((1, B, kvc, s_blk, D),
                                lambda c, ns, p, l: (l[0], 0, c, ns, 0),
                                memory_space=pltpu.VMEM)
        bf_specs = [
            pl.BlockSpec((B, kvc, G, D), lambda c, ns, p, l: (0, c, 0, 0),
                         memory_space=pltpu.VMEM),
            bf_cache, bf_cache,
        ]
        if has_slopes:
            bf_specs.append(pl.BlockSpec(
                (rows, 1), lambda c, ns, p, l: (c, 0),
                memory_space=pltpu.VMEM))
        if has_scales:
            bfs = pl.BlockSpec((1, B, kvc, s_blk),
                               lambda c, ns, p, l: (l[0], 0, c, ns),
                               memory_space=pltpu.VMEM)
            bf_specs += [bfs, bfs]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_c, n_s),
            in_specs=bf_specs,
            out_specs=pl.BlockSpec((B, kvc, G, D),
                                   lambda c, ns, p, l: (0, c, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((B * rows, D), jnp.float32),
                pltpu.VMEM((B * rows, 128), jnp.float32),
                pltpu.VMEM((B * rows, 128), jnp.float32),
            ],
        )
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_c, n_s),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, kvc, G, D), q_map,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((rows, D), jnp.float32),    # acc
                pltpu.VMEM((rows, 128), jnp.float32),  # running max
                pltpu.VMEM((rows, 128), jnp.float32),  # running denom
            ],
        )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KV, G, D), q.dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(B, H, D)


# ---- flash prefill (causal, GQA-native, ALiBi) ----------------------------


def _prefill_kernel(q_ref, k_ref, v_ref, slopes_ref, o_ref, *,
                    scale, t_blk, s_chunk):
    """One (batch, q-head, T-block) program of causal flash prefill.

    The stock Pallas flash kernel requires q_heads == kv_heads and no
    bias, so GQA models paid a jnp.repeat KV copy (group-factor x KV
    traffic) and ALiBi (BLOOM) fell back to materialized (B, H, T, T)
    f32 logits (round-4 VERDICT missing-item 4). Here GQA is native -
    the KV BlockSpec derefs head h//G, zero copies - and ALiBi rides as
    a per-head scalar. The kernel streams K/V chunks only up to the
    causal limit of its T-block (fori_loop with a traced bound) with
    online softmax, so the masked upper triangle costs nothing.
    """
    h = pl.program_id(1)
    tb = pl.program_id(2)
    T0, D_ = q_ref.shape[2], q_ref.shape[3]
    q = q_ref[0, 0]                                        # (T0, D)
    cdt = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    qf = q.astype(cdt)
    row = tb * t_blk + lax.broadcasted_iota(jnp.int32, (T0, 1), 0)
    slope = slopes_ref[0, h] if slopes_ref is not None else None

    limit = (tb + 1) * t_blk                   # first masked column
    n_chunks = (limit + s_chunk - 1) // s_chunk

    def body(c, carry):
        acc, m, l = carry
        c0 = c * s_chunk
        k = k_ref[0, 0, pl.ds(c0, s_chunk), :]             # (SC, D)
        v = v_ref[0, 0, pl.ds(c0, s_chunk), :]
        logits = lax.dot_general(qf, k.astype(cdt),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        col = c0 + lax.broadcasted_iota(jnp.int32, (T0, s_chunk), 1)
        if slope is not None:
            logits = logits + slope * (col - row).astype(jnp.float32)
        logits = jnp.where(col <= row, logits, -jnp.inf)
        m_blk = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.dot(p.astype(cdt), v.astype(cdt),
                     preferred_element_type=jnp.float32)
        return acc * alpha + pv, m_new, l

    acc = jnp.zeros((T0, D_), jnp.float32)
    m0 = jnp.full((T0, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((T0, 1), jnp.float32)
    acc, m, l = lax.fori_loop(0, n_chunks, body, (acc, m0, l0))
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "t_blk", "s_chunk",
                                             "interpret"))
def flash_prefill_pallas(q, kT, vT, scale: float,
                         alibi_slopes: Optional[jnp.ndarray] = None,
                         t_blk: int = 256, s_chunk: int = 256,
                         interpret: bool = False):
    """Causal self-attention for prefill: q (B, T, H, D); kT/vT
    (B, KV, S, D) with S == T (positions 0..T-1 per row, strictly
    increasing - the causal mask IS the position mask). GQA: q head h
    attends kv head h // (H // KV), natively (no KV repeat). ALiBi
    slopes (H,) f32 or None. Returns (B, T, H, D) in q.dtype."""
    B, T, H, D = q.shape
    Bk, KV, S, Dk = kT.shape
    assert (Bk, Dk) == (B, D) and S == T and H % KV == 0
    G = H // KV
    while T % t_blk:
        t_blk //= 2
    s_chunk = min(s_chunk, S)
    while S % s_chunk:
        s_chunk //= 2
    nT = T // t_blk
    # Head-major layout for legal (t_blk, D) q/out blocks (a per-head
    # block of the (B, T, H, D) layout would put a 1-sized block on the
    # second-minor H axis - Mosaic rejects it); XLA folds the transposes
    # into the surrounding reshape/projection ops.
    qh = q.transpose(0, 2, 1, 3)                      # (B, H, T, D)

    in_specs = [
        pl.BlockSpec((1, 1, t_blk, D), lambda b, h, tb: (b, h, tb, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, S, D), lambda b, h, tb, _G=G: (b, h // _G, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, S, D), lambda b, h, tb, _G=G: (b, h // _G, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qh, kT, vT]
    has_slopes = alibi_slopes is not None
    if has_slopes:
        # SMEM: the kernel reads ONE scalar slope at a dynamic head
        # index (a dynamic lane index into VMEM does not lower).
        slopes2 = jnp.asarray(alibi_slopes, jnp.float32).reshape(1, H)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(slopes2)

    def kernel(qr, kr, vr, *rest):
        slopes = rest[0] if has_slopes else None
        o = rest[-1]
        _prefill_kernel(qr, kr, vr, slopes, o, scale=scale, t_blk=t_blk,
                        s_chunk=s_chunk)

    out = pl.pallas_call(
        kernel,
        grid=(B, H, nT),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, t_blk, D),
                               lambda b, h, tb: (b, h, tb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        interpret=interpret,
    )(*args)
    return out.transpose(0, 2, 1, 3)


# ---- XLA oracle / portable fallback ---------------------------------------


def kv_append_xla(k_new, v_new, cache_k, cache_v, pos, layer,
                  k_scale=None, v_scale=None):
    """Same semantics as :func:`kv_append_pallas` on plain XLA ops."""
    L, B, KV, S, D = cache_k.shape
    pos = jnp.clip(jnp.broadcast_to(pos, (B,)).astype(jnp.int32), 0, S - 1)
    rows = jnp.arange(B)
    lrow = jnp.broadcast_to(jnp.asarray(layer, jnp.int32), (B,))
    if k_scale is None:
        cache_k = cache_k.at[lrow, rows, :, pos].set(
            k_new.astype(cache_k.dtype))
        cache_v = cache_v.at[lrow, rows, :, pos].set(
            v_new.astype(cache_v.dtype))
        return cache_k, cache_v
    kq, ks = _quant_rows(k_new.astype(jnp.float32))
    vq, vs = _quant_rows(v_new.astype(jnp.float32))
    cache_k = cache_k.at[lrow, rows, :, pos].set(kq.astype(cache_k.dtype))
    cache_v = cache_v.at[lrow, rows, :, pos].set(vq.astype(cache_v.dtype))
    k_scale = k_scale.at[lrow, rows, :, pos].set(ks[..., 0])
    v_scale = v_scale.at[lrow, rows, :, pos].set(vs[..., 0])
    return cache_k, cache_v, k_scale, v_scale


def flash_decode_xla(q, cache_k, cache_v, pos, layer, scale,
                     alibi_slopes=None, k_scale=None, v_scale=None):
    """Same semantics as :func:`flash_decode_pallas` on plain XLA ops."""
    L, B, KV, S, D = cache_k.shape
    H = q.shape[1]
    G = H // KV
    pos = jnp.clip(jnp.broadcast_to(pos, (B,)).astype(jnp.int32), 0, S - 1)
    lidx = jnp.asarray(layer, jnp.int32)
    k = lax.dynamic_index_in_dim(cache_k, lidx, axis=0, keepdims=False)
    v = lax.dynamic_index_in_dim(cache_v, lidx, axis=0, keepdims=False)
    if k_scale is not None:
        ks = lax.dynamic_index_in_dim(k_scale, lidx, 0, keepdims=False)
        vs = lax.dynamic_index_in_dim(v_scale, lidx, 0, keepdims=False)
        k = k.astype(jnp.float32) * ks[..., None]
        v = v.astype(jnp.float32) * vs[..., None]
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
                     k_scale=None, v_scale=None,
                     use_pallas: Optional[bool] = None,
                     interpret: bool = False):
    """Append the new token's K/V and attend over the cache (one decode
    step of one layer). Returns (out (B, H, D), cache_k, cache_v) - plus
    (k_scale, v_scale) appended when the cache is int8-quantized."""
    if scale is None:
        scale = 1.0 / math.sqrt(cache_k.shape[-1])
    if use_pallas is None:
        use_pallas = use_pallas_default()
    quantized = k_scale is not None
    if (use_pallas or interpret) and FLASH_FUSED_APPEND:
        # Pass the module global explicitly: the inner jit then keys its
        # cache on the VALUE, so a FLASH_FOLD change between direct
        # decode_attention calls retraces (an outer jit around this
        # still pins whatever value it traced - see the fold comment in
        # fused_decode_append_pallas).
        res = fused_decode_append_pallas(
            q, k_new, v_new, cache_k, cache_v, pos, layer, scale,
            alibi_slopes, k_scale=k_scale, v_scale=v_scale,
            fold=FLASH_FOLD, interpret=interpret)
        return res
    if use_pallas or interpret:
        updated = kv_append_pallas(
            k_new, v_new, cache_k, cache_v, pos, layer,
            k_scale=k_scale, v_scale=v_scale, interpret=interpret)
        if quantized:
            cache_k, cache_v, k_scale, v_scale = updated
        else:
            cache_k, cache_v = updated
        out = flash_decode_pallas(q, cache_k, cache_v, pos, layer, scale,
                                  alibi_slopes, k_scale=k_scale,
                                  v_scale=v_scale, interpret=interpret)
    else:
        updated = kv_append_xla(k_new, v_new, cache_k, cache_v, pos, layer,
                                k_scale=k_scale, v_scale=v_scale)
        if quantized:
            cache_k, cache_v, k_scale, v_scale = updated
        else:
            cache_k, cache_v = updated
        out = flash_decode_xla(q, cache_k, cache_v, pos, layer, scale,
                               alibi_slopes, k_scale=k_scale,
                               v_scale=v_scale)
    if quantized:
        return out, cache_k, cache_v, k_scale, v_scale
    return out, cache_k, cache_v
