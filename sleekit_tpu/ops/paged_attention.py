"""Paged KV cache attention (vLLM-style), TPU-native.

The slot-based cache (ops/attention.py) reserves max_seq_len per slot;
under continuous batching with mixed lengths most of that is dead
memory. Here KV lives in a shared PAGE POOL (L, P, KV, PS, D) and each
sequence owns a list of pages via a page table (B, MAXP) int32 - memory
scales with tokens actually resident, so many more sequences fit one
chip's HBM.

The kernels are the flash-decode/append pair with ONE change: the page
table rides in as a scalar-prefetch operand and the BlockSpec index maps
dereference it at DMA-address time - physical page = table[b, logical].
Same one-big-dot layout, online softmax across pages, GQA, ALiBi, int8
(per-token scales). Unallocated table entries must hold a valid page id
(0 is fine): their columns are masked, the fetch just needs a legal
address.

No reference analogue (the reference has no serving side, SURVEY.md
§7.8).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sleekit_tpu.ops.attention import (
    _APPEND_WIN,
    _append_kernel,
    _append_q_kernel,
    _decode_kernel,
    _fused_decode_kernel,
    _quant_rows,
)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_kv_append_pallas(k_new, v_new, pool_k, pool_v, page_table, pos,
                           layer, k_scale=None, v_scale=None,
                           interpret: bool = False):
    """Write k_new/v_new (B, KV, D) into page pool (L, P, KV, PS, D) at
    logical position pos (B,) of layer ``layer``, in place; the physical
    page comes from ``page_table`` (B, MAXP) int32."""
    L, PG, KV, PS, D = pool_k.shape
    B = k_new.shape[0]
    assert PS % _APPEND_WIN == 0
    max_pos = page_table.shape[1] * PS - 1
    pos = jnp.clip(jnp.broadcast_to(pos, (B,)).astype(jnp.int32), 0, max_pos)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    pt = page_table.astype(jnp.int32)
    k_new = k_new.reshape(B, KV, 1, D)
    v_new = v_new.reshape(B, KV, 1, D)

    def cache_map(b, pos_ref, pt_ref, layer_ref):
        p = pos_ref[b]
        page = pt_ref[b, p // PS]
        return (layer_ref[0], page, 0, (p % PS) // _APPEND_WIN, 0)

    cache_spec = pl.BlockSpec((1, 1, KV, _APPEND_WIN, D), cache_map,
                              memory_space=pltpu.VMEM)
    new_spec = pl.BlockSpec((1, KV, 1, D), lambda b, p, t, l: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    if k_scale is None:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,      # pos, page_table, layer
            grid=(B,),
            in_specs=[new_spec, new_spec, cache_spec, cache_spec],
            out_specs=[cache_spec, cache_spec],
        )
        return pl.pallas_call(
            lambda pr, ptr, lr, *a: _append_kernel(pr, lr, *a),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct(pool_k.shape, pool_k.dtype),
                       jax.ShapeDtypeStruct(pool_v.shape, pool_v.dtype)],
            # inputs: [pos, pt, layer, k_new, v_new, pool_k, pool_v]
            input_output_aliases={5: 0, 6: 1},
            interpret=interpret,
        )(pos, pt, layer, k_new, v_new, pool_k, pool_v)

    def scale_map(b, pos_ref, pt_ref, layer_ref):
        return (layer_ref[0], pt_ref[b, pos_ref[b] // PS], 0, 0)

    scale_spec = pl.BlockSpec((1, 1, KV, PS), scale_map,
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[new_spec, new_spec, cache_spec, cache_spec,
                  scale_spec, scale_spec],
        out_specs=[cache_spec, cache_spec, scale_spec, scale_spec],
    )

    def kern(pr, ptr, lr, knew, vnew, ck, cv, ks, vs, cko, cvo, kso, vso):
        # Positions inside the scale plane are page-local.
        _append_q_kernel(_LocalPos(pr, PS), lr, knew, vnew,
                         ck, cv, ks, vs, cko, cvo, kso, vso)

    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(pool_k.shape, pool_k.dtype),
                   jax.ShapeDtypeStruct(pool_v.shape, pool_v.dtype),
                   jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
                   jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype)],
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        interpret=interpret,
    )(pos, pt, layer, k_new, v_new, pool_k, pool_v, k_scale, v_scale)


class _LocalPos:
    """Adapter presenting page-local positions through pos_ref indexing
    (scalar SMEM reads only; modulo applied per access)."""

    def __init__(self, ref, page_size):
        self._ref = ref
        self._ps = page_size

    def __getitem__(self, idx):
        return self._ref[idx] % self._ps


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_flash_decode_pallas(q, pool_k, pool_v, page_table, pos, layer,
                              scale: float,
                              alibi_slopes: Optional[jnp.ndarray] = None,
                              k_scale=None, v_scale=None,
                              interpret: bool = False):
    """Masked decode attention over a paged pool. q: (B, H, D); pool:
    (L, P, KV, PS, D); page_table: (B, MAXP); pos: (B,) inclusive highest
    attendable position. Returns (B, H, D)."""
    L, PG, KV, PS, D = pool_k.shape
    B, H, Dq = q.shape
    assert Dq == D and H % KV == 0
    G = H // KV
    rows = KV * G
    MAXP = page_table.shape[1]
    q4 = q.reshape(B, KV, G, D)
    pos = jnp.clip(jnp.broadcast_to(pos, (B,)).astype(jnp.int32),
                   0, MAXP * PS - 1)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    pt = page_table.astype(jnp.int32)

    # _decode_kernel reads the S-block index from program_id(2) (its grid
    # is (batch, kv-chunk, s-block)); the paged grid folds all KV heads
    # into every program, so the chunk axis is a dummy of size 1 and the
    # logical page index rides axis 2.
    def cache_map(b, c, j, pos_ref, pt_ref, layer_ref):
        return (layer_ref[0], pt_ref[b, j], 0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, KV, G, D), lambda b, c, j, p, t, l: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, KV, PS, D), cache_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, KV, PS, D), cache_map, memory_space=pltpu.VMEM),
    ]
    args = [pos, pt, layer, q4, pool_k, pool_v]
    has_slopes = alibi_slopes is not None
    has_scales = k_scale is not None
    if has_slopes:
        slopes2 = jnp.asarray(alibi_slopes, jnp.float32).reshape(rows, 1)
        in_specs.append(pl.BlockSpec(
            (rows, 1), lambda b, c, j, p, t, l: (0, 0),
            memory_space=pltpu.VMEM))
        args.append(slopes2)
    if has_scales:
        sspec = pl.BlockSpec((1, 1, KV, PS),
                             lambda b, c, j, p, t, l: (l[0], t[b, j], 0, 0),
                             memory_space=pltpu.VMEM)
        in_specs += [sspec, sspec]
        args += [k_scale, v_scale]

    def kernel(pr, ptr, lr, qr, kr, vr, *rest):
        i = 0
        slopes = rest[0] if has_slopes else None
        i += int(has_slopes)
        ks = rest[i] if has_scales else None
        vs = rest[i + 1] if has_scales else None
        i += 2 * int(has_scales)
        # _decode_kernel masks with col_s = j * PS + local vs pos[b]
        # (program_id(2) is the logical page index).
        _decode_kernel(pr, lr, qr, kr, vr, slopes, ks, vs, *rest[i:],
                       scale=scale, kv=KV, groups=G, s_blk=PS)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, 1, MAXP),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, KV, G, D),
                               lambda b, c, j, p, t, l: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, D), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KV, G, D), q.dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(B, H, D)


# Logical pages folded into one program of the fused paged kernel: each
# program fetches ``page_fold`` page blocks (separate BlockSpecs, each
# dereferencing its own table entry) and walks them with one online-
# softmax carry. One page per program measures 92.9% of the slot engine
# at PS=128 (launch overhead). MEASURED REGRESSION at fold=2 (66 ms/step
# vs 2.1, round-5 journal): the fold passes the pool as pf separate
# operands, and donating a buffer that another operand still reads
# forces XLA to COPY the whole pool every call - multi-operand folding
# is structurally incompatible with in-place aliasing. Default stays 1;
# use PS=256 when slot-parity throughput matters (99.3% measured) and
# fine pages when memory granularity matters (92.9%).
PAGED_FOLD = 1


@functools.partial(jax.jit, static_argnames=("scale", "page_fold",
                                             "interpret"))
def paged_fused_decode_append_pallas(q, k_new, v_new, pool_k, pool_v,
                                     page_table, pos, layer, scale: float,
                                     alibi_slopes: Optional[jnp.ndarray] = None,
                                     k_scale=None, v_scale=None,
                                     page_fold: Optional[int] = None,
                                     interpret: bool = False):
    """One-kernel paged decode step: appends k_new/v_new (B, KV, D) into
    the page pool (L, P, KV, PS, D) at logical position ``pos`` of layer
    ``layer`` IN PLACE and returns the masked flash attention over the
    full post-append sequence.

    The paged analogue of ops.attention.fused_decode_append_pallas
    (round-4 verdict ask #1): replaces the append->flash kernel pair with
    one launch per (row, logical page). The grid's page axis plays the
    S-block role of the slot kernel - the BlockSpec index maps deref the
    page table at DMA-address time (physical page = table[b, j]), the
    streamed pool is masked STRICTLY below ``pos`` (row pos is stale
    pre-append), the new token's contribution comes from VMEM at page 0,
    and the token is persisted through two small aliased side outputs:
    the 8-row append window of the page holding pos and (int8 pools) that
    page's scale-plane block. Per-step traffic beyond the KV stream is
    O(token bytes) - the old pair re-read the window AND serialized two
    launches per layer.

    Returns ``(out, pool_k, pool_v)`` plus ``(k_scale, v_scale)`` for
    int8 pools.
    """
    L, PG, KV, PS, D = pool_k.shape
    B, H, Dq = q.shape
    assert Dq == D and H % KV == 0
    assert PS % _APPEND_WIN == 0
    G = H // KV
    rows = KV * G
    MAXP = page_table.shape[1]
    pf = PAGED_FOLD if page_fold is None else page_fold
    while pf > 1 and MAXP % pf:
        pf -= 1
    pf = max(pf, 1)
    q4 = q.reshape(B, KV, G, D)
    k_new = k_new.reshape(B, KV, 1, D)
    v_new = v_new.reshape(B, KV, 1, D)
    pos = jnp.clip(jnp.broadcast_to(pos, (B,)).astype(jnp.int32),
                   0, MAXP * PS - 1)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    pt = page_table.astype(jnp.int32)

    def cache_map(pi):
        def m(b, c, j, p, t, l):
            return (l[0], t[b, j * pf + pi], 0, 0, 0)
        return m

    def win_map(b, c, j, p, t, l):
        pp = p[b]
        return (l[0], t[b, pp // PS], 0, (pp % PS) // _APPEND_WIN, 0)

    def spage_map(b, c, j, p, t, l):
        return (l[0], t[b, p[b] // PS], 0, 0)

    def scale_map(pi):
        def m(b, c, j, p, t, l):
            return (l[0], t[b, j * pf + pi], 0, 0)
        return m

    q_map = lambda b, c, j, p, t, l: (b, 0, 0, 0)  # noqa: E731
    new_spec = pl.BlockSpec((1, KV, 1, D), q_map, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, KV, G, D), q_map, memory_space=pltpu.VMEM),
        new_spec, new_spec,
    ]
    # pf interleaved (k, v) page blocks, each dereferencing its own
    # table entry: one program walks logical pages j*pf .. j*pf+pf-1.
    for pi in range(pf):
        in_specs += [pl.BlockSpec((1, 1, KV, PS, D), cache_map(pi),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((1, 1, KV, PS, D), cache_map(pi),
                                  memory_space=pltpu.VMEM)]
    args = [pos, pt, layer, q4, k_new, v_new]
    for _ in range(pf):
        args += [pool_k, pool_v]
    has_slopes = alibi_slopes is not None
    has_scales = k_scale is not None
    if has_slopes:
        slopes2 = jnp.asarray(alibi_slopes, jnp.float32).reshape(rows, 1)
        in_specs.append(pl.BlockSpec((rows, 1),
                                     lambda b, c, j, p, t, l: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(slopes2)
    if has_scales:
        for pi in range(pf):
            sspec = pl.BlockSpec((1, 1, KV, PS), scale_map(pi),
                                 memory_space=pltpu.VMEM)
            in_specs += [sspec, sspec]
            args += [k_scale, v_scale]

    win_spec = pl.BlockSpec((1, 1, KV, _APPEND_WIN, D), win_map,
                            memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((1, KV, G, D), q_map, memory_space=pltpu.VMEM),
        win_spec, win_spec,
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, KV, G, D), q.dtype),
        jax.ShapeDtypeStruct(pool_k.shape, pool_k.dtype),
        jax.ShapeDtypeStruct(pool_v.shape, pool_v.dtype),
    ]
    # args: [pos, pt, layer, q, kn, vn, (pk, pv)*pf, (slopes),
    #        (ks, vs)*pf]; the FIRST pool pair aliases the in-place
    #        window outputs, the first scale pair the scale-block
    #        outputs.
    aliases = {6: 1, 7: 2}
    if has_scales:
        sout = pl.BlockSpec((1, 1, KV, PS), spage_map,
                            memory_space=pltpu.VMEM)
        out_specs += [sout, sout]
        out_shape += [jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
                      jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype)]
        si = 6 + 2 * pf + int(has_slopes)
        aliases[si] = 3
        aliases[si + 1] = 4

    def kernel(pr, ptr, lr, qr, knr, vnr, *rest):
        del ptr  # page table consumed by the index maps
        krs = tuple(rest[2 * pi] for pi in range(pf))
        vrs = tuple(rest[2 * pi + 1] for pi in range(pf))
        i = 2 * pf
        slopes = rest[i] if has_slopes else None
        i += int(has_slopes)
        if has_scales:
            kss = tuple(rest[i + 2 * pi] for pi in range(pf))
            vss = tuple(rest[i + 2 * pi + 1] for pi in range(pf))
            i += 2 * pf
        else:
            kss = vss = (None,) * pf
        outs = rest[i:]
        if has_scales:
            o, wk, wv, sk, sv = outs[:5]
            scratch = outs[5:]
        else:
            o, wk, wv = outs[:3]
            sk = sv = None
            scratch = outs[3:]
        # The grid's page axis (program_id(2)) is the kernel's S-block
        # axis: global col_s = (j*pf + pi) * PS + local, exactly the
        # slot kernel's ns * s_blk + local.
        _fused_decode_kernel(pr, lr, qr, knr, vnr, krs, vrs, slopes,
                             kss, vss, o, wk, wv, sk, sv, *scratch,
                             scale=scale, kv=KV, groups=G, s_blk=PS,
                             fold=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,          # pos, page_table, layer
        grid=(B, 1, MAXP // pf),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((rows, D), jnp.float32),    # acc
            pltpu.VMEM((rows, 128), jnp.float32),  # running max
            pltpu.VMEM((rows, 128), jnp.float32),  # running denom
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


# ---- XLA oracle ------------------------------------------------------------


def _gathered(pool, page_table, layer):
    """(L, P, KV, PS, D) + (B, MAXP) -> (B, KV, MAXP*PS, D) dense view."""
    lidx = jnp.asarray(layer, jnp.int32)
    lp = lax.dynamic_index_in_dim(pool, lidx, 0, keepdims=False)
    g = lp[page_table.astype(jnp.int32)]         # (B, MAXP, KV, PS, ...)
    if g.ndim == 5:
        B, MAXP, KV, PS, D = g.shape
        return g.transpose(0, 2, 1, 3, 4).reshape(B, KV, MAXP * PS, D)
    B, MAXP, KV, PS = g.shape
    return g.transpose(0, 2, 1, 3).reshape(B, KV, MAXP * PS)


def paged_kv_append_xla(k_new, v_new, pool_k, pool_v, page_table, pos,
                        layer, k_scale=None, v_scale=None):
    """Oracle: scatter the new token into its page."""
    L, PG, KV, PS, D = pool_k.shape
    B = k_new.shape[0]
    pos = jnp.clip(jnp.broadcast_to(pos, (B,)).astype(jnp.int32),
                   0, page_table.shape[1] * PS - 1)
    page = jnp.take_along_axis(page_table.astype(jnp.int32),
                               (pos // PS)[:, None], axis=1)[:, 0]
    row = pos % PS
    lrow = jnp.broadcast_to(jnp.asarray(layer, jnp.int32), (B,))
    if k_scale is None:
        pool_k = pool_k.at[lrow, page, :, row].set(
            k_new.astype(pool_k.dtype))
        pool_v = pool_v.at[lrow, page, :, row].set(
            v_new.astype(pool_v.dtype))
        return pool_k, pool_v
    kq, ks = _quant_rows(k_new.astype(jnp.float32))
    vq, vs = _quant_rows(v_new.astype(jnp.float32))
    pool_k = pool_k.at[lrow, page, :, row].set(kq.astype(pool_k.dtype))
    pool_v = pool_v.at[lrow, page, :, row].set(vq.astype(pool_v.dtype))
    k_scale = k_scale.at[lrow, page, :, row].set(ks[..., 0])
    v_scale = v_scale.at[lrow, page, :, row].set(vs[..., 0])
    return pool_k, pool_v, k_scale, v_scale


def paged_flash_decode_xla(q, pool_k, pool_v, page_table, pos, layer,
                           scale, alibi_slopes=None,
                           k_scale=None, v_scale=None):
    from sleekit_tpu.ops.attention import flash_decode_xla

    k = _gathered(pool_k, page_table, layer)[None]   # (1=L, B, KV, S, D)
    v = _gathered(pool_v, page_table, layer)[None]
    ks = vs = None
    if k_scale is not None:
        ks = _gathered(k_scale, page_table, layer)[None]
        vs = _gathered(v_scale, page_table, layer)[None]
    return flash_decode_xla(q, k, v, pos, 0, scale,
                            alibi_slopes=alibi_slopes,
                            k_scale=ks, v_scale=vs)


def paged_decode_attention(q, k_new, v_new, pool_k, pool_v, page_table,
                           pos, layer, scale: Optional[float] = None,
                           alibi_slopes=None, k_scale=None, v_scale=None,
                           use_pallas: Optional[bool] = None,
                           interpret: bool = False):
    """Paged analogue of ops.attention.decode_attention."""
    import sleekit_tpu.ops.attention as _attn

    if scale is None:
        scale = 1.0 / math.sqrt(pool_k.shape[-1])
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    quantized = k_scale is not None
    if (use_pallas or interpret) and _attn.FLASH_FUSED_APPEND:
        # One launch per layer instead of append + flash (the same knob
        # as the slot path: BENCH_ATTN=split restores the pair).
        return paged_fused_decode_append_pallas(
            q, k_new, v_new, pool_k, pool_v, page_table, pos, layer,
            scale, alibi_slopes=alibi_slopes,
            k_scale=k_scale, v_scale=v_scale, interpret=interpret)
    if use_pallas or interpret:
        updated = paged_kv_append_pallas(
            k_new, v_new, pool_k, pool_v, page_table, pos, layer,
            k_scale=k_scale, v_scale=v_scale, interpret=interpret)
        if quantized:
            pool_k, pool_v, k_scale, v_scale = updated
        else:
            pool_k, pool_v = updated
        out = paged_flash_decode_pallas(
            q, pool_k, pool_v, page_table, pos, layer, scale,
            alibi_slopes=alibi_slopes, k_scale=k_scale, v_scale=v_scale,
            interpret=interpret)
    else:
        updated = paged_kv_append_xla(
            k_new, v_new, pool_k, pool_v, page_table, pos, layer,
            k_scale=k_scale, v_scale=v_scale)
        if quantized:
            pool_k, pool_v, k_scale, v_scale = updated
        else:
            pool_k, pool_v = updated
        out = paged_flash_decode_xla(
            q, pool_k, pool_v, page_table, pos, layer, scale,
            alibi_slopes=alibi_slopes, k_scale=k_scale, v_scale=v_scale)
    if quantized:
        return out, pool_k, pool_v, k_scale, v_scale
    return out, pool_k, pool_v
