"""Fused dequantize(codebook) + matmul kernels.

The serving hot path: ``y = x @ (lut[unpack(W_packed)] * scale) + bias``
with the packed sub-byte weights streamed straight from HBM and expanded
in VMEM, so HBM traffic is ~nbits/16 of a bf16 dense matmul - weight-only
quantized decode is HBM-bandwidth-bound, which is exactly where this wins
(BASELINE.json north star; no reference analogue exists, SURVEY.md §7.8).

Two implementations with identical semantics:
  * :func:`dequant_matmul_xla` - pure-jnp unpack + dense dot; runs on any
    backend, the correctness oracle;
  * :func:`dequant_matmul_pallas` - Pallas TPU kernel over the PLANE-MAJOR
    packed layout (ops/pack.py): grid (N tiles, K tiles), K innermost
    accumulating into the output tile. Per step a (32, BN) int32 word
    block expands by ``jnp.concatenate`` of its bit planes - with the
    plane-major layout each plane is a CONTIGUOUS row block, so Mosaic
    emits straight shift/mask/concat with no sublane interleave - then one
    bf16 MXU dot. Measured on v5e: ~1.3x faster than the dense bf16
    matmul it replaces at 1/4 the HBM bytes (the residual gap to the
    bytes ratio is the VPU unpack cost; see bench notes in BENCH journal).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sleekit_tpu.ops.pack import (
    PAIR3_LO_WORDS,
    PAIR3_TILE,
    PAIR3_WORDS,
    PAIR3X_GROUP,
    PAIR3X_P4_WORDS,
    PAIR3X_WORDS,
    PLANE_GROUP,
    PackedLinear,
    pack_indices,
    pair_group,
    pair_planes,
    unpack_indices,
)


def dequant_matmul_xla(x: jnp.ndarray, w: PackedLinear) -> jnp.ndarray:
    """Correctness-oracle implementation on plain XLA ops."""
    assert w.k_splits == 1, (
        "split_packed_k matrices are a TP sharding format; localize the "
        "shard (ops/pack.localize_packed_shard) before the matmul")
    packed = w.packed
    if w.layer_sel is not None:
        packed = lax.dynamic_index_in_dim(packed, w.layer_sel, axis=0,
                                          keepdims=False)
    idx = unpack_indices(packed, w.nbits, w.in_features, layout=w.layout)
    idx = idx[:, :w.out_features]  # int8 layout pads N at pack time
    deq = jnp.take(w.lut, idx) * w.scale[None, :]
    y = jnp.dot(x.astype(jnp.float32), deq, preferred_element_type=jnp.float32)
    if w.bias is not None:
        y = y + w.bias[None, :]
    return y.astype(x.dtype)


def _kernel(*refs, nbits, vpw, ksize, affine, compute_dtype, kb_t=1,
            stacked=False, use_poly=False):
    if stacked:
        refs = refs[1:]  # scalar-prefetch layer index (used by index maps)
    if use_poly:
        x_ref, w_ref, scale_ref, lut_ref, poly_ref, o_ref = refs
    else:
        x_ref, w_ref, scale_ref, lut_ref, o_ref = refs
        poly_ref = None
    k_step = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    mask = jnp.int32((1 << nbits) - 1)
    bk0 = PLANE_GROUP * vpw
    words_all = w_ref[0] if stacked else w_ref[:]
    # kb_t plane tiles per grid step: 3-bit (vpw=10) tiles expand to 320
    # K rows, not a multiple of the 128-lane x block requirement - two
    # tiles (640 = 5x128) restore a legal block (TPU_KERNEL_SMOKE round 3
    # caught this lowering failure; interpret mode never enforces it).
    for t in range(kb_t):
        words = words_all[t * PLANE_GROUP:(t + 1) * PLANE_GROUP, :]
        # Plane j is a contiguous row block [j*PG, (j+1)*PG).
        planes = [lax.shift_right_logical(words, jnp.int32(nbits * j)) & mask
                  for j in range(vpw)]
        idx = jnp.concatenate(planes, axis=0)  # (PLANE_GROUP*vpw, BN)
        if affine is not None:
            step, zero = affine
            wv = (idx.astype(jnp.float32) * step + zero).astype(compute_dtype)
        elif use_poly:
            # Interpolating-polynomial dequant: Horner over a centered
            # node variable replaces the select tree (k=16: two exact
            # deg-7 halves selected by bit 3 - an f32 deg-15 coefficient
            # map is too ill-conditioned, cond(V16)=3.3e6 -> 3e-3 error,
            # while the split halves land at ~4e-6, far below the bf16
            # operand rounding; round-5 journal). Ops/element ~= 7 fma +
            # 8 coef selects + 3 vs the tree's 15 selects + 8 bit tests.
            half = 8 if ksize == 16 else ksize
            deg = half - 1
            if ksize == 16:
                b3 = (idx & 8) > 0
                il = (idx & 7).astype(jnp.float32)
                tc = il * (2.0 / deg) - 1.0
                acc = jnp.where(b3, poly_ref[1, deg], poly_ref[0, deg])
                for j in range(deg - 1, -1, -1):
                    acc = acc * tc + jnp.where(b3, poly_ref[1, j],
                                               poly_ref[0, j])
            else:
                tc = idx.astype(jnp.float32) * (2.0 / deg) - 1.0
                acc = jnp.broadcast_to(poly_ref[0, deg],
                                       idx.shape).astype(jnp.float32)
                for j in range(deg - 1, -1, -1):
                    acc = acc * tc + poly_ref[0, j]
            wv = acc.astype(compute_dtype)
        elif ksize >= 4 and ksize & (ksize - 1) == 0:
            # Binary select (mux) tree on the index bits: level l keeps
            # the candidates whose low l+1 bits match, so k-1 selects +
            # log2(k) bit tests replace the k compare+select chain (the
            # k=16 NF4 case: 15+4 VPU ops/element vs 32 - round-4
            # verdict ask 6). Works for ANY lut order (it muxes on idx
            # bits, not value order).
            cur = [lut_ref[0, j] for j in range(ksize)]
            level = 0
            while len(cur) > 1:
                b = (idx & (1 << level)) > 0
                cur = [jnp.where(b, cur[2 * j + 1], cur[2 * j])
                       for j in range(len(cur) // 2)]
                level += 1
            wv = cur[0].astype(compute_dtype)
        else:
            wv = jnp.zeros(idx.shape, jnp.float32)
            for j in range(ksize):
                wv = jnp.where(idx == j, lut_ref[0, j], wv)
            wv = wv.astype(compute_dtype)

        o_ref[:] += jnp.dot(
            x_ref[:, t * bk0:(t + 1) * bk0].astype(compute_dtype), wv,
            preferred_element_type=jnp.float32)

    @pl.when(k_step == nk - 1)
    def _():
        o_ref[:] = o_ref[:] * scale_ref[0, :][None, :]


def _mantissa_kernel(x_ref, w_ref, o_ref, *, nbits, vpw, compute_dtype,
                     kb_t=1):
    """Dequant via float-bit construction: the VPU hot loop.

    Instead of int->float convert + multiply-add per element, place the
    n-bit index straight into the f32 mantissa: bits = 0x3F800000 |
    (idx << (23 - nbits)) reinterprets as 1 + idx / 2^nbits, exactly.
    Per plane that is one shift + and + or + (free) bitcast + one bf16
    cast - the convert/mul/add of the affine path disappear. The affine
    correction w = step*2^nbits*(c - 1) + zero is linear, so it is folded
    OUTSIDE the kernel into y = (a*(x@C) + b*sum(x)) * scale (one fused
    elementwise pass over the (M, N) output).
    """
    k_step = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    shift = 23 - nbits
    fmask = jnp.int32(((1 << nbits) - 1) << shift)
    one = jnp.int32(0x3F800000)
    bk0 = PLANE_GROUP * vpw
    for t in range(kb_t):  # see _kernel: 3-bit needs 2 tiles per step
        words = w_ref[t * PLANE_GROUP:(t + 1) * PLANE_GROUP, :]
        planes = []
        for j in range(vpw):
            s = shift - nbits * j
            if s >= 0:
                w = lax.shift_left(words, jnp.int32(s)) & fmask
            else:
                w = lax.shift_right_logical(words, jnp.int32(-s)) & fmask
            planes.append(w | one)
        c = lax.bitcast_convert_type(jnp.concatenate(planes, axis=0),
                                     jnp.float32).astype(compute_dtype)
        o_ref[:] += jnp.dot(
            x_ref[:, t * bk0:(t + 1) * bk0].astype(compute_dtype), c,
            preferred_element_type=jnp.float32)


def _pair_kernel(*refs, nbits, hp, pg, a_aff, b_aff, kb=1, split=False,
                 pre=None, eps=1e-5, k_valid=0, has_ln_b=False,
                 use_res=False, stacked=False, int8_mode=False,
                 pair3=False, p3m=0, p3x=False):
    """Mantissa dequant over the bf16-PAIR layout: 2 values per VPU op.

    Each int32 word holds ``2*hp`` indices - ``hp`` bit planes in each
    16-bit half, pre-arranged (ops/pack.py layout='pair') so that ONE
    shift+and+or per plane materializes the bf16 bit patterns
    ``0x3F80 | idx << (7-nbits)`` of BOTH halves at once, and the int32 ->
    bf16 bitcast (free) expands word row p to bf16 rows (2p, 2p+1).
    Versus the f32 mantissa kernel this halves the shift/mask work AND
    drops the f32->bf16 convert pass: ~1.5 VPU ops/element instead of ~4.
    Exact for nbits <= 7 (bf16 mantissa).

    The whole affine epilogue is fused into the final K step:
    ``o = (a*acc + b*rowsum(x)) * scale + bias`` cast to the output
    dtype - zero XLA elementwise launches after the kernel (per decode
    step there are ~4 matmuls x n_layers; the separate correction ops
    were real launch overhead, BENCH_NOTES.md round 2).

    ``kb``: pair-layout tiles per grid step (bigger HBM transfers, fewer
    grid steps). ``split``: one MXU dot per bit plane (K=2*pg each)
    instead of concatenating planes into one K=2*pg*hp dot - trades a VMEM
    concat copy for more, shallower MXU passes.

    Decode-glue fusion (round 2): the per-layer XLA elementwise chain
    around each matmul (layernorm -> proj, activation -> proj, proj ->
    residual add) is pure launch overhead at decode shapes (x is (8, K)),
    so the kernel optionally absorbs it:
      * ``pre``: 'layernorm'/'rmsnorm' (requires the FULL K row in one
        grid step; masked to ``k_valid`` so K padding stays exact) or
        'relu'/'gelu' applied to the x block before the dot;
      * ``use_res``: a residual (M, BN) input added in the epilogue.
    One Pallas launch then replaces up to 3 XLA fusions per projection.
    """
    if stacked:
        refs = refs[1:]  # scalar-prefetch layer index consumed by index maps
    if pre == "silu_glu":
        # Two offset views of the same gate|up projection output: the
        # GLU combine happens in-register, per K block.
        x_ref, xu_ref, w_ref, scale_ref, bias_ref = refs[:5]
        i = 5
    else:
        x_ref, w_ref, scale_ref, bias_ref = refs[:4]
        i = 4
    ln_s_ref = ln_b_ref = res_ref = None
    if pre in ("layernorm", "rmsnorm"):
        ln_s_ref = refs[i]
        i += 1
        if has_ln_b:
            ln_b_ref = refs[i]
            i += 1
    if use_res:
        res_ref = refs[i]
        i += 1
    o_ref, acc_ref, xs_ref = refs[i:i + 3]

    k_step = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k_step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        xs_ref[:] = jnp.zeros_like(xs_ref)

    # (kb*pair_group, BN) int32, pair layout; stacked mode addresses the
    # (L, kw, N) tensor's layer block zero-copy (leading dim 1).
    words_all = w_ref[0] if stacked else w_ref[:]
    if not int8_mode:
        mlow = ((1 << nbits) - 1) << (7 - nbits)
        mask = jnp.int32(mlow | (mlow << 16))
        one = jnp.int32(0x3F803F80)
    bk = (PAIR3X_GROUP if p3x else PAIR3_TILE if pair3
          else 2 * pg * hp)
    if pre in ("layernorm", "rmsnorm"):
        x32 = x_ref[:].astype(jnp.float32)
        kp = x32.shape[1]
        col_ok = None
        if k_valid < kp:
            col_ok = (lax.broadcasted_iota(jnp.int32, x32.shape, 1)
                      < k_valid)
        if pre == "layernorm":
            mu = jnp.sum(x32, axis=1, keepdims=True) / k_valid
            xc = x32 - mu
            if col_ok is not None:
                xc = jnp.where(col_ok, xc, 0.0)
        else:
            xc = x32  # K padding is zero, so the sum is already exact
        var = jnp.sum(xc * xc, axis=1, keepdims=True) / k_valid
        xn = xc * lax.rsqrt(var + eps) * ln_s_ref[0, :][None, :]
        if ln_b_ref is not None:
            xn = xn + ln_b_ref[0, :][None, :]
            if col_ok is not None:
                xn = jnp.where(col_ok, xn, 0.0)
        x = xn.astype(jnp.bfloat16)
    elif pre == "relu":
        x = jnp.maximum(x_ref[:], 0).astype(jnp.bfloat16)
    elif pre == "gelu":
        x = jax.nn.gelu(x_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
    elif pre == "silu_glu":
        g = x_ref[:].astype(jnp.float32)
        x = (jax.nn.silu(g) * xu_ref[:].astype(jnp.float32)
             ).astype(jnp.bfloat16)
    else:
        x = x_ref[:].astype(jnp.bfloat16)
    if b_aff != 0.0:
        xs_ref[:, :1] += jnp.sum(x.astype(jnp.float32), axis=1,
                                 keepdims=True)
    if int8_mode:
        # 8-bit layout: rows ARE K rows stored as signed int8 (idx-128);
        # one native convert + one MXU dot, zero shift/mask work.
        acc_ref[:] += jnp.dot(x, words_all.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
    if (pair3 or p3x) and not int8_mode:
        # Shared pair3-tile plane extraction: 2-bit low plane (16 words)
        # + 1-bit high plane (8 words) per 256 K rows (ops/pack.py
        # pair3). Both planes expand by the same one-shift-per-bf16-PAIR
        # mantissa trick; the weighted recombination idx = lo + 4*hi is
        # folded into the epilogue: with c_lo = 1 + lo/4 and c_hi =
        # 1 + hi/2,
        #   x @ W = 4*step*[x@c_lo + (2x)@c_hi] + (zero-12*step)*rs
        # so a_aff = 4*step, b_aff = zero - 12*step (dispatch below).
        # (Swept alternatives, BENCH_NOTES round 4: an exponent-field
        # hi plane with a second accumulator saves the OR but LOSES 9%
        # on the full bench - the extra accumulator breaks the MXU
        # accumulation chain.)
        m_lo = jnp.int32(0x60 | (0x60 << 16))
        m_hi = jnp.int32(0x40 | (0x40 << 16))

        def _lo_planes(wlo):
            out = []
            for j in range(8):
                s = 5 - 2 * j
                w = (lax.shift_left(wlo, jnp.int32(s)) if s >= 0
                     else lax.shift_right_logical(wlo, jnp.int32(-s)))
                out.append(pltpu.bitcast((w & m_lo) | one, jnp.bfloat16))
            return out

        def _hi_planes(whi):
            out = []
            for j in range(16):
                s = 6 - j
                w = (lax.shift_left(whi, jnp.int32(s)) if s >= 0
                     else lax.shift_right_logical(whi, jnp.int32(-s)))
                out.append(pltpu.bitcast((w & m_hi) | one, jnp.bfloat16))
            return out

    p3_c, p3_x = [], []  # p3m=2: accumulate one whole-grid-step dot
    for t in range(kb if not int8_mode else 0):
        words = words_all[t * pg:(t + 1) * pg]
        if p3x:
            # Mixed group (ops/pack.py pair3x): 256 rows of 4-bit fields
            # in a standard pair tile, OR'd into exponent-129 bf16s so
            # c4 = 4 + idx/4 carries the same Sigma x*idx/4 coefficient
            # as the pair3 half; then one pair3 tile. The section-
            # weighted rowsum (4*rs_p4 + 3*rs_p3) rides scratch column 1
            # and the epilogue subtracts a_aff * xs1 (see _pair_affine).
            w4 = words[:PAIR3X_P4_WORDS]
            wlo = words[PAIR3X_P4_WORDS:PAIR3X_P4_WORDS + 16]
            whi = words[PAIR3X_P4_WORDS + 16:]
            m4 = jnp.int32(0x78 | (0x78 << 16))
            one4 = jnp.int32(0x40804080)
            p4 = []
            for j in range(4):
                s = 3 - 4 * j
                w = (lax.shift_left(w4, jnp.int32(s)) if s >= 0
                     else lax.shift_right_logical(w4, jnp.int32(-s)))
                p4.append(pltpu.bitcast((w & m4) | one4, jnp.bfloat16))
            xb4 = x[:, t * bk: t * bk + 256]
            xb3 = x[:, t * bk + 256:(t + 1) * bk]
            xs_ref[:, 1:2] += (
                4.0 * jnp.sum(xb4.astype(jnp.float32), axis=1,
                              keepdims=True)
                + 3.0 * jnp.sum(xb3.astype(jnp.float32), axis=1,
                                keepdims=True))
            if p3m == 2:
                p3_c += p4 + _lo_planes(wlo) + _hi_planes(whi)
                p3_x += [xb4, xb3, xb3 + xb3]
            elif p3m == 1:
                # Merged single dot per tile: [p4; c_lo; c_hi] as one
                # (256+256+256, BN) operand against [xb4 | xb3 | 2xb3] -
                # one MXU accumulation chain per tile (mirrors the pair3
                # p3m=1 arm; round-4 advisor finding - p3m=1 previously
                # aliased the p3m=0 schedule on pair3x layouts).
                c = jnp.concatenate(p4 + _lo_planes(wlo) + _hi_planes(whi),
                                    axis=0)
                x2 = jnp.concatenate([xb4, xb3, xb3 + xb3], axis=1)
                acc_ref[:] += jnp.dot(x2, c,
                                      preferred_element_type=jnp.float32)
            else:
                c4 = jnp.concatenate(p4, axis=0)           # (256, BN)
                acc_ref[:] += jnp.dot(xb4, c4,
                                      preferred_element_type=jnp.float32)
                c_lo = jnp.concatenate(_lo_planes(wlo), axis=0)
                acc_ref[:] += jnp.dot(xb3, c_lo,
                                      preferred_element_type=jnp.float32)
                c_hi = jnp.concatenate(_hi_planes(whi), axis=0)
                acc_ref[:] += jnp.dot(xb3 + xb3, c_hi,
                                      preferred_element_type=jnp.float32)
            continue
        if pair3:
            wlo = words[:PAIR3_LO_WORDS]
            whi = words[PAIR3_LO_WORDS:]
            xb = x[:, t * bk:(t + 1) * bk]
            if p3m == 0:
                c_lo = jnp.concatenate(_lo_planes(wlo), axis=0)  # (256, BN)
                # Issue the lo dot BEFORE unpacking the hi plane: the hi
                # extraction is the pure-VPU half of the 2+1 split and
                # overlaps the MXU pass over c_lo (+6.7% on the full
                # bench).
                acc_ref[:] += jnp.dot(xb, c_lo,
                                      preferred_element_type=jnp.float32)
                c_hi = jnp.concatenate(_hi_planes(whi), axis=0)
                acc_ref[:] += jnp.dot(xb + xb, c_hi,
                                      preferred_element_type=jnp.float32)
            elif p3m == 1:
                # Merged single dot per tile: [c_lo; c_hi] as one (512,
                # BN) operand against [xb | 2xb] - one MXU accumulation
                # chain instead of two K=256 chains (A/B knob p3m).
                c = jnp.concatenate(_lo_planes(wlo) + _hi_planes(whi),
                                    axis=0)
                x2 = jnp.concatenate([xb, xb + xb], axis=1)
                acc_ref[:] += jnp.dot(x2, c,
                                      preferred_element_type=jnp.float32)
            else:
                # p3m=2: defer every tile's planes to ONE dot per grid
                # step (one MXU accumulation chain per step: +9% on the
                # full bench vs the per-tile dot pair, round 4).
                p3_c += _lo_planes(wlo) + _hi_planes(whi)
                p3_x += [xb, xb + xb]
            continue
        planes = []
        for j in range(hp):
            s = (7 - nbits) - nbits * j
            if s >= 0:
                w = lax.shift_left(words, jnp.int32(s))
            else:
                w = lax.shift_right_logical(words, jnp.int32(-s))
            c = pltpu.bitcast((w & mask) | one, jnp.bfloat16)  # (2pg, BN)
            if split:
                xs = x[:, t * bk + j * 2 * pg: t * bk + (j + 1) * 2 * pg]
                acc_ref[:] += jnp.dot(xs, c,
                                      preferred_element_type=jnp.float32)
            else:
                planes.append(c)
        if not split:
            c = jnp.concatenate(planes, axis=0)  # (bk, BN) bf16
            acc_ref[:] += jnp.dot(x[:, t * bk:(t + 1) * bk], c,
                                  preferred_element_type=jnp.float32)
    if p3_c:
        acc_ref[:] += jnp.dot(jnp.concatenate(p3_x, axis=1),
                              jnp.concatenate(p3_c, axis=0),
                              preferred_element_type=jnp.float32)

    @pl.when(k_step == nk - 1)
    def _():
        out = a_aff * acc_ref[:]
        if p3x:
            out = out - a_aff * xs_ref[:, 1:2]
        if b_aff != 0.0:
            out = out + b_aff * xs_ref[:, :1]
        out = out * scale_ref[0, :][None, :] + bias_ref[0, :][None, :]
        if use_res:
            out = out + res_ref[:].astype(jnp.float32)
        o_ref[:] = out.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Table-codebook (plane-LUT) dequant strategy: True = interpolating-
# polynomial Horner (k=16 NF4: two exact deg-7 halves derived in-trace
# from the lut, coefficient error ~4e-6), False = binary mux tree on the
# index bits. The op COUNT favors the polynomial (~18 vs ~23 VPU
# ops/element) but the FULL BENCH says otherwise: poly 8.26 vs tree
# 7.25 ms/step on NF4 OPT-1.3B same-session (round 5) - the deg-7
# Horner is a serial fma dependency chain and the 8 per-level scalar
# broadcasts don't count as 1 op, while the tree's selects parallelize.
# Tree stays the default; the poly path + oracle test remain for
# A/B (BENCH_LUT_POLY=1).
LUT_POLY = False


# Serving-default tuning of the pair kernel. kb=0 means auto (~256 word
# rows per grid step); split = one MXU dot per bit plane (no VMEM
# concat); dim_sem = PARALLEL/ARBITRARY grid semantics; bn=0 keeps the
# caller's block_n (1024), bn>0 overrides it (bn >= N gives one fully
# contiguous weight row block per K step - best HBM access pattern for
# decode where the x/out tiles are tiny). NOTE (round-2 journal):
# isolated kernel_bench sweeps said split+dim_sem win 15-25% per shape,
# but the FULL fused decode regressed 3.06 -> 3.52 ms/step with them -
# microbenchmark wins do not transfer across back-to-back kernel
# launches here. Tuning decisions are taken on the full bench
# (BENCH_PAIR_TUNE=kb<K>s<0|1>d<0|1>[bn<N>][m<M>] env A/B in bench.py;
# the m<M> suffix sets p3m).
# p3m: pair3/pair3x dot scheduling - 0 = per-tile dots (lo-dot/hi-unpack
# interleave), 1 = one merged dot per tile, 2 = ONE merged dot per grid
# step. 2 is the default: one MXU accumulation chain per K step measured
# +3.3% (pair3) / +3.3% (pair3x) on the full bench (round 4).
PAIR_TUNE = {"kb": 0, "split": False, "dim_sem": False, "bn": 0, "p3m": 2}


def _pair_kb(nbits: int, kb: int, pair3: bool = False,
             p3x: bool = False) -> int:
    if kb > 0:
        return kb
    if p3x:
        return max(1, 256 // PAIR3X_WORDS)
    if pair3:
        return max(1, 256 // PAIR3_WORDS)
    return max(1, 256 // pair_group(nbits))


@functools.partial(jax.jit, static_argnames=(
    "nbits", "affine_a", "affine_b", "block_n", "interpret",
    "kb", "split", "dim_sem", "bn", "pre", "eps", "pair3", "p3m", "p3x"))
def _pallas_pair_impl(x, packed, scale, bias, ln_scale=None, ln_bias=None,
                      residual=None, layer=None, *, nbits, affine_a,
                      affine_b, block_n, interpret, kb=1, split=False,
                      dim_sem=False, bn=0, pre=None, eps=1e-5, pair3=False,
                      p3m=0, p3x=False):
    if bn > 0:
        block_n = bn
    m, k = x.shape
    glu = pre == "silu_glu"
    if glu:
        k //= 2  # x holds [gate | up]; the dot contracts over k
    stacked = packed.ndim == 3
    kw, n = packed.shape[-2:]
    if p3x:
        hp, pg, split = 0, PAIR3X_WORDS, False
    elif pair3:
        hp, pg, split = 0, PAIR3_WORDS, False
    else:
        hp, pg = pair_planes(nbits), pair_group(nbits)
    kb = _pair_kb(nbits, kb, pair3, p3x)
    bk = (PAIR3X_GROUP if p3x else PAIR3_TILE if pair3
          else 2 * pg * hp)
    if pair3 or p3x:
        # Shrink kb until the grid-step granularity divides the packed
        # word rows - pair3 exists to kill K padding, so never pad it
        # back in at the grid level (e.g. 8 tiles for K=2048).
        while kw % (kb * pg) and kb > 1:
            kb -= 1
    if pre in ("layernorm", "rmsnorm"):
        # Normalization needs the FULL K row in one grid step.
        kb = -(-kw // pg)

    bn = min(block_n, _round_up(n, 128))
    m_pad = _round_up(max(m, 8), 8)
    kw_pad = _round_up(kw, kb * pg)
    k_pad = (kw_pad // pg) * bk
    n_pad = _round_up(n, bn)

    if stacked and ((kw_pad, n_pad) != (kw, n) or layer is None):
        # Runtime-padding a stacked tensor would copy EVERY layer per
        # call; slice this layer out (one-layer copy) and go unstacked.
        packed = lax.dynamic_index_in_dim(
            packed, jnp.asarray(layer if layer is not None else 0,
                                jnp.int32), axis=0, keepdims=False)
        stacked = False

    def pad_x(v):
        if (m_pad, k_pad) == v.shape:
            return v
        out = jnp.zeros((m_pad, k_pad), v.dtype)
        return lax.dynamic_update_slice(out, v, (0, 0))

    xu_p = None
    if glu:
        x_p, xu_p = pad_x(x[:, :k]), pad_x(x[:, k:])
    else:
        x_p = pad_x(x)
    packed_p = (packed if stacked or (kw_pad, n_pad) == (kw, n)
                else jnp.pad(packed, ((0, kw_pad - kw), (0, n_pad - n))))
    scale_p = jnp.pad(scale, (0, n_pad - n)).reshape(1, n_pad)
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)
    bias_p = jnp.pad(bias.astype(jnp.float32),
                     (0, n_pad - n)).reshape(1, n_pad)

    grid = (n_pad // bn, kw_pad // (kb * pg))
    kernel = functools.partial(_pair_kernel, nbits=nbits, hp=hp, pg=pg,
                               a_aff=affine_a, b_aff=affine_b,
                               kb=kb, split=split, pre=pre, eps=eps,
                               k_valid=k, has_ln_b=ln_bias is not None,
                               use_res=residual is not None,
                               stacked=stacked, pair3=pair3, p3m=p3m,
                               p3x=p3x)

    # With scalar prefetch (stacked mode) every index map takes the layer
    # scalar ref as a trailing arg; the weight map addresses the (L, kw,
    # N) tensor's layer block zero-copy, exactly like the KV-cache kernels
    # (ops/attention.py).
    def imap(fn):
        return (lambda i, j, L: fn(i, j)) if stacked else fn

    x_spec = pl.BlockSpec((m_pad, kb * bk), imap(lambda i, j: (0, j)),
                          memory_space=pltpu.VMEM)
    in_specs = [
        x_spec,
        (pl.BlockSpec((1, kb * pg, bn), lambda i, j, L: (L[0], j, i),
                      memory_space=pltpu.VMEM) if stacked else
         pl.BlockSpec((kb * pg, bn), lambda i, j: (j, i),
                      memory_space=pltpu.VMEM)),
        pl.BlockSpec((1, bn), imap(lambda i, j: (0, i)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), imap(lambda i, j: (0, i)),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x_p, packed_p, scale_p, bias_p]
    if glu:
        in_specs.insert(1, x_spec)
        operands.insert(1, xu_p)
    if pre in ("layernorm", "rmsnorm"):
        assert ln_scale is not None
        for v in (ln_scale, ln_bias):
            if v is None:
                continue
            in_specs.append(pl.BlockSpec((1, k_pad),
                                         imap(lambda i, j: (0, 0)),
                                         memory_space=pltpu.VMEM))
            operands.append(jnp.pad(v.astype(jnp.float32),
                                    (0, k_pad - k)).reshape(1, k_pad))
    if residual is not None:
        in_specs.append(pl.BlockSpec((m_pad, bn), imap(lambda i, j: (0, i)),
                                     memory_space=pltpu.VMEM))
        if (m_pad, n_pad) == residual.shape:
            res_p = residual
        else:
            res_p = jnp.zeros((m_pad, n_pad), residual.dtype)
            res_p = lax.dynamic_update_slice(res_p, residual, (0, 0))
        operands.append(res_p)
    kwargs = {}
    if dim_sem and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.PARALLEL,
                                 pltpu.GridDimensionSemantics.ARBITRARY))
    out_spec = pl.BlockSpec((m_pad, bn), imap(lambda i, j: (0, i)),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype)
    scratch = [
        pltpu.VMEM((m_pad, bn), jnp.float32),   # f32 accumulator
        pltpu.VMEM((m_pad, 128), jnp.float32),  # rowsum(x) carry
    ]

    if stacked:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
            out_specs=out_spec, scratch_shapes=scratch)
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret, **kwargs,
        )(jnp.asarray(layer, jnp.int32).reshape(1), *operands)
    else:
        out = pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_spec,
            out_shape=out_shape, scratch_shapes=scratch,
            interpret=interpret, **kwargs,
        )(*operands)
    return out[:m, :n]


@functools.partial(jax.jit, static_argnames=(
    "affine_a", "affine_b", "block_n", "interpret", "pre", "eps", "out_n"))
def _pallas_int8_impl(x, packed, scale, bias, ln_scale=None, ln_bias=None,
                      residual=None, *, affine_a, affine_b, block_n,
                      interpret, pre=None, eps=1e-5, out_n=0):
    """8-bit layout: packed is a pre-padded (K_pad, N_pad) SIGNED int8
    matrix (ops/pack.py layout='int8'); the kernel is one int8->bf16
    convert + MXU dot per block with the same fused affine/scale/bias
    (+ optional pre-norm/activation/residual) epilogue as the pair
    kernel. No runtime padding of the weight ever happens."""
    m, k = x.shape
    kw, n = packed.shape
    out_n = out_n or n
    bn = min(block_n, n)
    assert n % bn == 0, (n, bn)
    if pre in ("layernorm", "rmsnorm"):
        kb8 = kw  # normalization needs the full K row in one grid step
    else:
        kb8 = min(kw, 512)
        while kw % kb8:
            kb8 -= 32
    m_pad = _round_up(max(m, 8), 8)

    if (m_pad, kw) == (m, k):
        x_p = x
    else:
        x_p = jnp.zeros((m_pad, kw), x.dtype)
        x_p = lax.dynamic_update_slice(x_p, x, (0, 0))
    scale_p = jnp.pad(scale, (0, n - out_n)).reshape(1, n)
    if bias is None:
        bias = jnp.zeros((out_n,), jnp.float32)
    bias_p = jnp.pad(bias.astype(jnp.float32),
                     (0, n - out_n)).reshape(1, n)

    grid = (n // bn, kw // kb8)
    kernel = functools.partial(_pair_kernel, nbits=8, hp=0, pg=0,
                               a_aff=affine_a, b_aff=affine_b,
                               pre=pre, eps=eps, k_valid=k,
                               has_ln_b=ln_bias is not None,
                               use_res=residual is not None,
                               int8_mode=True)
    in_specs = [
        pl.BlockSpec((m_pad, kb8), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((kb8, bn), lambda i, j: (j, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x_p, packed, scale_p, bias_p]
    if pre in ("layernorm", "rmsnorm"):
        assert ln_scale is not None
        for v in (ln_scale, ln_bias):
            if v is None:
                continue
            in_specs.append(pl.BlockSpec((1, kw), lambda i, j: (0, 0),
                                         memory_space=pltpu.VMEM))
            operands.append(jnp.pad(v.astype(jnp.float32),
                                    (0, kw - k)).reshape(1, kw))
    if residual is not None:
        in_specs.append(pl.BlockSpec((m_pad, bn), lambda i, j: (0, i),
                                     memory_space=pltpu.VMEM))
        res_p = jnp.zeros((m_pad, n), residual.dtype)
        res_p = lax.dynamic_update_slice(res_p, residual, (0, 0))
        operands.append(res_p)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m_pad, bn), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((m_pad, bn), jnp.float32),
            pltpu.VMEM((m_pad, 128), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return out[:m, :out_n]


def _int8_affine(w: PackedLinear):
    """(a, b) of the signed-int8 fold: deq = (a*v + b) * scale with
    v = idx - 128 stored in the int8 matrix."""
    step, zero = w.affine
    return step, zero + 128.0 * step


def _pair_affine(w: PackedLinear):
    """Epilogue constants (a_aff, b_aff) of out = (a*acc + b*rowsum) *
    scale + bias for the bf16-pair layouts (see _pair_kernel)."""
    step, zero = w.affine
    if w.layout == "pair3":
        # acc = x@c_lo + (2x)@c_hi with c_lo = 1+lo/4, c_hi = 1+hi/2 and
        # idx = lo + 4*hi: x@W = 4*step*acc + (zero - 12*step)*rowsum.
        return 4.0 * step, zero - 12.0 * step
    if w.layout == "pair3x":
        # acc = Sigma x*idx / 4 + (4*rs_p4 + 3*rs_p3); the section-
        # weighted rowsum is accumulated in scratch column 1 and
        # subtracted in the epilogue, so b_aff carries only `zero`.
        return 4.0 * step, zero
    a = step * float(2 ** w.nbits)
    return a, zero - a


@functools.partial(jax.jit, static_argnames=(
    "nbits", "vpw", "in_features", "affine", "block_n", "interpret"))
def _pallas_impl(x, packed, scale, lut, layer=None, *, nbits, vpw,
                 in_features, affine, block_n, interpret):
    m, k = x.shape
    stacked = packed.ndim == 3
    kw, n = packed.shape[-2:]
    ksize = lut.shape[0]

    # 3-bit plane tiles expand to 320 K rows - not a multiple of the
    # 128-lane block requirement; process enough tiles per grid step for
    # a legal x block (lcm-based: 2 tiles = 640 = 5x128 for 3-bit, and
    # correct for any future width rather than a hardcoded doubling).
    import math as _math

    tile_k = PLANE_GROUP * vpw
    kb_t = 128 // _math.gcd(tile_k, 128)
    bk = kb_t * PLANE_GROUP * vpw
    bn = min(block_n, _round_up(n, 128))
    m_pad = _round_up(max(m, 8), 8)
    kw_pad = _round_up(kw, kb_t * PLANE_GROUP)
    k_pad = kw_pad * vpw
    n_pad = _round_up(n, bn)

    if stacked and ((kw_pad, n_pad) != (kw, n) or layer is None):
        # Runtime-padding a stacked tensor would copy EVERY layer per
        # call; slice this layer out (one-layer copy) and go unstacked.
        packed = lax.dynamic_index_in_dim(
            packed, jnp.asarray(layer if layer is not None else 0,
                                jnp.int32), axis=0, keepdims=False)
        stacked = False

    if (m_pad, k_pad) == (m, k):
        x_p = x
    else:
        x_p = jnp.zeros((m_pad, k_pad), x.dtype)
        x_p = lax.dynamic_update_slice(x_p, x, (0, 0))
    packed_p = (packed if stacked or (kw_pad, n_pad) == (kw, n)
                else jnp.pad(packed, ((0, kw_pad - kw), (0, n_pad - n))))

    grid = (n_pad // bn, kw_pad // (kb_t * PLANE_GROUP))

    def imap(fn):
        return (lambda i, j, L: fn(i, j)) if stacked else fn

    w_spec = (pl.BlockSpec((1, kb_t * PLANE_GROUP, bn),
                           lambda i, j, L: (L[0], j, i),
                           memory_space=pltpu.VMEM) if stacked else
              pl.BlockSpec((kb_t * PLANE_GROUP, bn), lambda i, j: (j, i),
                           memory_space=pltpu.VMEM))
    # bf16 inputs take the bf16 MXU fast path; f32 inputs keep full
    # precision (parity with the XLA oracle).
    compute_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32

    # Mantissa-bit dequant (see _mantissa_kernel): exact while the index
    # fits the compute mantissa (bf16: 7 bits). The affine correction and
    # per-channel scale apply outside as one fused elementwise pass.
    if affine is not None and nbits <= 7:
        if stacked:  # rare: affine codebooks serve via the pair layouts
            packed_p = lax.dynamic_index_in_dim(
                packed_p, jnp.asarray(layer, jnp.int32), axis=0,
                keepdims=False)
            stacked = False
        kernel = functools.partial(
            _mantissa_kernel, nbits=nbits, vpw=vpw,
            compute_dtype=compute_dtype, kb_t=kb_t)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((m_pad, bk), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kb_t * PLANE_GROUP, bn), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m_pad, bn), lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
            interpret=interpret,
        )(x_p, packed_p)[:m, :n]
        step, zero = affine
        a = step * float(2 ** nbits)
        b = zero - a
        xs = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
        return (a * out + b * xs) * scale[None, :]

    scale_p = jnp.pad(scale, (0, n_pad - n)).reshape(1, n_pad)
    lut_p = lut.reshape(1, ksize)
    # Polynomial LUT path (see _kernel): derive the interpolating Horner
    # coefficients IN-TRACE from the (traced) lut via a constant inverse-
    # Vandermonde map - no PackedLinear format change, any table works.
    use_poly = (LUT_POLY and affine is None and ksize in (4, 8, 16))
    poly_p = None
    if use_poly:
        half = 8 if ksize == 16 else ksize
        tj = (np.arange(half) - (half - 1) / 2.0) / ((half - 1) / 2.0)
        Minv = jnp.asarray(np.linalg.inv(
            np.vander(tj, half, increasing=True)), jnp.float32)
        lut32 = lut.astype(jnp.float32)
        if ksize == 16:
            poly_p = jnp.stack([Minv @ lut32[:8], Minv @ lut32[8:]])
        else:
            poly_p = (Minv @ lut32).reshape(1, half)
    kernel = functools.partial(
        _kernel, nbits=nbits, vpw=vpw, ksize=ksize, affine=affine,
        compute_dtype=compute_dtype, kb_t=kb_t, stacked=stacked,
        use_poly=use_poly)

    in_specs = [
        pl.BlockSpec((m_pad, bk), imap(lambda i, j: (0, j)),
                     memory_space=pltpu.VMEM),
        w_spec,
        pl.BlockSpec((1, bn), imap(lambda i, j: (0, i)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ksize), imap(lambda i, j: (0, 0)),
                     memory_space=pltpu.VMEM),
    ]
    if use_poly:
        in_specs.append(pl.BlockSpec(
            poly_p.shape, imap(lambda i, j: (0, 0)),
            memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((m_pad, bn), imap(lambda i, j: (0, i)),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32)
    args = [x_p, packed_p, scale_p, lut_p]
    if use_poly:
        args.append(poly_p)
    if stacked:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
            out_specs=out_spec)
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret,
        )(jnp.asarray(layer, jnp.int32).reshape(1), *args)
    else:
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(*args)
    return out[:m, :n]


# PREFILL policy (measured, experiments/prefill_bench.py round 4): the
# streaming pair kernel beats dequantize-once-then-dense at EVERY M it
# fits (M=512 fc1-int4: pair 0.083 ms ~= dense-bf16 0.084 vs deq+mm
# 0.47), and only VMEM-fails around M~2048 (the decode-shaped full-M x
# block). So large-M calls are CHUNKED over M at PREFILL_CHUNK_M rows
# per pair-kernel call instead of switching kernels; _dequant_dense_bf16
# remains the fallback for shapes the kernel rejects.
PREFILL_CHUNK_M = 512


@functools.partial(jax.jit, static_argnames=())
def _dequant_dense_bf16(x: jnp.ndarray, w: PackedLinear) -> jnp.ndarray:
    """Dequantize-once-then-dense: XLA unpack to a bf16 (K, N) matrix +
    one MXU dot. Not on the dispatch path (M-chunking through the pair
    kernel beat it at every measured M - prefill_bench round 4); kept as
    the measured comparison point and a utility for callers that want a
    materialized bf16 weight."""
    packed = w.packed
    if w.layer_sel is not None:
        packed = lax.dynamic_index_in_dim(packed, w.layer_sel, axis=0,
                                          keepdims=False)
    idx = unpack_indices(packed, w.nbits, w.in_features, layout=w.layout)
    idx = idx[:, :w.out_features]
    deq = (jnp.take(w.lut, idx) * w.scale[None, :]).astype(jnp.bfloat16)
    y = jnp.dot(x, deq, preferred_element_type=jnp.float32)
    if w.bias is not None:
        y = y + w.bias[None, :]
    return y.astype(x.dtype)


def dequant_matmul_pallas(x: jnp.ndarray, w: PackedLinear,
                          block_n: int = 1024,
                          interpret: bool = False) -> jnp.ndarray:
    """Fused Pallas TPU kernel (plane-major layout). ``interpret=True``
    runs the same kernel on CPU for tests."""
    assert w.k_splits == 1, (
        "split_packed_k matrices are a TP sharding format; localize the "
        "shard (ops/pack.localize_packed_shard) before the matmul")
    if x.shape[0] > PREFILL_CHUNK_M and x.dtype == jnp.bfloat16:
        # Prefill-size M: chunk rows through the same streaming kernel
        # (see PREFILL_CHUNK_M note above).
        pad = (-x.shape[0]) % PREFILL_CHUNK_M
        xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
        parts = [
            dequant_matmul_pallas(
                xp[i:i + PREFILL_CHUNK_M], w, block_n=block_n,
                interpret=interpret)
            for i in range(0, xp.shape[0], PREFILL_CHUNK_M)]
        return jnp.concatenate(parts, axis=0)[:x.shape[0]]
    if w.layout in ("pair", "pair3", "pair3x"):
        # bf16-pair fast path: exact while the index fits the bf16
        # mantissa and the codebook is affine (uniform); anything else
        # should be packed with layout='plane'. The kernel computes in
        # bf16, so f32 activations keep full precision on the XLA path
        # instead (the serving hot path is bf16).
        if (w.affine is not None and w.nbits <= 7
                and x.dtype == jnp.bfloat16):
            a, b = _pair_affine(w)
            return _pallas_pair_impl(
                x, w.packed, w.scale, w.bias, layer=w.layer_sel,
                nbits=w.nbits, affine_a=a, affine_b=b,
                block_n=block_n, interpret=interpret,
                pair3=w.layout == "pair3", p3x=w.layout == "pair3x",
                **PAIR_TUNE)
        return dequant_matmul_xla(x, w)
    if w.layout == "int8":
        if (w.affine is not None and x.dtype == jnp.bfloat16
                and w.layer_sel is None):
            a, b = _int8_affine(w)
            return _pallas_int8_impl(
                x, w.packed, w.scale, w.bias, affine_a=a, affine_b=b,
                block_n=block_n, interpret=interpret,
                out_n=w.out_features)
        return dequant_matmul_xla(x, w)
    if w.layout != "plane":
        # Linear-layout weights fall back to the XLA oracle; repack with
        # layout='plane' (ops/pack.pack_quantized default) for the fast path.
        return dequant_matmul_xla(x, w)
    y = _pallas_impl(
        x, w.packed, w.scale, w.lut, w.layer_sel,
        nbits=w.nbits, vpw=w.vpw, in_features=w.in_features,
        affine=w.affine, block_n=block_n, interpret=interpret)
    if w.bias is not None:
        y = y + w.bias[None, :]
    return y.astype(x.dtype)


def quantized_matmul(x: jnp.ndarray, w: PackedLinear,
                     use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """y = x @ deq(w) + bias, picking the best implementation for the
    current backend (Pallas on TPU, XLA elsewhere)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas:
        return dequant_matmul_pallas(x, w)
    return dequant_matmul_xla(x, w)


def can_fuse_glue(x: jnp.ndarray, w: PackedLinear) -> bool:
    """Whether the decode-glue fusion (pre-norm / pre-activation /
    residual inside the kernel) applies to this matmul."""
    ok_pair = w.layout in ("pair", "pair3", "pair3x") and w.nbits <= 7
    ok_int8 = (w.layout == "int8" and w.nbits == 8
               and w.layer_sel is None)
    return ((ok_pair or ok_int8) and w.affine is not None
            and x.dtype == jnp.bfloat16 and w.k_splits == 1)


def fused_quantized_matmul(x: jnp.ndarray, w: PackedLinear, *,
                           pre: Optional[str] = None,
                           ln_scale: Optional[jnp.ndarray] = None,
                           ln_bias: Optional[jnp.ndarray] = None,
                           eps: float = 1e-5,
                           residual: Optional[jnp.ndarray] = None,
                           use_pallas: Optional[bool] = None,
                           interpret: bool = False) -> jnp.ndarray:
    """``y = [residual +] pre(x) @ deq(w) + bias`` in ONE kernel launch.

    ``pre``: None | 'layernorm' | 'rmsnorm' (with ``ln_scale``/``ln_bias``)
    | 'relu' | 'gelu'. On the serving path (pair layout, bf16, TPU) the
    whole expression runs inside the pair kernel; otherwise it composes
    the same math in XLA (identical semantics, the correctness oracle).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if (use_pallas or interpret) and can_fuse_glue(x, w):
        if w.layout == "int8":
            assert pre != "silu_glu", "GLU fusion is pair-layout only"
            a, b = _int8_affine(w)
            return _pallas_int8_impl(
                x, w.packed, w.scale, w.bias, ln_scale, ln_bias, residual,
                affine_a=a, affine_b=b, block_n=1024, interpret=interpret,
                pre=pre, eps=eps, out_n=w.out_features)
        a, b = _pair_affine(w)
        return _pallas_pair_impl(
            x, w.packed, w.scale, w.bias, ln_scale, ln_bias, residual,
            w.layer_sel, nbits=w.nbits, affine_a=a, affine_b=b,
            block_n=1024, interpret=interpret, pre=pre, eps=eps,
            pair3=w.layout == "pair3", p3x=w.layout == "pair3x",
            **PAIR_TUNE)
    h32 = x.astype(jnp.float32)
    if pre == "layernorm":
        mu = jnp.mean(h32, axis=-1, keepdims=True)
        var = jnp.var(h32, axis=-1, keepdims=True)
        h32 = (h32 - mu) * lax.rsqrt(var + eps) * ln_scale
        if ln_bias is not None:
            h32 = h32 + ln_bias
    elif pre == "rmsnorm":
        var = jnp.mean(jnp.square(h32), axis=-1, keepdims=True)
        h32 = h32 * lax.rsqrt(var + eps) * ln_scale
    elif pre == "relu":
        h32 = jnp.maximum(h32, 0)
    elif pre == "gelu":
        h32 = jax.nn.gelu(h32)
    elif pre == "silu_glu":
        kk = h32.shape[-1] // 2
        h32 = jax.nn.silu(h32[..., :kk]) * h32[..., kk:]
    y = quantized_matmul(h32.astype(x.dtype), w, use_pallas=use_pallas)
    if residual is not None:
        y = y + residual
    return y
