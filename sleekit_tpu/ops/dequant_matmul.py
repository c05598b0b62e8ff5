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
    idx = unpack_indices(w.packed, w.nbits, w.in_features, layout=w.layout)
    deq = jnp.take(w.lut, idx) * w.scale[None, :]
    y = jnp.dot(x.astype(jnp.float32), deq, preferred_element_type=jnp.float32)
    if w.bias is not None:
        y = y + w.bias[None, :]
    return y.astype(x.dtype)


def _kernel(x_ref, w_ref, scale_ref, lut_ref, o_ref, *,
            nbits, vpw, ksize, affine, compute_dtype):
    k_step = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    words = w_ref[:]  # (PLANE_GROUP, BN) int32, plane-major tile
    mask = jnp.int32((1 << nbits) - 1)
    # Plane j is a contiguous row block [j*PLANE_GROUP, (j+1)*PLANE_GROUP).
    planes = [lax.shift_right_logical(words, jnp.int32(nbits * j)) & mask
              for j in range(vpw)]
    idx = jnp.concatenate(planes, axis=0)  # (PLANE_GROUP*vpw, BN)
    if affine is not None:
        step, zero = affine
        wv = (idx.astype(jnp.float32) * step + zero).astype(compute_dtype)
    else:
        wv = jnp.zeros(idx.shape, jnp.float32)
        for j in range(ksize):
            wv = jnp.where(idx == j, lut_ref[0, j], wv)
        wv = wv.astype(compute_dtype)

    o_ref[:] += jnp.dot(x_ref[:].astype(compute_dtype), wv,
                        preferred_element_type=jnp.float32)

    @pl.when(k_step == nk - 1)
    def _():
        o_ref[:] = o_ref[:] * scale_ref[0, :][None, :]


def _mantissa_kernel(x_ref, w_ref, o_ref, *, nbits, vpw, compute_dtype):
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

    words = w_ref[:]  # (PLANE_GROUP, BN) int32, plane-major tile
    shift = 23 - nbits
    fmask = jnp.int32(((1 << nbits) - 1) << shift)
    one = jnp.int32(0x3F800000)
    planes = []
    for j in range(vpw):
        s = shift - nbits * j
        if s >= 0:
            t = lax.shift_left(words, jnp.int32(s)) & fmask
        else:
            t = lax.shift_right_logical(words, jnp.int32(-s)) & fmask
        planes.append(t | one)
    c = lax.bitcast_convert_type(jnp.concatenate(planes, axis=0),
                                 jnp.float32).astype(compute_dtype)
    o_ref[:] += jnp.dot(x_ref[:].astype(compute_dtype), c,
                        preferred_element_type=jnp.float32)


def _pair_kernel(x_ref, w_ref, scale_ref, bias_ref, o_ref, acc_ref, xs_ref,
                 *, nbits, hp, pg, a_aff, b_aff, kb=1, split=False):
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
    """
    k_step = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k_step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        xs_ref[:] = jnp.zeros_like(xs_ref)

    words_all = w_ref[:]  # (kb*pair_group, BN) int32, pair layout
    mlow = ((1 << nbits) - 1) << (7 - nbits)
    mask = jnp.int32(mlow | (mlow << 16))
    one = jnp.int32(0x3F803F80)
    bk = 2 * pg * hp
    x = x_ref[:].astype(jnp.bfloat16)
    if b_aff != 0.0:
        xs_ref[:, :1] += jnp.sum(x_ref[:].astype(jnp.float32), axis=1,
                                 keepdims=True)
    for t in range(kb):
        words = words_all[t * pg:(t + 1) * pg]
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

    @pl.when(k_step == nk - 1)
    def _():
        out = a_aff * acc_ref[:]
        if b_aff != 0.0:
            out = out + b_aff * xs_ref[:, :1]
        out = out * scale_ref[0, :][None, :] + bias_ref[0, :][None, :]
        o_ref[:] = out.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Serving-default tuning of the pair kernel. kb=0 means auto (~256 word
# rows per grid step); split = one MXU dot per bit plane (no VMEM
# concat); dim_sem = PARALLEL/ARBITRARY grid semantics. NOTE (round-2
# journal): isolated kernel_bench sweeps said split+dim_sem win 15-25%
# per shape, but the FULL fused decode regressed 3.06 -> 3.52 ms/step
# with them - microbenchmark wins do not transfer across back-to-back
# kernel launches here. Tuning decisions are taken on the full bench
# (BENCH_PAIR_TUNE=kb<K>s<0|1>d<0|1> env A/B in bench.py).
PAIR_TUNE = {"kb": 0, "split": False, "dim_sem": False}


def _pair_kb(nbits: int, kb: int) -> int:
    return kb if kb > 0 else max(1, 256 // pair_group(nbits))


@functools.partial(jax.jit, static_argnames=(
    "nbits", "affine_a", "affine_b", "block_n", "interpret",
    "kb", "split", "dim_sem"))
def _pallas_pair_impl(x, packed, scale, bias, *, nbits, affine_a, affine_b,
                      block_n, interpret, kb=1, split=False, dim_sem=False):
    m, k = x.shape
    kw, n = packed.shape
    hp, pg = pair_planes(nbits), pair_group(nbits)
    kb = _pair_kb(nbits, kb)
    bk = 2 * pg * hp

    bn = min(block_n, _round_up(n, 128))
    m_pad = _round_up(max(m, 8), 8)
    kw_pad = _round_up(kw, kb * pg)
    k_pad = (kw_pad // pg) * bk
    n_pad = _round_up(n, bn)

    if (m_pad, k_pad) == (m, k):
        x_p = x
    else:
        x_p = jnp.zeros((m_pad, k_pad), x.dtype)
        x_p = lax.dynamic_update_slice(x_p, x, (0, 0))
    packed_p = (packed if (kw_pad, n_pad) == (kw, n)
                else jnp.pad(packed, ((0, kw_pad - kw), (0, n_pad - n))))
    scale_p = jnp.pad(scale, (0, n_pad - n)).reshape(1, n_pad)
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)
    bias_p = jnp.pad(bias.astype(jnp.float32),
                     (0, n_pad - n)).reshape(1, n_pad)

    grid = (n_pad // bn, kw_pad // (kb * pg))
    kernel = functools.partial(_pair_kernel, nbits=nbits, hp=hp, pg=pg,
                               a_aff=affine_a, b_aff=affine_b,
                               kb=kb, split=split)
    kwargs = {}
    if dim_sem and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.PARALLEL,
                                 pltpu.GridDimensionSemantics.ARBITRARY))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_pad, kb * bk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb * pg, bn), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_pad, bn), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((m_pad, bn), jnp.float32),   # f32 accumulator
            pltpu.VMEM((m_pad, 128), jnp.float32),  # rowsum(x) carry
        ],
        interpret=interpret,
        **kwargs,
    )(x_p, packed_p, scale_p, bias_p)
    return out[:m, :n]


@functools.partial(jax.jit, static_argnames=(
    "nbits", "vpw", "in_features", "affine", "block_n", "interpret"))
def _pallas_impl(x, packed, scale, lut, *, nbits, vpw, in_features,
                 affine, block_n, interpret):
    m, k = x.shape
    kw, n = packed.shape
    ksize = lut.shape[0]

    bk = PLANE_GROUP * vpw
    bn = min(block_n, _round_up(n, 128))
    m_pad = _round_up(max(m, 8), 8)
    kw_pad = _round_up(kw, PLANE_GROUP)
    k_pad = kw_pad * vpw
    n_pad = _round_up(n, bn)

    if (m_pad, k_pad) == (m, k):
        x_p = x
    else:
        x_p = jnp.zeros((m_pad, k_pad), x.dtype)
        x_p = lax.dynamic_update_slice(x_p, x, (0, 0))
    packed_p = (packed if (kw_pad, n_pad) == (kw, n)
                else jnp.pad(packed, ((0, kw_pad - kw), (0, n_pad - n))))

    grid = (n_pad // bn, kw_pad // PLANE_GROUP)
    # bf16 inputs take the bf16 MXU fast path; f32 inputs keep full
    # precision (parity with the XLA oracle).
    compute_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32

    # Mantissa-bit dequant (see _mantissa_kernel): exact while the index
    # fits the compute mantissa (bf16: 7 bits). The affine correction and
    # per-channel scale apply outside as one fused elementwise pass.
    if affine is not None and nbits <= 7:
        kernel = functools.partial(
            _mantissa_kernel, nbits=nbits, vpw=vpw,
            compute_dtype=compute_dtype)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((m_pad, bk), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((PLANE_GROUP, bn), lambda i, j: (j, i),
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
    kernel = functools.partial(
        _kernel, nbits=nbits, vpw=vpw, ksize=ksize, affine=affine,
        compute_dtype=compute_dtype)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_pad, bk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PLANE_GROUP, bn), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ksize), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_pad, bn), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        interpret=interpret,
    )(x_p, packed_p, scale_p, lut_p)
    return out[:m, :n]


def dequant_matmul_pallas(x: jnp.ndarray, w: PackedLinear,
                          block_n: int = 1024,
                          interpret: bool = False) -> jnp.ndarray:
    """Fused Pallas TPU kernel (plane-major layout). ``interpret=True``
    runs the same kernel on CPU for tests."""
    assert w.k_splits == 1, (
        "split_packed_k matrices are a TP sharding format; localize the "
        "shard (ops/pack.localize_packed_shard) before the matmul")
    if w.layout == "pair":
        # bf16-pair fast path: exact while the index fits the bf16
        # mantissa and the codebook is affine (uniform); anything else
        # should be packed with layout='plane'. The kernel computes in
        # bf16, so f32 activations keep full precision on the XLA path
        # instead (the serving hot path is bf16).
        if (w.affine is not None and w.nbits <= 7
                and x.dtype == jnp.bfloat16):
            step, zero = w.affine
            a = step * float(2 ** w.nbits)
            return _pallas_pair_impl(
                x, w.packed, w.scale, w.bias, nbits=w.nbits,
                affine_a=a, affine_b=zero - a,
                block_n=block_n, interpret=interpret, **PAIR_TUNE)
        return dequant_matmul_xla(x, w)
    if w.layout != "plane":
        # Linear-layout weights fall back to the XLA oracle; repack with
        # layout='plane' (ops/pack.pack_quantized default) for the fast path.
        return dequant_matmul_xla(x, w)
    y = _pallas_impl(
        x, w.packed, w.scale, w.lut,
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
