"""Packed sub-byte weight format for quantized serving.

The reference stores quantized weights **dequantized back to fp32**
(ref /root/reference/sleekit/statistics.py:186) and only hints at packing
via ``quantize_index`` (ref codebook.py:43-54); a real packed format and the
kernels that consume it are all-new TPU-native work (SURVEY.md §7.8).

Format ("skq1"):
  * weights live in serving layout (K, N) = (in_features, out_features),
    i.e. transposed from the quantizer's (out, in);
  * per-element codebook indices are packed little-endian into uint32
    words along K: ``vals_per_word = 32 // nbits`` for power-of-two widths
    and 10 for 3-bit (30 used bits);
  * a row group of ``vals_per_word`` consecutive K rows shares one word
    row, so a (K, N) index matrix packs to (ceil(K/vpw), N) uint32 - the
    lane (N) dimension is untouched, keeping unpacking TPU-vectorizable;
  * per-output-channel f32 scale (N,), shared f32 codebook LUT (k,), and
    optional f32 bias (N,).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def affine_from_lut(lut) -> Optional[Tuple[float, float]]:
    """(step, zero) if the LUT is an affine grid (uniform codebook), else
    None. Static metadata so kernels can pick the closed-form dequant path
    at trace time."""
    lut = np.asarray(lut)
    if lut.size < 2:
        return None
    diffs = np.diff(lut)
    step = float(diffs[0])
    if np.allclose(diffs, step, rtol=1e-5, atol=1e-7):
        return (step, float(lut[0]))
    return None


def bits_for_codebook(codebook_size: int) -> int:
    """Smallest packing width holding indices 0..k-1 (1..8 bits)."""
    nbits = max(1, int(np.ceil(np.log2(codebook_size))))
    if nbits > 8:
        raise ValueError(f"codebook size {codebook_size} too large to pack")
    return nbits


def vals_per_word(nbits: int) -> int:
    """Sub-elements per uint32 word: 32/nbits, except 10 for 3-bit."""
    if nbits == 3:
        return 10
    if 32 % nbits != 0:
        raise ValueError(f"unsupported pack width {nbits}")
    return 32 // nbits


# Word-row group size of the plane-major layout: within each tile of
# PLANE_GROUP*vpw K-rows, word row g bit-field j holds K row j*PLANE_GROUP+g.
# Unpacking a (PLANE_GROUP, N) word block is then VPW contiguous block
# writes (one per bit plane) - no sublane interleave, which is what keeps
# the TPU dequant kernel at HBM speed (see ops/dequant_matmul.py).
PLANE_GROUP = 32

# Word-row group size of the pair layout (below).
PAIR_GROUP = 32

LAYOUTS = ("linear", "plane", "pair", "pair3", "pair3x", "int8")

# 'pair3' (3-bit native): each 3-bit index splits into a 2-bit low plane
# and a 1-bit high plane, each stored in its own bf16-pair arrangement
# inside a 256-K-row tile of 24 word rows (16 low + 8 high). Why: the
# plain 'pair' layout at 3-bit needs 640-row tiles (10 values/word x
# doubled group for 128-lane alignment), so K=2048 pads 25% - an int3
# matrix stored EXACTLY as many bytes as int4 plus 25% wasted MXU/VPU
# work (round-3 bench: int3 SLOWER than int4, VERDICT.md missing #2).
# pair3 tiles are 256 rows -> zero padding for every zoo geometry and
# TP shards down to K/n = 256, and the byte ratio is the true 24/32 =
# 0.75x of int4. Dequant stays one shift+and+or per bf16 PAIR per plane:
#   c_lo = 1 + lo/4   (2-bit mantissa),  c_hi = 1 + hi/2   (1-bit)
#   x @ W = 4*step*[x@c_lo + 2*(x@c_hi)] + (zero - 12*step)*rowsum(x)
PAIR3_TILE = 256           # K rows per tile
PAIR3_WORDS = 24           # word rows per tile (16 low + 8 high)
PAIR3_LO_WORDS = 16

# 'pair3x' (3-bit mixed): each 512-K-row group stores its first 256 rows
# as 4-BIT fields in one standard pair tile (32 words; the spare top bit
# is zero) and its last 256 rows as one pair3 tile (24 words) -> 56
# words per 512 rows = 0.875x int4 bytes. Why: on v5e the int4 pair
# kernel is DMA-bound (VPU unpack ~0.55x of its HBM stream time) while
# pure pair3 is VPU-bound (~1.5x) - mixing the two balances the
# pipeline, serving 3-bit checkpoints FASTER than int4 at fewer bytes
# (round-4 bench). Dequant: the 4-bit section ORs the field into
# exponent-129 bf16s (c4 = 4 + idx/4) so both sections contribute
# Sigma x*idx / 4 to one accumulator; the section-weighted rowsum
# (4*rs_pair + 3*rs_pair3) rides a second scratch column and is
# subtracted in the epilogue (ops/dequant_matmul._pair_kernel).
PAIR3X_GROUP = 512         # K rows per mixed group
PAIR3X_WORDS = 56          # word rows per group (32 4-bit + 16 lo + 8 hi)
PAIR3X_P4_WORDS = 32


def pair_planes(nbits: int) -> int:
    """Bit planes per 16-bit half in the 'pair' layout: floor(16/nbits).

    Element count per word is ``2 * pair_planes`` - identical density to
    the plane layout for every supported width (incl. 10/word at 3-bit).
    """
    return 16 // nbits


def pair_group(nbits: int) -> int:
    """Word rows per pair-layout tile: doubled when the plane count is
    odd (3-bit) so the expanded K tile ``2*group*planes`` stays a
    multiple of 128 (Mosaic block-shape requirement)."""
    return PAIR_GROUP * (2 if pair_planes(nbits) % 2 else 1)


def pack_indices(idx: jnp.ndarray, nbits: int,
                 layout: str = "linear") -> jnp.ndarray:
    """Pack (K, N) integer indices into (ceil(K/vpw), N) int32 words.

    Words carry raw bit patterns (int32 for Mosaic compatibility - TPU
    kernels lack uint32<->f32 casts); all unpacking uses logical shifts,
    so the sign bit is just another payload bit.

    layout 'linear': word g packs consecutive K rows g*vpw..(g+1)*vpw-1.
    layout 'plane':  plane-major tiles of PLANE_GROUP word rows (K padded
    to a multiple of PLANE_GROUP*vpw), the serving-kernel layout.
    layout 'pair':   bf16-pair tiles of PAIR_GROUP word rows; within a
    tile, word row p carries K row ``j*(2*PAIR_GROUP) + 2*p + h`` in bits
    ``[16*h + nbits*j, +nbits)`` (h = 16-bit half, j = bit plane). One
    shift+and+or then materializes TWO bf16 mantissa values per word, and
    Mosaic's int32->bf16 bitcast expands word row p to bf16 rows (2p,
    2p+1) - see ops/dequant_matmul._pair_kernel.
    """
    assert idx.ndim == 2
    assert layout in LAYOUTS
    k, n = idx.shape
    if layout == "int8":
        # 8-bit fast path: no sub-byte packing at all - indices are
        # stored as SIGNED int8 (idx - 128) so the kernel is one native
        # int8->bf16 convert + MXU dot (no shift/mask VPU work). K pads
        # to the sublane tile (32), N to the kernel's default block
        # (1024) AT PACK TIME, so the hot path never pads at runtime
        # (a runtime pad copied the whole (E, V) unembed every decode
        # step - 0.14 ms on OPT-1.3B, round-2 journal). Padding index
        # is 128 -> stored 0 -> contributes nothing to x @ V.
        k_pad = -(-k // 32) * 32
        n_pad = -(-n // 1024) * 1024
        idx = jnp.pad(idx, ((0, k_pad - k), (0, n_pad - n)),
                      constant_values=128)
        return (idx - 128).astype(jnp.int8)
    if layout == "pair":
        hp, pg = pair_planes(nbits), pair_group(nbits)
        bk = 2 * pg * hp
        k_pad = -(-k // bk) * bk
        idx = jnp.pad(idx.astype(jnp.uint32), ((0, k_pad - k), (0, 0)))
        # k_local = j*(2*pg) + 2*p + h  ->  dims (tiles, j, p, h)
        tiles = idx.reshape(k_pad // bk, hp, pg, 2, n)
        shifts = (16 * jnp.arange(2, dtype=jnp.uint32)[None, :]
                  + nbits * jnp.arange(hp, dtype=jnp.uint32)[:, None])
        words = jnp.sum(tiles << shifts[None, :, None, :, None],
                        axis=(1, 3), dtype=jnp.uint32)
        words = words.reshape(k_pad // bk * pg, n)
        return jax.lax.bitcast_convert_type(words, jnp.int32)
    if layout == "pair3":
        assert nbits == 3, "pair3 is the 3-bit-native layout"
        bk = PAIR3_TILE
        k_pad = -(-k // bk) * bk
        idx = jnp.pad(idx.astype(jnp.uint32), ((0, k_pad - k), (0, 0)))
        nt = k_pad // bk
        lo, hi = idx & 3, idx >> 2
        # low plane: 2-bit pair, pg=16, hp=8: k_local = j*32 + 2*p + h
        tl = lo.reshape(nt, bk, n).reshape(nt, 8, 16, 2, n)
        sl = (16 * jnp.arange(2, dtype=jnp.uint32)[None, :]
              + 2 * jnp.arange(8, dtype=jnp.uint32)[:, None])
        wlo = jnp.sum(tl << sl[None, :, None, :, None], axis=(1, 3),
                      dtype=jnp.uint32)                    # (nt, 16, n)
        # high plane: 1-bit pair, pg=8, hp=16: k_local = j*16 + 2*p + h
        th = hi.reshape(nt, bk, n).reshape(nt, 16, 8, 2, n)
        sh = (16 * jnp.arange(2, dtype=jnp.uint32)[None, :]
              + jnp.arange(16, dtype=jnp.uint32)[:, None])
        whi = jnp.sum(th << sh[None, :, None, :, None], axis=(1, 3),
                      dtype=jnp.uint32)                    # (nt, 8, n)
        words = jnp.concatenate([wlo, whi], axis=1)
        words = words.reshape(nt * PAIR3_WORDS, n)
        return jax.lax.bitcast_convert_type(words, jnp.int32)
    if layout == "pair3x":
        assert nbits == 3, "pair3x is the 3-bit mixed layout"
        assert k % PAIR3X_GROUP == 0, (
            f"pair3x requires K % {PAIR3X_GROUP} == 0 (got {k}); "
            "use layout='pair3' for other K")
        g = k // PAIR3X_GROUP
        idxg = idx.astype(jnp.uint32).reshape(g, 2, 256, n)
        a, b = idxg[:, 0], idxg[:, 1]
        # first 256 rows: 4-bit fields, standard pair tile (hp=4, pg=32):
        # k_local = j*64 + 2*p + h
        ta = a.reshape(g, 4, 32, 2, n)
        sa = (16 * jnp.arange(2, dtype=jnp.uint32)[None, :]
              + 4 * jnp.arange(4, dtype=jnp.uint32)[:, None])
        wa = jnp.sum(ta << sa[None, :, None, :, None], axis=(1, 3),
                     dtype=jnp.uint32)                   # (g, 32, n)
        # last 256 rows: one pair3 tile (see the pair3 branch above)
        lo, hi = b & 3, b >> 2
        tl = lo.reshape(g, 8, 16, 2, n)
        sl = (16 * jnp.arange(2, dtype=jnp.uint32)[None, :]
              + 2 * jnp.arange(8, dtype=jnp.uint32)[:, None])
        wlo = jnp.sum(tl << sl[None, :, None, :, None], axis=(1, 3),
                      dtype=jnp.uint32)                  # (g, 16, n)
        th = hi.reshape(g, 16, 8, 2, n)
        sh = (16 * jnp.arange(2, dtype=jnp.uint32)[None, :]
              + jnp.arange(16, dtype=jnp.uint32)[:, None])
        whi = jnp.sum(th << sh[None, :, None, :, None], axis=(1, 3),
                      dtype=jnp.uint32)                  # (g, 8, n)
        words = jnp.concatenate([wa, wlo, whi], axis=1)
        words = words.reshape(g * PAIR3X_WORDS, n)
        return jax.lax.bitcast_convert_type(words, jnp.int32)
    vpw = vals_per_word(nbits)
    if layout == "linear":
        k_pad = -(-k // vpw) * vpw
        idx = jnp.pad(idx.astype(jnp.uint32), ((0, k_pad - k), (0, 0)))
        grouped = idx.reshape(k_pad // vpw, vpw, n)
    else:
        bk = PLANE_GROUP * vpw
        k_pad = -(-k // bk) * bk
        idx = jnp.pad(idx.astype(jnp.uint32), ((0, k_pad - k), (0, 0)))
        # (tiles, vpw, PLANE_GROUP, n): axis 1 is the bit plane
        tiles = idx.reshape(k_pad // bk, vpw, PLANE_GROUP, n)
        grouped = tiles.transpose(0, 2, 1, 3).reshape(k_pad // vpw, vpw, n)
    shifts = (jnp.arange(vpw, dtype=jnp.uint32) * nbits)[None, :, None]
    words = jnp.sum(grouped << shifts, axis=1, dtype=jnp.uint32)
    return jax.lax.bitcast_convert_type(words, jnp.int32)


def unpack_indices(packed: jnp.ndarray, nbits: int, k: int,
                   layout: str = "linear") -> jnp.ndarray:
    """Inverse of :func:`pack_indices`; returns (k, N) int32 indices."""
    assert packed.ndim == 2
    assert layout in LAYOUTS
    kw, n = packed.shape
    if layout == "int8":
        return packed[:k].astype(jnp.int32) + 128
    mask = jnp.int32((1 << nbits) - 1)
    if layout == "pair3":
        nt = kw // PAIR3_WORDS
        tiles = packed.reshape(nt, PAIR3_WORDS, n)
        wlo = tiles[:, :PAIR3_LO_WORDS]                    # (nt, 16, n)
        whi = tiles[:, PAIR3_LO_WORDS:]                    # (nt, 8, n)
        sl = (16 * jnp.arange(2, dtype=jnp.int32)[None, :]
              + 2 * jnp.arange(8, dtype=jnp.int32)[:, None])
        lo = jax.lax.shift_right_logical(
            wlo[:, None, None], sl[None, :, :, None, None]) & 3
        lo = lo.transpose(0, 1, 3, 2, 4).reshape(nt * PAIR3_TILE, n)
        sh = (16 * jnp.arange(2, dtype=jnp.int32)[None, :]
              + jnp.arange(16, dtype=jnp.int32)[:, None])
        hi = jax.lax.shift_right_logical(
            whi[:, None, None], sh[None, :, :, None, None]) & 1
        hi = hi.transpose(0, 1, 3, 2, 4).reshape(nt * PAIR3_TILE, n)
        return (lo + 4 * hi)[:k]
    if layout == "pair3x":
        g = kw // PAIR3X_WORDS
        tiles = packed.reshape(g, PAIR3X_WORDS, n)
        wa = tiles[:, :PAIR3X_P4_WORDS]                    # (g, 32, n)
        wlo = tiles[:, PAIR3X_P4_WORDS:PAIR3X_P4_WORDS + 16]
        whi = tiles[:, PAIR3X_P4_WORDS + 16:]
        sa = (16 * jnp.arange(2, dtype=jnp.int32)[None, :]
              + 4 * jnp.arange(4, dtype=jnp.int32)[:, None])
        aa = jax.lax.shift_right_logical(
            wa[:, None, None], sa[None, :, :, None, None]) & 15
        aa = aa.transpose(0, 1, 3, 2, 4).reshape(g, 256, n)
        sl = (16 * jnp.arange(2, dtype=jnp.int32)[None, :]
              + 2 * jnp.arange(8, dtype=jnp.int32)[:, None])
        lo = jax.lax.shift_right_logical(
            wlo[:, None, None], sl[None, :, :, None, None]) & 3
        lo = lo.transpose(0, 1, 3, 2, 4).reshape(g, 256, n)
        sh = (16 * jnp.arange(2, dtype=jnp.int32)[None, :]
              + jnp.arange(16, dtype=jnp.int32)[:, None])
        hi = jax.lax.shift_right_logical(
            whi[:, None, None], sh[None, :, :, None, None]) & 1
        hi = hi.transpose(0, 1, 3, 2, 4).reshape(g, 256, n)
        full = jnp.concatenate([aa, lo + 4 * hi], axis=1)
        return full.reshape(g * PAIR3X_GROUP, n)[:k]
    if layout == "pair":
        hp, pg = pair_planes(nbits), pair_group(nbits)
        shifts = (16 * jnp.arange(2, dtype=jnp.int32)[None, :]
                  + nbits * jnp.arange(hp, dtype=jnp.int32)[:, None])
        # (kw, hp, 2, n) -> tiles of pair_group word rows with
        # k_local = j*(2*pg) + 2*p + h
        sub = jax.lax.shift_right_logical(
            packed[:, None, None, :], shifts[None, :, :, None]) & mask
        tiles = sub.reshape(kw // pg, pg, hp, 2, n)
        full = tiles.transpose(0, 2, 1, 3, 4).reshape(kw * 2 * hp, n)
        return full[:k]
    vpw = vals_per_word(nbits)
    shifts = (jnp.arange(vpw, dtype=jnp.int32) * nbits)[None, :, None]
    sub = jax.lax.shift_right_logical(packed[:, None, :], shifts) & mask
    if layout == "linear":
        full = sub.reshape(kw * vpw, n)
    else:
        # (kw, vpw, n) -> tiles of PLANE_GROUP word rows; plane j of tile t
        # holds K rows t*bk + j*PLANE_GROUP + g
        tiles = sub.reshape(kw // PLANE_GROUP, PLANE_GROUP, vpw, n)
        full = tiles.transpose(0, 2, 1, 3).reshape(kw * vpw, n)
    return full[:k]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedLinear:
    """A packed weight-only-quantized linear layer: y = x @ deq(W) + b.

    ``deq(W)[k, n] = lut[idx[k, n]] * scale[n]`` - per-output-channel scale
    over a shared codebook LUT, matching the quantizer's per-channel
    scaling contract (Q = cb(W/s) * s, ref scaling.py:58-81).
    """

    packed: jnp.ndarray          # (ceil(K/vpw), N) int32 bit patterns
    scale: jnp.ndarray           # (N,) f32
    lut: jnp.ndarray             # (codebook_size,) f32
    bias: Optional[jnp.ndarray]  # (N,) f32 or None
    in_features: int = dataclasses.field(metadata=dict(static=True))
    out_features: int = dataclasses.field(metadata=dict(static=True))
    nbits: int = dataclasses.field(metadata=dict(static=True))
    # (step, zero) for uniform codebooks - enables the closed-form affine
    # dequant in kernels; None for table codebooks (NF4, Lloyd-Max).
    affine: Optional[Tuple[float, float]] = dataclasses.field(
        default=None, metadata=dict(static=True))
    # 'linear' (interchange) or 'plane' (plane-major serving layout).
    layout: str = dataclasses.field(
        default="linear", metadata=dict(static=True))
    # >1: the K axis is split into this many contiguous chunks, each packed
    # INDEPENDENTLY (own tile padding) and concatenated along word rows -
    # the tensor-parallel row-sharding format (see split_packed_k). Kernels
    # consume k_splits == 1 matrices; shard_map localizes a split one with
    # :func:`localize_packed_shard`.
    k_splits: int = dataclasses.field(default=1, metadata=dict(static=True))
    # Zero-copy layer selection for scan-over-layers decode: when set,
    # ``packed`` is the FULL (L, kw, N) stacked tensor and ``layer_sel`` a
    # traced scalar index. The Pallas kernels address the layer block
    # directly via scalar prefetch (like the (L, ...) KV cache) - without
    # this, lax.scan's per-iteration xs slice copies the ENTIRE packed
    # model HBM->HBM every decode step (measured 0.9 ms/step on OPT-1.3B,
    # round-2 journal).
    layer_sel: Optional[jnp.ndarray] = None

    @property
    def vpw(self) -> int:
        return vals_per_word(self.nbits)

    def dequantize(self) -> jnp.ndarray:
        """Dense f32 (K, N) weights (reference semantics of storing the
        dequantized matrix, for validation and fallback paths)."""
        if self.layer_sel is not None:
            packed = jax.lax.dynamic_index_in_dim(
                self.packed, self.layer_sel, axis=0, keepdims=False)
            return dataclasses.replace(
                self, packed=packed, layer_sel=None).dequantize()
        if self.k_splits > 1:
            kw = self.packed.shape[0] // self.k_splits
            k_local = self.in_features // self.k_splits
            parts = [unpack_indices(
                self.packed[i * kw:(i + 1) * kw], self.nbits, k_local,
                layout=self.layout) for i in range(self.k_splits)]
            idx = jnp.concatenate(parts, axis=0)
        else:
            idx = unpack_indices(self.packed, self.nbits, self.in_features,
                                 layout=self.layout)
        idx = idx[:, :self.out_features]  # int8 layout pads N at pack time
        return jnp.take(self.lut, idx) * self.scale[None, :]

    def memory_bytes(self) -> int:
        return int(self.packed.size * self.packed.dtype.itemsize
                   + self.scale.size * 4 + self.lut.size * 4
                   + (0 if self.bias is None else self.bias.size * 4))


def split_packed_k(p: PackedLinear, n: int) -> PackedLinear:
    """Re-pack for tensor-parallel ROW sharding: split K into ``n``
    contiguous chunks, pack each independently (each gets its own tile
    padding, so any layout - incl. 10-per-word 3-bit - splits cleanly),
    concatenate along word rows. Sharding the result's word-row axis into
    ``n`` equal parts hands every device a well-formed (K/n, N) packed
    matrix; the partial products then ``psum`` exactly because the
    per-shard affine fold ``b*sum(x_shard)`` and the per-channel scale are
    both linear in the shard contributions (VERDICT.md round-1 item 2).
    """
    if n == 1:
        return p
    assert p.k_splits == 1, "already split"
    assert p.in_features % n == 0, (
        f"K={p.in_features} not divisible by {n} shards")
    k_local = p.in_features // n
    idx = unpack_indices(p.packed, p.nbits, p.in_features, layout=p.layout)
    layout = p.layout
    if layout == "pair3x" and k_local % PAIR3X_GROUP:
        # Mixed groups need K_local % 512 == 0; shards that slice finer
        # re-pack in the memory-optimal pair3 layout instead.
        layout = "pair3"
    chunks = [pack_indices(idx[i * k_local:(i + 1) * k_local], p.nbits,
                           layout=layout) for i in range(n)]
    return dataclasses.replace(
        p, packed=jnp.concatenate(chunks, axis=0), k_splits=n,
        layout=layout)


def localize_packed_shard(p: PackedLinear, n: int,
                          row_parallel: bool) -> PackedLinear:
    """Fix the static metadata of a PackedLinear INSIDE a shard_map body
    (shard_map delivers local array shards but re-attaches the global
    static fields). Row-parallel shards of a :func:`split_packed_k` matrix
    become ordinary (K/n, N) packed linears; column-parallel shards keep K
    and get N/n outputs."""
    if n == 1:
        return p
    if row_parallel:
        assert p.k_splits == n, (
            f"row-parallel PackedLinear must be split_packed_k({n}) first "
            f"(k_splits={p.k_splits})")
        return dataclasses.replace(
            p, in_features=p.in_features // n, k_splits=1)
    assert p.out_features % n == 0
    return dataclasses.replace(p, out_features=p.out_features // n)


def concat_packed(pls) -> PackedLinear:
    """Concatenate PackedLinears along the output (N) axis.

    Serving-time fusion (e.g. q|k|v -> one matmul): per-output-channel
    scales make the concatenation exact. Requires identical in_features,
    nbits, layout and LUT.
    """
    first = pls[0]
    for p in pls[1:]:
        assert (p.in_features, p.nbits, p.layout) == (
            first.in_features, first.nbits, first.layout)
        assert np.allclose(np.asarray(p.lut), np.asarray(first.lut))
    packed = jnp.concatenate([p.packed for p in pls], axis=1)
    scale = jnp.concatenate([p.scale for p in pls])
    if all(p.bias is None for p in pls):
        bias = None
    else:
        bias = jnp.concatenate([
            p.bias if p.bias is not None
            else jnp.zeros((p.out_features,), jnp.float32) for p in pls])
    return PackedLinear(
        packed=packed, scale=scale, lut=first.lut, bias=bias,
        in_features=first.in_features,
        out_features=sum(p.out_features for p in pls),
        nbits=first.nbits, affine=first.affine, layout=first.layout)


def pack_quantized(
    weight_q: jnp.ndarray,
    scale: jnp.ndarray,
    codebook,
    bias: Optional[jnp.ndarray] = None,
    layout: str = "auto",
) -> PackedLinear:
    """Pack a quantizer output into serving format.

    ``weight_q`` is the dequantized (out, in) matrix produced by the
    pipeline (values lie on the per-channel scaled codebook grid);
    ``scale`` the per-output-channel scale; ``codebook`` the codebook it
    was quantized against. layout 'auto' picks the fastest kernel layout
    for the codebook: bf16-'pair' for affine codebooks that fit the bf16
    mantissa (uniform, <=7 bits), 'plane' otherwise (LUT path).
    """
    out_f, in_f = weight_q.shape
    # Back to grid indices: divide the per-channel scale out, then index.
    normalized = weight_q / scale[:, None]
    idx = codebook.quantize_index(normalized).astype(jnp.int32)
    lut = jnp.asarray(codebook.values, jnp.float32)
    nbits = bits_for_codebook(int(lut.shape[0]))
    if layout == "auto":
        aff = affine_from_lut(lut) is not None
        # 3-bit: pair3x (mixed; serves at int4 speed, 0.875x int4 bytes)
        # when K allows, else pair3 (memory-optimal 0.75x, ~-2.5%).
        layout = ("pair3x" if aff and nbits == 3
                  and in_f % PAIR3X_GROUP == 0
                  else "pair3" if aff and nbits == 3
                  else "pair" if aff and nbits <= 7
                  else "int8" if aff and nbits == 8 else "plane")
    packed = pack_indices(idx.T, nbits, layout=layout)  # serving layout (K, N)
    scale = jnp.asarray(scale, jnp.float32)
    if bias is not None:
        bias = jnp.asarray(bias, jnp.float32)
    if layout == "int8" and packed.shape[1] != out_f:
        # The int8 layout pads N at PACK time; pad scale/bias with it and
        # make the container uniformly "wide" (out_features = padded N) so
        # every per-channel vector shards/streams identically - consumers
        # (forward/_unembed, tp logits gather) slice to the true vocab.
        # Padded columns have scale 0: their outputs are exactly bias (0).
        n_pad = packed.shape[1]
        scale = jnp.pad(scale, (0, n_pad - out_f))
        if bias is not None:
            bias = jnp.pad(bias, (0, n_pad - out_f))
        out_f = n_pad
    return PackedLinear(
        packed=packed,
        scale=scale,
        lut=lut,
        bias=bias,
        in_features=in_f,
        out_features=out_f,
        nbits=nbits,
        affine=affine_from_lut(lut),
        layout=layout,
    )
