"""Fast fake-quantized model construction for benches and compile checks.

Replaces every linear with a :class:`PackedLinear` holding random codebook
indices + unit-ish scales - the serving-side memory layout and kernels are
exactly those of a really-quantized model, without paying for the GPTQ
solve (which benches separately).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sleekit_tpu.codebooks import UniformCodebook
from sleekit_tpu.models.transformer import (
    TransformerConfig,
    get_linear_param,
    init_params,
    layer_names,
    set_linear_param,
)
from sleekit_tpu.ops.pack import (PackedLinear, affine_from_lut, bits_for_codebook, pack_indices)


def random_packed_linear(key, in_features: int, out_features: int,
                         codebook, layout: str = "plane") -> PackedLinear:
    nbits = bits_for_codebook(len(codebook))
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (in_features, out_features), 0, len(codebook))
    packed = pack_indices(idx, nbits, layout=layout)
    scale = 0.02 * (1.0 + 0.1 * jax.random.uniform(k2, (out_features,)))
    lut = jnp.asarray(codebook.values, jnp.float32)
    return PackedLinear(
        packed=packed, scale=scale.astype(jnp.float32),
        lut=lut, bias=None,
        in_features=in_features, out_features=out_features, nbits=nbits,
        affine=affine_from_lut(lut), layout=layout)


def _fast_packed_linear(rng: np.ndarray, in_features: int,
                        out_features: int, codebook,
                        bias: bool, layout: str = "plane") -> PackedLinear:
    """Random PackedLinear straight from random bits (no dense kernel,
    no pack step): uniform random words ARE uniform random indices (every
    payload bit uniform - true in any layout for power-of-two widths).
    Index count is rounded up to the layout's K tile."""
    from sleekit_tpu.ops.pack import (PAIR3_TILE, PAIR3_WORDS, PAIR3X_GROUP,
                                      PAIR3X_P4_WORDS, PAIR3X_WORDS,
                                      PLANE_GROUP, pair_group, pair_planes,
                                      vals_per_word)

    nbits = bits_for_codebook(len(codebook))
    vpw = vals_per_word(nbits)
    if layout == "pair3x" and in_features % PAIR3X_GROUP:
        layout = "pair3"  # mixed groups need K % 512 == 0
    if layout == "pair3x":
        assert nbits == 3
        n_groups = in_features // PAIR3X_GROUP
        kw = n_groups * PAIR3X_WORDS
        vpw = -(-in_features // kw)  # fallback row bound only
    elif layout == "pair3":
        # Every payload bit is used (16 = 8x2-bit = 16x1-bit per half),
        # so uniform random words ARE uniform random 3-bit indices.
        assert nbits == 3
        n_tiles = -(-in_features // PAIR3_TILE)
        kw = n_tiles * PAIR3_WORDS
        vpw = -(-n_tiles * PAIR3_TILE // kw)  # fallback row bound only
    elif layout == "pair":
        hp, pg = pair_planes(nbits), pair_group(nbits)
        bk = 2 * pg * hp
        kw = -(-in_features // bk) * pg
        if 2 * hp != vpw:
            # 3-bit pair words leave bits 15/31 unused; random bits there
            # are harmless (masked out by unpacking) but keep densities
            # equal for memory accounting by packing for real below.
            vpw = 2 * hp
    else:
        bk = PLANE_GROUP * vpw
        kw = -(-in_features // bk) * bk // vpw
    words = rng.randint(-2 ** 31, 2 ** 31, (kw, out_features),
                        dtype=np.int64).astype(np.int32)
    if layout == "pair3x":
        # The 4-bit-field section stores 3-bit indices: the top bit of
        # every field must be zero for in-range (0..7) indices.
        w3 = words.reshape(-1, PAIR3X_WORDS, out_features)
        w3[:, :PAIR3X_P4_WORDS] &= 0x77777777
        words = w3.reshape(kw, out_features)
    if len(codebook) != 2 ** nbits:
        # Random bits would produce out-of-range indices; fall back to a
        # real pack of clipped indices (non-power-of-two codebooks).
        from sleekit_tpu.native import pack_indices_np
        idx = rng.randint(0, len(codebook),
                          (kw * vpw, out_features)).astype(np.uint8)
        words = pack_indices_np(idx, nbits)
        # re-tile to the plane layout
        words = np.asarray(pack_indices(
            jnp.asarray(idx[:in_features].astype(np.int32)), nbits,
            layout=layout))
    scale = (0.02 * (1.0 + 0.1 * rng.rand(out_features))).astype(np.float32)
    lut = jnp.asarray(codebook.values, jnp.float32)
    return PackedLinear(
        packed=jnp.asarray(words), scale=jnp.asarray(scale),
        lut=lut,
        bias=jnp.zeros((out_features,), jnp.float32) if bias else None,
        in_features=in_features, out_features=out_features, nbits=nbits,
        affine=affine_from_lut(lut), layout=layout)


def random_packed_params(cfg: TransformerConfig, key,
                         codebook=None, fuse_qkv: bool = False,
                         layout: str = "plane"):
    """Dense random params with every linear swapped for a random packed
    one. Returns (params, codebook). ``fuse_qkv`` applies the serving-time
    q|k|v (and gate|up) fusion before stacking."""
    codebook = codebook or UniformCodebook(16, -1.0, 1.0)
    # Build on the host CPU: materializing the DENSE model on a TPU only
    # to throw its kernels away would peak at full-model bf16 HBM (OOM
    # for 8B-class models on one v5e chip). The quantizable linears are
    # constructed as PackedLinears directly (numpy random bits) - the
    # dense kernels never exist anywhere. Only the packed result ships.
    # local_devices, not devices: in multi-process runs jax.devices() is
    # the GLOBAL list and pinning host-side work to another process's
    # device makes every produced array non-addressable.
    cpu = jax.local_devices(backend="cpu")[0]
    nprng = np.random.RandomState(
        int(jax.random.randint(key, (), 0, 2 ** 31 - 1)))

    def factory(k, d_in, d_out, dtype, bias=True):
        # init_params already resolves per-linear bias policy (incl.
        # qkv_bias models like Qwen2); honor it as passed.
        return _fast_packed_linear(nprng, d_in, d_out, codebook,
                                   bias=bias, layout=layout)

    with jax.default_device(cpu):
        params = init_params(cfg, key, linear_factory=factory)
        if fuse_qkv:
            from sleekit_tpu.models.transformer import fuse_qkv_params
            params = fuse_qkv_params(cfg, params)
        if cfg.scan_layers:
            from sleekit_tpu.models.transformer import stack_layer_params
            params = stack_layer_params(params)
    if jax.default_backend() != "cpu":
        # Explicit target: device_put(tree) with device=None would leave
        # the CPU-committed arrays where they are.
        params = jax.device_put(params, jax.local_devices()[0])
    return params, codebook
