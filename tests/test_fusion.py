"""Serving-time projection fusion (q|k|v, gate|up) is exact."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sleekit_tpu.models.fake_quant import random_packed_params
from sleekit_tpu.models.transformer import (
    forward, fuse_qkv_params, init_params)
from sleekit_tpu.models.zoo import tiny_test


@pytest.mark.parametrize("family_kw", [
    dict(),                                                 # OPT-like
    dict(activation="silu_glu", norm="rmsnorm", positional="rope"),
])
def test_fused_dense_forward_matches(family_kw):
    cfg = tiny_test(d_model=32, n_heads=2, n_layers=2, d_ff=48,
                    vocab_size=64, **family_kw)
    params = init_params(cfg, jax.random.PRNGKey(0))
    fused = fuse_qkv_params(cfg, params)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 7), 0, 64)
    np.testing.assert_allclose(
        np.asarray(forward(cfg, params, tokens)),
        np.asarray(forward(cfg, fused, tokens)), rtol=1e-5, atol=1e-5)


def test_fused_packed_forward_matches():
    cfg = tiny_test(d_model=64, n_heads=2, n_layers=2, d_ff=96,
                    vocab_size=64)
    params, _ = random_packed_params(cfg, jax.random.PRNGKey(0))
    fused = fuse_qkv_params(cfg, params)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 7), 0, 64)
    np.testing.assert_allclose(
        np.asarray(forward(cfg, params, tokens)),
        np.asarray(forward(cfg, fused, tokens)), rtol=1e-4, atol=1e-4)


def test_fused_decode_matches_forward():
    from sleekit_tpu.models.eval import generate_fused
    cfg = tiny_test(d_model=32, n_heads=2, n_layers=2, d_ff=48,
                    vocab_size=64)
    params = init_params(cfg, jax.random.PRNGKey(0))
    fused = fuse_qkv_params(cfg, params)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 5), 0, 64)
    out_ref = generate_fused(cfg, params, prompt, 6)
    out_fused = generate_fused(cfg, fused, prompt, 6)
    assert np.array_equal(np.asarray(out_ref), np.asarray(out_fused))


def test_packed_lm_head_matches_dense():
    from sleekit_tpu.models.quantize import pack_lm_head
    cfg = tiny_test(d_model=32, n_heads=2, n_layers=1, d_ff=48,
                    vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0))
    packed = pack_lm_head(cfg, params, nbits=8)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 9), 0, 128)
    ref = np.asarray(forward(cfg, params, tokens))
    got = np.asarray(forward(cfg, packed, tokens))
    # int8 RTN head: logits nearly identical, argmax fully preserved.
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.02
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.99


def test_padded_vocab_sliced_everywhere():
    """Regression for the int8-head N-padding contract (commits 093a721,
    e3eb05d both fixed missed slices): with a vocab far from the 1024
    pack block, every logits-producing entry point must return exactly
    vocab_size columns, and the pad columns must not shift the argmax."""
    from sleekit_tpu.models.eval import generate_fused
    from sleekit_tpu.models.quantize import pack_lm_head
    from sleekit_tpu.models.transformer import decode_step, init_kv_cache, prefill

    cfg = tiny_test(d_model=32, n_heads=2, n_layers=1, d_ff=48,
                    vocab_size=100)
    params = init_params(cfg, jax.random.PRNGKey(2))
    packed = pack_lm_head(cfg, params, nbits=8)
    assert packed["lm_head"].out_features == 1024  # contract precondition
    tokens = jax.random.randint(jax.random.PRNGKey(3), (2, 5), 0, 100)
    logits = forward(cfg, packed, tokens)
    assert logits.shape[-1] == cfg.vocab_size
    cache = init_kv_cache(cfg, 2, 16)
    pl, cache = prefill(cfg, packed, tokens, cache)
    assert pl.shape[-1] == cfg.vocab_size
    dl, _ = decode_step(cfg, packed, tokens[:, -1:], cache, jnp.int32(5))
    assert dl.shape[-1] == cfg.vocab_size
    out = np.asarray(generate_fused(cfg, packed, tokens, 4))
    assert out.max() < cfg.vocab_size  # sampler never picks a pad column


@pytest.mark.parametrize("nbits", [3, 4])
@pytest.mark.parametrize("pre,use_res", [
    (None, True), ("layernorm", False), ("layernorm", True),
    ("rmsnorm", False), ("relu", True), ("gelu", False),
    ("silu_glu", True)])
def test_glue_fused_pair_kernel_matches_composed(nbits, pre, use_res):
    """Decode-glue fusion (pre-norm / pre-activation / residual inside
    the pair kernel) matches the composed XLA oracle, incl. K sizes that
    pad the pair tile (masked layernorm)."""
    from sleekit_tpu.ops.dequant_matmul import fused_quantized_matmul
    from sleekit_tpu.ops.pack import affine_from_lut, pack_indices
    from sleekit_tpu.ops.pack import PackedLinear

    rng = np.random.RandomState(11 + nbits)
    K, N, M = 512, 192, 4
    lut = np.linspace(-1.0, 0.95, 2 ** nbits).astype(np.float32)
    idx = jnp.asarray(rng.randint(0, 2 ** nbits, (K, N)), jnp.int32)
    w = PackedLinear(
        packed=pack_indices(idx, nbits, layout="pair"),
        scale=jnp.asarray(rng.rand(N).astype(np.float32) + 0.5),
        lut=jnp.asarray(lut),
        bias=jnp.asarray(rng.randn(N).astype(np.float32)),
        in_features=K, out_features=N, nbits=nbits,
        affine=affine_from_lut(lut), layout="pair")
    xk = 2 * K if pre == "silu_glu" else K
    x = jnp.asarray(rng.randn(M, xk).astype(np.float32) * 2.0
                    ).astype(jnp.bfloat16)
    kw = dict(
        ln_scale=(jnp.asarray(rng.rand(K).astype(np.float32) + 0.5)
                  if pre in ("layernorm", "rmsnorm") else None),
        ln_bias=(jnp.asarray(0.1 * rng.randn(K).astype(np.float32))
                 if pre == "layernorm" else None),
        residual=(jnp.asarray(rng.randn(M, N).astype(np.float32)
                              ).astype(jnp.bfloat16) if use_res else None),
        pre=pre)
    oracle = np.asarray(
        fused_quantized_matmul(x, w, use_pallas=False, **kw), np.float32)
    got = np.asarray(
        fused_quantized_matmul(x, w, interpret=True, **kw), np.float32)
    err = np.abs(got - oracle).max() / (np.abs(oracle).max() + 1e-9)
    assert err < 2e-2, (nbits, pre, use_res, err)


def test_stacked_layer_sel_pair_kernel_matches_per_layer():
    """Zero-copy scan decode: a (L, kw, N) stacked pair PackedLinear with
    ``layer_sel`` addressed in-kernel (scalar prefetch) matches slicing
    the layer out, for every layer - incl. the glue-fusion epilogue."""
    import dataclasses as dc

    from sleekit_tpu.ops.dequant_matmul import fused_quantized_matmul
    from sleekit_tpu.ops.pack import (PackedLinear, affine_from_lut,
                                      pack_indices)

    rng = np.random.RandomState(3)
    L, K, N, M = 3, 256, 128, 4
    nbits = 4
    lut = np.linspace(-1.0, 0.9, 2 ** nbits).astype(np.float32)
    packed = jnp.stack([
        pack_indices(jnp.asarray(rng.randint(0, 2 ** nbits, (K, N)),
                                 jnp.int32), nbits, layout="pair")
        for _ in range(L)])
    scales = jnp.asarray(rng.rand(L, N).astype(np.float32) + 0.5)
    x = jnp.asarray(rng.randn(M, K).astype(np.float32)).astype(jnp.bfloat16)
    res = jnp.asarray(rng.randn(M, N).astype(np.float32)).astype(jnp.bfloat16)
    ln_s = jnp.asarray(rng.rand(K).astype(np.float32) + 0.5)
    for li in range(L):
        base = PackedLinear(
            packed=packed, scale=scales[li], lut=jnp.asarray(lut),
            bias=None, in_features=K, out_features=N, nbits=nbits,
            affine=affine_from_lut(lut), layout="pair",
            layer_sel=jnp.int32(li))
        sliced = dc.replace(base, packed=packed[li], layer_sel=None)
        got = np.asarray(fused_quantized_matmul(
            x, base, pre="layernorm", ln_scale=ln_s, residual=res,
            interpret=True), np.float32)
        want = np.asarray(fused_quantized_matmul(
            x, sliced, pre="layernorm", ln_scale=ln_s, residual=res,
            interpret=True), np.float32)
        np.testing.assert_allclose(got, want, rtol=0, atol=0)
        oracle = np.asarray(fused_quantized_matmul(
            x, sliced, pre="layernorm", ln_scale=ln_s, residual=res,
            use_pallas=False), np.float32)
        err = np.abs(got - oracle).max() / (np.abs(oracle).max() + 1e-9)
        assert err < 2e-2, (li, err)
