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
