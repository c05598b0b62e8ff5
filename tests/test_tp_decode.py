"""shard_map tensor-parallel decode == single-device decode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sleekit_tpu.models.transformer import (
    decode_step, init_kv_cache, init_params, prefill, stack_layer_params)
from sleekit_tpu.models.zoo import tiny_test
from sleekit_tpu.parallel.mesh import make_mesh
from sleekit_tpu.parallel.tp_decode import tp_decode_step


@pytest.mark.parametrize("family_kw", [
    dict(),
    dict(activation="gelu", positional="alibi"),          # BLOOM-like
    dict(activation="silu_glu", norm="rmsnorm", positional="rope",
         n_kv_heads=2),                                   # Llama/GQA-like
    dict(activation="silu_glu", norm="rmsnorm", positional="rope",
         n_kv_heads=2, qkv_bias=True),                    # Qwen2-like
])
@pytest.mark.parametrize("scan_layers", [False, True])
@pytest.mark.parametrize("cache_dtype", [jnp.float32])
def test_tp_decode_matches_single(family_kw, scan_layers, cache_dtype):
    cfg = tiny_test(d_model=64, n_heads=4, n_layers=2, d_ff=128,
                    vocab_size=97, scan_layers=scan_layers, **family_kw)
    params = init_params(cfg, jax.random.PRNGKey(0))
    if scan_layers:
        params = stack_layer_params(params)
    batch = 4
    tokens = jax.random.randint(jax.random.PRNGKey(1), (batch, 6), 0, 97)

    cache = init_kv_cache(cfg, batch, 16, cache_dtype)
    logits0, cache = prefill(cfg, params, tokens, cache)
    nxt = jnp.argmax(logits0[:, -1:], -1).astype(jnp.int32)

    ref_logits, ref_cache = decode_step(cfg, params, nxt, cache,
                                        jnp.int32(6))

    mesh = make_mesh(data=2, model=2)
    with mesh:
        tp_logits, tp_cache = tp_decode_step(cfg, params, nxt, cache,
                                             jnp.int32(6), mesh)
    np.testing.assert_allclose(np.asarray(tp_logits), np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)
    ref_k = (ref_cache["k"] if scan_layers else ref_cache[0]["k"])
    tp_k = (tp_cache["k"] if scan_layers else tp_cache[0]["k"])
    np.testing.assert_allclose(np.asarray(tp_k), np.asarray(ref_k),
                               rtol=2e-4, atol=2e-4)


def test_tp_decode_int8_cache():
    cfg = tiny_test(d_model=64, n_heads=4, n_layers=2, d_ff=128,
                    vocab_size=97, scan_layers=True)
    params = stack_layer_params(init_params(cfg, jax.random.PRNGKey(0)))
    batch = 4
    tokens = jax.random.randint(jax.random.PRNGKey(1), (batch, 6), 0, 97)
    cache = init_kv_cache(cfg, batch, 16, jnp.int8)
    logits0, cache = prefill(cfg, params, tokens, cache)
    nxt = jnp.argmax(logits0[:, -1:], -1).astype(jnp.int32)
    ref_logits, _ = decode_step(cfg, params, nxt, cache, jnp.int32(6))
    mesh = make_mesh(data=2, model=2)
    with mesh:
        tp_logits, _ = tp_decode_step(cfg, params, nxt, cache,
                                      jnp.int32(6), mesh)
    np.testing.assert_allclose(np.asarray(tp_logits), np.asarray(ref_logits),
                               rtol=2e-3, atol=2e-3)
