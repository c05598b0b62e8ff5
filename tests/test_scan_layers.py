"""scan_layers mode (stacked layer params + lax.scan over the block)
must be numerically identical to the unrolled python loop, for both dense
and packed params, across forward / prefill / decode."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sleekit_tpu.models.fake_quant import random_packed_params
from sleekit_tpu.models.transformer import (
    decode_step, forward, init_kv_cache, init_params, prefill,
    stack_layer_params, unstack_layer_params)
from sleekit_tpu.models.zoo import tiny_test


@pytest.mark.parametrize("family_kw", [
    dict(),
    dict(positional="alibi", activation="gelu", embed_ln=True),
    dict(positional="rope", activation="silu_glu", norm="rmsnorm",
         n_kv_heads=2, tie_embeddings=False),
])
def test_scan_matches_loop_dense(family_kw):
    cfg = tiny_test(n_layers=3, **family_kw)
    cfg_s = dataclasses.replace(cfg, scan_layers=True)
    params = init_params(cfg, jax.random.PRNGKey(0))
    sparams = stack_layer_params(params)
    tokens = jnp.asarray(np.random.RandomState(0).randint(
        0, cfg.vocab_size, (2, 9)).astype(np.int32))

    a = np.asarray(forward(cfg, params, tokens))
    b = np.asarray(forward(cfg_s, sparams, tokens))
    assert np.allclose(a, b, atol=1e-5)

    cache_l = init_kv_cache(cfg, 2, 12)
    cache_s = init_kv_cache(cfg_s, 2, 12)
    la, cache_l = prefill(cfg, params, tokens[:, :5], cache_l)
    lb, cache_s = prefill(cfg_s, sparams, tokens[:, :5], cache_s)
    assert np.allclose(np.asarray(la), np.asarray(lb), atol=1e-5)
    for i in range(5, 9):
        da, cache_l = decode_step(cfg, params, tokens[:, i:i + 1],
                                  cache_l, jnp.int32(i))
        db, cache_s = decode_step(cfg_s, sparams, tokens[:, i:i + 1],
                                  cache_s, jnp.int32(i))
        assert np.allclose(np.asarray(da), np.asarray(db), atol=1e-5)


def test_scan_matches_loop_packed():
    cfg = tiny_test(n_layers=3)
    cfg_s = dataclasses.replace(cfg, scan_layers=True)
    params, _ = random_packed_params(cfg, jax.random.PRNGKey(1))
    sparams = stack_layer_params(params)
    tokens = jnp.asarray(np.random.RandomState(1).randint(
        0, cfg.vocab_size, (2, 7)).astype(np.int32))
    a = np.asarray(forward(cfg, params, tokens))
    b = np.asarray(forward(cfg_s, sparams, tokens))
    assert np.allclose(a, b, atol=1e-5)


def test_stack_unstack_roundtrip():
    cfg = tiny_test(n_layers=3)
    params = init_params(cfg, jax.random.PRNGKey(2))
    rt = unstack_layer_params(stack_layer_params(params), cfg.n_layers)
    for a, b in zip(jax.tree_util.tree_leaves(params["layers"]),
                    jax.tree_util.tree_leaves(rt["layers"])):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_scan_calibration_rejected():
    cfg = tiny_test(n_layers=2, scan_layers=True)
    params = stack_layer_params(init_params(
        dataclasses.replace(cfg, scan_layers=False), jax.random.PRNGKey(3)))
    tokens = jnp.zeros((1, 4), jnp.int32)
    with pytest.raises(AssertionError):
        forward(cfg, params, tokens, stats={})


def test_engine_scan_mode_matches_loop():
    from sleekit_tpu.serve.engine import Engine, Request

    cfg = tiny_test(n_layers=3, scan_layers=True)
    params, _ = random_packed_params(cfg, jax.random.PRNGKey(5))

    def mk_reqs():
        rng = np.random.RandomState(5)
        return [Request(prompt=rng.randint(0, 256, (5,)).astype(np.int32),
                        max_new_tokens=4),
                Request(prompt=rng.randint(0, 256, (11,)).astype(np.int32),
                        max_new_tokens=6)]

    eng_s = Engine(cfg, params, max_slots=2, max_seq_len=64)
    comps_s = eng_s.run(mk_reqs())
    cfg_l = dataclasses.replace(cfg, scan_layers=False)
    eng_l = Engine(cfg_l, unstack_layer_params(params, cfg.n_layers),
                   max_slots=2, max_seq_len=64)
    comps_l = eng_l.run(mk_reqs())
    for a, b in zip(comps_s, comps_l):
        assert np.array_equal(a.tokens, b.tokens)
