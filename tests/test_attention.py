"""Fused decode-attention kernels vs the XLA oracle (interpret mode).

Mirrors the reference's oracle-vs-optimized pattern (ref
tests/test_obq.py:57-70) for the all-new serving kernels."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sleekit_tpu.ops.attention import (
    decode_attention,
    flash_decode_pallas,
    flash_decode_xla,
    kv_append_pallas,
    kv_append_xla,
)


def _setup(L=3, B=4, KV=2, S=32, D=64, G=3, dtype=jnp.float32, seed=0):
    rng = np.random.RandomState(seed)
    ck = jnp.asarray(rng.randn(L, B, KV, S, D), dtype)
    cv = jnp.asarray(rng.randn(L, B, KV, S, D), dtype)
    kn = jnp.asarray(rng.randn(B, KV, D), dtype)
    vn = jnp.asarray(rng.randn(B, KV, D), dtype)
    q = jnp.asarray(rng.randn(B, KV * G, D), dtype)
    pos = jnp.asarray(rng.randint(0, S, B), jnp.int32)
    return ck, cv, kn, vn, q, pos


@pytest.mark.parametrize("G", [1, 3])
def test_kv_append_kernel_matches_oracle(G):
    ck, cv, kn, vn, q, pos = _setup(G=G)
    layer = jnp.int32(1)
    ck1, cv1 = kv_append_xla(kn, vn, ck, cv, pos, layer)
    ck2, cv2 = kv_append_pallas(kn, vn, ck, cv, pos, layer, interpret=True)
    assert np.array_equal(np.asarray(ck1), np.asarray(ck2))
    assert np.array_equal(np.asarray(cv1), np.asarray(cv2))
    # Other layers and other positions are untouched.
    mask = np.zeros(ck.shape, bool)
    for b, p in enumerate(np.asarray(pos)):
        mask[1, b, :, p, :] = True
    assert np.array_equal(np.asarray(ck)[~mask], np.asarray(ck1)[~mask])


@pytest.mark.parametrize("G", [1, 3])
@pytest.mark.parametrize("alibi", [False, True])
def test_flash_decode_matches_oracle(G, alibi):
    ck, cv, kn, vn, q, pos = _setup(G=G)
    layer = jnp.int32(2)
    H = q.shape[1]
    slopes = jnp.linspace(0.05, 0.9, H) if alibi else None
    scale = 1.0 / np.sqrt(ck.shape[-1])
    o1 = flash_decode_xla(q, ck, cv, pos, layer, scale, alibi_slopes=slopes)
    o2 = flash_decode_pallas(q, ck, cv, pos, layer, scale,
                             alibi_slopes=slopes, interpret=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-5, atol=1e-5)


def test_decode_attention_paths_agree():
    ck, cv, kn, vn, q, pos = _setup()
    layer = jnp.int32(0)
    o1, ck1, cv1 = decode_attention(q, kn, vn, ck, cv, pos, layer,
                                    use_pallas=False)
    o2, ck2, cv2 = decode_attention(q, kn, vn, ck, cv, pos, layer,
                                    use_pallas=False, interpret=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(ck1), np.asarray(ck2))


def test_flash_decode_masks_future_positions():
    """Changing cache content beyond pos must not change the output."""
    ck, cv, kn, vn, q, pos = _setup(S=16)
    pos = jnp.full((q.shape[0],), 5, jnp.int32)
    layer = jnp.int32(1)
    scale = 1.0 / np.sqrt(ck.shape[-1])
    o1 = flash_decode_pallas(q, ck, cv, pos, layer, scale, interpret=True)
    ck_mod = ck.at[:, :, :, 6:, :].set(99.0)
    cv_mod = cv.at[:, :, :, 6:, :].set(-99.0)
    o2 = flash_decode_pallas(q, ck_mod, cv_mod, pos, layer, scale,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-6, atol=1e-6)


def test_decode_step_uses_new_layout_end_to_end():
    """decode_step over the new cache layout matches a full forward."""
    from sleekit_tpu.models.transformer import (
        TransformerConfig, decode_step, forward, init_kv_cache, init_params,
        prefill)
    from sleekit_tpu.models.zoo import tiny_test

    cfg = tiny_test(d_model=32, n_heads=2, n_layers=2, d_ff=64,
                    vocab_size=97)
    params = init_params(cfg, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 9), 0, 97)
    ref_logits = forward(cfg, params, tokens)

    cache = init_kv_cache(cfg, 2, 16)
    logits, cache = prefill(cfg, params, tokens[:, :8], cache)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits[:, :8]),
                               rtol=2e-4, atol=2e-4)
    step_logits, cache = decode_step(cfg, params, tokens[:, 8:9], cache,
                                     jnp.int32(8))
    np.testing.assert_allclose(np.asarray(step_logits),
                               np.asarray(ref_logits[:, 8]),
                               rtol=2e-4, atol=2e-4)
