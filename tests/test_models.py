"""Model stack tests: forward shapes, KV-cache decode == full forward,
on-device calibration == manual statistics, whole-model quantization and
packed serving params, generation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sleekit_tpu.hessian import init_stats, update_stats
from sleekit_tpu.models.eval import chunk_tokens, generate, perplexity
from sleekit_tpu.models.quantize import calibrate, quantize_model
from sleekit_tpu.models.transformer import (
    TransformerConfig,
    calibrate_step,
    decode_step,
    forward,
    init_calibration_stats,
    init_kv_cache,
    init_params,
    layer_names,
    prefill,
)
from sleekit_tpu.models.zoo import get_config, tiny_test
from sleekit_tpu.ops.pack import PackedLinear
from sleekit_tpu.pipeline import QuantConfig


FAMILIES = {
    "opt-like": dict(),
    "opt350-like": dict(pre_norm=False, embed_dim=48, final_ln=False),
    "bloom-like": dict(positional="alibi", activation="gelu", embed_ln=True),
    "llama-like": dict(positional="rope", activation="silu_glu",
                       norm="rmsnorm", n_kv_heads=2, tie_embeddings=False),
    # Qwen2: llama architecture + q/k/v biases (qkv_bias) + GQA.
    "qwen-like": dict(positional="rope", activation="silu_glu",
                      norm="rmsnorm", n_kv_heads=2, tie_embeddings=False,
                      qkv_bias=True),
}


def _cfg(family, **kw):
    return tiny_test(**{**FAMILIES[family], **kw})


@pytest.mark.parametrize("family", list(FAMILIES))
def test_forward_shapes(family):
    cfg = _cfg(family)
    params = init_params(cfg, jax.random.PRNGKey(0))
    tokens = jnp.asarray(np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 10)))
    logits = forward(cfg, params, tokens)
    assert logits.shape == (2, 10, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("family", list(FAMILIES))
def test_decode_matches_forward(family):
    """prefill + decode_step token-by-token reproduces the full forward."""
    cfg = _cfg(family)
    params = init_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.RandomState(1)
    b, t = 2, 9
    tokens = jnp.asarray(rng.randint(0, cfg.vocab_size, (b, t)).astype(np.int32))

    full_logits = np.asarray(forward(cfg, params, tokens))

    # prefill the first 4 tokens, decode the rest one by one
    split = 4
    cache = init_kv_cache(cfg, b, t + 1)
    logits_p, cache = prefill(cfg, params, tokens[:, :split], cache)
    got = [np.asarray(logits_p)]
    for i in range(split, t):
        step_logits, cache = decode_step(cfg, params, tokens[:, i:i + 1],
                                         cache, jnp.int32(i))
        got.append(np.asarray(step_logits)[:, None, :])
    got = np.concatenate(got, axis=1)
    assert got.shape == full_logits.shape
    assert np.allclose(got, full_logits, rtol=1e-3, atol=1e-3), (
        np.abs(got - full_logits).max())


def test_calibration_matches_manual():
    """Fused on-device calibration equals hand-fed per-layer statistics."""
    cfg = _cfg("opt-like", n_layers=1)
    params = init_params(cfg, jax.random.PRNGKey(2))
    rng = np.random.RandomState(2)
    tokens = jnp.asarray(rng.randint(0, cfg.vocab_size, (2, 8)).astype(np.int32))

    stats = init_calibration_stats(cfg)
    stats = calibrate_step(cfg, params, tokens, stats)

    # Manual: the q layer's input is the ln1 output of the embedded tokens
    from sleekit_tpu.models.transformer import _embed, apply_norm
    positions = jnp.broadcast_to(jnp.arange(8), (2, 8))
    x = _embed(cfg, params, tokens, positions)
    h = apply_norm(cfg, params["layers"][0]["ln1"], x)
    manual = update_stats(init_stats(cfg.d_model), h.reshape(-1, cfg.d_model))

    got = stats["layers.0.q"]
    assert float(got.count) == 16
    assert np.allclose(np.asarray(got.mean), np.asarray(manual.mean), atol=1e-5)
    assert np.allclose(np.asarray(got.hessian), np.asarray(manual.hessian),
                       atol=1e-4)


def test_calibration_all_layers_counted():
    cfg = _cfg("llama-like")
    params = init_params(cfg, jax.random.PRNGKey(3))
    rng = np.random.RandomState(3)
    batches = [rng.randint(0, cfg.vocab_size, (1, 16)).astype(np.int32)
               for _ in range(3)]
    stats = calibrate(cfg, params, batches)
    assert set(stats) == set(layer_names(cfg))
    for name, st in stats.items():
        assert float(st.count) == 48, name
        assert np.isfinite(np.asarray(st.hessian)).all(), name


@pytest.mark.parametrize("pack", [False, True])
def test_quantize_model_roundtrip(pack):
    cfg = _cfg("opt-like")
    params = init_params(cfg, jax.random.PRNGKey(4))
    rng = np.random.RandomState(4)
    batches = [rng.randint(0, cfg.vocab_size, (2, 16)).astype(np.int32)
               for _ in range(2)]
    stats = calibrate(cfg, params, batches)
    qparams, reports = quantize_model(
        cfg, params, stats, QuantConfig(nbits=4, scaling_mode="diag",
                                        grid_size=20), pack=pack)
    assert len(reports) == len(layer_names(cfg))
    # Original params untouched
    assert "kernel" in params["layers"][0]["attn"]["q"]
    if pack:
        assert isinstance(qparams["layers"][0]["attn"]["q"], PackedLinear)
    tokens = jnp.asarray(rng.randint(0, cfg.vocab_size, (1, 12)).astype(np.int32))
    ref_logits = np.asarray(forward(cfg, params, tokens))
    q_logits = np.asarray(forward(cfg, qparams, tokens))
    assert q_logits.shape == ref_logits.shape
    assert np.isfinite(q_logits).all()


def test_quantized_ppl_close_at_8bit():
    """8-bit quantization should barely move perplexity on a tiny model."""
    cfg = _cfg("opt-like")
    params = init_params(cfg, jax.random.PRNGKey(5))
    rng = np.random.RandomState(5)
    stream = rng.randint(0, cfg.vocab_size, (600,)).astype(np.int32)
    calib = [rng.randint(0, cfg.vocab_size, (2, 32)).astype(np.int32)
             for _ in range(3)]
    stats = calibrate(cfg, params, calib)
    qparams, _ = quantize_model(
        cfg, params, stats, QuantConfig(nbits=8, scaling_mode="mse",
                                        grid_size=20))
    batches = list(chunk_tokens(stream, 32, 2))
    ppl_ref = perplexity(cfg, params, batches)
    ppl_q = perplexity(cfg, qparams, batches)
    assert abs(ppl_q - ppl_ref) / ppl_ref < 0.05, (ppl_ref, ppl_q)


def test_generate_greedy_deterministic():
    cfg = _cfg("opt-like")
    params = init_params(cfg, jax.random.PRNGKey(6))
    prompt = jnp.asarray(np.random.RandomState(6).randint(
        0, cfg.vocab_size, (2, 5)).astype(np.int32))
    out1 = np.asarray(generate(cfg, params, prompt, 6))
    out2 = np.asarray(generate(cfg, params, prompt, 6))
    assert out1.shape == (2, 11)
    assert np.array_equal(out1, out2)
    assert np.array_equal(out1[:, :5], np.asarray(prompt))


def test_zoo_configs_construct():
    for name in ("opt-125m", "opt-350m", "opt-1.3b", "bloom-560m",
                 "llama2-7b", "llama3-8b", "qwen2-7b"):
        cfg = get_config(name)
        assert cfg.d_model % cfg.n_heads == 0
        assert len(layer_names(cfg)) in (6 * cfg.n_layers, 7 * cfg.n_layers)


def test_calibrate_spill_matches_standard():
    """Layer-outer spill calibration (host-resident stats for models
    whose Hessians exceed HBM, e.g. OPT-2.7B's 17.6 GB) is numerically
    identical to the standard on-device path."""
    import numpy as np
    import jax
    from sleekit_tpu.models.quantize import calibrate, calibrate_spill
    from sleekit_tpu.models.transformer import init_params
    from sleekit_tpu.models.zoo import tiny_test

    cfg = tiny_test(n_layers=3)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batches = [rng.randint(0, cfg.vocab_size, (2, 16)).astype(np.int32)
               for _ in range(3)]
    a = calibrate(cfg, params, batches, layerwise=True)
    b = calibrate_spill(cfg, params, batches)
    assert set(a) == set(b)
    for k in a:
        assert isinstance(b[k].hessian, np.ndarray)  # host-resident
        np.testing.assert_allclose(np.asarray(a[k].hessian), b[k].hessian,
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(a[k].mean), b[k].mean,
                                   rtol=1e-6, atol=1e-6)
        assert int(a[k].count) == int(b[k].count)
