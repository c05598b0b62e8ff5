"""Logit parity vs HuggingFace torch implementations on tiny random-init
models - validates our OPT/BLOOM/Llama semantics (positions, ALiBi, RoPE,
GQA, pre/post-norm, fused-qkv split) against the public reference
implementations without any network or weight cache."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sleekit_tpu.models.hf import convert_bloom, convert_llama, convert_opt
from sleekit_tpu.models.transformer import TransformerConfig, forward


def _sd(model):
    return {k: v.to(torch.float32).numpy()
            for k, v in model.state_dict().items()}


def _compare(cfg, params, hf_model, vocab, atol=2e-3):
    rng = np.random.RandomState(0)
    tokens = rng.randint(0, vocab, (2, 12)).astype(np.int32)
    with torch.no_grad():
        ref = hf_model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    got = np.asarray(forward(cfg, params, jnp.asarray(tokens)))
    assert got.shape == ref.shape
    scale = np.abs(ref).max() + 1e-6
    err = np.abs(got - ref).max() / scale
    assert err < atol, f"relative logit error {err}"


def test_opt_parity_pre_norm():
    hf_cfg = transformers.OPTConfig(
        vocab_size=97, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, ffn_dim=64, max_position_embeddings=64,
        do_layer_norm_before=True, word_embed_proj_dim=32,
        activation_function="relu")
    hf = transformers.OPTForCausalLM(hf_cfg).eval()
    cfg = TransformerConfig(
        vocab_size=97, d_model=32, n_layers=2, n_heads=4, d_ff=64,
        max_seq_len=64, activation="relu", positional="learned",
        pre_norm=True, learned_pos_offset=2, final_ln=True,
        tie_embeddings=True)
    params = convert_opt(cfg, _sd(hf))
    _compare(cfg, params, hf, 97)


def test_opt_parity_post_norm_projected():
    """OPT-350M style: post-norm + word_embed_proj_dim != hidden."""
    hf_cfg = transformers.OPTConfig(
        vocab_size=89, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, ffn_dim=64, max_position_embeddings=64,
        do_layer_norm_before=False, word_embed_proj_dim=16,
        activation_function="relu")
    hf = transformers.OPTForCausalLM(hf_cfg).eval()
    cfg = TransformerConfig(
        vocab_size=89, d_model=32, n_layers=2, n_heads=4, d_ff=64,
        max_seq_len=64, activation="relu", positional="learned",
        pre_norm=False, learned_pos_offset=2, final_ln=False,
        tie_embeddings=True, embed_dim=16)
    params = convert_opt(cfg, _sd(hf))
    _compare(cfg, params, hf, 89)


def test_bloom_parity():
    hf_cfg = transformers.BloomConfig(
        vocab_size=101, hidden_size=32, n_layer=2, n_head=4)
    hf = transformers.BloomForCausalLM(hf_cfg).eval()
    cfg = TransformerConfig(
        vocab_size=101, d_model=32, n_layers=2, n_heads=4, d_ff=128,
        max_seq_len=64, activation="gelu", positional="alibi",
        pre_norm=True, embed_ln=True, final_ln=True, tie_embeddings=True)
    params = convert_bloom(cfg, _sd(hf))
    _compare(cfg, params, hf, 101)


def test_llama_parity_gqa():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=103, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
        max_position_embeddings=64, rope_theta=10000.0)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = TransformerConfig(
        vocab_size=103, d_model=32, n_layers=2, n_heads=4, n_kv_heads=2,
        d_ff=64, max_seq_len=64, activation="silu_glu", norm="rmsnorm",
        positional="rope", rope_theta=10000.0, pre_norm=True,
        final_ln=True, tie_embeddings=False, norm_eps=1e-6)
    params = convert_llama(cfg, _sd(hf))
    _compare(cfg, params, hf, 103)
