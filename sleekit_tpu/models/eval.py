"""Evaluation: causal-LM perplexity and greedy/sampled generation.

The reference has no end-to-end model-quality test (SURVEY.md §4 gap);
perplexity here is the acceptance metric of BASELINE.md (ppl delta <= 0.1
vs the reference pipeline at the same bit-width).
"""

from __future__ import annotations

from functools import partial
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sleekit_tpu.models.transformer import (
    TransformerConfig,
    decode_step,
    forward,
    init_kv_cache,
    prefill,
)


@partial(jax.jit, static_argnames=("cfg",))
def _nll_step(cfg: TransformerConfig, params, tokens):
    """Sum of next-token negative log-likelihoods and token count for one
    (B, T) batch; first position has no target."""
    logits = forward(cfg, params, tokens)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    targets = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll), nll.size


def perplexity(cfg: TransformerConfig, params,
               batches: Iterable[jnp.ndarray]) -> float:
    """Corpus perplexity over (B, T) token batches (stride = window)."""
    total, count = 0.0, 0
    for tokens in batches:
        s, c = _nll_step(cfg, params, jnp.asarray(tokens))
        total += float(s)
        count += int(c)
    return float(np.exp(total / max(count, 1)))


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(3,))
def _decode_nll_step(cfg: TransformerConfig, params, tokens, cache):
    """Teacher-forced NLL of one (B, T) batch scored through the DECODE
    path (KV cache + per-token decode_step - the packed serving kernels'
    route), not the parallel forward. Exists so the acceptance gate can
    assert the packed Engine's perplexity equals the fake-quant
    pipeline's (VERDICT round-3 ask 4: nothing previously checked that
    the two paths that must agree actually do)."""

    def body(carry, tok_next):
        cache, pos, cur = carry
        logits, cache = decode_step(cfg, params, cur[:, None], cache, pos)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, tok_next[:, None], axis=1)[:, 0]
        return (cache, pos + 1, tok_next), nll

    (cache, _, _), nlls = jax.lax.scan(
        body, (cache, jnp.int32(0), tokens[:, 0]),
        jnp.transpose(tokens[:, 1:]))
    return jnp.sum(nlls), nlls.size


def decode_perplexity(cfg: TransformerConfig, params,
                      batches: Iterable[jnp.ndarray],
                      cache_dtype=jnp.float32,
                      scale_dtype=jnp.float32) -> float:
    """Corpus perplexity scored token-by-token through the decode/KV-cache
    path (same kernels the serving Engine runs). Must agree with
    :func:`perplexity` on the same params to well under the 0.1-ppl
    acceptance bar (tests/test_quality.py pins <= 0.01)."""
    total, count = 0.0, 0
    for tokens in batches:
        tokens = jnp.asarray(tokens)
        cache = init_kv_cache(cfg, int(tokens.shape[0]),
                              int(tokens.shape[1]), dtype=cache_dtype,
                              scale_dtype=scale_dtype)
        s, c = _decode_nll_step(cfg, params, tokens, cache)
        total += float(s)
        count += int(c)
    return float(np.exp(total / max(count, 1)))


def chunk_tokens(token_stream: np.ndarray, seq_len: int,
                 batch_size: int = 1) -> Iterable[np.ndarray]:
    """Split a flat token array into (batch, seq_len) eval windows."""
    n = (len(token_stream) // seq_len) * seq_len
    windows = token_stream[:n].reshape(-1, seq_len)
    for i in range(0, len(windows), batch_size):
        yield windows[i:i + batch_size].astype(np.int32)


@partial(jax.jit, static_argnames=("cfg", "steps"), donate_argnums=(2,))
def decode_scan(cfg: TransformerConfig, params, cache, last_token, pos0,
                steps: int):
    """Fused multi-token greedy decode: ``steps`` decode iterations under
    one lax.scan = one host dispatch per K tokens (vital when host<->device
    round trips are expensive). last_token: (B,), pos0: scalar int32.
    Returns (tokens (B, steps), cache, last (B,), pos)."""

    def body(carry, _):
        last, cache, pos = carry
        logits, cache = decode_step(cfg, params, last[:, None], cache, pos)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, cache, pos + 1), nxt

    (last, cache, pos), toks = jax.lax.scan(
        body, (last_token, cache, jnp.asarray(pos0, jnp.int32)), None,
        length=steps)
    return jnp.transpose(toks), cache, last, pos


def sample_tokens(logits, temps, key):
    """Per-slot greedy/temperature sampling (greedy where temp == 0)."""
    greedy = jnp.argmax(logits, axis=-1)
    safe_t = jnp.maximum(temps, 1e-4)
    sampled = jax.random.categorical(key, logits / safe_t[:, None], axis=-1)
    return jnp.where(temps > 0, sampled, greedy).astype(jnp.int32)


def sample_tokens_topkp(logits, temps, top_ks, top_ps, key):
    """Per-slot greedy / temperature / top-k / top-p (nucleus) sampling.

    One program for all slots with per-slot knobs: the scaled logits are
    sorted once per slot; top-k keeps the k largest, top-p keeps the
    smallest prefix of the (k-masked) distribution whose mass reaches p.
    ``top_k == 0`` and ``top_p >= 1`` each disable their cut exactly.
    """
    V = logits.shape[-1]
    greedy = jnp.argmax(logits, axis=-1)
    safe_t = jnp.maximum(temps, 1e-4)
    scaled = logits.astype(jnp.float32) / safe_t[:, None]

    sorted_desc = -jnp.sort(-scaled, axis=-1)
    k = jnp.where(top_ks > 0, top_ks, V).astype(jnp.int32)
    kth = jnp.take_along_axis(sorted_desc, (k - 1)[:, None], axis=-1)
    masked = jnp.where(scaled < kth, -jnp.inf, scaled)

    pos = jnp.arange(V)[None, :]
    sorted_masked = jnp.where(pos < k[:, None], sorted_desc, -jnp.inf)
    sp = jax.nn.softmax(sorted_masked, axis=-1)
    cum = jnp.cumsum(sp, axis=-1)
    # Keep tokens whose exclusive cumulative mass is < p (the argmax token
    # always survives); top_p >= 1 keeps the whole k-masked distribution.
    keep = ((cum - sp) < top_ps[:, None]) | (top_ps[:, None] >= 1.0)
    thresh = jnp.min(jnp.where(keep, sorted_masked, jnp.inf), axis=-1)
    final = jnp.where(masked >= thresh[:, None], masked, -jnp.inf)

    sampled = jax.random.categorical(key, final, axis=-1)
    return jnp.where(temps > 0, sampled, greedy).astype(jnp.int32)


@partial(jax.jit, static_argnames=("cfg", "steps", "use_topkp"),
         donate_argnums=(2,))
def decode_scan_sampled(cfg: TransformerConfig, params, cache, last_token,
                        pos0, steps: int, temps, top_ks, top_ps, key,
                        use_topkp: bool = False):
    """Fused multi-token decode with ON-DEVICE per-slot sampling: the PRNG
    key rides the scan carry, so sampled slots stop paying one host round
    trip per token (~25 ms through the axon tunnel - round-2 VERDICT
    item 8). The key is split once per step exactly like the unfused
    engine loop, so fused and unfused paths emit IDENTICAL tokens from the
    same starting key. Greedy slots (temp == 0) take argmax inside the
    same program. Returns (tokens (B, steps), cache, last, pos, key)."""

    def body(carry, _):
        last, cache, pos, key = carry
        logits, cache = decode_step(cfg, params, last[:, None], cache, pos)
        key, sub = jax.random.split(key)
        if use_topkp:
            nxt = sample_tokens_topkp(logits, temps, top_ks, top_ps, sub)
        else:
            nxt = sample_tokens(logits, temps, sub)
        return (nxt, cache, pos + 1, key), nxt

    (last, cache, pos, key), toks = jax.lax.scan(
        body, (last_token, cache, jnp.asarray(pos0, jnp.int32), key), None,
        length=steps)
    return jnp.transpose(toks), cache, last, pos, key


def generate_fused(cfg: TransformerConfig, params, prompt: jnp.ndarray,
                   max_new_tokens: int,
                   max_len: Optional[int] = None) -> jnp.ndarray:
    """Greedy generation with the fused decode loop (one device program
    for the prompt, one for all new tokens)."""
    b, t = prompt.shape
    max_len = max_len or (t + max_new_tokens)
    cache = init_kv_cache(cfg, b, max_len)
    logits, cache = jax.jit(prefill, static_argnums=(0,))(
        cfg, params, prompt, cache)
    first = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    if max_new_tokens == 1:
        return jnp.concatenate([prompt, first[:, None]], axis=1)
    toks, _, _, _ = decode_scan(cfg, params, cache, first, t,
                                max_new_tokens - 1)
    return jnp.concatenate([prompt, first[:, None], toks], axis=1)


def generate(cfg: TransformerConfig, params, prompt: jnp.ndarray,
             max_new_tokens: int, temperature: float = 0.0,
             key: Optional[jax.Array] = None,
             max_len: Optional[int] = None) -> jnp.ndarray:
    """Autoregressive generation with a KV cache.

    prompt: (B, T) int32. Greedy when temperature == 0, else sampled.
    Returns (B, T + max_new_tokens).
    """
    b, t = prompt.shape
    max_len = max_len or (t + max_new_tokens)
    cache = init_kv_cache(cfg, b, max_len)

    prefill_jit = jax.jit(prefill, static_argnums=(0,))
    decode_jit = jax.jit(decode_step, static_argnums=(0,))

    logits, cache = prefill_jit(cfg, params, prompt, cache)
    last = logits[:, -1, :]
    out = [prompt]
    if key is None:
        key = jax.random.PRNGKey(0)
    for i in range(max_new_tokens):
        if temperature > 0:
            key, sub = jax.random.split(key)
            nxt = jax.random.categorical(sub, last / temperature, axis=-1)
        else:
            nxt = jnp.argmax(last, axis=-1)
        nxt = nxt.astype(jnp.int32)[:, None]
        out.append(nxt)
        last, cache = decode_jit(cfg, params, nxt, cache, jnp.int32(t + i))
    return jnp.concatenate(out, axis=1)
