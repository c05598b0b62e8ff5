"""Calibration / evaluation data: WikiText-2 token streams.

The reference's published quality numbers are computed from WikiText-2
calibration through an external harness (ref README.md:183); this module
supplies the in-framework equivalent with graceful degradation:

  1. a pre-tokenized ``.npy`` int32 stream (works everywhere, incl. the
     zero-egress environments used for development);
  2. HF datasets + tokenizer when a local cache or network is available;
  3. a deterministic synthetic stream as the last resort for smoke runs.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def synthetic_stream(vocab_size: int, n_tokens: int,
                     seed: int = 0) -> np.ndarray:
    """Deterministic Zipf-ish synthetic token stream (smoke/benchmarks)."""
    rng = np.random.default_rng(seed)
    # Zipfian marginal roughly matches natural-text token statistics,
    # exercising the same embedding-gather patterns.
    ranks = rng.zipf(1.3, size=n_tokens)
    return ((ranks - 1) % vocab_size).astype(np.int32)


def load_token_stream(
    source: Optional[str],
    vocab_size: int,
    n_tokens: int,
    tokenizer_name: Optional[str] = None,
    split: str = "train",
    seed: int = 0,
) -> Tuple[np.ndarray, str]:
    """Resolve a token stream. Returns (tokens, provenance).

    ``source`` may be a ``.npy`` path, the literal ``wikitext2`` (requires
    HF datasets + a tokenizer), or None (synthetic).
    """
    if source and source.endswith(".npy"):
        stream = np.load(source).astype(np.int32)
        return stream[:n_tokens], f"file:{source}"
    if source and source.endswith(".skt"):
        from sleekit_tpu.native.dataio import TokenShard
        shard = TokenShard(source)
        n = min(n_tokens, len(shard))
        stream = shard.windows(np.zeros(1, np.int64), n)[0]
        shard.close()
        return stream, f"shard:{source}"
    if source == "wikitext2":
        toks = _load_wikitext2(tokenizer_name, split)
        if toks is not None:
            return toks[:n_tokens], f"wikitext2/{split}"
        raise RuntimeError(
            "wikitext2 requested but HF datasets/tokenizer unavailable "
            "(offline without cache?); pass a pre-tokenized .npy instead")
    if source is not None:
        # A typo'd path or unknown format must not silently calibrate on
        # random tokens (the only signal would be one provenance line in
        # a long log and quietly wrong quantization quality).
        raise ValueError(
            f"unrecognized token source {source!r}: expected a .npy path, "
            "a .skt shard, 'wikitext2', or None for synthetic")
    return synthetic_stream(vocab_size, n_tokens, seed), "synthetic"


def _load_wikitext2(tokenizer_name: Optional[str],
                    split: str) -> Optional[np.ndarray]:
    try:
        from datasets import load_dataset
        from transformers import AutoTokenizer
    except ImportError:
        return None
    try:
        ds = load_dataset("wikitext", "wikitext-2-raw-v1", split=split)
        tok = AutoTokenizer.from_pretrained(tokenizer_name or "gpt2")
        text = "\n\n".join(ds["text"])
        return np.asarray(tok(text).input_ids, np.int32)
    except Exception:
        return None


def calibration_batches(stream: np.ndarray, samples: int, seq_len: int,
                        batch: int = 2):
    """Slice the first samples*seq_len tokens into (batch, seq_len) arrays."""
    need = samples * seq_len
    stream = np.resize(stream, max(need, len(stream)))[:need]
    windows = stream.reshape(samples, seq_len)
    return [windows[i:i + batch] for i in range(0, samples, batch)]
