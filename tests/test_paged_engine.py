"""Paged-pool serving engine == dense slot-cache engine, token for token."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sleekit_tpu.models.transformer import init_params, stack_layer_params
from sleekit_tpu.models.zoo import tiny_test
from sleekit_tpu.serve.engine import Engine, Request


def _requests():
    rng = np.random.RandomState(0)
    return [Request(prompt=rng.randint(0, 64, n).astype(np.int32),
                    max_new_tokens=m, eos_id=None)
            for n, m in [(5, 12), (19, 4), (3, 30), (40, 8), (7, 7)]]


@pytest.mark.parametrize("scan_layers", [False, True])
@pytest.mark.parametrize("cache_dtype", [jnp.float32, jnp.int8])
def test_paged_engine_matches_dense(scan_layers, cache_dtype):
    cfg = tiny_test(d_model=64, n_heads=4, n_layers=2, d_ff=96,
                    vocab_size=64, scan_layers=scan_layers)
    params = init_params(cfg, jax.random.PRNGKey(0))
    if scan_layers:
        params = stack_layer_params(params)

    dense = Engine(cfg, params, max_slots=3, max_seq_len=64,
                   cache_dtype=cache_dtype)
    paged = Engine(cfg, params, max_slots=3, max_seq_len=64,
                   cache_dtype=cache_dtype, paged=True, page_size=16)
    out_d = dense.run(_requests())
    out_p = paged.run(_requests())
    for a, b in zip(out_d, out_p):
        assert np.array_equal(a.new_tokens, b.new_tokens), (
            a.new_tokens, b.new_tokens)
    # All pages returned to the pool.
    assert len(paged._free_pages) == paged.total_pages - 1
    assert not paged._slot_pages


def test_paged_pool_smaller_than_worst_case():
    """A pool with fewer pages than slots*max_pages still completes (FIFO
    admission blocks until pages free up)."""
    cfg = tiny_test(d_model=32, n_heads=2, n_layers=1, d_ff=48,
                    vocab_size=64)
    params = init_params(cfg, jax.random.PRNGKey(0))
    dense = Engine(cfg, params, max_slots=4, max_seq_len=64)
    paged = Engine(cfg, params, max_slots=4, max_seq_len=64, paged=True,
                   page_size=16, total_pages=6)  # 4 slots x 4 pages = 16 worst case
    out_d = dense.run(_requests())
    out_p = paged.run(_requests())
    for a, b in zip(out_d, out_p):
        assert np.array_equal(a.new_tokens, b.new_tokens)
