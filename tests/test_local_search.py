"""Local-search tests: incremental-state algebra vs exhaustive oracle
(mirrors ref tests/test_obq.py:112-140) and monotone error improvement."""

import numpy as np
import jax.numpy as jnp

from sleekit_tpu.codebooks import UniformCodebook
from sleekit_tpu.local_search import compute_gain, quantize_local_search
from sleekit_tpu.solver import channelwise_error, quantization_error


def random_psd(size, rank, damp=0.0, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.randn(size, rank).astype(np.float32)
    h = a @ a.T
    return h + damp * np.linalg.norm(h, ord=2, axis=1) * np.eye(size)


def compute_gain_exhaustive(W, Q, H, candidates):
    """Oracle: evaluate the full quadratic error for every single-entry
    candidate change (ref tests/test_obq.py local oracle)."""
    m, n = Q.shape
    base = np.einsum("ij,ci,cj->c", H, Q - W, Q - W)
    gains = np.zeros((m, n), np.float32)
    for r in range(m):
        for c in range(n):
            Q2 = Q[r].copy()
            Q2[c] = candidates[r, c]
            e2 = Q2 - W[r]
            gains[r, c] = base[r] - e2 @ H @ e2
    return gains


def test_compute_gain_matches_oracle():
    rng = np.random.RandomState(0)
    m, n = 4, 6
    W = rng.randn(m, n).astype(np.float32)
    H = random_psd(n, n, damp=1e-2, seed=1).astype(np.float32)
    cb = UniformCodebook(4, -1.5, 1.5)
    Q = np.asarray(cb(jnp.asarray(W)))
    cand = np.asarray(cb.quantize_up(jnp.asarray(Q)))
    got = np.asarray(compute_gain(jnp.asarray(W), jnp.asarray(Q),
                                  jnp.asarray(H), jnp.asarray(cand)))
    expected = compute_gain_exhaustive(W, Q, H, cand)
    assert np.allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_local_search_improves_error():
    rng = np.random.RandomState(2)
    m, n = 16, 32
    W = rng.randn(m, n).astype(np.float32)
    H = jnp.asarray(random_psd(n, 16, damp=1e-2, seed=3))
    cb = UniformCodebook(4, -1.5, 1.5)
    Wj = jnp.asarray(W)
    Q0 = cb(Wj)
    err0 = float(quantization_error(Wj, Q0, H))
    Q10 = quantize_local_search(Wj, Q0, H, cb, 10)
    err10 = float(quantization_error(Wj, Q10, H))
    Q100 = quantize_local_search(Wj, Q0, H, cb, 100)
    err100 = float(quantization_error(Wj, Q100, H))
    assert err10 <= err0 + 1e-5
    assert err100 <= err10 + 1e-5
    # Output stays on the codebook grid
    assert np.allclose(np.asarray(cb(Q100)), np.asarray(Q100), atol=1e-6)


def test_local_search_moves_are_profitable_per_row():
    """Each move never increases any row's error (per-move gains >= 0)."""
    rng = np.random.RandomState(4)
    m, n = 8, 12
    W = jnp.asarray(rng.randn(m, n).astype(np.float32))
    H = jnp.asarray(random_psd(n, n, damp=1e-2, seed=5))
    cb = UniformCodebook(3, -1.0, 1.0)
    Q = cb(W)
    prev = np.asarray(channelwise_error(W, Q, H))
    for _ in range(5):
        Q = quantize_local_search(W, Q, H, cb, 1)
        cur = np.asarray(channelwise_error(W, Q, H))
        assert (cur <= prev + 1e-4).all()
        prev = cur


def test_local_search_zero_moves_identity():
    rng = np.random.RandomState(6)
    W = jnp.asarray(rng.randn(4, 8).astype(np.float32))
    H = jnp.asarray(random_psd(8, 8, seed=7))
    cb = UniformCodebook(4, -1.0, 1.0)
    Q = cb(W)
    assert quantize_local_search(W, Q, H, cb, 0) is Q
