"""Codebook semantics tests, mirroring ref tests/test_codebook.py plus
uniform-vs-generic equivalence and Lloyd-Max convergence checks."""

import numpy as np
import pytest

from sleekit_tpu.codebooks import Codebook, UniformCodebook, lloyd_max


def test_uniform_codebook_values():
    cb = UniformCodebook(4, -1.0, 2.0)
    assert len(cb) == 4
    assert np.allclose(np.asarray(cb.values), [-1.0, 0.0, 1.0, 2.0])
    assert cb.min() == -1.0
    assert cb.max() == 2.0


def test_uniform_quantize_roundtrip():
    cb = UniformCodebook(8, -1.0, 1.0)
    data = np.random.RandomState(0).uniform(-2, 2, (50,)).astype(np.float32)
    q = np.asarray(cb(data))
    # Idempotence (ref test_codebook.py:35-40)
    assert np.allclose(np.asarray(cb(q)), q)
    # Quantized values are codebook values
    vals = np.asarray(cb.values)
    for v in q:
        assert np.abs(vals - v).min() < 1e-6
    # Nearest-value property
    for x, v in zip(data, q):
        assert np.abs(x - v) <= (np.abs(x - vals).min() + 1e-6)


def test_uniform_index():
    cb = UniformCodebook(4, 0.0, 3.0)
    data = np.array([-10.0, 0.2, 0.9, 2.4, 99.0], np.float32)
    idx = np.asarray(cb.quantize_index(data))
    assert idx.dtype == np.uint8
    assert np.array_equal(idx, [0, 0, 1, 2, 3])


def test_uniform_up_down():
    cb = UniformCodebook(4, 0.0, 3.0)
    data = np.array([-5.0, 0.1, 1.2, 2.8, 10.0], np.float32)
    up = np.asarray(cb.quantize_up(data))
    down = np.asarray(cb.quantize_down(data))
    assert np.array_equal(up, [1.0, 1.0, 2.0, 3.0, 3.0])
    assert np.array_equal(down, [0.0, 0.0, 0.0, 2.0, 2.0])


def test_generic_matches_uniform():
    """UniformCodebook and generic Codebook agree on the same grid
    (ref tests/test_codebook.py:43-57)."""
    ucb = UniformCodebook(9, -2.0, 2.0)
    gcb = Codebook.uniform(9, -2.0, 2.0)
    data = np.random.RandomState(1).uniform(-3, 3, (200,)).astype(np.float32)
    assert np.allclose(np.asarray(ucb(data)), np.asarray(gcb(data)), atol=1e-6)
    assert np.allclose(np.asarray(ucb.quantize_up(data)),
                       np.asarray(gcb.quantize_up(data)), atol=1e-6)
    assert np.allclose(np.asarray(ucb.quantize_down(data)),
                       np.asarray(gcb.quantize_down(data)), atol=1e-6)
    assert np.array_equal(np.asarray(ucb.quantize_index(data)),
                          np.asarray(gcb.quantize_index(data)))


def test_codebook_thresholds():
    cb = Codebook.create([0.0, 1.0, 3.0])
    assert np.allclose(np.asarray(cb.thresholds), [0.5, 2.0])
    data = np.array([-1.0, 0.4, 0.6, 1.9, 2.1, 5.0], np.float32)
    q = np.asarray(cb(data))
    assert np.array_equal(q, [0.0, 0.0, 1.0, 1.0, 3.0, 3.0])


def test_codebook_up_down_saturate():
    cb = Codebook.create([-1.0, 0.0, 2.0])
    # thresholds are [-0.5, 1.0]; up/down move one bin, saturating
    data = np.array([-3.0, -0.2, 0.7, 4.0], np.float32)
    assert np.array_equal(np.asarray(cb.quantize_up(data)), [0.0, 2.0, 2.0, 2.0])
    assert np.array_equal(np.asarray(cb.quantize_down(data)), [-1.0, -1.0, -1.0, 0.0])


def test_probabilities_entropy_mse():
    cb = Codebook.create([0.0, 1.0])
    data = np.array([0.1, 0.2, 0.9, 1.1], np.float32)
    p = np.asarray(cb.probabilities(data))
    assert np.allclose(p, [0.5, 0.5])
    assert abs(float(cb.entropy(data)) - 1.0) < 1e-6
    assert abs(float(cb.mse(data)) - np.mean([0.01, 0.04, 0.01, 0.01])) < 1e-6


def test_centroids_with_empty_bins():
    cb = Codebook.create([0.0, 1.0, 2.0])
    data = np.array([0.0, 0.2, 1.9, 2.2], np.float32)  # middle bin empty
    c = np.asarray(cb.centroids(data))
    assert np.allclose(c[0], 0.1)
    assert np.allclose(c[1], (0.5 + 1.5) / 2)  # threshold midpoint fallback
    assert np.allclose(c[2], np.mean([1.9, 2.2]))


def test_nf4():
    cb = Codebook.nf4()
    assert len(cb) == 16
    vals = np.asarray(cb.values)
    assert vals[0] == -1.0 and vals[-1] == 1.0
    assert (np.diff(vals) > 0).all()
    assert 0.0 in vals


def test_equiprobable():
    rng = np.random.RandomState(2)
    data = rng.randn(1000).astype(np.float32)
    cb = Codebook.equiprobable(data, 4)
    p = np.asarray(cb.probabilities(data))
    assert len(cb) == 4
    assert (np.abs(p - 0.25) < 0.05).all()


def test_lloyd_max_improves_mse():
    rng = np.random.RandomState(3)
    data = rng.randn(2000).astype(np.float32)
    uniform = Codebook.uniform(8, float(data.min()), float(data.max()))
    trained = lloyd_max(data, 8)
    assert float(trained.mse(data)) <= float(uniform.mse(data))


def test_lloyd_max_entropy_penalty():
    rng = np.random.RandomState(4)
    data = rng.randn(2000).astype(np.float32)
    plain = lloyd_max(data, 8)
    penalized = lloyd_max(data, 8, lagrange_mult=0.5)
    # Entropy goes down (or stays) when penalized
    assert float(penalized.entropy(data)) <= float(plain.entropy(data)) + 1e-3


def test_remove_unused():
    cb = Codebook.create([0.0, 1.0, 5.0, 6.0])
    data = np.array([0.0, 0.9, 1.2, 0.4], np.float32)
    cb2 = cb.remove_unused(data)
    assert len(cb2) == 2
    assert np.allclose(np.asarray(cb2.values), [0.0, 1.0])
