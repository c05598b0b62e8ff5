"""Scaling tests: hand-computed micro-cases, axis coverage, quality
monotonicity and mode-string dispatch (mirrors ref tests/test_scaling.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sleekit_tpu.codebooks import Codebook, UniformCodebook
from sleekit_tpu.scaling import (
    apply_scaling,
    compute_min_mse_scaling,
    compute_non_saturating_scaling,
    compute_norm_scaling,
    compute_obq_scaling,
    compute_scaling,
    quantize_with_scaling,
)
from sleekit_tpu.solver import quantization_error


def random_psd(size, rank, damp=0.0, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.randn(size, rank).astype(np.float32)
    h = a @ a.T
    return h + damp * np.linalg.norm(h, ord=2, axis=1) * np.eye(size)


def test_norm_scaling_axes():
    """Exact values on a tiny matrix (ref tests/test_scaling.py:16-41)."""
    data = jnp.asarray([[0.0, 10.0], [5.0, 5.0]], jnp.float32)
    sc = compute_norm_scaling(data, 0)
    assert np.allclose(np.asarray(sc), [10.0 / np.sqrt(2), 5.0])
    scaled = apply_scaling(data, sc, 0)
    assert np.allclose(np.asarray(scaled), [[0.0, np.sqrt(2)], [1.0, 1.0]], atol=1e-6)
    sc1 = compute_norm_scaling(data, 1)
    assert np.allclose(np.asarray(sc1), [5.0 / np.sqrt(2), np.sqrt(125 / 2)])


def test_norm_scaling_high_dim():
    data = jnp.asarray(np.random.RandomState(0).randn(4, 5, 6, 7), jnp.float32)
    for axis, size in enumerate((4, 5, 6, 7)):
        assert compute_norm_scaling(data, axis).shape == (size,)


def test_non_saturating_scaling_values():
    """Hand-computed scales (ref tests/test_scaling.py:56-72)."""
    data = jnp.asarray(
        [
            [0.0, 10.0, -20.0, 15.0],
            [5.0, 5.0, 10.0, -10.0],
            [1.0, 2.0, -4.0, 3.0],
            [0.0, 0.0, 0.0, 0.0],
            [1.0, 10.0, 100.0, 1000.0],
            [-1.0, 10.0, 100.0, 1000.0],
        ],
        jnp.float32,
    )
    cb = Codebook.create([-1.0, 0.0, 10.0, 20.0])
    sc0 = np.asarray(compute_non_saturating_scaling(data, cb, 0))
    sc1 = np.asarray(compute_non_saturating_scaling(data, cb, 1))
    assert np.allclose(sc0, [20, 10, 4, 1e-16, 50, 50])
    assert np.allclose(sc1, [1, 0.5, 20, 50])


def test_non_saturating_requires_mixed_sign():
    cb = Codebook.create([0.5, 1.0, 2.0])
    with pytest.raises(ValueError):
        compute_non_saturating_scaling(jnp.ones((2, 2)), cb, 0)


def test_min_mse_scaling_shapes():
    data = jnp.asarray(np.random.RandomState(1).randn(20, 50), jnp.float32)
    cb = UniformCodebook(9, -2.0, 2.0)
    assert compute_min_mse_scaling(data, cb, 0).shape == (20,)
    assert compute_min_mse_scaling(data, cb, 1).shape == (50,)


def test_min_mse_scaling_with_hessians():
    data = jnp.asarray(np.random.RandomState(2).randn(20, 50), jnp.float32)
    cb = UniformCodebook(9, -2.0, 2.0)
    Hd = jnp.asarray(np.random.RandomState(3).rand(50).astype(np.float32))
    assert compute_min_mse_scaling(data, cb, 0, H=Hd).shape == (20,)
    Hf = jnp.asarray(random_psd(50, 10, seed=4))
    assert compute_min_mse_scaling(data, cb, 0, H=Hf).shape == (20,)


def test_min_mse_beats_non_saturating():
    data = jnp.asarray(np.random.RandomState(5).randn(20, 100), jnp.float32)
    cb = UniformCodebook(9, -3.0, 3.0)
    sc_max = compute_non_saturating_scaling(data, cb, 0)
    sc_mse = compute_min_mse_scaling(data, cb, 0)
    q_max = quantize_with_scaling(data, sc_max, cb)
    q_mse = quantize_with_scaling(data, sc_mse, cb)
    mse_max = float(jnp.mean(jnp.square(q_max - data)))
    mse_mse = float(jnp.mean(jnp.square(q_mse - data)))
    assert mse_mse <= mse_max + 1e-7


def test_scaling_quality_ladder():
    """hessian-aware <= mse, obq <= hessian (ref tests/test_scaling.py:130-149)."""
    size = 100
    data = jnp.asarray(np.random.RandomState(6).randn(20, size), jnp.float32)
    cb = UniformCodebook(9, -3.0, 3.0)
    H = jnp.asarray(random_psd(size, 10, damp=1e-6, seed=7))
    sc_base = compute_min_mse_scaling(data, cb, 0)
    sc_diag = compute_min_mse_scaling(data, cb, 0, H=jnp.diagonal(H))
    sc_hessian = compute_min_mse_scaling(data, cb, 0, H=H)
    sc_obq = compute_obq_scaling(data, cb, 0, H=H)
    q_base = quantize_with_scaling(data, sc_base, cb)
    q_diag = quantize_with_scaling(data, sc_diag, cb)
    q_hessian = quantize_with_scaling(data, sc_hessian, cb)
    q_obq = quantize_with_scaling(data, sc_obq, cb, H=H)
    err_base = float(quantization_error(q_base, data, H))
    err_diag = float(quantization_error(q_diag, data, H))
    err_hessian = float(quantization_error(q_hessian, data, H))
    err_obq = float(quantization_error(q_obq, data, H))
    assert err_hessian <= err_base * 1.001
    assert err_hessian <= err_diag * 1.001
    assert err_obq <= err_hessian * 1.001


def test_obq_refine_matches_flat_grid_quality():
    """Coarse-then-fine OBQ scaling (2*refine sweeps) lands within a few
    % of the flat 100-point grid's error (the discrete objective makes
    either side win by small margins - see compute_obq_scaling docstring)
    and stays below the hessian-scaling error (the quality ladder
    holds)."""
    size = 96
    data = jnp.asarray(np.random.RandomState(11).randn(24, size), jnp.float32)
    cb = UniformCodebook(8, -1.0, 1.0)
    H = jnp.asarray(random_psd(size, 48, damp=1e-4, seed=12))
    sc_flat = compute_obq_scaling(data, cb, 0, H=H, grid_size=100)
    sc_fast = compute_obq_scaling(data, cb, 0, H=H, refine=16)
    q_flat = quantize_with_scaling(data, sc_flat, cb, H=H)
    q_fast = quantize_with_scaling(data, sc_fast, cb, H=H)
    e_flat = float(quantization_error(q_flat, data, H))
    e_fast = float(quantization_error(q_fast, data, H))
    assert e_fast <= e_flat * 1.06, (e_flat, e_fast)
    sc_h = compute_min_mse_scaling(data, cb, 0, H=H)
    q_h = quantize_with_scaling(data, sc_h, cb, H=H)
    assert e_fast <= float(quantization_error(q_h, data, H)) * 1.001


def test_scaling_mode_dispatch():
    """Every mode string incl. damp suffixes (ref tests/test_scaling.py:152-165)."""
    size = 20
    data = jnp.asarray(np.random.RandomState(8).randn(20, size), jnp.float32)
    cb = UniformCodebook(9, -3.0, 3.0)
    H = jnp.asarray(random_psd(size, 10, damp=1e-6, seed=9))
    for mode in ("norm", "max", "mse", "diag", "hessian", "diag1",
                 "hessian1", "diag1.8", "hessian1.8", "obq"):
        sc = compute_scaling(data, cb, H, mode=mode)
        assert sc.shape == (20,)
        assert np.isfinite(np.asarray(sc)).all()
    with pytest.raises(ValueError):
        compute_scaling(data, cb, H, mode="bogus")


def test_quantize_with_scaling_roundtrip():
    data = jnp.asarray(np.random.RandomState(10).randn(8, 16), jnp.float32)
    cb = UniformCodebook(16, -1.0, 1.0)
    sc = compute_non_saturating_scaling(data, cb, 0)
    q = quantize_with_scaling(data, sc, cb)
    # Values lie on the per-channel scaled grid
    back = np.asarray(q) / np.asarray(sc)[:, None]
    grid = np.asarray(cb(jnp.asarray(back)))
    assert np.allclose(back, grid, atol=1e-5)
