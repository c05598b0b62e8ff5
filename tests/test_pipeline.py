"""Statistics accumulation + end-to-end pipeline tests (mirrors ref
tests/test_statistics.py count semantics and smoke quantization)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sleekit_tpu.hessian import (
    init_stats,
    prepare_input_conv1d,
    prepare_input_conv2d,
    prepare_input_linear,
    update_stats,
)
from sleekit_tpu.pipeline import LayerQuantizer, QuantConfig, preset_config, quantize_layer
from sleekit_tpu.solver import quantization_error


def test_stats_count_linear():
    """Count counts sample columns, not batches (ref tests/test_statistics.py:7-46)."""
    lq = LayerQuantizer(np.random.randn(8, 16).astype(np.float32))
    lq.add_batch(np.random.randn(10, 16).astype(np.float32))
    assert lq.count == 10
    lq.add_batch(np.random.randn(3, 5, 16).astype(np.float32))
    assert lq.count == 10 + 15


def test_stats_count_conv2d():
    # 4x4 image, 3x3 kernel, padding 1, stride 1 -> 16 patches per image
    w = np.random.randn(4, 2, 3, 3).astype(np.float32)
    lq = LayerQuantizer(w, kind="conv2d", kernel_size=(3, 3), padding=(1, 1))
    lq.add_batch(np.random.randn(2, 2, 4, 4).astype(np.float32))
    assert lq.count == 2 * 16
    assert lq.stats.hessian.shape == (2 * 9, 2 * 9)


def test_stats_count_conv1d():
    w = np.random.randn(4, 2, 3).astype(np.float32)
    lq = LayerQuantizer(w, kind="conv1d", kernel_size=3, padding=1)
    lq.add_batch(np.random.randn(2, 2, 8).astype(np.float32))
    assert lq.count == 2 * 8
    assert lq.stats.hessian.shape == (6, 6)


def test_stats_running_mean_hessian():
    """Streaming accumulation equals the one-shot computation."""
    rng = np.random.RandomState(0)
    xs = [rng.randn(7, 12).astype(np.float32) for _ in range(5)]
    stats = init_stats(12)
    for x in xs:
        stats = update_stats(stats, jnp.asarray(x))
    X = np.concatenate(xs, axis=0)
    assert np.allclose(np.asarray(stats.mean), X.mean(axis=0), atol=1e-5)
    assert np.allclose(np.asarray(stats.hessian), X.T @ X / len(X), atol=1e-4)
    assert float(stats.count) == len(X)


def test_conv2d_unfold_matches_manual():
    """Patch extraction reproduces torch-unfold feature ordering."""
    rng = np.random.RandomState(1)
    x = rng.randn(1, 2, 4, 4).astype(np.float32)
    out = np.asarray(prepare_input_conv2d(jnp.asarray(x), (2, 2)))
    # 3x3 = 9 patches, 2*2*2 = 8 features
    assert out.shape == (9, 8)
    # First patch, feature order (c, i, j)
    first = x[0, :, 0:2, 0:2].reshape(-1)
    assert np.allclose(out[0], first, atol=1e-6)


def test_quantize_layer_end_to_end():
    rng = np.random.RandomState(2)
    n, m = 32, 24
    W = rng.randn(m, n).astype(np.float32)
    lq = LayerQuantizer(W, bias=np.zeros(m, np.float32))
    for _ in range(4):
        lq.add_batch(rng.randn(50, n).astype(np.float32))
    H = jnp.asarray(np.asarray(lq.stats.hessian))
    Q, scale, err = lq.quantize_sleekit_light(3)
    Q = np.asarray(Q)
    assert Q.shape == W.shape
    assert np.isfinite(Q).all()
    direct_err = float(quantization_error(
        jnp.asarray(W), jnp.asarray(W) * 0, H))
    assert float(err.sum()) < direct_err  # better than zeroing everything


@pytest.mark.parametrize("preset", ["basic", "light", "heavy"])
def test_presets_run_and_improve(preset):
    rng = np.random.RandomState(3)
    n, m = 24, 16
    W = rng.randn(m, n).astype(np.float32)
    lq = LayerQuantizer(W, bias=np.zeros(m, np.float32))
    lq.add_batch(rng.randn(200, n).astype(np.float32) + 0.3)
    cfg = preset_config(preset, nbits=3, grid_size=20, nb_ls_moves=10
                        if preset == "heavy" else 0)
    Q, scale, err = lq.quantize(cfg)
    assert np.isfinite(np.asarray(Q)).all()
    assert np.isfinite(float(err.sum()))


def test_preset_hyperparameters():
    """Presets carry the exact reference hyperparameters (ref statistics.py:107-144)."""
    basic = preset_config("basic")
    assert (basic.scaling_mode, basic.order_mode, basic.bias_correction,
            basic.damp, basic.nb_ls_moves) == ("mse", "diag", False, 0.01, 0)
    light = preset_config("light")
    assert (light.scaling_mode, light.order_mode, light.bias_correction,
            light.damp, light.nb_ls_moves) == ("diag", "sqerr", True, 0.03, 0)
    heavy = preset_config("heavy")
    assert (heavy.scaling_mode, heavy.order_mode, heavy.bias_correction,
            heavy.damp, heavy.nb_ls_moves) == ("hessian", "sqerr", True, 0.03, 100)


def test_bias_correction_reduces_true_error():
    """Bias correction: quantize with H - mu mu^T + bias update gives lower
    true expected error over the calibration distribution."""
    rng = np.random.RandomState(4)
    n, m = 16, 12
    W = rng.randn(m, n).astype(np.float32)
    X = (rng.randn(500, n) + 1.0).astype(np.float32)  # biased inputs
    lq = LayerQuantizer(W.copy(), bias=np.zeros(m, np.float32))
    lq.add_batch(X)

    cfg_nobc = QuantConfig(nbits=2, scaling_mode="mse", bias_correction=False,
                           grid_size=20)
    cfg_bc = QuantConfig(nbits=2, scaling_mode="mse", bias_correction=True,
                         grid_size=20)

    # no-bias-correction run
    lq1 = LayerQuantizer(W.copy(), bias=np.zeros(m, np.float32))
    lq1.add_batch(X)
    Q1, _, _ = lq1.quantize(cfg_nobc)
    # bias-correction run
    lq2 = LayerQuantizer(W.copy(), bias=np.zeros(m, np.float32))
    lq2.add_batch(X)
    Q2, _, _ = lq2.quantize(cfg_bc)

    y_ref = X @ W.T
    e1 = np.mean(np.square(X @ np.asarray(Q1).T + np.asarray(lq1.bias) - y_ref))
    e2 = np.mean(np.square(X @ np.asarray(Q2).T + np.asarray(lq2.bias) - y_ref))
    assert e2 <= e1 * 1.05


def test_export_load_roundtrip(tmp_path):
    rng = np.random.RandomState(5)
    W = rng.randn(6, 10).astype(np.float32)
    lq = LayerQuantizer(W, bias=np.zeros(6, np.float32))
    lq.add_batch(rng.randn(30, 10).astype(np.float32))
    path = str(tmp_path / "layer0")
    lq.export(path)
    lq2 = LayerQuantizer.load(path)
    assert np.allclose(np.asarray(lq2.weight), W)
    assert np.allclose(np.asarray(lq2.stats.hessian),
                       np.asarray(lq.stats.hessian), atol=1e-6)
    assert np.allclose(np.asarray(lq2.stats.mean),
                       np.asarray(lq.stats.mean), atol=1e-6)


def test_nf4_codebook_pipeline():
    """NF4 table codebook through the full per-layer pipeline."""
    rng = np.random.RandomState(7)
    W = rng.randn(16, 24).astype(np.float32)
    lq = LayerQuantizer(W, bias=np.zeros(16, np.float32))
    lq.add_batch(rng.randn(100, 24).astype(np.float32))
    Q, scale, err = lq.quantize(QuantConfig(codebook_kind="nf4",
                                            scaling_mode="diag",
                                            grid_size=15))
    Q = np.asarray(Q)
    assert np.isfinite(Q).all()
    # values lie on the per-channel scaled NF4 grid
    from sleekit_tpu.codebooks import Codebook
    import jax.numpy as jnp
    nf4 = Codebook.nf4()
    normalized = Q / np.asarray(scale)[:, None]
    snapped = np.asarray(nf4(jnp.asarray(normalized)))
    assert np.allclose(normalized, snapped, atol=1e-5)


def test_lloyd_codebook_pipeline():
    """Per-layer Lloyd-Max-trained codebook through the pipeline."""
    rng = np.random.RandomState(8)
    W = rng.randn(16, 24).astype(np.float32)
    lq = LayerQuantizer(W, bias=np.zeros(16, np.float32))
    lq.add_batch(rng.randn(100, 24).astype(np.float32))
    Q, scale, err = lq.quantize(QuantConfig(codebook_kind="lloyd", nbits=3,
                                            scaling_mode="diag",
                                            grid_size=15))
    assert np.isfinite(np.asarray(Q)).all()
    assert len(np.unique(np.round(np.asarray(Q) / np.asarray(scale)[:, None],
                                  4))) <= 8 * 2  # <= codebook size per sign


def test_export_pt_format(tmp_path):
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(9)
    W = rng.randn(4, 6).astype(np.float32)
    lq = LayerQuantizer(W, bias=np.zeros(4, np.float32))
    lq.add_batch(rng.randn(20, 6).astype(np.float32))
    path = str(tmp_path / "pt_layer")
    lq.export(path, npy_format=False)
    import os
    assert os.path.exists(os.path.join(path, "weight.pt"))
    w = torch.load(os.path.join(path, "weight.pt"), weights_only=True)
    assert np.allclose(w.numpy(), W)
