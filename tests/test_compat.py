"""Torch-facing Sleekit drop-in (compat.py) vs the reference contract.

Mirrors the reference's tests/test_statistics.py (count semantics for
Linear/Conv1d/Conv2d incl. padding; one end-to-end light quantize per layer
kind) and adds the transformers.Conv1D extension plus an export roundtrip.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from sleekit_tpu import Sleekit  # noqa: E402


def test_linear_counts():
    layer = nn.Linear(10, 5)
    stats = Sleekit(layer)
    stats.add_batch(torch.randn(10))
    assert stats.count == 1
    stats.add_batch(torch.randn(3, 10))
    assert stats.count == 4
    stats.add_batch(torch.randn(3, 3, 10))
    assert stats.count == 13


def test_conv2d_counts():
    layer = nn.Conv2d(10, 5, 3)
    stats = Sleekit(layer)
    stats.add_batch(torch.randn(10, 3, 3))
    assert stats.count == 1
    stats.add_batch(torch.randn(5, 10, 3, 3))
    assert stats.count == 6
    stats.add_batch(torch.randn(10, 7, 7))
    assert stats.count == 31

    layer = nn.Conv2d(10, 5, 3, padding=1)
    stats = Sleekit(layer)
    stats.add_batch(torch.randn(10, 3, 3))
    assert stats.count == 9
    stats.add_batch(torch.randn(5, 10, 3, 3))
    assert stats.count == 54
    stats.add_batch(torch.randn(10, 5, 5))
    assert stats.count == 79


def test_conv1d_counts():
    layer = nn.Conv1d(10, 5, 3)
    stats = Sleekit(layer)
    stats.add_batch(torch.randn(10, 3))
    assert stats.count == 1
    stats.add_batch(torch.randn(5, 10, 3))
    assert stats.count == 6
    stats.add_batch(torch.randn(10, 7))
    assert stats.count == 11


def test_hessian_matches_manual():
    layer = nn.Linear(6, 4)
    stats = Sleekit(layer)
    x = torch.randn(8, 6)
    stats.add_batch(x)
    xs = x.numpy().T  # (features, samples)
    np.testing.assert_allclose(
        stats.hessian.numpy(), xs @ xs.T / 8, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        stats.mean.numpy(), xs.mean(axis=1), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("make,inp", [
    (lambda: nn.Linear(10, 5), torch.randn(20, 10)),
    (lambda: nn.Conv1d(10, 5, 3), torch.randn(20, 10, 5)),
    (lambda: nn.Conv2d(10, 5, 3), torch.randn(20, 10, 5, 5)),
])
def test_quantize_in_place(make, inp):
    torch.manual_seed(0)
    layer = make()
    before = layer.weight.detach().clone()
    bias_before = layer.bias.detach().clone()
    stats = Sleekit(layer)
    stats.add_batch(inp)
    stats.quantize_sleekit_light(3)
    assert layer.weight.shape == before.shape
    assert not torch.equal(layer.weight, before)
    # light preset corrects the bias
    assert not torch.equal(layer.bias, bias_before)
    # weights land on an 8-point symmetric per-channel grid
    w = layer.weight.detach().flatten(1).numpy()
    for row in w:
        assert len(np.unique(np.round(row / (np.abs(row).max() + 1e-12), 5))) <= 8
    stats.free()
    assert stats.layer is None and stats.count == 0


def test_hf_conv1d_transposed():
    transformers = pytest.importorskip("transformers")
    from transformers.pytorch_utils import Conv1D

    torch.manual_seed(0)
    layer = Conv1D(5, 10)  # weight stored (in=10, out=5)
    ref = nn.Linear(10, 5)
    with torch.no_grad():
        ref.weight.copy_(layer.weight.t())
        ref.bias.copy_(layer.bias)
    x = torch.randn(20, 10)

    a, b = Sleekit(layer), Sleekit(ref)
    a.add_batch(x)
    b.add_batch(x)
    assert a.count == b.count == 20
    np.testing.assert_allclose(a.hessian.numpy(), b.hessian.numpy(),
                               rtol=1e-5, atol=1e-6)
    a.quantize_basic(3)
    b.quantize_basic(3)
    np.testing.assert_allclose(layer.weight.detach().numpy(),
                               ref.weight.detach().numpy().T,
                               rtol=1e-4, atol=1e-5)


def test_export_pt_roundtrip(tmp_path):
    layer = nn.Linear(6, 4)
    stats = Sleekit(layer)
    stats.add_batch(torch.randn(8, 6))
    stats.export(str(tmp_path))  # reference default: .pt files
    w = torch.load(tmp_path / "weight.pt")
    h = torch.load(tmp_path / "hessian.pt")
    np.testing.assert_allclose(w.numpy(), layer.weight.detach().numpy(),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(h.numpy(), stats.hessian.numpy(),
                               rtol=1e-6, atol=1e-7)
