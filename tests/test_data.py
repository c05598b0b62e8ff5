"""Token-stream resolution tests."""

import numpy as np
import pytest

from sleekit_tpu.models.data import (calibration_batches, load_token_stream,
                                     synthetic_stream)


def test_synthetic_stream_deterministic():
    a = synthetic_stream(1000, 500, seed=1)
    b = synthetic_stream(1000, 500, seed=1)
    assert np.array_equal(a, b)
    assert a.dtype == np.int32
    assert ((0 <= a) & (a < 1000)).all()


def test_npy_source(tmp_path):
    stream = np.arange(100, dtype=np.int32)
    p = tmp_path / "toks.npy"
    np.save(p, stream)
    toks, prov = load_token_stream(str(p), 1000, 50)
    assert prov.startswith("file:")
    assert np.array_equal(toks, stream[:50])


def test_default_synthetic():
    toks, prov = load_token_stream(None, 512, 128)
    assert prov == "synthetic"
    assert len(toks) == 128


def test_calibration_batches_shapes():
    stream = np.arange(1000, dtype=np.int32)
    batches = calibration_batches(stream, samples=6, seq_len=32, batch=4)
    assert [b.shape for b in batches] == [(4, 32), (2, 32)]
    assert np.array_equal(batches[0][0], stream[:32])
