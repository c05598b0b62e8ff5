"""Native packing library: bit-compatibility with the JAX pack format,
numpy fallback equivalence, fused quantize+pack correctness."""

import numpy as np
import jax.numpy as jnp
import pytest

from sleekit_tpu import native
from sleekit_tpu.codebooks import UniformCodebook
from sleekit_tpu.ops.pack import pack_indices, unpack_indices


def test_native_lib_builds():
    lib = native.get_lib()
    # The session image ships g++, so the native path should be live.
    assert lib is not None


@pytest.mark.parametrize("nbits", [1, 2, 3, 4, 8])
def test_native_pack_matches_jax(nbits):
    rng = np.random.RandomState(nbits)
    k, n = 123, 57
    idx = rng.randint(0, 2 ** nbits, (k, n)).astype(np.uint8)
    ours = native.pack_indices_np(idx, nbits)
    ref = np.asarray(pack_indices(jnp.asarray(idx.astype(np.int32)), nbits))
    assert np.array_equal(ours, ref)
    back = native.unpack_indices_np(ours, nbits, k)
    assert np.array_equal(back, idx.astype(np.int32))


@pytest.mark.parametrize("nbits", [2, 4])
def test_numpy_fallback_matches_native(nbits, monkeypatch):
    rng = np.random.RandomState(10 + nbits)
    k, n = 77, 33
    idx = rng.randint(0, 2 ** nbits, (k, n)).astype(np.uint8)
    with_native = native.pack_indices_np(idx, nbits)
    monkeypatch.setattr(native, "get_lib", lambda: None)
    without = native.pack_indices_np(idx, nbits)
    assert np.array_equal(with_native, without)
    back = native.unpack_indices_np(without, nbits, k)
    assert np.array_equal(back, idx.astype(np.int32))


def test_fused_quantize_pack_uniform():
    rng = np.random.RandomState(0)
    k, n = 100, 40
    cb = UniformCodebook(16, -1.0, 1.0)
    w = rng.uniform(-1.3, 1.3, (k, n)).astype(np.float32)
    packed = native.quantize_pack_uniform_np(
        w, nbits=4, levels=16, step=cb.scale, zero=cb.zero)
    # Reference: quantize_index through the codebook, then pack
    idx_ref = np.asarray(cb.quantize_index(jnp.asarray(w))).astype(np.uint8)
    ref = native.pack_indices_np(idx_ref, 4)
    assert np.array_equal(packed, ref)


def test_large_pack_roundtrip():
    """Larger matrix to exercise the threaded path."""
    rng = np.random.RandomState(1)
    k, n = 4096, 512
    idx = rng.randint(0, 16, (k, n)).astype(np.uint8)
    packed = native.pack_indices_np(idx, 4)
    back = native.unpack_indices_np(packed, 4, k)
    assert np.array_equal(back, idx.astype(np.int32))
