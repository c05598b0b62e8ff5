"""Native token-shard loader: format, windows, prefetcher, fallbacks."""

import numpy as np
import pytest

from sleekit_tpu.native import dataio


@pytest.fixture()
def shard_path(tmp_path):
    rng = np.random.RandomState(0)
    tokens = rng.randint(0, 50000, 10_000).astype(np.int32)
    path = str(tmp_path / "t.skt")
    dataio.write_shard(path, tokens)
    return path, tokens


def test_native_lib_builds():
    assert dataio.get_lib() is not None


def test_roundtrip_and_windows(shard_path):
    path, tokens = shard_path
    shard = dataio.TokenShard(path)
    assert len(shard) == len(tokens)
    starts = np.asarray([0, 17, 9000, len(tokens) - 3], np.int64)
    w = shard.windows(starts, 64)
    for r, s in enumerate(starts):
        idx = (s + np.arange(64)) % len(tokens)
        assert np.array_equal(w[r], tokens[idx])
    shard.close()


def test_u32_dtype(tmp_path):
    tokens = np.asarray([0, 70000, 123456, 5], np.int32)
    path = str(tmp_path / "wide.skt")
    dataio.write_shard(path, tokens)
    shard = dataio.TokenShard(path)
    got = shard.windows(np.zeros(1, np.int64), 4)[0]
    assert np.array_equal(got, tokens)
    shard.close()


def test_numpy_fallback_reads_native_shard(shard_path, monkeypatch):
    path, tokens = shard_path
    monkeypatch.setattr(dataio, "get_lib", lambda: None)
    shard = dataio.TokenShard(path)
    w = shard.windows(np.asarray([5], np.int64), 32)
    assert np.array_equal(w[0], tokens[5:37])
    shard.close()


def test_prefetcher_matches_sync_batches(shard_path):
    path, tokens = shard_path
    shard = dataio.TokenShard(path)
    sync = list(shard.batches(5, batch=3, seq_len=16))
    with dataio.Prefetcher(shard, batch=3, seq_len=16) as pf:
        for expect in sync:
            got = pf.next()
            assert np.array_equal(got, expect)
    shard.close()


def test_load_token_stream_skt(tmp_path):
    from sleekit_tpu.models.data import load_token_stream
    tokens = np.arange(100, dtype=np.int32)
    path = str(tmp_path / "s.skt")
    dataio.write_shard(path, tokens)
    stream, prov = load_token_stream(path, vocab_size=200, n_tokens=50)
    assert prov == f"shard:{path}"
    assert np.array_equal(stream, tokens[:50])
