"""Quantized checkpoint roundtrip + damp-retry robustness + profiling."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sleekit_tpu.codebooks import UniformCodebook
from sleekit_tpu.hessian import hessian_inv_chol_robust
from sleekit_tpu.models.fake_quant import random_packed_params
from sleekit_tpu.models.transformer import forward, init_params
from sleekit_tpu.models.zoo import tiny_test
from sleekit_tpu.serve.checkpoint import load_packed_params, save_packed_params
from sleekit_tpu.solver import quantize_opt
from sleekit_tpu.utils.profiling import Timer


def test_checkpoint_roundtrip_packed(tmp_path):
    cfg = tiny_test(n_layers=2)
    params, _ = random_packed_params(cfg, jax.random.PRNGKey(0))
    save_packed_params(str(tmp_path / "ckpt"), params,
                       meta={"model": "tiny", "nbits": 4})
    loaded, meta = load_packed_params(str(tmp_path / "ckpt"))
    assert meta["nbits"] == 4
    tokens = jnp.asarray(np.random.RandomState(0).randint(
        0, cfg.vocab_size, (1, 8)).astype(np.int32))
    a = np.asarray(forward(cfg, params, tokens))
    b = np.asarray(forward(cfg, loaded, tokens))
    assert np.array_equal(a, b)


def test_checkpoint_roundtrip_dense(tmp_path):
    cfg = tiny_test(n_layers=1)
    params = init_params(cfg, jax.random.PRNGKey(1))
    save_packed_params(str(tmp_path / "dense"), params)
    loaded, _ = load_packed_params(str(tmp_path / "dense"))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip_tp_split(tmp_path):
    """A split_packed_k (TP row-sharding format) tree must round-trip with
    k_splits intact: losing it makes dequantize() read interleaved garbage
    (round-2 VERDICT item 5)."""
    import dataclasses

    from sleekit_tpu.ops.pack import pack_quantized, split_packed_k
    from sleekit_tpu.codebooks import UniformCodebook

    rng = np.random.RandomState(3)
    cb = UniformCodebook(16, -1.0, 1.0)
    scale = jnp.asarray(rng.rand(24).astype(np.float32) + 0.5)
    w = cb(jnp.asarray(rng.randn(24, 256).astype(np.float32))
           / scale[:, None]) * scale[:, None]
    p = pack_quantized(w, scale, cb)
    sp = split_packed_k(p, 4)
    assert sp.k_splits == 4
    save_packed_params(str(tmp_path / "tp"), {"layer": sp})
    loaded, _ = load_packed_params(str(tmp_path / "tp"))
    assert loaded["layer"].k_splits == 4
    assert np.array_equal(np.asarray(sp.dequantize()),
                          np.asarray(loaded["layer"].dequantize()))


def test_checkpoint_rejects_layer_sel(tmp_path):
    """layer_sel is a traced scan-time index; persisting it would freeze a
    runtime value, so save must reject it with a clear error."""
    import dataclasses

    from sleekit_tpu.ops.pack import pack_quantized
    from sleekit_tpu.codebooks import UniformCodebook

    rng = np.random.RandomState(4)
    cb = UniformCodebook(16, -1.0, 1.0)
    scale = jnp.asarray(rng.rand(8).astype(np.float32) + 0.5)
    w = cb(jnp.asarray(rng.randn(8, 64).astype(np.float32))
           / scale[:, None]) * scale[:, None]
    p = pack_quantized(w, scale, cb)
    stacked = dataclasses.replace(
        p, packed=p.packed[None], layer_sel=jnp.int32(0))
    with pytest.raises(ValueError, match="layer_sel"):
        save_packed_params(str(tmp_path / "ls"), {"layer": stacked})


def test_checkpoint_reads_skq1(tmp_path):
    """Old-format (pre-k_splits) checkpoints keep loading: every skq1
    PackedLinear is k_splits=1."""
    import json

    cfg = tiny_test(n_layers=1)
    params, _ = random_packed_params(cfg, jax.random.PRNGKey(2))
    save_packed_params(str(tmp_path / "old"), params)
    mpath = tmp_path / "old" / "manifest.json"
    m = json.loads(mpath.read_text())
    m["format"] = "skq1"
    mpath.write_text(json.dumps(m))
    loaded, _ = load_packed_params(str(tmp_path / "old"))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_bad_format(tmp_path):
    import json, os
    d = tmp_path / "bad"
    d.mkdir()
    (d / "manifest.json").write_text(json.dumps({"format": "nope"}))
    with pytest.raises(ValueError):
        load_packed_params(str(d))


def test_damp_retry_rescues_singular_hessian():
    """A rank-deficient Hessian with zero dampening would produce NaN;
    damp_retry must still return finite quantized weights."""
    rng = np.random.RandomState(0)
    n = 32
    a = rng.randn(n, 2).astype(np.float32)  # rank 2
    H = jnp.asarray(a @ a.T)
    W = jnp.asarray(rng.randn(8, n).astype(np.float32))
    cb = UniformCodebook(8, -1.0, 1.0)
    Q = quantize_opt(W, H, cb, damp=1e-12, damp_retry=True)
    assert np.isfinite(np.asarray(Q)).all()
    # Without retry it goes non-finite (documents the failure mode)
    Q_bad = quantize_opt(W, H, cb, damp=1e-12, damp_retry=False)
    assert not np.isfinite(np.asarray(Q_bad)).all()


def test_damp_retry_noop_when_healthy():
    """First-attempt success => identical to non-retried result."""
    rng = np.random.RandomState(1)
    n = 24
    a = rng.randn(n, n).astype(np.float32)
    H = jnp.asarray(a @ a.T + 0.1 * np.eye(n, dtype=np.float32))
    W = jnp.asarray(rng.randn(6, n).astype(np.float32))
    cb = UniformCodebook(8, -1.0, 1.0)
    q1 = np.asarray(quantize_opt(W, H, cb, damp=0.01, damp_retry=True))
    q2 = np.asarray(quantize_opt(W, H, cb, damp=0.01, damp_retry=False))
    assert np.array_equal(q1, q2)
    hinv, mult = hessian_inv_chol_robust(H, 0.01)
    assert float(mult) == 1.0


def test_timer_report():
    t = Timer()
    with t.section("a"):
        x = jnp.ones((8, 8)) * 2
    t.timed("b", x)
    rep = t.report()
    assert set(rep) == {"a", "b"}
    assert rep["a"]["count"] == 1
    assert "total_s" in rep["a"]
    assert isinstance(t.dump(), str)


def test_checkpoint_roundtrip_pair3_and_nf4(tmp_path):
    """The round-4 layouts persist: pair3 (3-bit split-plane) and NF4
    (plane LUT) checkpoints round-trip bit-exact through skq2."""
    from sleekit_tpu.codebooks import Codebook, UniformCodebook

    # d_model 512 so the pair3x mixed groups (K % 512 == 0) really pack.
    cfg = tiny_test(n_layers=2, d_model=512, d_ff=1024)
    for name, cb, layout in (("p3", UniformCodebook(8, -1, 1), "pair3"),
                             ("p3x", UniformCodebook(8, -1, 1), "pair3x"),
                             ("nf4", Codebook.nf4(), "plane")):
        params, _ = random_packed_params(cfg, jax.random.PRNGKey(3), cb,
                                         layout=layout)
        save_packed_params(str(tmp_path / name), params,
                           meta={"model": "tiny", "layout": layout})
        loaded, meta = load_packed_params(str(tmp_path / name))
        assert meta["layout"] == layout
        tokens = jnp.asarray(np.random.RandomState(0).randint(
            0, cfg.vocab_size, (1, 8)).astype(np.int32))
        a = np.asarray(forward(cfg, params, tokens))
        b = np.asarray(forward(cfg, loaded, tokens))
        assert np.array_equal(a, b)
