"""Packed weights under tensor parallelism (VERDICT.md round-1 item 2).

Three levels:
  1. split_packed_k is a pure re-layout (dequantize round-trips);
  2. the Pallas kernels (interpret mode) on row-parallel K shards inside
     shard_map psum to the single-device result - pinning the
     b*sum(x_shard) affine-fold algebra across shards;
  3. full tp_decode_step with packed params (+ packed int8 lm_head)
     matches single-device packed decode.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from sleekit_tpu.codebooks import UniformCodebook
from sleekit_tpu.models.fake_quant import (
    random_packed_linear, random_packed_params)
from sleekit_tpu.models.quantize import pack_lm_head
from sleekit_tpu.models.transformer import (
    decode_step, init_kv_cache, prefill, stack_layer_params)
from sleekit_tpu.models.zoo import tiny_test
from sleekit_tpu.ops.dequant_matmul import (
    dequant_matmul_pallas, dequant_matmul_xla)
from sleekit_tpu.ops.pack import localize_packed_shard, split_packed_k
from sleekit_tpu.parallel.mesh import (
    make_mesh, param_specs, prepare_params_for_tp)
from sleekit_tpu.parallel.tp_decode import tp_decode_step


@pytest.mark.parametrize("layout", ["plane", "pair"])
@pytest.mark.parametrize("nbits", [3, 4])
def test_split_packed_k_roundtrip(layout, nbits):
    cb = UniformCodebook(2 ** nbits, -1.0, 1.0)
    p = random_packed_linear(jax.random.PRNGKey(0), 160, 64, cb,
                             layout=layout)
    for n in (2, 4):
        ps = split_packed_k(p, n)
        assert ps.k_splits == n
        np.testing.assert_array_equal(np.asarray(ps.dequantize()),
                                      np.asarray(p.dequantize()))


@pytest.mark.parametrize("layout", ["plane", "pair"])
@pytest.mark.parametrize("nbits", [3, 4])
def test_row_parallel_pallas_psum_matches_single(layout, nbits):
    """Each shard runs the REAL kernel (interpret mode) on its localized
    (K/n, N) packing; psum of partial outputs == full-matrix kernel. The
    mantissa/pair kernels fold the affine correction as
    (a*(x@C) + b*sum(x_local)) * scale per shard - linear, so the psum is
    exact up to f32 accumulation order."""
    n = 4
    K, N, M = 512, 256, 8
    cb = UniformCodebook(2 ** nbits, -1.0, 1.0)
    p = random_packed_linear(jax.random.PRNGKey(1), K, N, cb, layout=layout)
    ps = split_packed_k(p, n)
    x = jax.random.normal(jax.random.PRNGKey(2), (M, K)).astype(jnp.bfloat16)

    want_pallas = dequant_matmul_pallas(x, p, interpret=True)
    want_xla = dequant_matmul_xla(x.astype(jnp.float32), p)

    mesh = make_mesh(data=1, model=n)
    pspec = dataclasses.replace(
        ps, packed=P("model", None), scale=P(), lut=P(), bias=None)

    def local(w, xs):
        lw = localize_packed_shard(w, n, row_parallel=True)
        y = dequant_matmul_pallas(xs, lw, interpret=True)
        return lax.psum(y, "model")

    fn = shard_map(local, mesh=mesh,
                   in_specs=(pspec, P(None, "model")),
                   out_specs=P(), check_vma=False)
    got = fn(ps, x)

    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want_pallas, np.float32),
        rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want_xla, np.float32),
        rtol=2e-2, atol=3e-2)


@pytest.mark.parametrize("scan_layers", [False, True])
@pytest.mark.parametrize("layout", ["plane", "pair"])
def test_tp_decode_packed_matches_single(scan_layers, layout):
    cfg = tiny_test(d_model=64, n_heads=4, n_layers=2, d_ff=128,
                    vocab_size=256, scan_layers=False)
    params, _ = random_packed_params(cfg, jax.random.PRNGKey(0),
                                     UniformCodebook(16, -1.0, 1.0),
                                     layout=layout)
    params = pack_lm_head(cfg, params, nbits=8)
    batch = 4
    tokens = jax.random.randint(jax.random.PRNGKey(1), (batch, 6), 0, 256)

    tp_params = prepare_params_for_tp(cfg, params, 2)
    if scan_layers:
        params = stack_layer_params(params)
        tp_params = stack_layer_params(tp_params)
        cfg = dataclasses.replace(cfg, scan_layers=True)

    cache = init_kv_cache(cfg, batch, 16)
    logits0, cache = prefill(cfg, params, tokens, cache)
    nxt = jnp.argmax(logits0[:, -1:], -1).astype(jnp.int32)
    ref_logits, ref_cache = decode_step(cfg, params, nxt, cache, jnp.int32(6))

    mesh = make_mesh(data=2, model=2)
    with mesh:
        tp_logits, tp_cache = tp_decode_step(cfg, tp_params, nxt, cache,
                                             jnp.int32(6), mesh)
    np.testing.assert_allclose(np.asarray(tp_logits), np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)
    ref_k = (ref_cache["k"] if scan_layers else ref_cache[0]["k"])
    tp_k = (tp_cache["k"] if scan_layers else tp_cache[0]["k"])
    np.testing.assert_allclose(np.asarray(tp_k), np.asarray(ref_k),
                               rtol=2e-4, atol=2e-4)


def test_tp_decode_packed_glu_family():
    """Llama-like family: gate/up column-parallel, down row-parallel."""
    cfg = tiny_test(d_model=64, n_heads=4, n_layers=2, d_ff=128,
                    vocab_size=256, activation="silu_glu", norm="rmsnorm",
                    positional="rope", n_kv_heads=2)
    params, _ = random_packed_params(cfg, jax.random.PRNGKey(3),
                                     UniformCodebook(16, -1.0, 1.0))
    batch = 4
    tokens = jax.random.randint(jax.random.PRNGKey(4), (batch, 6), 0, 256)
    cache = init_kv_cache(cfg, batch, 16)
    logits0, cache = prefill(cfg, params, tokens, cache)
    nxt = jnp.argmax(logits0[:, -1:], -1).astype(jnp.int32)
    ref_logits, _ = decode_step(cfg, params, nxt, cache, jnp.int32(6))

    tp_params = prepare_params_for_tp(cfg, params, 2)
    mesh = make_mesh(data=2, model=2)
    with mesh:
        tp_logits, _ = tp_decode_step(cfg, tp_params, nxt, cache,
                                      jnp.int32(6), mesh)
    np.testing.assert_allclose(np.asarray(tp_logits), np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)
