"""Mesh-aware engine: continuous batching over shard_map TP == single-device.

The Engine(mesh=...) path shards packed params + KV pool over a
('data','model') mesh and runs tp_prefill / tp_decode_step / the fused TP
decode scan; greedy generation must be token-exact vs the single-device
engine (VERDICT.md round-1 item 6).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sleekit_tpu.codebooks import UniformCodebook
from sleekit_tpu.models.fake_quant import random_packed_params
from sleekit_tpu.models.quantize import pack_lm_head
from sleekit_tpu.models.zoo import tiny_test
from sleekit_tpu.parallel.mesh import make_mesh, prepare_params_for_tp
from sleekit_tpu.serve.engine import Engine, Request


def _reqs():
    rng = np.random.RandomState(3)
    return [
        Request(prompt=rng.randint(0, 256, (n,)).astype(np.int32),
                max_new_tokens=m)
        for n, m in ((5, 8), (11, 4), (3, 12), (7, 6), (19, 5))
    ]


def _run(engine):
    outs = engine.run(_reqs())
    return [o.new_tokens.tolist() for o in outs]


@pytest.mark.parametrize("scan_layers", [False, True])
@pytest.mark.parametrize("cache_dtype", [jnp.float32, jnp.int8])
def test_engine_tp_matches_single(scan_layers, cache_dtype):
    cfg = tiny_test(d_model=64, n_heads=4, n_layers=2, d_ff=128,
                    vocab_size=256, scan_layers=False)
    params, _ = random_packed_params(cfg, jax.random.PRNGKey(0),
                                     UniformCodebook(16, -1.0, 1.0))
    params = pack_lm_head(cfg, params, nbits=8)
    tp_params = prepare_params_for_tp(cfg, params, 2)
    if scan_layers:
        import dataclasses
        from sleekit_tpu.models.transformer import stack_layer_params
        params = stack_layer_params(params)
        tp_params = stack_layer_params(tp_params)
        cfg = dataclasses.replace(cfg, scan_layers=True)

    single = Engine(cfg, params, max_slots=4, max_seq_len=64,
                    cache_dtype=cache_dtype)
    want = _run(single)

    mesh = make_mesh(data=2, model=2)
    tp = Engine(cfg, tp_params, max_slots=4, max_seq_len=64,
                cache_dtype=cache_dtype, mesh=mesh)
    got = _run(tp)
    assert got == want


def test_engine_tp_sampled_fused_matches_single():
    """Sampled requests through the TP fused scan (_tp_scan_sampled, key
    in the carry) == the single-device fused engine, token for token."""
    cfg = tiny_test(d_model=64, n_heads=4, n_layers=2, d_ff=128,
                    vocab_size=256, scan_layers=False)
    params, _ = random_packed_params(cfg, jax.random.PRNGKey(0),
                                     UniformCodebook(16, -1.0, 1.0))
    params = pack_lm_head(cfg, params, nbits=8)
    tp_params = prepare_params_for_tp(cfg, params, 2)

    def reqs():
        rng = np.random.RandomState(8)
        return [
            Request(prompt=rng.randint(0, 256, (5,)).astype(np.int32),
                    max_new_tokens=8, temperature=0.8),
            Request(prompt=rng.randint(0, 256, (9,)).astype(np.int32),
                    max_new_tokens=8),  # greedy slot in the same batch
        ]

    single = Engine(cfg, params, max_slots=2, max_seq_len=64,
                    fused_steps=4, seed=3)
    want = [c.new_tokens.tolist() for c in single.run(reqs())]
    mesh = make_mesh(data=1, model=2)
    tp = Engine(cfg, tp_params, max_slots=2, max_seq_len=64,
                fused_steps=4, seed=3, mesh=mesh)
    got = [c.new_tokens.tolist() for c in tp.run(reqs())]
    assert got == want
