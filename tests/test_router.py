"""ReplicaRouter: data-axis serving as independent per-replica engines.

The multi-host recipe is TP inside each host, DATA across hosts with
zero per-step cross-replica collectives (parallel/comm_model.py
two_host_recipe). These tests realize it on the 8-virtual-device CPU
mesh: two TP-2 replicas over disjoint device sets, deterministic
round-robin admission, token-exact against plain engines serving the
same subsets."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sleekit_tpu.codebooks import UniformCodebook
from sleekit_tpu.models.fake_quant import random_packed_params
from sleekit_tpu.models.quantize import pack_lm_head
from sleekit_tpu.models.zoo import tiny_test
from sleekit_tpu.serve.engine import Engine, Request
from sleekit_tpu.serve.router import ReplicaRouter, replica_meshes


def _cfg():
    return tiny_test(d_model=64, n_heads=4, n_layers=2, d_ff=128,
                     vocab_size=256)


def _params(cfg):
    p, _ = random_packed_params(cfg, jax.random.PRNGKey(0),
                                UniformCodebook(16, -1.0, 1.0))
    return pack_lm_head(cfg, p, nbits=8)


def _reqs(cfg, n=5):
    rng = np.random.RandomState(3)
    out = []
    for i in range(n):
        out.append(Request(
            prompt=rng.randint(0, cfg.vocab_size,
                               (3 + 2 * i,)).astype(np.int32),
            max_new_tokens=4 + (i % 3),
            temperature=0.8 if i == 2 else 0.0))
    return out


def test_router_token_exact_vs_per_replica_engines():
    """Router over 2 TP-2 replicas emits, per request, exactly the
    tokens a standalone engine produces for that replica's subset."""
    cfg = _cfg()
    params = _params(cfg)
    from sleekit_tpu.parallel.mesh import prepare_params_for_tp

    tp_params = prepare_params_for_tp(cfg, params, 2)
    meshes = replica_meshes(2, 2)
    assert len({d for m in meshes for d in m.devices.flat}) == 4

    router = ReplicaRouter(cfg, tp_params, meshes, max_slots=2,
                           max_seq_len=32, seed=0)
    got = router.run(_reqs(cfg))
    assert len(got) == 5
    # request i -> replica i % 2, recorded deterministically
    assert [router.owner(i) for i in range(5)] == [0, 1, 0, 1, 0]

    # Oracles: one plain engine per replica on the same subset (same
    # engine geometry + seed -> identical PRNG stream and admission).
    for rep in (0, 1):
        want = Engine(cfg, params, max_slots=2, max_seq_len=32,
                      seed=0).run(_reqs(cfg)[rep::2])
        subset = got[rep::2]
        for g, w in zip(subset, want):
            assert g.new_tokens.tolist() == w.new_tokens.tolist(), rep


def test_router_partial_local_replicas():
    """A process owning only replica 1 serves exactly requests 1, 3 and
    agrees with the full router's completions for them."""
    cfg = _cfg()
    params = _params(cfg)
    from sleekit_tpu.parallel.mesh import prepare_params_for_tp

    tp_params = prepare_params_for_tp(cfg, params, 2)
    meshes = replica_meshes(2, 2)

    full = ReplicaRouter(cfg, tp_params, meshes, max_slots=2,
                         max_seq_len=32, seed=0)
    all_out = full.run(_reqs(cfg))

    part = ReplicaRouter(cfg, tp_params, [meshes[1]], replica_ids=[1],
                         n_replicas=2, max_slots=2, max_seq_len=32, seed=0)
    out = part.run(_reqs(cfg))
    assert [c.request_id for c in out] == [1, 3]
    for c in out:
        assert (c.new_tokens.tolist()
                == all_out[c.request_id].new_tokens.tolist())


def test_router_single_device_replicas():
    """model=1 replicas run the plain engine (mesh dropped) PINNED to
    their assigned device - each replica's cache must live on its own
    device, not all on device 0 (round-5 review finding); 4 replicas
    over 4 devices round-robin deterministically."""
    cfg = _cfg()
    params = _params(cfg)
    meshes = replica_meshes(4, 1)
    expect_dev = [list(m.devices.flat)[0] for m in meshes]
    router = ReplicaRouter(cfg, params, meshes, max_slots=2,
                           max_seq_len=32, seed=0)
    for rid, e in router.engines.items():
        assert e.mesh is None
        leaf = jax.tree_util.tree_leaves(e.cache)[0]
        assert leaf.devices() == {expect_dev[rid]}, (
            rid, leaf.devices(), expect_dev[rid])
    got = router.run(_reqs(cfg, n=6))
    assert [router.owner(i) for i in range(6)] == [0, 1, 2, 3, 0, 1]
    want = Engine(cfg, params, max_slots=2, max_seq_len=32,
                  seed=0).run(_reqs(cfg, n=6))
    # replicas 0/1 serve two requests each (same order as a fresh
    # engine fed the subset); 2/3 serve one - every completion must
    # match a single-engine run of its subset.
    for rep in range(4):
        sub = [c for c in got if router.owner(c.request_id) == rep]
        oracle = Engine(cfg, params, max_slots=2, max_seq_len=32,
                        seed=0).run(_reqs(cfg, n=6)[rep::4])
        for g, w in zip(sub, oracle):
            assert g.new_tokens.tolist() == w.new_tokens.tolist()
    del want


def test_router_decode_has_no_data_axis_collectives():
    """The per-replica decode program's collectives are exactly the
    TP-only set (2 psums/layer + 1 logits all-gather): the data axis
    adds NONE - the zero-DCN-traffic claim of the 2-host recipe, now
    asserted on the program that actually serves."""
    from sleekit_tpu.models.transformer import init_kv_cache
    from sleekit_tpu.parallel.comm_model import count_collectives_in_jaxpr
    from sleekit_tpu.parallel.mesh import (kv_cache_specs, param_specs,
                                           prepare_params_for_tp,
                                           shard_pytree)
    from sleekit_tpu.parallel.tp_decode import tp_decode_step

    cfg = _cfg()
    params = _params(cfg)
    tp_params = prepare_params_for_tp(cfg, params, 2)
    mesh = replica_meshes(2, 2)[0]
    with mesh:
        tp_sharded = shard_pytree(tp_params, param_specs(cfg, tp_params),
                                  mesh)
        cache = init_kv_cache(cfg, 2, 32)
        cache = shard_pytree(cache, kv_cache_specs(cache), mesh)
        tokens = jnp.zeros((2, 1), jnp.int32)
        traced = jax.make_jaxpr(
            lambda p, t, c: tp_decode_step(cfg, p, t, c, jnp.int32(0),
                                           mesh))(tp_sharded, tokens, cache)
    got = count_collectives_in_jaxpr(traced)
    n_psum = got.get("psum", 0) + got.get("psum2", 0)
    assert n_psum == 2 * cfg.n_layers, got
    assert got.get("all_gather", 0) == 1, got
    extra = {k: v for k, v in got.items()
             if k not in ("psum", "psum2", "all_gather")}
    assert not extra, got


def test_router_with_paged_engines():
    """ReplicaRouter + paged-pool TP engines - the flagship multi-host
    serving combination (each host: TP sub-mesh + its own page pool;
    the data axis never shares a program, so 'paged multi-process' is
    just paged single-process per replica)."""
    cfg = _cfg()
    params = _params(cfg)
    from sleekit_tpu.parallel.mesh import prepare_params_for_tp

    tp_params = prepare_params_for_tp(cfg, params, 2)
    meshes = replica_meshes(2, 2)
    router = ReplicaRouter(cfg, tp_params, meshes, max_slots=2,
                           max_seq_len=32, seed=0, paged=True,
                           page_size=16)
    got = router.run(_reqs(cfg))
    assert len(got) == 5
    for rep in (0, 1):
        want = Engine(cfg, params, max_slots=2, max_seq_len=32,
                      seed=0, paged=True, page_size=16).run(
                          _reqs(cfg)[rep::2])
        for g, w in zip(got[rep::2], want):
            assert g.new_tokens.tolist() == w.new_tokens.tolist(), rep
