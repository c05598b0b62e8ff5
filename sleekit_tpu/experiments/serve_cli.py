"""Serve a packed checkpoint: batch generation through the engine.

  python -m sleekit_tpu.experiments.serve_cli ckpt/ --model opt-125m \
      --prompts prompts.npy --max-new-tokens 32 [--temperature 0.7]

Prompts: .npy object/int32 array of token id sequences, or (with
--random N) N random prompts for smoke/throughput runs. Prints one line
per completion plus aggregate tokens/s.
"""

import argparse
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="Serve a packed checkpoint")
    parser.add_argument("ckpt", type=str)
    parser.add_argument("--model", type=str, default="tiny")
    parser.add_argument("--prompts", type=str, default=None,
                        help=".npy array of int32 token prompts")
    parser.add_argument("--random", type=int, default=0,
                        help="Generate N random prompts instead")
    parser.add_argument("--prompt-len", type=int, default=16)
    parser.add_argument("--max-new-tokens", type=int, default=32)
    parser.add_argument("--temperature", type=float, default=0.0)
    parser.add_argument("--slots", type=int, default=8)
    parser.add_argument("--max-seq-len", type=int, default=512)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--kv", type=str, default="f32",
                        choices=["f32", "bf16", "int8"],
                        help="KV-cache dtype (int8 = per-token scales)")
    parser.add_argument("--paged", action="store_true",
                        help="paged KV pool instead of dense slot cache")
    parser.add_argument("--page-size", type=int, default=64)
    parser.add_argument("--total-pages", type=int, default=None)
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel ways over a ('data','model')"
                             " mesh; params must NOT be pre-split "
                             "(prepare_params_for_tp runs here)")
    parser.add_argument("--replicas", type=int, default=1,
                        help="data-axis replicas served as independent "
                             "engines (serve.router.ReplicaRouter): "
                             "replicas*tp devices, round-robin admission,"
                             " zero cross-replica collectives")
    args = parser.parse_args(argv)

    from sleekit_tpu.experiments.common import honor_platform_env
    honor_platform_env()

    import jax.numpy as jnp

    from sleekit_tpu.models.zoo import get_config
    from sleekit_tpu.serve.checkpoint import load_packed_params
    from sleekit_tpu.serve.engine import Engine, Request

    cfg = get_config(args.model)
    params, meta = load_packed_params(args.ckpt)
    print(f"loaded {args.ckpt} (meta: {meta})")

    mesh = None
    if args.tp > 1:
        from sleekit_tpu.parallel.mesh import make_mesh, prepare_params_for_tp
        params = prepare_params_for_tp(cfg, params, args.tp)
        if args.replicas == 1:
            mesh = make_mesh(data=1, model=args.tp)
        print(f"tensor-parallel over {args.tp} devices")

    rng = np.random.RandomState(args.seed)
    if args.prompts:
        arr = np.load(args.prompts, allow_pickle=True)
        prompts = [np.asarray(p, np.int32) for p in arr]
    else:
        n = args.random or 4
        prompts = [rng.randint(0, cfg.vocab_size,
                               (args.prompt_len,)).astype(np.int32)
                   for _ in range(n)]

    cache_dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16,
                   "int8": jnp.int8}[args.kv]
    engine_kw = dict(max_slots=args.slots, max_seq_len=args.max_seq_len,
                     seed=args.seed, cache_dtype=cache_dtype,
                     paged=args.paged, page_size=args.page_size,
                     total_pages=args.total_pages)
    if args.replicas > 1:
        from sleekit_tpu.serve.router import ReplicaRouter, replica_meshes
        engine = ReplicaRouter(
            cfg, params, replica_meshes(args.replicas, args.tp),
            **engine_kw)
        print(f"data axis: {args.replicas} independent replica engines")
    else:
        engine = Engine(cfg, params, mesh=mesh, **engine_kw)
    def mk_reqs():
        return [Request(prompt=p, max_new_tokens=args.max_new_tokens,
                        temperature=args.temperature) for p in prompts]

    t0 = time.time()
    comps = engine.run(mk_reqs())
    dt = time.time() - t0
    new_tokens = sum(len(c.new_tokens) for c in comps)
    for c in comps:
        print(f"[{c.request_id}] +{len(c.new_tokens)} tokens "
              f"({c.finish_reason}): {c.new_tokens.tolist()}")
    print(f"{new_tokens} tokens in {dt:.2f}s = {new_tokens / dt:.1f} "
          "tokens/s (cold: includes jit compiles)")
    # Steady state: the same requests again with every program compiled
    # (first-compiles through the axon relay take minutes and would
    # otherwise masquerade as throughput).
    t0 = time.time()
    comps = engine.run(mk_reqs())
    dt = time.time() - t0
    new_tokens = sum(len(c.new_tokens) for c in comps)
    print(f"steady state: {new_tokens} tokens in {dt:.2f}s = "
          f"{new_tokens / dt:.1f} tokens/s")


if __name__ == "__main__":
    main()
