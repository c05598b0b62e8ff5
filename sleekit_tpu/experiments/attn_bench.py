"""Microbenchmark the flash-decode attention kernel vs its HBM bound.

Sweeps the KV fold factor (ops/attention.FLASH_KV_CHUNK) of
flash_decode_pallas on a model geometry's decode attention: per layer,
one kv_append + one flash_decode over a (L, B, KV, S, D) cache, looped
under lax.scan so the axon host round-trip amortizes (same timing rules
as kernel_bench.py; journal in BENCH_NOTES.md).

Usage:
  python -m sleekit_tpu.experiments.attn_bench [--model opt-1.3b]
      [--batch 8] [--ctx 256] [--kv int8|bf16] [--chunks 4,8,16,32]
      [--iters 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="opt-1.3b")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=256)
    ap.add_argument("--kv", default="int8", choices=("bf16", "int8"))
    ap.add_argument("--chunks", default="4,8,16,32")
    ap.add_argument("--iters", type=int, default=128)
    ap.add_argument("--parts", default="both",
                    choices=("both", "decode", "append"),
                    help="which kernels to include per layer step")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    cache_root = os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(cache_root, jax.default_backend()))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from sleekit_tpu.models.zoo import get_config
    from sleekit_tpu.ops.attention import (
        flash_decode_pallas, kv_append_pallas)

    cfg = get_config(args.model, dtype=jnp.bfloat16)
    b, S = args.batch, args.ctx
    L, KV, D = cfg.n_layers, cfg.kv_heads, cfg.head_dim
    G = cfg.n_heads // KV
    quant = args.kv == "int8"
    kv_bytes = 2 * L * b * KV * S * D * (1 if quant else 2)
    log(f"attn bench: {args.model} L={L} B={b} KV={KV} G={G} S={S} D={D} "
        f"kv={args.kv}; cache bytes/step {kv_bytes / 1e6:.0f} MB "
        f"on {jax.devices()[0].platform}")

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    def make(chunk, iters):
        @jax.jit
        def run(cache, q, kn):
            def body(carry, _):
                cache, pos = carry
                pos_vec = jnp.broadcast_to(pos, (b,))

                def layer_body(inner, lidx):
                    x, cache = inner
                    do_append = args.parts in ("both", "append")
                    do_decode = args.parts in ("both", "decode")
                    out = q
                    if quant:
                        if do_append:
                            ck, cv, ks, vs = kv_append_pallas(
                                kn, kn, cache["k"], cache["v"], pos_vec,
                                lidx, k_scale=cache["k_scale"],
                                v_scale=cache["v_scale"])
                            cache = {"k": ck, "v": cv, "k_scale": ks,
                                     "v_scale": vs}
                        if do_decode:
                            out = flash_decode_pallas(
                                q + x, cache["k"], cache["v"], pos_vec,
                                lidx, 1.0 / D ** 0.5,
                                k_scale=cache["k_scale"],
                                v_scale=cache["v_scale"], kv_chunk=chunk)
                    else:
                        if do_append:
                            ck, cv = kv_append_pallas(
                                kn, kn, cache["k"], cache["v"], pos_vec,
                                lidx)
                            cache = {"k": ck, "v": cv}
                        if do_decode:
                            out = flash_decode_pallas(
                                q + x, cache["k"], cache["v"], pos_vec,
                                lidx, 1.0 / D ** 0.5, kv_chunk=chunk)
                    return (x + 1e-6 * out, cache), None

                (x, cache), _ = jax.lax.scan(
                    layer_body, (jnp.zeros_like(q), cache),
                    jnp.arange(L))
                return (cache, (pos + 1) % S), jnp.sum(
                    x.astype(jnp.float32))

            (cache, _), outs = jax.lax.scan(
                body, (cache, jnp.int32(S // 2)), None, length=iters)
            return outs
        return run

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, cfg.n_heads, D), jnp.bfloat16)
    kn = jax.random.normal(key, (b, KV, D), jnp.bfloat16)

    def fresh_cache():
        shape = (L, b, KV, S, D)
        if quant:
            return {"k": jnp.zeros(shape, jnp.int8),
                    "v": jnp.zeros(shape, jnp.int8),
                    "k_scale": jnp.ones((L, b, KV, S), jnp.float32),
                    "v_scale": jnp.ones((L, b, KV, S), jnp.float32)}
        return {"k": jnp.zeros(shape, jnp.bfloat16),
                "v": jnp.zeros(shape, jnp.bfloat16)}

    results = []
    for chunk in [int(c) for c in args.chunks.split(",")]:
        if KV % chunk and chunk != KV:
            continue
        long, short = make(chunk, args.iters), make(chunk, args.iters // 2)
        t0 = time.time()
        sync(long(fresh_cache(), q, kn))
        sync(short(fresh_cache(), q, kn))
        compile_s = time.time() - t0
        best_l = best_s = float("inf")
        for _ in range(4):
            t0 = time.time()
            sync(long(fresh_cache(), q, kn))
            best_l = min(best_l, time.time() - t0)
            t0 = time.time()
            sync(short(fresh_cache(), q, kn))
            best_s = min(best_s, time.time() - t0)
        step_ms = (best_l - best_s) / (args.iters / 2) * 1e3
        gbs = kv_bytes / (step_ms * 1e-3) / 1e9
        log(f"  kv_chunk {chunk:>3}: {step_ms:7.3f} ms/step "
            f"({step_ms / L * 1e3:5.1f} us/layer, {gbs:6.1f} GB/s eff, "
            f"compile {compile_s:.1f}s)")
        results.append((chunk, round(step_ms, 4)))
    print(results)


if __name__ == "__main__":
    main()
