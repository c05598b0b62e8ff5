"""Decompose per-step decode cost on the current backend.

Times fused K-step loops of progressively stripped decode variants so the
per-step cost splits into weights / attention+KV / embed+unembed parts.
This is the measurement harness behind the serving-kernel optimization
journal (BENCH_NOTES.md); no reference analogue exists (the reference
never runs a model forward, SURVEY.md §5.7).

Usage:
  python -m sleekit_tpu.experiments.profile_decode [--model opt-1.3b]
      [--batch 8] [--steps 64] [--ctx 256] [--nbits 4] [--dense]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="opt-1.3b")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--ctx", type=int, default=256)
    ap.add_argument("--nbits", type=int, default=4)
    ap.add_argument("--dense", action="store_true",
                    help="profile the bf16 dense path instead of packed")
    ap.add_argument("--layout", default="pair",
                    help="packed layout (pair/plane), default = serving default")
    ap.add_argument("--kv", default="int8", choices=("bf16", "int8"),
                    help="KV-cache dtype for the full variant")
    ap.add_argument("--no-fuse", action="store_true",
                    help="skip the serving-time q|k|v fusion")
    ap.add_argument("--variants", default="full,no_unembed,linears_only,attn_only")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    cache_root = os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(cache_root, jax.default_backend()))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from sleekit_tpu.codebooks import UniformCodebook
    from sleekit_tpu.models.eval import decode_scan
    from sleekit_tpu.models.fake_quant import random_packed_params
    from sleekit_tpu.models.transformer import (
        _embed, apply_linear, init_kv_cache, init_params,
        stack_layer_params)
    from sleekit_tpu.models.zoo import get_config

    cfg = get_config(args.model, dtype=jnp.bfloat16, scan_layers=True)
    key = jax.random.PRNGKey(0)
    if args.dense:
        params = stack_layer_params(init_params(cfg, key))
        tag = "bf16 dense"
        kv_dtype = jnp.bfloat16
    else:
        from sleekit_tpu.models.quantize import pack_lm_head

        params, _ = random_packed_params(
            cfg, key, UniformCodebook(2 ** args.nbits, -1.0, 1.0),
            fuse_qkv=not args.no_fuse, layout=args.layout)
        params = pack_lm_head(cfg, params, nbits=8)
        tag = f"int{args.nbits} packed ({args.layout})"
        kv_dtype = {"bf16": jnp.bfloat16, "int8": jnp.int8}[args.kv]
    b, steps, ctx = args.batch, args.steps, args.ctx
    log(f"profile: {args.model} {tag} batch={b} steps={steps} ctx={ctx} "
        f"on {jax.devices()[0].platform}")

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    tiny = jax.jit(lambda x: jnp.sum(x))
    sync(tiny(jnp.ones((8, 8))))
    t0 = time.time()
    for _ in range(5):
        sync(tiny(jnp.ones((8, 8))))
    overhead = (time.time() - t0) / 5
    log(f"  host round-trip overhead: {overhead * 1e3:.1f} ms")

    def timed(fn, *fn_args, tag=""):
        t0 = time.time()
        out = fn(*fn_args)
        sync(out)
        log(f"  {tag}: compile+first {time.time() - t0:.1f}s")
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = fn(*fn_args)
            sync(out)
            best = min(best, time.time() - t0 - overhead)
        ms = best / steps * 1e3
        log(f"  {tag}: {ms:.3f} ms/step")
        return ms

    results = {}
    variants = args.variants.split(",")

    # --- full decode (the bench path) ---------------------------------
    if "full" in variants:
        def run_full():
            cache = init_kv_cache(cfg, b, ctx, dtype=kv_dtype)
            toks, *_ = decode_scan(cfg, params, cache,
                                   jnp.zeros((b,), jnp.int32),
                                   jnp.int32(0), steps)
            return toks
        results["full"] = timed(run_full, tag="full decode")

    # --- full minus the unembed matmul ---------------------------------
    if "no_unembed" in variants:
        from sleekit_tpu.models.transformer import _run_layers_decode

        @functools.partial(jax.jit, donate_argnums=(1,))
        def run_no_unembed(params, cache):
            def body(carry, _):
                last, cache, pos = carry
                positions = pos[None].repeat(b)[:, None]
                x = _embed(cfg, params, last[:, None], positions)
                x, cache = _run_layers_decode(cfg, params, x, positions,
                                              cache, pos)
                nxt = (last + 1) % cfg.vocab_size
                return (nxt, cache, pos + 1), jnp.sum(x.astype(jnp.float32))
            (_, cache, _), outs = jax.lax.scan(
                body, (jnp.zeros((b,), jnp.int32), cache, jnp.int32(0)),
                None, length=steps)
            return outs

        def go():
            # Same cache dtype as the full variant (a hardcoded bf16
            # cache made this variant SLOWER than full under int8 KV -
            # round-3 Llama profile).
            cache = init_kv_cache(cfg, b, ctx, dtype=kv_dtype)
            return run_no_unembed(params, cache)
        results["no_unembed"] = timed(go, tag="no unembed")

    # --- only the six linears per layer (weights streaming) -----------
    if "linears_only" in variants:
        from sleekit_tpu.models.transformer import (
            _merge_stacked_packed, _split_stacked_packed)

        @jax.jit
        def run_linears(params):
            x0 = jnp.ones((b, 1, cfg.d_model), cfg.dtype)
            # Zero-copy layer addressing exactly like the serving scan:
            # big packed tensors stay OUT of the scan xs (layer_sel);
            # scanning them as xs would copy the whole packed model
            # HBM->HBM per step and overstate the weight stream (this
            # variant measured 8.19 ms vs full 6.30 ms on Llama3-8B
            # before the fix).
            bigs, rest = _split_stacked_packed(params["layers"])

            def step_body(x, _):
                def layer_body(x, inp):
                    layer_rest, lidx = inp
                    layer = _merge_stacked_packed(bigs, layer_rest, lidx)
                    a = layer["attn"]
                    m = layer["mlp"]
                    if "qkv" in a:  # serving-time fused projections
                        h = apply_linear(a["qkv"], x)[..., :cfg.d_model]
                    else:
                        h = apply_linear(a["q"], x)
                        h = h + apply_linear(a["k"], x).mean() \
                            + apply_linear(a["v"], x).mean()
                    h = apply_linear(a["o"], h)
                    if "gate_up" in m:
                        gu = apply_linear(m["gate_up"], h)
                        half = gu.shape[-1] // 2
                        h = apply_linear(m["down"],
                                         gu[..., :half] * gu[..., half:])
                    elif "gate" in m:
                        g = apply_linear(m["gate"], h) * apply_linear(m["up"], h)
                        h = apply_linear(m["down"], g)
                    else:
                        g = apply_linear(m["fc1"], h)
                        h = apply_linear(m["fc2"], g)
                    return x + 1e-6 * h, None
                x, _ = jax.lax.scan(layer_body, x,
                                    (rest, jnp.arange(cfg.n_layers)))
                return x, jnp.sum(x.astype(jnp.float32))
            _, outs = jax.lax.scan(step_body, x0, None, length=steps)
            return outs
        results["linears_only"] = timed(run_linears, params,
                                        tag="linears only")

    # --- only attention + KV-cache traffic (the fused kernel path) ----
    if "attn_only" in variants:
        from sleekit_tpu.ops.attention import decode_attention

        quant_kv = kv_dtype == jnp.int8

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_attn(cache):
            hd, kv = cfg.head_dim, cfg.kv_heads
            x0 = jnp.ones((b, 1, cfg.d_model), cfg.dtype)

            def step_body(carry, _):
                cache, pos = carry
                pos_vec = jnp.broadcast_to(pos, (b,))

                def layer_body(inner, lidx):
                    x, cache = inner
                    q = x.reshape(b, cfg.n_heads, hd)
                    k = x[:, 0, : kv * hd].reshape(b, kv, hd)
                    if quant_kv:
                        out, ck, cv, ks, vs = decode_attention(
                            q, k, k, cache["k"], cache["v"], pos_vec, lidx,
                            k_scale=cache["k_scale"],
                            v_scale=cache["v_scale"])
                        cache = {"k": ck, "v": cv,
                                 "k_scale": ks, "v_scale": vs}
                    else:
                        out, ck, cv = decode_attention(
                            q, k, k, cache["k"], cache["v"], pos_vec, lidx)
                        cache = {"k": ck, "v": cv}
                    return (x + out.reshape(b, 1, cfg.d_model), cache), None

                (x, cache), _ = jax.lax.scan(
                    layer_body, (x0, cache), jnp.arange(cfg.n_layers))
                return (cache, pos + 1), jnp.sum(x.astype(jnp.float32))
            (cache, _), outs = jax.lax.scan(
                step_body, (cache, jnp.int32(0)), None, length=steps)
            return outs

        def go_attn():
            cache = init_kv_cache(cfg, b, ctx, dtype=kv_dtype)
            return run_attn(cache)
        results["attn_only"] = timed(
            go_attn, tag=f"attn+kv only ({args.kv if not args.dense else 'bf16'})")

    log("")
    for k, v in results.items():
        log(f"  {k:>14}: {v:7.3f} ms/step")
    if "full" in results and "no_unembed" in results:
        log(f"  {'unembed':>14}: {results['full'] - results['no_unembed']:7.3f} ms/step (derived)")
    if {"no_unembed", "linears_only", "attn_only"} <= results.keys():
        other = (results["no_unembed"] - results["linears_only"]
                 - results["attn_only"])
        log(f"  {'residual':>14}: {other:7.3f} ms/step (norms/embed/overheads)")
    print(results)


if __name__ == "__main__":
    main()
