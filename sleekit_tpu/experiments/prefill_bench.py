"""Prefill-side matmul MFU and the packed-vs-dense crossover (round-3
VERDICT ask 7: all published perf was decode; measure prefill).

Per geometry and M in {8, 128, 512, 2048}, times three implementations
of y = x @ deq(W):
  * pair    - the streaming pair kernel (decode-shaped; full-M x block)
  * deq+mm  - dequantize-once-then-dense bf16
              (ops/dequant_matmul._dequant_dense_bf16, the fallback)
  * dense   - plain bf16 matmul of pre-dequantized weights (upper bound)
and reports ms + MFU vs the v5e bf16 peak. Then measures end-to-end
prefill tokens/s on the packed model (models/transformer.prefill).

Run ON TPU, one client at a time:
  python -m sleekit_tpu.experiments.prefill_bench [--model opt-1.3b]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

V5E_BF16_PEAK = 197e12  # FLOP/s


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="opt-1.3b")
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--skip-matmul", action="store_true",
                    help="only the end-to-end prefill section")
    ap.add_argument("--modes", default="ours",
                    help="comma list of prefill attention routes to A/B "
                         "(ours | stock | xla; transformer.PREFILL_MODE)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    cache_root = os.environ.get(
        "JAX_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(cache_root, jax.default_backend()))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import sleekit_tpu.ops.dequant_matmul as dq
    from sleekit_tpu.codebooks import UniformCodebook
    from sleekit_tpu.models.fake_quant import random_packed_linear

    rng = np.random.RandomState(0)

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    tiny = jax.jit(lambda x: jnp.sum(x))
    sync(tiny(jnp.ones((8, 8))))
    # MIN of several samples: a single tunnel hiccup in a mean-of-5
    # poisons every subtraction downstream (negative wall-clocks).
    overhead = float("inf")
    for _ in range(7):
        t0 = time.time()
        sync(tiny(jnp.ones((8, 8))))
        overhead = min(overhead, time.time() - t0)
    print(f"host round-trip overhead: {overhead * 1e3:.1f} ms", flush=True)

    LOOP = 128

    def loopify(fn):
        """Repeat fn LOOP times inside one jit (sub-ms ops are unmeasurable
        through the ~26 ms tunnel round trip). The carry consumes a FULL
        reduction of y - a slice would let XLA shrink the dot to a
        slice-of-operands dot and time nothing - and feeds a negligible
        perturbation back into x so nothing hoists."""
        def body(carry, _):
            x, s = carry
            y = fn(x)
            s2 = s + jnp.sum(y.astype(jnp.float32)).reshape(1) * 1e-30
            # maximum() is not affine: XLA cannot distribute the next
            # iteration's dot over it and hoist the invariant part (it
            # CAN for x + c or x * c - measured as >100% MFU nonsense).
            x = jnp.maximum(x, (s2[0] - 1e30).astype(x.dtype))
            return (x, s2), None

        @jax.jit
        def run(x):
            (x, s), _ = jax.lax.scan(
                body, (x, jnp.zeros((1,), jnp.float32)), None, length=LOOP)
            return s
        return run

    def timeit(fn, *a, loop=False):
        reps = 1
        if loop:
            fn = loopify(fn)
            reps = LOOP
        sync(fn(*a))  # compile
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            sync(fn(*a))
            best = min(best, (time.time() - t0 - overhead) / reps)
        return best

    geoms = [("fc1", 2048, 8192), ("attn-qkv", 2048, 6144)]
    if args.skip_matmul:
        geoms = []
    else:
        print(f"\n{'geom':10s} {'nbits':5s} {'M':>5s} {'pair ms':>9s} "
              f"{'deq+mm ms':>10s} {'dense ms':>9s} {'best MFU':>9s}")
    crossover = {}
    for gname, K, N in geoms:
        for nbits in (3, 4):
            cb = UniformCodebook(2 ** nbits, -1.0, 1.0)
            w = random_packed_linear(jax.random.PRNGKey(0), K, N, cb,
                                     layout="pair3" if nbits == 3
                                     else "pair")
            dense_w = jnp.asarray(w.dequantize(), jnp.bfloat16)

            pair_fn = jax.jit(lambda x, w=w: dq._pallas_pair_impl(
                x, w.packed, w.scale,
                w.bias if w.bias is not None
                else jnp.zeros((w.out_features,), jnp.float32),
                nbits=w.nbits, affine_a=dq._pair_affine(w)[0],
                affine_b=dq._pair_affine(w)[1], block_n=1024,
                interpret=False, pair3=w.layout == "pair3",
                **dq.PAIR_TUNE))
            deq_fn = jax.jit(lambda x, w=w: dq._dequant_dense_bf16(x, w))
            dense_fn = jax.jit(lambda x, dw=dense_w: jnp.dot(
                x, dw, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16))

            for M in (8, 128, 512, 2048):
                x = jnp.asarray(rng.randn(M, K).astype(np.float32) * 0.1,
                                jnp.bfloat16)
                res = {}
                for name, fn in (("pair", pair_fn), ("deq+mm", deq_fn),
                                 ("dense", dense_fn)):
                    try:
                        res[name] = timeit(fn, x, loop=True)
                    except Exception as e:  # noqa: BLE001 - record OOMs
                        res[name] = float("nan")
                        print(f"    {name} failed at M={M}: "
                              f"{type(e).__name__}", flush=True)
                flops = 2.0 * M * K * N
                best = np.nanmin([res["pair"], res["deq+mm"]])
                mfu = flops / best / V5E_BF16_PEAK if best > 0 else 0.0
                print(f"{gname:10s} int{nbits:<2d} {M:>5d} "
                      f"{res['pair'] * 1e3:>9.3f} "
                      f"{res['deq+mm'] * 1e3:>10.3f} "
                      f"{res['dense'] * 1e3:>9.3f} {mfu:>8.1%}",
                      flush=True)
                key = (gname, nbits)
                if key not in crossover and res["deq+mm"] < res["pair"]:
                    crossover[key] = M
    if not args.skip_matmul:
        print(f"\npair->deq+mm crossover (first M where dense path wins): "
              f"{crossover}")
        print("pair-kernel M-chunk size PREFILL_CHUNK_M = "
              f"{dq.PREFILL_CHUNK_M}")

    # ---- end-to-end prefill tokens/s ---------------------------------
    from sleekit_tpu.models.fake_quant import random_packed_params
    from sleekit_tpu.models.quantize import pack_lm_head
    from sleekit_tpu.models.transformer import init_kv_cache, prefill
    from sleekit_tpu.models.zoo import get_config

    cfg = get_config(args.model, dtype=jnp.bfloat16, scan_layers=True)
    params, _ = random_packed_params(cfg, jax.random.PRNGKey(0),
                                     UniformCodebook(16, -1.0, 1.0),
                                     fuse_qkv=True, layout="pair")
    params = pack_lm_head(cfg, params, nbits=8)
    tokens = jnp.asarray(rng.randint(0, cfg.vocab_size,
                                     (args.batch, args.seq)), jnp.int32)
    toks = args.batch * args.seq
    # Attention-route A/B: transformer.PREFILL_MODE is a jit-trace-time
    # global, so each mode jits a FRESH prefill wrapper (closure identity
    # defeats the jit cache).
    import sleekit_tpu.models.transformer as tr

    for mode in args.modes.split(","):
        tr.PREFILL_MODE = mode

        def pf_run(c, p, t, cache, _m=mode):
            return prefill(c, p, t, cache)

        pf = jax.jit(pf_run, static_argnums=(0,))

        def run():
            cache = init_kv_cache(cfg, args.batch, args.seq,
                                  dtype=jnp.int8)
            logits, cache = pf(cfg, params, tokens, cache)
            return logits

        best = timeit(run)
        print(f"\nprefill {args.model} int4 [attn={mode}]: {toks} tokens "
              f"in {best * 1e3:.1f} ms = {toks / best:.0f} tokens/s",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
