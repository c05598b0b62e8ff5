"""Microbenchmark the fused dequant-matmul kernel against its HBM bound.

Times y = x @ deq(W) for the decode-shape matmuls of a model geometry
(M = batch, K/N from the layer shapes), per layout/variant, and reports
effective packed-weight GB/s vs the chip's stream bound. The inner loop
runs many matmuls under one lax.scan so the axon host round trip
amortizes (BENCH_NOTES.md measurement rules).

Usage:
  python -m sleekit_tpu.experiments.kernel_bench [--nbits 4] [--m 8]
      [--shapes 2048x6144,2048x2048,2048x8192,8192x2048] [--iters 256]
      [--variants pair,plane,dense]
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
    ap.add_argument("--nbits", type=int, default=4)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--shapes",
                    default="2048x6144,2048x2048,2048x8192,8192x2048")
    ap.add_argument("--iters", type=int, default=256)
    ap.add_argument("--variants", default="pair,plane,dense")
    ap.add_argument("--block-n", type=int, default=1024)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    cache_root = os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(cache_root, jax.default_backend()))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from sleekit_tpu.codebooks import UniformCodebook
    from sleekit_tpu.models.fake_quant import random_packed_linear
    from sleekit_tpu.ops.dequant_matmul import dequant_matmul_pallas

    cb = UniformCodebook(2 ** args.nbits, -1.0, 1.0)
    shapes = [tuple(map(int, s.split("x"))) for s in args.shapes.split(",")]
    variants = args.variants.split(",")
    m = args.m

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    tiny = jax.jit(lambda x: jnp.sum(x))
    sync(tiny(jnp.ones((8, 8))))
    t0 = time.time()
    for _ in range(5):
        sync(tiny(jnp.ones((8, 8))))
    overhead = (time.time() - t0) / 5
    log(f"host round-trip overhead: {overhead * 1e3:.1f} ms; "
        f"backend {jax.devices()[0].platform}")

    def timed_loop(fn, x0, tag):
        """Per-iteration time via the slope between a long and a short
        fused loop (cancels the axon host round-trip constant exactly).
        The output feeds back a tiny perturbation so XLA cannot hoist the
        matmul out of the loop."""
        def make(length):
            @jax.jit
            def loop(x):
                def body(x, _):
                    y = fn(x)
                    return x + 1e-12 * jnp.sum(y, dtype=jnp.float32
                                               ).astype(x.dtype), None
                x, _ = jax.lax.scan(body, x, None, length=length)
                return x
            return loop

        long, short = make(args.iters), make(args.iters // 2)
        t0 = time.time()
        sync(long(x0))
        sync(short(x0))
        compile_s = time.time() - t0
        best_l = best_s = float("inf")
        for _ in range(4):
            t0 = time.time()
            sync(long(x0))
            best_l = min(best_l, time.time() - t0)
            t0 = time.time()
            sync(short(x0))
            best_s = min(best_s, time.time() - t0)
        us = (best_l - best_s) / (args.iters / 2) * 1e6
        return us, compile_s

    results = []
    for (k, n) in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), (m, k)
                              ).astype(jnp.bfloat16)
        packed_bytes = None
        for variant in variants:
            if variant == "dense":
                w = jax.random.normal(jax.random.PRNGKey(1), (k, n)
                                      ).astype(jnp.bfloat16)
                fn = (lambda w: lambda x: jnp.dot(
                    x, w, preferred_element_type=jnp.float32))(w)
                nbytes = k * n * 2
            elif variant.startswith("pair@"):
                # tuned pair kernel, e.g. pair@kb2s1d1 = 2 tiles/step,
                # split dots, parallel/arbitrary dimension semantics
                import re

                from sleekit_tpu.ops.dequant_matmul import _pallas_pair_impl
                mm = re.match(r"pair@kb(\d+)s(\d)d(\d)", variant)
                kb, split, dim = (int(mm.group(1)), bool(int(mm.group(2))),
                                  bool(int(mm.group(3))))
                p = random_packed_linear(jax.random.PRNGKey(1), k, n, cb,
                                         layout="pair")
                step, zero = p.affine
                a = step * float(2 ** p.nbits)

                def fn(x, p=p, a=a, zero=zero, kb=kb, split=split, dim=dim):
                    return _pallas_pair_impl(
                        x, p.packed, p.scale, p.bias, nbits=p.nbits,
                        affine_a=a, affine_b=zero - a, block_n=args.block_n,
                        interpret=False, kb=kb, split=split, dim_sem=dim)
                nbytes = int(p.packed.size) * 4
            else:
                p = random_packed_linear(jax.random.PRNGKey(1), k, n, cb,
                                         layout=variant)
                fn = (lambda p: lambda x: dequant_matmul_pallas(
                    x, p, block_n=args.block_n))(p)
                nbytes = int(p.packed.size) * 4
                packed_bytes = nbytes
            us, compile_s = timed_loop(fn, x, variant)
            gbs = nbytes / (us * 1e-6) / 1e9
            results.append((k, n, variant, us, gbs, nbytes))
            log(f"  {k}x{n} {variant:>6}: {us:8.1f} us  {gbs:7.1f} GB/s "
                f"(bytes {nbytes / 1e6:.1f} MB, compile {compile_s:.1f}s)")

    log("")
    log(f"{'shape':>12} {'variant':>8} {'us':>9} {'GB/s':>8}")
    for k, n, v, us, gbs, nb in results:
        log(f"{k}x{n:>6} {v:>8} {us:9.1f} {gbs:8.1f}")
    print([(f"{k}x{n}", v, round(us, 1), round(gbs, 1))
           for k, n, v, us, gbs, nb in results])


if __name__ == "__main__":
    main()
