"""Headline benchmark: weight-only-quantized decode throughput per chip.

Prints ONE JSON line PER CONFIG (first line = the int4 headline):
  {"metric": ..., "value": N, "unit": "tokens/s", "vs_baseline": N}

``value`` is packed-weight decode tokens/s on this chip for the flagship
geometry (OPT-1.3B by default) using the fused multi-token decode loop
(one device program per K tokens); ``vs_baseline`` is the speedup over a
bf16 dense decode of the same model on the same chip (the reference
publishes no throughput numbers - BASELINE.md - so the dense model IS
the baseline the quantized path must beat). Default config sweep (the
round-4 verdict asks the driver to capture the int3/nf4/paged headlines,
not just int4): int4 (slot cache), int3 (pair3x mixed layout), nf4
(table-LUT plane kernels), paged4 (int4 over the paged pool via the
fused paged append+flash kernel). Override with BENCH_CONFIGS=int4,...

Timing notes: on the axon TPU tunnel a host<->device round trip costs
~30ms and ``block_until_ready`` does not reliably wait for completion, so
throughput is measured by fetching a value (forced D2H) around a fused
K-step loop and subtracting the measured round-trip overhead.

Env knobs: BENCH_MODEL (zoo name), BENCH_BATCH, BENCH_STEPS, BENCH_NBITS,
BENCH_CTX, BENCH_KV (bf16 | int8 - quantized KV cache for the packed
path), BENCH_CONFIGS, BENCH_PAGE (paged page size).
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: axon remote compiles are slow, cache hard.
    # Keyed by backend - CPU AOT artifacts are machine-specific and must
    # not mix with the TPU cache.
    cache_root = os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(cache_root, jax.default_backend()))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    model_name = os.environ.get("BENCH_MODEL", "opt-1.3b")
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    steps = int(os.environ.get("BENCH_STEPS", "64"))
    nbits = int(os.environ.get("BENCH_NBITS", "4"))
    ctx = int(os.environ.get("BENCH_CTX", "256"))
    # int8 KV cache (per-token scales, quantized in-kernel) is the
    # default serving config: halves KV HBM traffic and doubles context
    # capacity at no measured argmax change (tests/test_attention.py).
    # fp8 (e4m3) compiles but converts in software on v5e - slow.
    # Scale planes default to BF16 since round 5 (they are 1/3 of the
    # f32-scaled int8 KV stream; round-3 ctx-1024 analysis); int8f = f32
    # scale planes (A/B), int8b = explicit bf16 alias.
    kv_name = os.environ.get("BENCH_KV", "int8")
    kv_dtype = {"bf16": jnp.bfloat16, "int8": jnp.int8, "int8f": jnp.int8,
                "int8b": jnp.int8, "fp8": jnp.float8_e4m3fn}[kv_name]
    kv_scale_dtype = jnp.float32 if kv_name == "int8f" else jnp.bfloat16

    # Full-context pair-kernel tuning A/B: BENCH_PAIR_TUNE=kb0s1d1 etc.
    # (microbench sweeps don't transfer; see ops/dequant_matmul.PAIR_TUNE).
    tune = os.environ.get("BENCH_PAIR_TUNE")
    if tune:
        import re

        import sleekit_tpu.ops.dequant_matmul as dq
        mm = re.match(r"kb(\d+)s(\d)d(\d)(?:bn(\d+))?(?:m(\d))?", tune)
        dq.PAIR_TUNE = {"kb": int(mm.group(1)),
                        "split": bool(int(mm.group(2))),
                        "dim_sem": bool(int(mm.group(3))),
                        "bn": int(mm.group(4) or 0),
                        "p3m": int(mm.group(5) or 0)}
        log(f"  PAIR_TUNE override: {dq.PAIR_TUNE}")
    if os.environ.get("BENCH_LUT_POLY"):
        import sleekit_tpu.ops.dequant_matmul as _dqm
        _dqm.LUT_POLY = os.environ["BENCH_LUT_POLY"] == "1"
        log(f"  LUT_POLY={_dqm.LUT_POLY} (table-dequant strategy A/B)")
    if os.environ.get("BENCH_GLUE", "1") == "0":
        import sleekit_tpu.models.transformer as _tr
        _tr.GLUE_FUSE = False
        log("  GLUE_FUSE disabled (A/B)")
    if (os.environ.get("BENCH_ATTN") or os.environ.get("BENCH_KV_CHUNK")
            or os.environ.get("BENCH_ATTN_FOLD")):
        import sleekit_tpu.ops.attention as _at
        if os.environ.get("BENCH_ATTN") == "bfold":
            _at.FLASH_BATCH_FOLD = True
        elif os.environ.get("BENCH_ATTN") == "split":
            _at.FLASH_FUSED_APPEND = False  # un-fused append + flash pair
        elif os.environ.get("BENCH_ATTN"):
            _at.FLASH_MHA_MODE = os.environ["BENCH_ATTN"]
        if os.environ.get("BENCH_KV_CHUNK"):
            _at.FLASH_KV_CHUNK = int(os.environ["BENCH_KV_CHUNK"])
        if os.environ.get("BENCH_ATTN_FOLD"):
            _at.FLASH_FOLD = int(os.environ["BENCH_ATTN_FOLD"])
        log(f"  attention A/B: mode={_at.FLASH_MHA_MODE} "
            f"bfold={_at.FLASH_BATCH_FOLD} kv_chunk={_at.FLASH_KV_CHUNK} "
            f"fused={_at.FLASH_FUSED_APPEND} fold={_at.FLASH_FOLD}")

    # BENCH_TEMP=0.7: decode via the fused SAMPLED scan (on-device
    # categorical sampling, PRNG key in the scan carry) instead of greedy
    # argmax - must stay within ~10% of greedy throughput.
    temp = float(os.environ.get("BENCH_TEMP", "0"))

    from sleekit_tpu.codebooks import UniformCodebook
    from sleekit_tpu.models.eval import decode_scan, decode_scan_sampled
    from sleekit_tpu.models.fake_quant import random_packed_params
    from sleekit_tpu.models.transformer import (
        init_kv_cache, init_paged_kv_cache, init_params, stack_layer_params)
    from sleekit_tpu.models.zoo import get_config

    # scan_layers compiles the layer stack once (vital: remote compiles of
    # unrolled deep models through the axon relay take tens of minutes).
    cfg = get_config(model_name, dtype=jnp.bfloat16, scan_layers=True)
    log(f"bench: {model_name} {nbits}-bit batch={batch} steps={steps} "
        f"ctx={ctx} on {jax.devices()[0].platform}")

    key = jax.random.PRNGKey(0)

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    # Measure the host round-trip overhead to subtract from timings.
    tiny = jax.jit(lambda x: jnp.sum(x))
    sync(tiny(jnp.ones((8, 8))))
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        sync(tiny(jnp.ones((8, 8))))
    overhead = (time.time() - t0) / reps
    log(f"  host round-trip overhead: {overhead * 1e3:.1f} ms")

    first = jnp.zeros((batch,), jnp.int32)
    if temp > 0:
        temps = jnp.full((batch,), temp, jnp.float32)
        zk = jnp.zeros((batch,), jnp.int32)
        zp = jnp.ones((batch,), jnp.float32)

        def scan_fn(cfg, params, cache, first, pos0, steps):
            return decode_scan_sampled(
                cfg, params, cache, first, pos0, steps, temps, zk, zp,
                jax.random.PRNGKey(1), use_topkp=False)[:4]
        log(f"  sampled decode (temperature={temp})")
    else:
        scan_fn = decode_scan

    # Paged page size: 256 = the throughput-parity configuration (99.3%
    # of the slot engine measured at ctx 256; one fused program per page
    # per row, same program count as the slot path). 128 = finer memory
    # granularity at ~93% (one extra launch per layer per row); the
    # ENGINE default stays 64 for maximal packing of mixed lengths.
    page_size = int(os.environ.get("BENCH_PAGE", "256"))
    # ctx must hold a whole number of pages: clamp to ctx, then shrink
    # to a divisor (BENCH_CTX=128 with the 256 default previously built
    # a zero-width page table - round-5 review).
    page_size = max(min(page_size, ctx), 8)
    while ctx % page_size:
        page_size //= 2

    def make_cache(cache_dtype, paged, scale_dtype):
        if paged:
            maxp = ctx // page_size
            c = init_paged_kv_cache(cfg, batch * maxp + 1, page_size,
                                    batch, maxp, cache_dtype,
                                    scale_dtype=scale_dtype)
            # Slot i owns pages [1 + i*maxp, ...); page 0 stays the trash
            # page (engine layout). Physical order deliberately strided.
            table = 1 + np.arange(batch * maxp).reshape(batch, maxp)
            c["page_table"] = jnp.asarray(table, jnp.int32)
            return c
        return init_kv_cache(cfg, batch, ctx, dtype=cache_dtype,
                             scale_dtype=scale_dtype)

    def run_decode(params, tag, cache_dtype=jnp.bfloat16, paged=False,
                   scale_dtype=None):
        scale_dtype = scale_dtype or kv_scale_dtype
        cache = make_cache(cache_dtype, paged, scale_dtype)
        t0 = time.time()
        toks, cache, last, pos = scan_fn(cfg, params, cache, first,
                                         jnp.int32(0), steps)
        sync(toks)
        log(f"  {tag}: compile+first loop {time.time() - t0:.1f}s")
        best = float("inf")
        # Best-of-5: the driver's cold run is one session; extra reps
        # are cheap (~0.15 s each) insurance against tunnel hiccups.
        for _ in range(5):
            cache = make_cache(cache_dtype, paged, scale_dtype)
            t0 = time.time()
            toks, cache, last, pos = scan_fn(cfg, params, cache, first,
                                             jnp.int32(0), steps)
            sync(toks)
            best = min(best, time.time() - t0 - overhead)
        tok_s = batch * steps / best
        log(f"  {tag}: {best / steps * 1e3:.2f} ms/step, {tok_s:.1f} tokens/s")
        return tok_s

    # Quantized packed decode: fused q|k|v + gate|up projections and an
    # int8-packed unembed head on top of the int-N packed linears.
    from sleekit_tpu.models.quantize import pack_lm_head

    # ---- config sweep -----------------------------------------------------
    # Named configs: int4 = the headline; int3 = pair3x mixed layout (the
    # 3-bit-beats-int4 claim, now driver-captured); int3p = memory-optimal
    # pair3; nf4 = table-codebook LUT serving; paged4 = int4 over the
    # paged pool (fused paged append+flash kernel). Legacy single-config
    # A/B knobs (BENCH_NBITS / BENCH_CODEBOOK / BENCH_LAYOUT /
    # BENCH_PAGED) override the sweep when any of them is set.
    named = {
        "int4": dict(nbits=4, layout="pair", nf4=False, paged=False),
        "int3": dict(nbits=3, layout="pair3x", nf4=False, paged=False),
        "int3p": dict(nbits=3, layout="pair3", nf4=False, paged=False),
        "nf4": dict(nbits=4, layout="plane", nf4=True, paged=False),
        "paged4": dict(nbits=4, layout="pair", nf4=False, paged=True),
        # f32-scale-plane A/B twin of int4 (scale planes default bf16).
        "int4f": dict(nbits=4, layout="pair", nf4=False, paged=False,
                      scale_dtype=jnp.float32),
    }
    legacy = (os.environ.get("BENCH_NBITS") or os.environ.get("BENCH_CODEBOOK")
              or os.environ.get("BENCH_LAYOUT") or os.environ.get("BENCH_PAGED"))
    if legacy:
        is_nf4 = os.environ.get("BENCH_CODEBOOK") == "nf4"
        name = f"custom-int{nbits}" if not is_nf4 else "nf4"
        # Table codebooks must serve through the plane LUT kernels: the
        # pair fast path needs an affine codebook and would silently
        # fall back to the XLA dense-dequant oracle (round-5 review).
        default_layout = ("plane" if is_nf4
                          else "pair3x" if nbits == 3 else "pair")
        run_cfgs = [(name, dict(
            nbits=nbits,
            layout=os.environ.get("BENCH_LAYOUT", default_layout),
            nf4=is_nf4,
            paged=os.environ.get("BENCH_PAGED", "0") == "1"))]
    else:
        sel = os.environ.get("BENCH_CONFIGS", "int4,int3,nf4,paged4")
        run_cfgs = [(n, named[n]) for n in sel.split(",") if n]

    # Dense bf16 baseline (measured once). BENCH_DENSE=0 skips it
    # (8B-class models do not fit one 16 GB chip in bf16 - the whole
    # point of the packed path); vs_baseline then reports the
    # packed/dense HBM byte ratio instead.
    dense_tok_s = None
    if os.environ.get("BENCH_DENSE", "1") != "0":
        dparams = init_params(cfg, key)
        if cfg.scan_layers:
            dparams = stack_layer_params(dparams)
        dense_tok_s = run_decode(dparams, "bf16 dense")
        del dparams
    else:
        log("  bf16 dense baseline skipped (BENCH_DENSE=0)")
        dense_shapes = jax.eval_shape(lambda k: init_params(cfg, k), key)
        dense_bytes = sum(int(np.prod(s.shape)) * s.dtype.itemsize
                          for s in jax.tree.leaves(dense_shapes))

    results = []
    for name, c in run_cfgs:
        if c["nf4"]:
            from sleekit_tpu.codebooks import Codebook
            codebook = Codebook.nf4()
        else:
            codebook = UniformCodebook(2 ** c["nbits"], -1.0, 1.0)
        qparams, _ = random_packed_params(cfg, key, codebook,
                                          fuse_qkv=True, layout=c["layout"])
        qparams = pack_lm_head(cfg, qparams, nbits=8)
        packed_bytes = sum(x.size * x.dtype.itemsize
                           for x in jax.tree.leaves(qparams))
        tag = (f"{name} [{c['layout']}"
               + (", paged" if c["paged"] else "") + "]")
        tok_s = run_decode(qparams, tag, cache_dtype=kv_dtype,
                           paged=c["paged"],
                           scale_dtype=c.get("scale_dtype"))
        del qparams
        vs = (round(tok_s / dense_tok_s, 4) if dense_tok_s
              else round(dense_bytes / packed_bytes, 4))
        metric = name if not name.startswith("custom-") else name[7:]
        metric = {"paged4": "int4_paged", "int3p": "int3_pair3"}.get(
            metric, metric)
        results.append({
            "metric": (f"decode_tokens_per_sec_per_chip_{metric}"
                       f"_{model_name}"),
            "value": round(tok_s, 2),
            "unit": "tokens/s",
            "vs_baseline": vs,
        })

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
