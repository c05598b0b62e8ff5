"""Headline benchmark: weight-only-quantized decode throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tokens/s", "vs_baseline": N}

``value`` is int4 packed-weight decode tokens/s on this chip for the
flagship geometry (OPT-1.3B by default); ``vs_baseline`` is the speedup
over a bf16 dense decode of the same model on the same chip (the
reference publishes no throughput numbers - BASELINE.md - so the dense
model IS the baseline the quantized path must beat).

Env knobs: BENCH_MODEL (zoo name), BENCH_BATCH, BENCH_STEPS, BENCH_NBITS,
BENCH_CTX.
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
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    model_name = os.environ.get("BENCH_MODEL", "opt-1.3b")
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    steps = int(os.environ.get("BENCH_STEPS", "32"))
    nbits = int(os.environ.get("BENCH_NBITS", "4"))
    ctx = int(os.environ.get("BENCH_CTX", "256"))

    from sleekit_tpu.codebooks import UniformCodebook
    from sleekit_tpu.models.fake_quant import random_packed_params
    from sleekit_tpu.models.transformer import decode_step, init_kv_cache, init_params
    from sleekit_tpu.models.zoo import get_config

    # scan_layers compiles the layer stack once (vital: remote compiles of
    # unrolled deep models through the axon relay take tens of minutes).
    cfg = get_config(model_name, dtype=jnp.bfloat16, scan_layers=True)
    log(f"bench: {model_name} {nbits}-bit batch={batch} steps={steps} "
        f"ctx={ctx} on {jax.devices()[0].platform}")

    key = jax.random.PRNGKey(0)
    codebook = UniformCodebook(2 ** nbits, -1.0, 1.0)

    decode = jax.jit(decode_step, static_argnums=(0,))
    tokens = jnp.zeros((batch, 1), jnp.int32)

    def run_decode(params, tag):
        cache = init_kv_cache(cfg, batch, ctx, dtype=jnp.bfloat16)
        t0 = time.time()
        logits, cache = decode(cfg, params, tokens, cache, jnp.int32(0))
        jax.block_until_ready(logits)
        log(f"  {tag}: compile+first step {time.time() - t0:.1f}s")
        # warmup
        for i in range(3):
            logits, cache = decode(cfg, params, tokens, cache, jnp.int32(i + 1))
        jax.block_until_ready(logits)
        t0 = time.time()
        for i in range(steps):
            logits, cache = decode(cfg, params, tokens, cache, jnp.int32(4 + i))
        jax.block_until_ready(logits)
        dt = time.time() - t0
        tok_s = batch * steps / dt
        log(f"  {tag}: {dt / steps * 1e3:.2f} ms/step, {tok_s:.1f} tokens/s")
        return tok_s

    # Quantized packed decode
    qparams, _ = random_packed_params(cfg, key, codebook)
    qparams = jax.device_put(qparams)
    quant_tok_s = run_decode(qparams, f"int{nbits} packed")
    del qparams

    # Dense bf16 baseline
    from sleekit_tpu.models.transformer import stack_layer_params
    dparams = init_params(cfg, key)
    if cfg.scan_layers:
        dparams = stack_layer_params(dparams)
    dparams = jax.device_put(dparams)
    dense_tok_s = run_decode(dparams, "bf16 dense")

    result = {
        "metric": f"decode_tokens_per_sec_per_chip_int{nbits}_{model_name}",
        "value": round(quant_tok_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(quant_tok_s / dense_tok_s, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
