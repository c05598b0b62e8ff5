"""End-user CLI: quantize a whole model to a packed serving checkpoint.

  python -m sleekit_tpu.experiments.quantize_model_cli out_ckpt/ \
      --model opt-125m [--checkpoint /path/to/hf] [--preset light] \
      [--nbits 4] [--tokens tokens.npy] [--samples 16] [--pack/--no-pack]

Covers the whole production flow the reference outsources: calibrate,
quantize every linear with the chosen preset, report per-layer errors and
wall clock, optionally evaluate perplexity before/after, and save the
packed checkpoint for the serving engine.
"""

import argparse
import os
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Quantize a model to a packed serving checkpoint")
    parser.add_argument("out", type=str)
    parser.add_argument("--model", type=str, default="tiny")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="HF checkpoint dir (default: random init)")
    parser.add_argument("--preset", type=str, default="light",
                        choices=["basic", "light", "heavy"])
    parser.add_argument("--nbits", type=float, default=4)
    parser.add_argument("--codebook", type=str, default="uniform",
                        choices=["uniform", "nf4", "lloyd"])
    parser.add_argument("--grid-size", type=int, default=100)
    parser.add_argument("--obq-refine", type=int, default=0,
                        help="coarse-then-fine OBQ scaling: 2N sweeps "
                             "instead of grid-size (heavy preset only; "
                             "see scaling.compute_obq_scaling caveats)")
    parser.add_argument("--tokens", type=str, default=None,
                        help=".npy int32 token stream, or 'wikitext2' "
                             "(needs HF datasets+tokenizer); default synthetic")
    parser.add_argument("--samples", type=int, default=16)
    parser.add_argument("--seq-len", type=int, default=256)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--eval-ppl", action="store_true",
                        help="Report perplexity before/after on held-out tokens")
    parser.add_argument("--no-pack", dest="pack", action="store_false")
    parser.add_argument("--offload-stats", type=str, default="auto",
                        choices=["auto", "always", "never"],
                        help="Move calibration Hessians to host RAM before "
                             "the solve loop (auto: only when stats+params "
                             "exceed the HBM budget)")
    args = parser.parse_args(argv)

    import jax

    if jax.default_backend() not in ("cpu",):
        # Persistent compile cache (TPU only - CPU AOT artifacts are not
        # reliably deserializable, tests/conftest.py): the calibration
        # forward + solver programs take minutes to compile through the
        # axon relay and are identical across runs.
        cache_root = os.environ.get("JAX_CACHE_DIR",
                                    os.path.join(os.path.dirname(
                                        os.path.dirname(os.path.dirname(
                                            os.path.abspath(__file__)))),
                                        ".jax_cache"))
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(cache_root, jax.default_backend()))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    from sleekit_tpu.models.zoo import get_config
    from sleekit_tpu.models.transformer import init_params
    from sleekit_tpu.models.quantize import calibrate, quantize_model
    from sleekit_tpu.models.eval import chunk_tokens, perplexity
    from sleekit_tpu.pipeline import preset_config
    from sleekit_tpu.serve.checkpoint import save_packed_params
    from sleekit_tpu.utils.profiling import Timer

    cfg = get_config(args.model)
    if args.checkpoint:
        from sleekit_tpu.models.hf import load_hf_checkpoint
        params = load_hf_checkpoint(cfg, args.model, args.checkpoint)
    else:
        params = init_params(cfg, jax.random.PRNGKey(args.seed))

    from sleekit_tpu.models.data import calibration_batches, load_token_stream

    need = args.samples * args.seq_len + 4096
    stream, provenance = load_token_stream(
        args.tokens, cfg.vocab_size, need, seed=args.seed)
    print(f"calibration tokens: {provenance}")
    batches = calibration_batches(stream, args.samples, args.seq_len,
                                  args.batch)

    qconfig = preset_config(args.preset, nbits=args.nbits,
                            codebook_kind=args.codebook,
                            grid_size=args.grid_size,
                            obq_refine=args.obq_refine)
    def _hbm_limit():
        # QUANT_HBM_LIMIT: test override to exercise the offload/drain
        # branches on hardware without a >16 GB model.
        env = os.environ.get("QUANT_HBM_LIMIT")
        if env:
            return float(env)
        try:
            return jax.local_devices()[0].memory_stats()["bytes_limit"]
        except Exception:  # noqa: BLE001 - memory_stats is backend-optional
            return 16e9

    def _est_stats_bytes():
        from sleekit_tpu.models.transformer import layer_names
        d, ff = cfg.d_model, cfg.d_ff
        dim_of = {"q": d, "k": d, "v": d, "o": d, "fc1": d, "fc2": ff,
                  "gate": d, "up": d, "down": ff}
        return sum(4.0 * (dim_of[n.split(".")[-1]] ** 2
                          + 2 * dim_of[n.split(".")[-1]])
                   for n in layer_names(cfg))

    def _params_bytes():
        return sum(x.size * x.dtype.itemsize
                   for x in jax.tree_util.tree_leaves(params))

    timer = Timer()
    spill_calibration = False
    if jax.default_backend() not in ("cpu",):
        # Statistics that do not fit HBM even WITHOUT solve workspace
        # (OPT-2.7B: 17.6 GB of Hessians) poison calibration itself;
        # sweep layer-outer and spill each layer's stats to the host
        # (models/quantize.calibrate_spill).
        est = _params_bytes() + _est_stats_bytes()
        spill_calibration = est + 1.5e9 > _hbm_limit()
    with timer.section("calibrate"):
        if spill_calibration:
            from sleekit_tpu.models.quantize import calibrate_spill
            print(f"stats+params estimate {est / 1e9:.2f} GB exceeds HBM: "
                  "layer-outer SPILL calibration (host-resident stats)",
                  flush=True)
            stats = calibrate_spill(cfg, params, batches)
        else:
            stats = calibrate(cfg, params, batches)
            jax.block_until_ready(stats)
    if jax.default_backend() not in ("cpu",) and not spill_calibration:
        # Offload statistics to the host ONLY when the footprint demands
        # it. The round-1 blanket offload avoided a RESOURCE_EXHAUSTED
        # (every Hessian + dense f32 params + every solution held at
        # once) but cost ~13 min of axon-tunnel round-trips for OPT-1.3B
        # (8.4 GB down + 8.4 GB back up at ~35 MB/s, round-2 journal).
        # With free_stats + per-layer apply the steady peak is
        # params + stats + one solve workspace, which fits a 16 GB chip
        # for 1.3B-class models - so stats stay on device unless the
        # estimate exceeds the HBM budget (or --offload-stats=always).
        def _tree_bytes(t):
            return sum(x.size * x.dtype.itemsize
                       for x in jax.tree_util.tree_leaves(t))

        need = _tree_bytes(stats) + _tree_bytes(params)
        limit = _hbm_limit()
        # Headroom for the largest solve workspace (fc2-class Hessian
        # copy + flipped Cholesky + grid-scaling temps + dequantized
        # solution; 2.3 GB measured insufficient for OPT-1.3B fc2).
        budget = limit - 3.5e9
        def _w_est(k):
            # Solve-workspace estimate: ~3.5 GB measured for K=8192
            # (Hessian copy + flipped Cholesky + grid temps + solution),
            # scaling ~K^2, floored for fixed overheads.
            return max(0.5e9, 3.5e9 * (k / 8192.0) ** 2)

        # quantize_model solves SMALLEST-K layers first and frees each
        # layer's stats on completion, so the peak is max over the solve
        # order of params + remaining stats + that layer's workspace -
        # the big-workspace layers run last against a shrunken pool.
        # Simulate that peak; only shed to the host when it truly does
        # not fit (the round-3 blanket shed cost 190 s of idle-TPU D2H
        # on OPT-1.3B that this analysis proves unnecessary).
        order = sorted(stats, key=lambda n: stats[n].hessian.size)
        s_rem = sum(_tree_bytes(stats[n]) for n in order)
        p_bytes = _tree_bytes(params)
        peak = 0.0
        for n in order:
            k = stats[n].hessian.shape[-1]
            peak = max(peak, p_bytes + s_rem + _w_est(k))
            s_rem -= _tree_bytes(stats[n])
        margin = 0.5e9
        if args.offload_stats == "always":
            with timer.section("stats_offload"):
                stats = jax.device_get(stats)
            print(f"stats offloaded to host ({_tree_bytes(stats) / 1e9:.2f}"
                  " GB, --offload-stats=always)", flush=True)
        elif args.offload_stats == "auto" and peak + margin > limit:
            # Shed the largest Hessians - but drain them to the host in
            # a BACKGROUND thread overlapped with the solves (the solve
            # loop uses a still-on-device entry directly and device_puts
            # host entries one layer ahead). The host stays idle during
            # solves, so the D2H rides the otherwise-dead tunnel time.
            shed = []
            shed_bytes = 0.0
            max_shed = 0.0
            for name in reversed(order):  # largest first
                # Up to TWO shed entries are transiently back on device
                # during their own solves (current + prefetched next).
                if peak + margin - shed_bytes + 2 * max_shed <= limit:
                    break
                eb = _tree_bytes(stats[name])
                shed_bytes += eb
                max_shed = max(max_shed, eb)
                shed.append(name)

            import threading

            def _drain():
                # CHUNKED device_gets (~2 GB each): one monolithic fetch
                # frees NO device memory until every leaf lands on the
                # host, so the racing solves OOM'd against a still-full
                # HBM (first on-hardware exercise of this branch, round-5
                # OPT-2.7B run). Chunks free incrementally; the solve
                # loop additionally retries on RESOURCE_EXHAUSTED while
                # the drain catches up (models/quantize.py).
                group: list = []
                gb = 0.0

                def flush():
                    nonlocal group, gb
                    if not group:
                        return
                    fetched = jax.device_get(
                        {n: stats[n] for n in group if n in stats})
                    for n, v in fetched.items():
                        if n in stats:
                            stats[n] = v
                    group, gb = [], 0.0

                for n in shed:
                    if n not in stats:
                        continue
                    group.append(n)
                    gb += _tree_bytes(stats[n])
                    if gb >= 2e9:
                        flush()
                flush()

            t = threading.Thread(target=_drain, daemon=True)
            with timer.section("stats_offload"):
                t.start()
            print(f"background offload started: {len(shed)}/{len(stats)} "
                  f"stats entries ({shed_bytes / 1e9:.2f} GB) draining "
                  f"under the solves (simulated peak {peak / 1e9:.2f} GB "
                  f"> HBM {limit / 1e9:.2f} GB)", flush=True)
        else:
            print(f"stats+params {need / 1e9:.2f} GB on device; simulated "
                  f"solve peak {peak / 1e9:.2f} GB fits HBM "
                  f"{limit / 1e9:.2f} GB - no offload", flush=True)
    with timer.section("quantize"):
        qparams, reports = quantize_model(cfg, params, stats, qconfig,
                                          pack=args.pack, verbose=True,
                                          free_stats=True,
                                          pack_host=spill_calibration)
    with timer.section("save"):
        save_packed_params(args.out, qparams, meta={
            "model": args.model, "preset": args.preset,
            "nbits": args.nbits, "codebook": args.codebook})

    total_err = sum(r.error for r in reports)
    print(f"\n{len(reports)} layers quantized; total layer error "
          f"{total_err:.6g}")
    if args.eval_ppl:
        from sleekit_tpu.models.eval import decode_perplexity

        held = stream[args.samples * args.seq_len:]
        ev = list(chunk_tokens(held, args.seq_len, args.batch))
        with timer.section("eval_ppl"):
            # Three-way acceptance loop (BASELINE.md <= 0.1 ppl gate):
            # fp32 / quantized-forward / quantized through the DECODE
            # path (the packed serving kernels' route). The last two are
            # the same numbers by contract; disagreement means a serving
            # kernel drifted from the pipeline.
            ppl_ref = perplexity(cfg, params, ev)
            ppl_q = perplexity(cfg, qparams, ev)
            ppl_dec = decode_perplexity(cfg, qparams, ev)
        print(f"perplexity: fp32 {ppl_ref:.4f} -> quantized {ppl_q:.4f} "
              f"(delta {ppl_q - ppl_ref:+.4f}); decode-scored "
              f"{ppl_dec:.4f} (forward-vs-decode "
              f"{ppl_dec - ppl_q:+.5f})")
        if abs(ppl_dec - ppl_q) > 0.01:
            print("WARNING: packed decode path disagrees with the "
                  "fake-quant forward by more than 0.01 ppl", flush=True)
    print(timer.dump())
    print(f"checkpoint -> {args.out}")


if __name__ == "__main__":
    main()
