"""Dump per-layer calibration artifacts in the reference's data/ layout.

The reference gathers statistics through an external GPTQ harness and
consumes ``data/<model>/<layer>/{weight,hessian,mean,bias}.npy``
(ref experiments/compare.py:37-43, statistics.py:89-105). This CLI is the
in-framework harness: build a zoo model (random-init, or HF weights when a
checkpoint directory is given), stream calibration tokens through the
fused on-device calibration step, and export every linear layer.

Usage:
  python -m sleekit_tpu.experiments.dump_stats data/opt-125m \
      --model opt-125m --samples 16 --seq-len 512 [--seed 0]
"""

import argparse
import os

import numpy as np
import jax


def main(argv=None):
    parser = argparse.ArgumentParser(description="Dump calibration artifacts")
    parser.add_argument("out", type=str, help="Output directory")
    parser.add_argument("--model", type=str, default="tiny")
    parser.add_argument("--samples", type=int, default=8,
                        help="Number of calibration sequences")
    parser.add_argument("--seq-len", type=int, default=128)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tokens", type=str, default=None,
                        help=".npy int32 token stream (default: random)")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="HF checkpoint dir to load real weights from")
    args = parser.parse_args(argv)

    from sleekit_tpu.models.zoo import get_config
    from sleekit_tpu.models.transformer import (
        get_linear_param, init_params, layer_names)
    from sleekit_tpu.models.quantize import calibrate

    cfg = get_config(args.model)
    if args.checkpoint:
        from sleekit_tpu.models.hf import load_hf_checkpoint
        params = load_hf_checkpoint(cfg, args.model, args.checkpoint)
    else:
        params = init_params(cfg, jax.random.PRNGKey(args.seed))

    rng = np.random.RandomState(args.seed)
    if args.tokens:
        # .npy / .skt shard / the literal 'wikitext2' (HF datasets +
        # tokenizer, for the real-model reproduction runs).
        from sleekit_tpu.models.data import load_token_stream
        n = args.samples * args.seq_len
        stream, provenance = load_token_stream(
            args.tokens, cfg.vocab_size, n, tokenizer_name=args.checkpoint,
            seed=args.seed)
        print(f"calibration tokens: {provenance}")
        stream = np.resize(stream.astype(np.int32), n)
        tokens = stream.reshape(args.samples, args.seq_len)
    else:
        tokens = rng.randint(0, cfg.vocab_size,
                             (args.samples, args.seq_len)).astype(np.int32)

    batches = [tokens[i:i + args.batch] for i in range(0, len(tokens), args.batch)]
    stats = calibrate(cfg, params, batches)

    for name in layer_names(cfg):
        p = get_linear_param(params, name)
        st = stats[name]
        path = os.path.join(args.out, name.replace(".", "_"))
        os.makedirs(path, exist_ok=True)
        np.save(os.path.join(path, "weight.npy"),
                np.asarray(p["kernel"].T, np.float32))
        np.save(os.path.join(path, "hessian.npy"), np.asarray(st.hessian))
        np.save(os.path.join(path, "mean.npy"), np.asarray(st.mean))
        bias = p.get("bias")
        np.save(os.path.join(path, "bias.npy"),
                np.asarray(bias if bias is not None
                           else np.zeros(p["kernel"].shape[1]), np.float32))
    print(f"dumped {len(layer_names(cfg))} layers to {args.out}")


if __name__ == "__main__":
    main()
