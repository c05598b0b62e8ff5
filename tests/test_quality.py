"""Quality regression guards on a fixed synthetic workload.

The reference's published numbers (BASELINE.md) are geomean per-layer
error improvements vs standard GPTQ; these tests pin the same direction
and a conservative magnitude on a deterministic synthetic layer so a
regression in any pipeline component trips loudly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sleekit_tpu.codebooks import UniformCodebook
from sleekit_tpu.hessian import remove_input_bias
from sleekit_tpu.models.quantize import calibrate, quantize_model
from sleekit_tpu.models.transformer import forward, init_params
from sleekit_tpu.models.zoo import tiny_test
from sleekit_tpu.pipeline import QuantConfig
from sleekit_tpu.scaling import (
    compute_min_mse_scaling, compute_obq_scaling, quantize_with_scaling)
from sleekit_tpu.solver import quantization_error
import jax


@pytest.fixture(scope="module")
def workload():
    rng = np.random.RandomState(0)
    n_in, n_out = 128, 96
    W = jnp.asarray(rng.randn(n_out, n_in).astype(np.float32))
    mix = (rng.randn(n_in, n_in) * 0.2 + np.eye(n_in)).astype(np.float32)
    X = (rng.randn(2000, n_in).astype(np.float32) @ mix) + 0.5
    H = jnp.asarray(X.T @ X / len(X))
    mean = jnp.asarray(X.mean(axis=0))
    return W, H, mean


# Reference-implementation results on the EXACT workload above, measured
# by running /root/reference/sleekit (NumPy float64 promotion) with the
# same pipelines (see the recipe in this file's git history / the A/B
# harness experiments/ab_reference.py). These turn the old hand-waved
# -3%/-10% bounds into tolerances derived from the direct A/B
# (VERDICT.md round-1 item 10): per-layer agreement is ~0% in practice
# (PARITY_r02.md), so +-2% (+-5% for heavy, whose discrete local-search
# path can diverge) is generous but trips loudly on any real regression.
REF_E_STD = 14.20737
REF_LIGHT_RATIO = 0.93642  # e_light / e_std in the reference
REF_HEAVY_RATIO = 0.81095  # e_heavy / e_std in the reference


def test_sleekit_improvements_vs_standard_gptq(workload):
    """The compare.py pipelines on a fixed workload, pinned to the
    reference implementation's measured errors on the same inputs."""
    W, H, mean = workload
    Hc = remove_input_bias(H, mean)
    cb = UniformCodebook(8, -1.0, 1.0)

    sc = compute_min_mse_scaling(W, cb)
    std = quantize_with_scaling(W, sc, cb, H=H, act_order="diag", damp=0.01)
    e_std = float(quantization_error(W, std, H))

    sc = compute_min_mse_scaling(W, cb, H=jnp.diagonal(Hc))
    light = quantize_with_scaling(W, sc, cb, H=Hc, act_order="sqerr", damp=0.03)
    e_light = float(quantization_error(W, light, Hc))

    sc = compute_obq_scaling(W, cb, 0, H=Hc, act_order="sqerr", damp=0.03)
    heavy = quantize_with_scaling(W, sc, cb, H=Hc, act_order="sqerr",
                                  damp=0.03, nb_ls_moves=100)
    e_heavy = float(quantization_error(W, heavy, Hc))

    assert abs(e_std - REF_E_STD) / REF_E_STD < 0.02, e_std
    assert abs(e_light / e_std - REF_LIGHT_RATIO) < 0.02, (e_std, e_light)
    assert abs(e_heavy / e_std - REF_HEAVY_RATIO) < 0.05, (e_std, e_heavy)
    assert e_heavy < e_light


def test_packed_serving_is_lossless():
    """Packing is a storage change, not a numerics change: forward with
    packed params == forward with dense dequantized params, bit-for-bit
    in f32."""
    cfg = tiny_test(n_layers=2)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    batches = [rng.randint(0, cfg.vocab_size, (2, 16)).astype(np.int32)]
    stats = calibrate(cfg, params, batches)
    qcfg = QuantConfig(nbits=4, scaling_mode="diag", grid_size=15)
    dense_q, _ = quantize_model(cfg, params, stats, qcfg, pack=False)
    packed_q, _ = quantize_model(cfg, params, stats, qcfg, pack=True)
    tokens = jnp.asarray(rng.randint(0, cfg.vocab_size, (1, 10)).astype(np.int32))
    a = np.asarray(forward(cfg, dense_q, tokens))
    b = np.asarray(forward(cfg, packed_q, tokens))
    assert np.allclose(a, b, rtol=1e-5, atol=1e-5), np.abs(a - b).max()


def test_three_way_ppl_acceptance_loop():
    """The BASELINE ppl acceptance gate, closed end-to-end in-repo
    (VERDICT round-3 ask 4): quantize a tiny model light@4bit and score
    perplexity three ways -
      (a) fp32 dense,
      (b) fake-quant (dequantized dense weights, parallel forward),
      (c) PACKED params through the decode/KV-cache path (the serving
          Engine's route).
    (b) and (c) are supposed to be the same numbers: assert <= 0.01 ppl;
    and the quantized ppl stays within a sane band of fp32."""
    from sleekit_tpu.models.eval import (chunk_tokens, decode_perplexity,
                                         perplexity)
    from sleekit_tpu.pipeline import preset_config

    cfg = tiny_test()
    params = init_params(cfg, jax.random.PRNGKey(7))
    rng = np.random.RandomState(7)
    stream = rng.randint(0, cfg.vocab_size, (400,)).astype(np.int32)
    calib = [rng.randint(0, cfg.vocab_size, (2, 32)).astype(np.int32)
             for _ in range(3)]
    stats = calibrate(cfg, params, calib)
    qcfg = preset_config("light", nbits=4)
    fake, _ = quantize_model(cfg, params, dict(stats), qcfg, pack=False)
    packed, _ = quantize_model(cfg, params, dict(stats), qcfg, pack=True)
    batches = list(chunk_tokens(stream, 32, 2))

    ppl_fp = perplexity(cfg, params, batches)
    ppl_fake = perplexity(cfg, fake, batches)
    ppl_packed_fwd = perplexity(cfg, packed, batches)
    ppl_packed_dec = decode_perplexity(cfg, packed, batches)

    # The packed decode path == the fake-quant pipeline (same weights,
    # same math contract; kernels must not drift).
    assert abs(ppl_packed_dec - ppl_fake) <= 0.01, (ppl_fake, ppl_packed_dec)
    assert abs(ppl_packed_fwd - ppl_fake) <= 0.01, (ppl_fake, ppl_packed_fwd)
    # Quantization moves ppl but must stay in a sane band on this tiny
    # random-init model (guards catastrophe, not the 0.1-ppl real-model
    # gate - that needs checkpoints, tools/reproduce_real_models.py).
    assert ppl_fake < ppl_fp * 1.5 + 1.0, (ppl_fp, ppl_fake)


def test_preset_ppl_bands_at_flagship_bitwidths():
    """fp32 -> quantized ppl delta at the flagship presets/bit-widths,
    pinned to bands recorded on this exact workload (round-4 VERDICT
    weak-item 6: the acceptance loop guarded catastrophe only; now a
    preset-quality regression - wrong scaling mode, broken LS, bad damp -
    moves ppl by whole points and trips these instead of waiting for the
    checkpoint-blocked real-model gate). Recorded 2026-08-21 (CPU f32,
    deterministic seeds): fp32 259.0853; light@4 +0.1395, light@3
    -0.5852, heavy@4 +0.1061, heavy@3 +0.1462."""
    from sleekit_tpu.models.eval import chunk_tokens, perplexity
    from sleekit_tpu.pipeline import preset_config

    cfg = tiny_test()
    params = init_params(cfg, jax.random.PRNGKey(7))
    rng = np.random.RandomState(7)
    stream = rng.randint(0, cfg.vocab_size, (400,)).astype(np.int32)
    calib = [rng.randint(0, cfg.vocab_size, (2, 32)).astype(np.int32)
             for _ in range(3)]
    stats = calibrate(cfg, params, calib)
    batches = list(chunk_tokens(stream, 32, 2))
    ppl_fp = perplexity(cfg, params, batches)
    assert abs(ppl_fp - 259.0853) < 1.0, ppl_fp

    expected = {("light", 4): 0.1395, ("light", 3): -0.5852,
                ("heavy", 4): 0.1061, ("heavy", 3): 0.1462}
    for (preset, nbits), want in expected.items():
        qcfg = preset_config(preset, nbits=nbits)
        fake, _ = quantize_model(cfg, params, dict(stats), qcfg,
                                 pack=False)
        delta = perplexity(cfg, fake, batches) - ppl_fp
        assert abs(delta - want) < 0.35, (preset, nbits, delta, want)
