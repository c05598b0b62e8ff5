"""CI guard: direct numerical A/B against the reference implementation.

Imports the actual reference package from /root/reference (pure
NumPy+torch, offline) and asserts per-layer quantization_error agreement
with sleekit_tpu on identical synthetic dumps (VERDICT.md round-1 item 1;
full report: PARITY_r02.md, produced by experiments/ab_reference.py).

Skips cleanly if the reference checkout is absent (e.g. running the test
suite outside this image).
"""

import os

import pytest

REF_PATH = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_PATH, "sleekit")),
    reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref_mods():
    from sleekit_tpu.experiments.ab_reference import import_reference

    return import_reference(REF_PATH)


def test_pipeline_errors_match_reference(ref_mods):
    """The five compare.py pipelines agree per layer within 2% (5% for
    heavy — its local-search path can diverge discretely) on two layer
    regimes x two codebook sizes."""
    from sleekit_tpu.experiments.ab_reference import (
        PIPELINES, gen_layers, ref_pipeline_errors, tpu_pipeline_errors)

    for name, W, H, mean in gen_layers(quick=True):
        for k in (4, 3):
            e_ref = ref_pipeline_errors(ref_mods, W, H, mean, k, grid_size=40)
            e_tpu = tpu_pipeline_errors(W, H, mean, k, grid_size=40)
            for p in PIPELINES:
                tol = 0.05 if p == "heavy" else 0.02
                rel = abs(e_tpu[p] - e_ref[p]) / max(abs(e_ref[p]), 1e-12)
                assert rel <= tol, (name, k, p, e_ref[p], e_tpu[p])


def test_near_singular_heavy_divergence_is_local_search_only(ref_mods):
    """Pinned regression for the ONE known A/B divergence (PARITY_r02:
    2.96% on the near-singular heavy case): it must come entirely from
    the DISCRETE local-search path. With nb_ls_moves=0 the heavy pipeline
    (OBQ-aware scaling + sqerr GPTQ) must agree tightly (<=0.5%); with
    100 moves the divergence stays inside the understood band (<=3.5%) -
    so a regression in the continuous path trips the tight bound instead
    of hiding in the generic 5% heavy headroom (round-2 VERDICT weak 5)."""
    import jax.numpy as jnp

    from sleekit_tpu.codebooks import UniformCodebook
    from sleekit_tpu.experiments.ab_reference import gen_layers
    from sleekit_tpu.hessian import remove_dead_values, remove_input_bias
    from sleekit_tpu.scaling import (compute_obq_scaling,
                                     quantize_with_scaling)
    from sleekit_tpu.solver import quantization_error

    ref_codebook, ref_obq, ref_scaling, _ = ref_mods
    layer = [l for l in gen_layers() if l[0] == "near_singular"][0]
    _, W0, H0, mean = layer
    gk = dict(grid_size=40, min_factor=0.05, max_factor=1.0)

    for k in (4, 3):
        # reference side
        cb_r = ref_codebook.UniformCodebook(k, -1, 1)
        Wr, Hr = W0.copy(), H0.copy()
        ref_obq.remove_dead_values(Hr, Wr)
        Hcr = ref_obq.remove_input_bias(Hr, mean)
        sc_r = ref_scaling.compute_obq_scaling(Wr, cb_r, 0, H=Hcr,
                                               act_order="sqerr",
                                               damp=0.03, **gk)
        # our side
        cb_t = UniformCodebook(k, -1.0, 1.0)
        Ht, Wt = remove_dead_values(jnp.asarray(H0), jnp.asarray(W0))
        Hct = remove_input_bias(Ht, jnp.asarray(mean))
        sc_t = compute_obq_scaling(Wt, cb_t, 0, H=Hct, act_order="sqerr",
                                   damp=0.03, **gk)
        for moves, tol in ((0, 0.005), (100, 0.035)):
            q_r = ref_scaling.quantize_with_scaling(
                Wr, sc_r, cb_r, H=Hcr, act_order="sqerr", damp=0.03,
                nb_ls_moves=moves)
            e_ref = float(ref_obq.quantization_error(Wr, q_r, H=Hcr))
            q_t = quantize_with_scaling(Wt, sc_t, cb_t, H=Hct,
                                        act_order="sqerr", damp=0.03,
                                        nb_ls_moves=moves)
            e_tpu = float(quantization_error(Wt, q_t, Hct))
            rel = abs(e_tpu - e_ref) / max(abs(e_ref), 1e-12)
            assert rel <= tol, (k, moves, e_ref, e_tpu, rel)


def test_preset_class_matches_reference(ref_mods):
    """ref Sleekit (torch add_batch + quantize presets) vs LayerQuantizer:
    identical statistics, near-identical stored weights and biases."""
    from sleekit_tpu.experiments.ab_reference import preset_class_ab

    for r in preset_class_ab(ref_mods, quick=True):
        assert r["stats_delta"] < 1e-3, r
        rel = abs(r["e_tpu"] - r["e_ref"]) / max(abs(r["e_ref"]), 1e-12)
        assert rel <= 0.02, r
        assert r["w_rel_delta"] < 0.02, r
        assert r["bias_max_delta"] < 1e-3, r
