"""Direct numerical A/B against the reference implementation.

Imports the reference package from ``/root/reference`` (pure NumPy+torch,
runs offline) and executes BOTH implementations on identical synthetic
layer dumps:

  1. the five compare.py pipelines (standard GPTQ / integrated bias
     correction / diag scaling / Sleekit light / Sleekit heavy,
     ref experiments/compare.py:49-135) per layer x codebook size,
     comparing per-layer ``quantization_error``;
  2. the preset-level ``Sleekit`` class driven through ``add_batch`` on a
     torch Linear vs our ``LayerQuantizer`` on the same activations
     (statistics accumulation + quantize_{basic,sleekit_light,
     sleekit_heavy}, ref statistics.py:76-190), comparing the stored
     dequantized weights and corrected biases;
  3. a dump-tree geomean diff: both compare CLIs over the same ``.npy``
     tree, aggregated with the reference's geomean-of-ratios metric
     (ref results/graph.py:14-21).

The reference promotes to float64 through its NumPy pipeline while ours
is float32 end-to-end on TPU/XLA, so exact equality is impossible; the
contract is per-layer relative error agreement within a stated tolerance
(default 2%) and geomean agreement within 0.5%.

Usage:
    python -m sleekit_tpu.experiments.ab_reference \
        [--ref-path /root/reference] [--out PARITY_r02.md] [--quick]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time


def _force_cpu():
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def import_reference(ref_path: str):
    """Import the reference package (NumPy+torch, MIT) from its checkout."""
    if ref_path not in sys.path:
        sys.path.insert(0, ref_path)
    import sleekit  # noqa: F401
    import sleekit.codebook as ref_codebook
    import sleekit.obq as ref_obq
    import sleekit.scaling as ref_scaling
    import sleekit.statistics as ref_statistics

    return ref_codebook, ref_obq, ref_scaling, ref_statistics


# ---- synthetic layer dumps ------------------------------------------------


def gen_layers(quick: bool = False, variants: int = 1):
    """Deterministic synthetic layers spanning the regimes the reference
    tests exercise (SURVEY.md §4): well-conditioned, near-singular
    (samples < features), dead input columns, correlated inputs with a
    mean offset (so bias correction matters). ``variants`` replicates
    the 5-layer set with fresh draws (variant 0 is byte-identical to
    ``variants=1`` — the rng stream is consumed in the same order — so
    PARITY tables stay stable)."""
    import numpy as np

    rng = np.random.RandomState(1234)
    specs = [
        ("fc_small", 48, 64, 512, 0.5, False),
        ("fc_rect", 96, 128, 384, 0.8, False),
        ("near_singular", 64, 96, 48, 0.3, False),
        ("dead_col", 32, 64, 256, 0.5, True),
        ("tall", 128, 160, 640, 0.2, False),
    ]
    if quick:
        specs = specs[:2]
    layers = []
    for v in range(variants):
        for name, m, n, s, offset, dead in specs:
            W = rng.randn(m, n).astype(np.float32)
            mix = (0.25 * rng.randn(n, n) + np.eye(n)).astype(np.float32)
            X = rng.randn(s, n).astype(np.float32) @ mix + offset
            if dead:
                X[:, n // 3] = 0.0
            H = (X.T @ X / s).astype(np.float32)
            mean = X.mean(axis=0).astype(np.float32)
            layers.append((name if v == 0 else f"{name}_v{v}",
                           W, H, mean))
    return layers


def write_dump_tree(layers, root: str):
    import numpy as np

    for name, W, H, mean in layers:
        d = os.path.join(root, name)
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, "weight.npy"), W)
        np.save(os.path.join(d, "hessian.npy"), H)
        np.save(os.path.join(d, "mean.npy"), mean)


# ---- the five compare.py pipelines, both implementations ------------------

PIPELINES = ("standard", "correction", "scaling", "light", "heavy")


def ref_pipeline_errors(ref_mods, W, H, mean, cb_size, grid_size=100):
    """The exact pipeline bodies of ref experiments/compare.py:49-131."""
    import numpy as np

    ref_codebook, ref_obq, ref_scaling, _ = ref_mods
    cb = ref_codebook.UniformCodebook(cb_size, -1, 1)
    W = W.copy()
    H = H.copy()
    ref_obq.remove_dead_values(H, W)
    Hc = ref_obq.remove_input_bias(H, mean)
    gk = dict(grid_size=grid_size, min_factor=0.05, max_factor=1.0)

    out = {}
    sc = ref_scaling.compute_min_mse_scaling(W, cb, **gk)
    q = ref_scaling.quantize_with_scaling(W, sc, cb, H=H, act_order="diag",
                                          damp=0.01)
    out["standard"] = float(ref_obq.quantization_error(W, q, H=H))
    q = ref_scaling.quantize_with_scaling(W, sc, cb, H=Hc, act_order="diag",
                                          damp=0.01)
    out["correction"] = float(ref_obq.quantization_error(W, q, H=Hc))

    sc = ref_scaling.compute_min_mse_scaling(W, cb, H=H.diagonal(), **gk)
    q = ref_scaling.quantize_with_scaling(W, sc, cb, H=H, damp=0.01)
    out["scaling"] = float(ref_obq.quantization_error(W, q, H=H))

    sc = ref_scaling.compute_min_mse_scaling(W, cb, H=Hc.diagonal(), **gk)
    q = ref_scaling.quantize_with_scaling(W, sc, cb, H=Hc, act_order="sqerr",
                                          damp=0.03)
    out["light"] = float(ref_obq.quantization_error(W, q, H=Hc))

    sc = ref_scaling.compute_obq_scaling(W, cb, 0, H=Hc, act_order="sqerr",
                                         damp=0.03, **gk)
    q = ref_scaling.quantize_with_scaling(W, sc, cb, H=Hc, act_order="sqerr",
                                          damp=0.03, nb_ls_moves=100)
    out["heavy"] = float(ref_obq.quantization_error(W, q, H=Hc))
    del np
    return out


def tpu_pipeline_errors(W, H, mean, cb_size, grid_size=100):
    """The same five pipelines through sleekit_tpu (the bodies of
    sleekit_tpu/experiments/compare.py)."""
    import jax.numpy as jnp

    from sleekit_tpu.codebooks import UniformCodebook
    from sleekit_tpu.hessian import remove_dead_values, remove_input_bias
    from sleekit_tpu.scaling import (
        compute_min_mse_scaling, compute_obq_scaling, quantize_with_scaling)
    from sleekit_tpu.solver import quantization_error

    cb = UniformCodebook(cb_size, -1.0, 1.0)
    H, W = remove_dead_values(jnp.asarray(H), jnp.asarray(W))
    Hc = remove_input_bias(H, jnp.asarray(mean))
    gk = dict(grid_size=grid_size, min_factor=0.05, max_factor=1.0)

    out = {}
    sc = compute_min_mse_scaling(W, cb, **gk)
    q = quantize_with_scaling(W, sc, cb, H=H, act_order="diag", damp=0.01)
    out["standard"] = float(quantization_error(W, q, H))
    q = quantize_with_scaling(W, sc, cb, H=Hc, act_order="diag", damp=0.01)
    out["correction"] = float(quantization_error(W, q, Hc))

    sc = compute_min_mse_scaling(W, cb, H=jnp.diagonal(H), **gk)
    q = quantize_with_scaling(W, sc, cb, H=H, damp=0.01)
    out["scaling"] = float(quantization_error(W, q, H))

    sc = compute_min_mse_scaling(W, cb, H=jnp.diagonal(Hc), **gk)
    q = quantize_with_scaling(W, sc, cb, H=Hc, act_order="sqerr", damp=0.03)
    out["light"] = float(quantization_error(W, q, Hc))

    sc = compute_obq_scaling(W, cb, 0, H=Hc, act_order="sqerr", damp=0.03, **gk)
    q = quantize_with_scaling(W, sc, cb, H=Hc, act_order="sqerr", damp=0.03,
                              nb_ls_moves=100)
    out["heavy"] = float(quantization_error(W, q, Hc))
    return out


# ---- preset-level Sleekit class A/B ---------------------------------------


def preset_class_ab(ref_mods, quick: bool = False):
    """Drive ref ``Sleekit`` (torch Linear + add_batch) and our
    ``LayerQuantizer`` on identical activations; compare the stored
    dequantized weights (relative Frobenius delta), corrected bias, and
    the resulting quantization errors for each preset."""
    import numpy as np
    import torch

    import jax.numpy as jnp

    from sleekit_tpu.hessian import remove_input_bias
    from sleekit_tpu.pipeline import LayerQuantizer, preset_config
    from sleekit_tpu.solver import quantization_error

    _, ref_obq, _, ref_statistics = ref_mods

    rng = np.random.RandomState(7)
    m, n = 40, 64
    W0 = rng.randn(m, n).astype(np.float32)
    b0 = rng.randn(m).astype(np.float32)
    batches = [rng.randn(8, 16, n).astype(np.float32) + 0.3
               for _ in range(3)]

    presets = [("basic", "quantize_basic"),
               ("light", "quantize_sleekit_light"),
               ("heavy", "quantize_sleekit_heavy")]
    if quick:
        presets = presets[:2]
    rows = []
    for preset, ref_method in presets:
        for nbits in (3, 2):
            layer = torch.nn.Linear(n, m)
            with torch.no_grad():
                layer.weight.copy_(torch.from_numpy(W0))
                layer.bias.copy_(torch.from_numpy(b0))
            ref = ref_statistics.Sleekit(layer)
            for x in batches:
                ref.add_batch(torch.from_numpy(x))
            H_ref = ref.hessian.numpy().copy()
            mean_ref = ref.mean.numpy().copy()
            getattr(ref, ref_method)(nbits)
            q_ref = layer.weight.detach().numpy()
            b_ref = layer.bias.detach().numpy()

            lq = LayerQuantizer(W0, bias=b0)
            for x in batches:
                lq.add_batch(jnp.asarray(x))
            stats_delta = max(
                float(np.abs(np.asarray(lq.stats.hessian) - H_ref).max()),
                float(np.abs(np.asarray(lq.stats.mean) - mean_ref).max()))
            q_tpu, _, _ = lq.quantize(preset_config(preset, nbits=nbits))
            q_tpu = np.asarray(q_tpu)
            b_tpu = np.asarray(lq.bias)

            Hm = remove_input_bias(jnp.asarray(H_ref), jnp.asarray(mean_ref)) \
                if preset != "basic" else jnp.asarray(H_ref)
            e_ref = float(quantization_error(
                jnp.asarray(W0), jnp.asarray(q_ref), Hm))
            e_tpu = float(quantization_error(
                jnp.asarray(W0), jnp.asarray(q_tpu), Hm))
            wdelta = float(np.linalg.norm(q_tpu - q_ref)
                           / max(np.linalg.norm(q_ref), 1e-12))
            bdelta = float(np.abs(b_tpu - b_ref).max())
            rows.append(dict(preset=preset, nbits=nbits,
                             stats_delta=stats_delta, e_ref=e_ref,
                             e_tpu=e_tpu, w_rel_delta=wdelta,
                             bias_max_delta=bdelta))
    return rows


# ---- dump-tree compare CLI diff -------------------------------------------


def run_compare_clis(ref_path: str, tree: str, cb_size: int):
    """Run the reference experiments/compare.py as a subprocess and our
    compare CLI in-process over the same dump tree; return both TSV
    tables as {layer: [5 errors]}."""
    import contextlib
    import io
    import subprocess

    env = dict(os.environ)
    env["PYTHONPATH"] = ref_path + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(ref_path, "experiments", "compare.py"),
         tree, "--codebook-size", str(cb_size)],
        capture_output=True, text=True, env=env, timeout=3600)
    assert proc.returncode == 0, proc.stderr[-2000:]

    def parse(text):
        out = {}
        for line in text.strip().splitlines():
            parts = line.split("\t")
            if parts[0] == "Data" or len(parts) != 6:
                continue
            out[parts[0]] = [float(v) for v in parts[1:]]
        return out

    from sleekit_tpu.experiments import compare as tpu_compare

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        tpu_compare.main([tree, "--codebook-size", str(cb_size)])
    return parse(proc.stdout), parse(buf.getvalue())


def geomean_ratios(table):
    """The reference's headline metric: geomean over layers of each
    pipeline's error relative to the standard-GPTQ column
    (ref results/graph.py:14-21)."""
    out = []
    for col in range(1, 5):
        logs = [math.log(errs[col] / errs[0])
                for errs in table.values() if errs[0] > 0 and errs[col] > 0]
        out.append(math.exp(sum(logs) / len(logs)) - 1.0)
    return out  # [correction, scaling, light, heavy] relative change


# ---- main -----------------------------------------------------------------


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ref-path", default="/root/reference")
    parser.add_argument("--out", default="PARITY_r02.md")
    parser.add_argument("--tol", type=float, default=0.02,
                        help="per-layer relative error tolerance")
    parser.add_argument("--heavy-tol", type=float, default=0.05,
                        help="tolerance for the heavy pipeline (local "
                             "search paths diverge discretely)")
    parser.add_argument("--quick", action="store_true",
                        help="small subset (CI)")
    parser.add_argument("--skip-cli", action="store_true")
    args = parser.parse_args(argv)

    _force_cpu()
    import numpy as np

    ref_mods = import_reference(args.ref_path)
    layers = gen_layers(quick=args.quick)
    cb_sizes = (4, 3) if args.quick else (8, 4, 3, 2)
    grid = 40 if args.quick else 100

    lines = [f"# {os.path.splitext(os.path.basename(args.out))[0]} — direct numerical A/B vs /root/reference",
             "",
             f"Reference (NumPy/float64 promotion) vs sleekit_tpu "
             f"(JAX f32, CPU backend), identical synthetic layer dumps. "
             f"Per-layer relative error delta = (tpu - ref) / ref.",
             ""]
    failures = []

    # 1. the five pipelines per layer x codebook size
    lines += ["## Per-layer pipeline errors", "",
              "| layer | k | pipeline | ref error | tpu error | rel delta |",
              "|---|---|---|---|---|---|"]
    worst = 0.0
    t0 = time.time()
    for name, W, H, mean in layers:
        for k in cb_sizes:
            e_ref = ref_pipeline_errors(ref_mods, W, H, mean, k, grid)
            e_tpu = tpu_pipeline_errors(W, H, mean, k, grid)
            for p in PIPELINES:
                rel = (e_tpu[p] - e_ref[p]) / max(abs(e_ref[p]), 1e-12)
                worst = max(worst, abs(rel))
                tol = args.heavy_tol if p == "heavy" else args.tol
                flag = "" if abs(rel) <= tol else "  **OUT OF TOL**"
                if abs(rel) > tol:
                    failures.append((name, k, p, rel))
                lines.append(
                    f"| {name} | {k} | {p} | {e_ref[p]:.6g} | "
                    f"{e_tpu[p]:.6g} | {rel:+.4%}{flag} |")
    lines += ["", f"Worst per-layer |delta|: {worst:.4%} "
              f"({len(layers) * len(cb_sizes) * 5} comparisons, "
              f"{time.time() - t0:.0f}s)", ""]

    # 2. preset-level Sleekit class A/B (statistics + quantize + bias)
    lines += ["## Preset-level `Sleekit` class A/B (torch Linear, add_batch)",
              "",
              "| preset | nbits | stats max|Δ| | ref err | tpu err | "
              "W rel Δ | bias max|Δ| |",
              "|---|---|---|---|---|---|---|"]
    for r in preset_class_ab(ref_mods, quick=args.quick):
        rel = (r["e_tpu"] - r["e_ref"]) / max(abs(r["e_ref"]), 1e-12)
        tol = args.heavy_tol if r["preset"] == "heavy" else args.tol
        if abs(rel) > tol:
            failures.append((f"class:{r['preset']}", r["nbits"], "preset", rel))
        if r["stats_delta"] > 1e-3:
            failures.append((f"class:{r['preset']}", r["nbits"], "stats",
                             r["stats_delta"]))
        lines.append(
            f"| {r['preset']} | {r['nbits']} | {r['stats_delta']:.2e} | "
            f"{r['e_ref']:.6g} | {r['e_tpu']:.6g} | "
            f"{r['w_rel_delta']:.4f} | {r['bias_max_delta']:.2e} |")
    lines.append("")

    # 3. both compare CLIs over the same dump tree -> geomean diff
    if not args.skip_cli:
        import tempfile

        with tempfile.TemporaryDirectory() as tmp:
            write_dump_tree(layers, tmp)
            k = cb_sizes[0]
            ref_tab, tpu_tab = run_compare_clis(args.ref_path, tmp, k)
            g_ref = geomean_ratios(ref_tab)
            g_tpu = geomean_ratios(tpu_tab)
            lines += [f"## compare CLI geomeans (codebook size {k}, "
                      "geomean error change vs standard GPTQ, "
                      "ref results/graph.py metric)", "",
                      "| pipeline | reference CLI | sleekit_tpu CLI | Δ |",
                      "|---|---|---|---|"]
            for nm, a, b in zip(("correction", "scaling", "light", "heavy"),
                                g_ref, g_tpu):
                if abs(a - b) > 0.005:
                    failures.append(("geomean", k, nm, a - b))
                lines.append(f"| {nm} | {a:+.3%} | {b:+.3%} | "
                             f"{(b - a):+.4%} |")
            lines.append("")

    verdict = "PASS" if not failures else f"FAIL ({len(failures)} out of tol)"
    lines += [f"## Verdict: {verdict}", ""]
    if failures:
        lines += [f"- {f}" for f in failures]

    report = "\n".join(lines) + "\n"
    with open(args.out, "w") as f:
        f.write(report)
    print(report)
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
