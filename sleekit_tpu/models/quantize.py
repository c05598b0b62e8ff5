"""Whole-model quantization: calibrate -> per-layer solve -> packed params.

The model-level driver the reference delegates to an external GPTQ harness
(ref README.md:183): stream calibration batches through
:func:`~sleekit_tpu.models.transformer.calibrate_step` (statistics
accumulate on device), then run the jitted per-layer pipeline
(:func:`~sleekit_tpu.pipeline.quantize_layer`) for every linear and either
store dequantized f32 weights (reference semantics, for quality evaluation)
or pack to the serving format.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sleekit_tpu.hessian import LayerStats
from sleekit_tpu.ops.pack import PackedLinear, pack_quantized
from sleekit_tpu.pipeline import QuantConfig, quantize_layer
from sleekit_tpu.models.transformer import (
    TransformerConfig,
    calibrate_step,
    get_linear_param,
    init_calibration_stats,
    layer_names,
    set_linear_param,
)


@dataclasses.dataclass
class LayerReport:
    name: str
    error: float
    wall_s: float


def calibrate(cfg: TransformerConfig, params, batches: Iterable[jnp.ndarray],
              stats: Optional[Dict[str, LayerStats]] = None,
              layerwise: Optional[bool] = None) -> Dict[str, LayerStats]:
    """Accumulate Hessian statistics over calibration batches.

    Each batch is (B, T) int32 tokens. Statistics update on device (no
    host activation transfer) in one of two compilation strategies:

    * ``layerwise=False``: ONE jitted forward per batch covering the
      whole (unrolled) model - best steady-state dispatch count;
    * ``layerwise=True`` (default on TPU): one jitted block program
      REUSED for every layer - identical math, but the compile is one
      block instead of an N-layer unrolled graph. Through the axon
      remote-compile relay the unrolled OPT-1.3B calibration program
      takes tens of minutes to build; the single-block program compiles
      in seconds (round-2 journal).
    """
    if stats is None:
        stats = init_calibration_stats(cfg)
    if layerwise is None:
        layerwise = jax.default_backend() not in ("cpu",)
    if not layerwise:
        for tokens in batches:
            stats = calibrate_step(cfg, params, jnp.asarray(tokens), stats)
        return stats
    return _calibrate_layerwise(cfg, params, batches, stats)


def _calibrate_layerwise(cfg, params, batches, stats):
    from sleekit_tpu.models.transformer import _block, _embed  # noqa: PLC0415
    from sleekit_tpu.models.transformer import block_linear_names

    assert not cfg.scan_layers, "layerwise calibration needs unstacked params"
    names = block_linear_names(cfg)

    @jax.jit
    def embed_fn(params, tokens, positions):
        return _embed(cfg, params, tokens, positions)

    @jax.jit
    def block_fn(layer, x, positions, bstats):
        x, _, bstats = _block(cfg, layer, x, positions, None, bstats, 0)
        return x, bstats

    for tokens in batches:
        tokens = jnp.asarray(tokens)
        b, t = tokens.shape
        positions = jnp.broadcast_to(jnp.arange(t), (b, t))
        x = embed_fn(params, tokens, positions)
        for i, layer in enumerate(params["layers"]):
            bstats = {f"layers.0.{n}": stats[f"layers.{i}.{n}"]
                      for n in names}
            x, bstats = block_fn(layer, x, positions, bstats)
            for n in names:
                stats[f"layers.{i}.{n}"] = bstats[f"layers.0.{n}"]
    return stats


def calibrate_spill(cfg: TransformerConfig, params, batches):
    """Layer-OUTER calibration for models whose statistics do not fit
    HBM even without solve workspace (OPT-2.7B: 17.6 GB of Hessians on a
    16 GB chip - calibration itself poisons; first observed on the
    round-5 on-hardware drain run).

    The batch activations at each layer boundary are tiny (MBs) next to
    the Hessians, so hold ALL batch activations on device, sweep layer
    by layer updating only THAT layer's statistics, and spill them to
    the host as the sweep advances - device residency is params +
    activations + one layer's stats. Returns HOST (numpy) statistics;
    the solve loop re-uploads per layer with prefetch (quantize_model).
    Numerically identical to :func:`calibrate` (same update order per
    layer; cross-layer order never mattered - statistics are
    per-layer)."""
    from sleekit_tpu.models.transformer import _block, _embed  # noqa: PLC0415
    from sleekit_tpu.models.transformer import block_linear_names

    from sleekit_tpu.hessian import init_stats

    assert not cfg.scan_layers, "spill calibration needs unstacked params"
    names = block_linear_names(cfg)
    # Per-linear input dims WITHOUT allocating the full stats tree (the
    # whole point is that it does not fit).
    dim_of = {"q": cfg.d_model, "k": cfg.d_model, "v": cfg.d_model,
              "o": cfg.d_model, "fc1": cfg.d_model, "fc2": cfg.d_ff,
              "gate": cfg.d_model, "up": cfg.d_model, "down": cfg.d_ff}

    @jax.jit
    def embed_fn(params, tokens, positions):
        return _embed(cfg, params, tokens, positions)

    @jax.jit
    def block_fn(layer, x, positions, bstats):
        x, _, bstats = _block(cfg, layer, x, positions, None, bstats, 0)
        return x, bstats

    xs, poss = [], []
    for tokens in batches:
        tokens = jnp.asarray(tokens)
        b, t = tokens.shape
        positions = jnp.broadcast_to(jnp.arange(t), (b, t))
        poss.append(positions)
        xs.append(embed_fn(params, tokens, positions))

    host_stats: Dict[str, LayerStats] = {}
    for i, layer in enumerate(params["layers"]):
        bstats = {f"layers.0.{n}": init_stats(dim_of[n]) for n in names}
        for j in range(len(xs)):
            xs[j], bstats = block_fn(layer, xs[j], poss[j], bstats)
        fetched = jax.device_get(bstats)      # frees device stats
        for n in names:
            host_stats[f"layers.{i}.{n}"] = fetched[f"layers.0.{n}"]
        del bstats, fetched
    return host_stats


def _layer_artifact_path(resume_dir: str, name: str) -> str:
    return os.path.join(resume_dir, name.replace(".", "_") + ".npz")


def _save_layer_artifact(resume_dir: str, name: str, Q, bias_delta, scale,
                         err) -> None:
    """Atomic per-layer checkpoint (tmp + rename): a crashed quantize_model
    resumes from the last completed layer (SURVEY.md §5.4 manifest)."""
    path = _layer_artifact_path(resume_dir, name)
    tmp = path + ".tmp.npz"
    np.savez(tmp, Q=np.asarray(Q), bias_delta=np.asarray(bias_delta),
             scale=np.asarray(scale), err=np.asarray(err))
    os.replace(tmp, path)


def _load_layer_artifact(resume_dir: str, name: str):
    path = _layer_artifact_path(resume_dir, name)
    if not os.path.exists(path):
        return None
    z = np.load(path)
    return (jnp.asarray(z["Q"]), jnp.asarray(z["bias_delta"]),
            jnp.asarray(z["scale"]), jnp.asarray(z["err"]))


def _apply_solution(params, name, p, cb, Q, bias_delta, scale, qconfig,
                    pack, pack_host=False):
    bias = p.get("bias")
    if qconfig.bias_correction and bias is not None:
        bias = bias + bias_delta
    if pack:
        if pack_host:
            # >HBM (spill) runs: pack on the host CPU backend so no
            # persistent packed allocations interleave with the 5+ GB
            # solve workspaces - 25 fc2 solves of the OPT-2.7B run
            # fragmented the device heap until the 26th could not place
            # its workspace (round-5 on-hardware drain exercise). The
            # CLI save fetches everything to the host anyway.
            import numpy as _np

            Qh, sh = _np.asarray(Q), _np.asarray(scale)
            bh = None if bias is None else _np.asarray(bias)
            with jax.default_device(jax.devices("cpu")[0]):
                new_p = pack_quantized(jnp.asarray(Qh), jnp.asarray(sh),
                                       cb,
                                       bias=None if bh is None
                                       else jnp.asarray(bh))
        else:
            new_p = pack_quantized(Q, scale, cb, bias=bias)
    else:
        new_p = {"kernel": Q.T}
        if bias is not None:
            new_p["bias"] = bias
    set_linear_param(params, name, new_p)


def quantize_model(
    cfg: TransformerConfig,
    params,
    stats: Dict[str, LayerStats],
    qconfig: QuantConfig,
    pack: bool = False,
    verbose: bool = False,
    layer_parallel: bool = False,
    mesh=None,
    resume_dir: Optional[str] = None,
    free_stats: bool = False,
    pack_host: bool = False,
) -> Tuple[Any, List[LayerReport]]:
    """Quantize every linear layer of the model.

    Returns (new params, per-layer reports). With ``pack=True`` linears
    become :class:`PackedLinear` (serving); otherwise weights stay dense
    dequantized f32 (reference semantics, ref statistics.py:186).

    ``layer_parallel=True`` batches independent layers of identical shape
    into ONE vmapped jitted solve; with ``mesh`` the layer batch is
    sharded over every mesh device (SURVEY.md §2.3 layer-sweep
    parallelism). ``resume_dir`` checkpoints each solved layer (atomic
    .npz) and skips already-solved layers on restart, so a 7B-class
    quantization survives preemption (SURVEY.md §5.4).

    Each layer is solved, applied, and released before the next starts:
    with ``free_stats`` the consumed entry is popped from the
    CALLER's ``stats`` dict (the reference's ``Sleekit.free()`` analogue,
    ref statistics.py:192-199) so its Hessian frees immediately. Holding
    every Hessian + every dequantized solution on a 16 GB chip at once
    RESOURCE_EXHAUSTs 1.3B-class models (measured, round-2 journal).
    """
    if resume_dir is not None:
        os.makedirs(resume_dir, exist_ok=True)
    # tree_map rebuilds every container (leaves shared), so the per-layer
    # set_linear_param mutations below never touch the caller's tree.
    params = jax.tree_util.tree_map(lambda x: x, params)
    per_layer_cb = qconfig.codebook_kind == "lloyd"
    explicit_cb = qconfig.codebook_kind != "uniform"
    cb = None if per_layer_cb else qconfig.make_codebook()

    names = layer_names(cfg)
    reports: Dict[str, LayerReport] = {}

    def finish(name, out, wall):
        Q, bias_delta, scale, err = out
        p = get_linear_param(params, name)
        cb_l = qconfig.make_codebook(p["kernel"].T) if per_layer_cb else cb
        _apply_solution(params, name, p, cb_l, Q, bias_delta, scale,
                        qconfig, pack, pack_host=pack_host)
        if free_stats:
            stats.pop(name, None)
        reports[name] = LayerReport(name=name, error=float(jnp.sum(err)),
                                    wall_s=wall)
        if verbose:
            print(f"  {name:24s} err={reports[name].error:12.5g} "
                  f"{wall:6.2f}s", flush=True)

    pending = []
    for name in names:
        if resume_dir is not None:
            got = _load_layer_artifact(resume_dir, name)
            if got is not None:
                finish(name, got, 0.0)
                continue
        pending.append(name)

    # Solve SMALLEST-K layers first: the solve workspace scales ~K^2
    # (fc2-class layers need GBs of temps), and free_stats shrinks the
    # resident statistics as layers complete - so by the time the big
    # layers solve, their workspace fits without pre-offloading stats to
    # the host (the round-3 heavy run spent 190 s of idle-TPU D2H on an
    # offload this ordering makes unnecessary; VERDICT round-3 weak #3).
    # Layer order of the RETURNED reports is unchanged (names order).
    pending.sort(key=lambda n: (int(np.prod(stats[n].hessian.shape)), n))

    if layer_parallel and not per_layer_cb and pending:
        groups: Dict[Tuple[int, int], List[str]] = {}
        for name in pending:
            W = get_linear_param(params, name)["kernel"]
            groups.setdefault((W.shape[1], W.shape[0]), []).append(name)
        # key is (out, in); sort by K=in first (workspace scales ~K^2).
        for shape, group in sorted(groups.items(),
                                   key=lambda kv: (kv[0][1], kv[0][0])):
            t0 = time.time()
            outs = _solve_with_hbm_retry(
                lambda group=group: jax.block_until_ready(
                    _solve_layer_batch(params, stats, group, qconfig,
                                       cb if explicit_cb else None, mesh)))
            wall = (time.time() - t0) / len(group)
            for name, out in zip(group, outs):
                if resume_dir is not None:
                    _save_layer_artifact(resume_dir, name, *out)
                finish(name, out, wall)
        pending = []

    # Host-resident stats (offloaded Hessians) are prefetched one layer
    # ahead with async device_put so the H2D tunnel transfer of layer
    # i+1 overlaps the solve of layer i.
    prefetched: Dict[str, LayerStats] = {}

    def _fetch(name):
        st = prefetched.pop(name, None) or stats[name]
        if isinstance(st.hessian, np.ndarray):
            st = jax.tree_util.tree_map(jax.device_put, st)
        return st

    for idx, name in enumerate(pending):
        t0 = time.time()
        p = get_linear_param(params, name)
        st = _fetch(name)
        if idx + 1 < len(pending):
            nxt = pending[idx + 1]
            if isinstance(stats[nxt].hessian, np.ndarray):
                prefetched[nxt] = jax.tree_util.tree_map(
                    jax.device_put, stats[nxt])
        W = p["kernel"].T  # (out, in), the quantizer's layout
        cb_solve = (qconfig.make_codebook(W) if per_layer_cb
                    else (cb if explicit_cb else None))
        # block_until_ready INSIDE the retried thunk: solves dispatch
        # asynchronously, so an OOM would otherwise surface at some later
        # unrelated fetch (observed at pack_quantized's LUT fetch on the
        # 2.7B run) where no retry can rescue it.
        out = _solve_with_hbm_retry(
            lambda: jax.block_until_ready(
                quantize_layer(W, st.hessian, st.mean, qconfig, cb_solve)))
        del st
        if resume_dir is not None:
            _save_layer_artifact(resume_dir, name, *out)
        finish(name, out, time.time() - t0)

    return params, [reports[name] for name in names]


def _solve_with_hbm_retry(fn, attempts: int = 8, wait_s: float = 20.0):
    """Run a solve, retrying on device RESOURCE_EXHAUSTED.

    On >HBM models the CLI drains shed statistics to the host in a
    background thread WHILE the (smallest-first) solves run; a solve can
    transiently lose the race for HBM until more entries land on the
    host (first observed on the OPT-2.7B on-hardware drain run, round
    5). Waiting and retrying is exact - nothing about the solve depends
    on timing - and a genuine out-of-memory still raises after the
    retries are exhausted."""
    for attempt in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - match on message, re-raise
            if ("RESOURCE_EXHAUSTED" not in str(e)
                    or attempt == attempts - 1):
                raise
            print(f"  solve hit RESOURCE_EXHAUSTED; waiting {wait_s:.0f}s "
                  f"for the background stats drain "
                  f"({attempt + 1}/{attempts - 1})", flush=True)
            time.sleep(wait_s)


def _solve_layer_batch(params, stats, group: List[str],
                       qconfig: QuantConfig, codebook, mesh):
    """One vmapped quantize_layer over a stack of same-shape layers,
    optionally sharded over all mesh devices (the layer axis is the batch
    axis; each per-layer solve is one independent program instance)."""
    from sleekit_tpu.pipeline import quantize_layer as _ql

    Ws = jnp.stack([get_linear_param(params, n)["kernel"].T for n in group])
    Hs = jnp.stack([stats[n].hessian for n in group])
    mus = jnp.stack([stats[n].mean for n in group])
    n_layers = Ws.shape[0]

    pad = 0
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = int(np.prod(list(mesh.shape.values())))
        pad = (-n_layers) % n_dev
        if pad:
            idx = jnp.arange(n_layers + pad) % n_layers
            Ws, Hs, mus = Ws[idx], Hs[idx], mus[idx]
        axes = tuple(mesh.axis_names)
        sh = NamedSharding(mesh, P(axes))
        Ws, Hs, mus = (jax.device_put(x, sh) for x in (Ws, Hs, mus))

    fn = jax.jit(jax.vmap(lambda W, H, mu: _ql(W, H, mu, qconfig, codebook)),
                 static_argnums=())
    Q, bd, sc, err = fn(Ws, Hs, mus)
    outs = [(Q[i], bd[i], sc[i], err[i]) for i in range(n_layers)]
    return outs


def pack_lm_head(cfg: TransformerConfig, params, nbits: int = 8):
    """Inject a packed serving unembed head.

    The unembed matmul streams the full (E, V) matrix every decode step;
    packing it (int8 by default - the output head is quality-sensitive)
    cuts that stream 2-4x. Round-to-nearest with per-vocab-channel
    non-saturating scales; the tied embedding GATHER keeps the dense
    table (reads only B rows per step).
    """
    from sleekit_tpu.codebooks import UniformCodebook
    from sleekit_tpu.scaling import compute_non_saturating_scaling

    params = jax.tree_util.tree_map(lambda x: x, params)
    if "lm_head" in params and not isinstance(params["lm_head"], PackedLinear):
        W = params["lm_head"]["kernel"].T          # (V, E)
    else:
        W = params["embed"]["tokens"]               # (V, E) tied
        if "project_out" in params["embed"]:
            raise ValueError("pack_lm_head does not support project_out "
                             "models (OPT-350M); unembed stays dense")
    # Quantize + pack on the host CPU: the (V, E) round-trip peaks at
    # several f32/int32 copies of the full vocab matrix (2.1 GB each for
    # Llama3-8B) - on-device packing RESOURCE_EXHAUSTs a 16 GB chip that
    # already holds the packed model. Only the packed result ships back.
    target = None
    if jax.default_backend() != "cpu":
        target = (W.devices().pop() if getattr(W, "devices", None)
                  else jax.local_devices()[0])
        W = jax.device_get(W)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        W = jnp.asarray(W, jnp.float32)
        cb = UniformCodebook(2 ** nbits, -1.0, 1.0)
        scale = compute_non_saturating_scaling(W, cb)   # per vocab channel
        Q = cb(W / scale[:, None]) * scale[:, None]
        head = pack_quantized(Q, scale, cb)
    if target is not None:
        head = jax.device_put(head, target)
    params["lm_head"] = head
    return params


def quantize_model_from_batches(
    cfg: TransformerConfig,
    params,
    batches: Iterable[jnp.ndarray],
    qconfig: QuantConfig,
    pack: bool = False,
    verbose: bool = False,
):
    """Convenience: calibrate then quantize in one call."""
    stats = calibrate(cfg, params, batches)
    return quantize_model(cfg, params, stats, qconfig, pack=pack,
                          verbose=verbose)
