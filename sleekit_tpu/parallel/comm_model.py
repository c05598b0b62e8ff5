"""Analytical per-decode-step collective accounting for TP serving.

Gives the BASELINE ">85% tokens/s efficiency from 1 chip to >= 2 hosts"
target a footing that can be checked without a pod (round-3 VERDICT ask
5): count exactly the collectives the shard_map decode program issues
(parallel/tp_decode.py - two psums per layer after the row-parallel o
and down/fc2 projections, plus one logits all-gather), convert to wire
bytes under the standard ring-collective cost 2*(n-1)/n bytes moved per
device per all-reduce, and compare against the per-step compute time the
weight stream dictates.

The model intentionally has only first-order terms - its job is to show
WHERE the >=85% target holds (the packed weight stream per device
shrinks 1/n while the collective bytes are tiny and context-independent)
and at what geometry it stops holding, not to predict milliseconds to
three digits. No reference analogue (the reference has no parallelism,
SURVEY.md S2.3).
"""

from __future__ import annotations

from typing import Dict

# Per-link bandwidths, bytes/s. ICI: one v5e ring link direction ~
# 4.5e10 B/s effective; DCN per-host ~ 2.5e10 B/s (200 Gb/s class NICs);
# conservative round numbers - callers may override.
ICI_BPS = 4.5e10
DCN_BPS = 2.5e10
HBM_BPS = 8.1e11           # v5e ~810 GB/s
# Fixed per-step launch/dispatch overhead of the fused decode program
# (measured component split, BENCH_NOTES.md round 3: glue ~0.08 ms plus
# per-kernel gaps); collectives add latency per call on top of bytes.
STEP_OVERHEAD_S = 2.0e-4
ALLREDUCE_LATENCY_S = 5e-6   # per call, intra-slice ICI
DCN_LATENCY_S = 25e-6        # per call, cross-host


def decode_step_comm(cfg, batch: int, tp: int,
                     act_bytes: int = 2,
                     vocab_gather: bool = True) -> Dict[str, float]:
    """Collective calls and wire bytes for ONE decode step of ``cfg``
    under ``tp``-way tensor parallelism (batch ``batch``, activations
    ``act_bytes`` wide).

    The shard_map decode block issues exactly TWO all-reduces per layer -
    after the row-parallel attention o-projection and the row-parallel
    down/fc2 projection, each on a (batch, d_model) activation
    (parallel/tp_decode.py:140,153) - plus ONE tiled all-gather of the
    (batch, vocab/tp) logit shards (:381).
    """
    d = cfg.d_model
    n_ar = 2 * cfg.n_layers + (1 if vocab_gather else 0)
    ar_payload = batch * d * act_bytes
    # Ring all-reduce: each device sends/receives 2*(n-1)/n of the
    # payload; all-gather moves (n-1)/n of the gathered result.
    ring = 2.0 * (tp - 1) / tp
    ar_bytes = 2 * cfg.n_layers * ar_payload * ring
    ag_bytes = 0.0
    if vocab_gather:
        ag_bytes = batch * cfg.vocab_size * act_bytes * (tp - 1) / tp
    return {
        "allreduce_calls": n_ar,
        "allreduce_payload_bytes": float(ar_payload),
        "ici_bytes_per_step": float(ar_bytes + ag_bytes),
        "tp": tp,
    }


def packed_weight_bytes(cfg, nbits: int) -> float:
    """Approximate packed-weight HBM stream per decode step (the decode
    bottleneck): all linear layers at nbits/16 of bf16 + an int8 unembed."""
    d, f, v = cfg.d_model, cfg.d_ff, cfg.vocab_size
    kv = getattr(cfg, "kv_heads", cfg.n_heads) or cfg.n_heads
    kv_dim = d * kv // cfg.n_heads
    per_layer = d * (d + 2 * kv_dim) + d * d          # qkv + o
    glu = getattr(cfg, "activation", "") in ("silu_glu", "swiglu")
    per_layer += d * f * (3 if glu else 2)            # up(+gate) + down
    return cfg.n_layers * per_layer * nbits / 8.0 + d * v  # + int8 head


def tp_step_estimate(cfg, batch: int, tp: int, nbits: int = 4,
                     cross_host: bool = False,
                     kv_bytes_per_step: float = 0.0) -> Dict[str, float]:
    """First-order per-step time model under ``tp``-way TP.

    step = weight_stream/tp/HBM + kv_stream/tp/HBM + overhead
         + collective bytes/link_bw + n_calls * link_latency
    Returns times plus the scaling efficiency vs the single-chip step
    (= t1 / (tp * t_tp) * tp = t1 / t_tp ... tokens/s efficiency is
    throughput_tp / throughput_1, same batch).
    """
    comm = decode_step_comm(cfg, batch, tp)
    w_bytes = packed_weight_bytes(cfg, nbits)
    t1 = (w_bytes + kv_bytes_per_step) / HBM_BPS + STEP_OVERHEAD_S
    link = DCN_BPS if cross_host else ICI_BPS
    lat = DCN_LATENCY_S if cross_host else ALLREDUCE_LATENCY_S
    t_comm = comm["ici_bytes_per_step"] / link + comm["allreduce_calls"] * lat
    t_tp = ((w_bytes + kv_bytes_per_step) / tp / HBM_BPS
            + STEP_OVERHEAD_S + t_comm)
    return {
        **comm,
        "weight_bytes": w_bytes,
        "t_single_s": t1,
        "t_tp_s": t_tp,
        "t_comm_s": t_comm,
        # tokens/s with the same global batch: 1/t per batch -> per-chip
        # efficiency = (1/t_tp) / (tp * (1/t1)) when weak-scaling the
        # chip count at fixed batch.
        "tokens_per_s_speedup": t1 / t_tp,
        "efficiency_vs_linear": t1 / t_tp / tp,
    }


def count_collectives_in_jaxpr(jaxpr) -> Dict[str, int]:
    """Count collective primitives in a (closed) jaxpr, recursively -
    ties the analytical model to the program actually traced."""
    counts: Dict[str, int] = {}

    def walk(jx):
        # Accept ClosedJaxpr or raw Jaxpr at any nesting level.
        if hasattr(jx, "jaxpr") and not hasattr(jx, "eqns"):
            jx = jx.jaxpr
        for eqn in jx.eqns:
            name = eqn.primitive.name
            if name in ("psum", "psum2", "psum_invariant", "all_gather",
                        "all_reduce", "reduce_scatter", "ppermute",
                        "all_to_all"):
                counts[name] = counts.get(name, 0) + 1
            for v in eqn.params.values():
                for u in (v if isinstance(v, (list, tuple)) else [v]):
                    if hasattr(u, "jaxpr") or hasattr(u, "eqns"):
                        walk(u)

    walk(jaxpr)
    return counts


def two_host_recipe(cfg, batch: int, tp: int, nbits: int = 4) -> str:
    """The >=85% 1-chip -> 2-hosts recipe the byte accounting supports:
    'model' (TP) stays INSIDE each host on ICI; hosts scale on the
    'data' axis, which carries ZERO per-step serving collectives (the
    only cross-host traffic is calibration-time stats psum). Doubling
    hosts at fixed per-replica batch therefore doubles tokens/s minus
    only scheduler jitter - the analytical efficiency is ~100%, and the
    single-host TP efficiency below is the real constraint."""
    est = tp_step_estimate(cfg, batch, tp, nbits)
    return (f"2-host config: mesh data=2(hosts, DCN) x model={tp}(ICI); "
            f"per-step DCN collective bytes = 0 (serving), "
            f"ICI {est['ici_bytes_per_step'] / 1e6:.2f} MB/step in "
            f"{est['allreduce_calls']} all-reduces; single-host TP{tp} "
            f"comm time {est['t_comm_s'] * 1e3:.2f} ms vs weight-stream "
            f"{est['weight_bytes'] / tp / HBM_BPS * 1e3:.2f} ms")
