"""On-TPU kernel compile/run smoke matrix.

CI runs every Pallas kernel in interpret mode on CPU; nothing recorded
which configurations actually COMPILE on real TPU hardware (round-2
VERDICT weak-item 7 - e.g. a pre="layernorm" full-K-row variant at
8B-class K is the first to hit VMEM limits). This driver pallas_call's
every kernel variant x layout x geometry on the current backend, checks
each against its XLA oracle, and writes one JSON line per case to
``--out`` (default TPU_KERNEL_SMOKE.json).

Run on the TPU (one client at a time):
  python tools/tpu_kernel_smoke.py [--out TPU_KERNEL_SMOKE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.path.join(REPO, "TPU_KERNEL_SMOKE.json"))
    ap.add_argument("--quick", action="store_true",
                    help="skip the 8B-class geometries")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache_root = os.environ.get("JAX_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(cache_root, jax.default_backend()))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from sleekit_tpu.codebooks import UniformCodebook
    from sleekit_tpu.ops import attention as at
    from sleekit_tpu.ops import dequant_matmul as dq
    from sleekit_tpu.ops import paged_attention as pat
    from sleekit_tpu.ops.pack import pack_quantized

    backend = jax.default_backend()
    interpret = backend == "cpu"
    results = []
    rng = np.random.RandomState(0)

    def record(name, fn, check=None, tol=2e-2):
        t0 = time.time()
        entry = {"case": name, "backend": backend}
        try:
            out = fn()
            jax.block_until_ready(out)
            entry["ok"] = True
            if check is not None:
                ref = check()
                rel = float(np.max(np.abs(np.asarray(out, np.float32)
                                          - np.asarray(ref, np.float32)))
                            / (np.max(np.abs(np.asarray(ref))) + 1e-9))
                entry["max_rel_err"] = round(rel, 6)
                entry["ok"] = rel < tol
        except Exception as e:  # noqa: BLE001 - record every failure mode
            entry["ok"] = False
            entry["error"] = f"{type(e).__name__}: {e}"[:500]
            traceback.print_exc(limit=2)
        entry["secs"] = round(time.time() - t0, 2)
        results.append(entry)
        print(f"  {'OK ' if entry['ok'] else 'FAIL'} {name} "
              f"({entry['secs']}s"
              + (f", rel={entry.get('max_rel_err')}" if "max_rel_err" in entry
                 else "") + ")", flush=True)

    # ---- dequant matmul: layout x nbits x glue-fusion x geometry ------
    # K is the dimension that stresses lowering/VMEM (full-K-row glue
    # variants); N is block-tiled, so the 8B rows keep the true K but a
    # reduced N - the full-width host-side pack alone took minutes and
    # tripped the sweep timeout.
    geoms = [("opt1.3b-fc1", 2048, 8192), ("opt1.3b-attn", 2048, 2048)]
    if not args.quick:
        geoms += [("llama8b-gateup", 4096, 8192), ("llama8b-down", 14336, 4096)]
    for gname, K, N in geoms:
        W = rng.randn(N, K).astype(np.float32) * 0.02
        x = jnp.asarray(rng.randn(8, K).astype(np.float32) * 0.1,
                        jnp.bfloat16)
        for nbits in (3, 4, 8):
            layouts = (("int8",) if nbits == 8
                       else ("pair", "pair3", "pair3x", "plane")
                       if nbits == 3 else ("pair", "plane"))
            cb = UniformCodebook(2 ** nbits, -1.0, 1.0)
            scale = np.abs(W).max(axis=1) + 1e-3
            Q = np.asarray(cb(jnp.asarray(W / scale[:, None]))) * scale[:, None]
            for layout in layouts:
                p = pack_quantized(jnp.asarray(Q), jnp.asarray(scale), cb,
                                   layout=layout)
                ref = (np.asarray(x, np.float32)
                       @ np.asarray(p.dequantize())[:, :p.out_features])

                def run(p=p):
                    return dq.dequant_matmul_pallas(x, p,
                                                    interpret=interpret)
                record(f"dequant_matmul/{gname}/int{nbits}/{layout}",
                       run, check=lambda ref=ref: ref)
                if layout in ("pair", "pair3", "pair3x"):
                    # Glue fusion: pre-layernorm rides the kernel
                    # prologue - the full-K-row variant most likely to
                    # hit VMEM at 8B-class K.
                    ln = {"scale": jnp.ones((K,), jnp.float32),
                          "bias": jnp.zeros((K,), jnp.float32)}

                    def run_ln(p=p, ln=ln):
                        return dq.fused_quantized_matmul(
                            x, p, pre="layernorm", ln_scale=ln["scale"],
                            ln_bias=ln["bias"], interpret=interpret)
                    record(f"dequant_matmul/{gname}/int{nbits}/"
                           f"{layout}+ln", run_ln)

    # ---- NF4 (table-codebook) LUT serving: plane kernel, incl. the
    # stacked layer_sel zero-copy path (round-3 VERDICT ask 6) ----------
    from sleekit_tpu.codebooks import Codebook
    from sleekit_tpu.ops.pack import PackedLinear, affine_from_lut
    from sleekit_tpu.ops.pack import pack_indices as _pack_idx
    import dataclasses as _dc

    nf4 = Codebook.nf4()
    lutv = jnp.asarray(np.asarray(nf4.values), jnp.float32)
    assert affine_from_lut(lutv) is None
    Knf, Nnf = 2048, 2048
    idx_nf = jnp.asarray(rng.randint(0, 16, (Knf, Nnf)), jnp.int32)
    w_nf = PackedLinear(
        packed=_pack_idx(idx_nf, 4, layout="plane"),
        scale=jnp.asarray(rng.rand(Nnf).astype(np.float32) + 0.5),
        lut=lutv, bias=None, in_features=Knf, out_features=Nnf,
        nbits=4, affine=None, layout="plane")
    x_nf = jnp.asarray(rng.randn(8, Knf).astype(np.float32) * 0.1,
                       jnp.bfloat16)
    ref_nf = (np.asarray(x_nf, np.float32)
              @ np.asarray(w_nf.dequantize(), np.float32))
    record("dequant_matmul/nf4/plane",
           lambda: dq.dequant_matmul_pallas(x_nf, w_nf,
                                            interpret=interpret),
           check=lambda: ref_nf)
    w_nf_st = _dc.replace(
        w_nf, packed=jnp.stack([w_nf.packed, w_nf.packed]),
        layer_sel=jnp.int32(1))
    record("dequant_matmul/nf4/plane-stacked",
           lambda: dq.dequant_matmul_pallas(x_nf, w_nf_st,
                                            interpret=interpret),
           check=lambda: ref_nf)

    # ---- flash decode: mode x GQA x int8 KV ---------------------------
    for kv, G, tag in ((32, 1, "mha32"), (8, 4, "gqa8x4")):
        B, S, D = 8, 256, 64
        ck = jnp.asarray(rng.randn(2, B, kv, S, D).astype(np.float32),
                         jnp.bfloat16)
        cv = jnp.asarray(rng.randn(2, B, kv, S, D).astype(np.float32),
                         jnp.bfloat16)
        q = jnp.asarray(rng.randn(B, kv * G, D).astype(np.float32),
                        jnp.bfloat16)
        pos = jnp.asarray(rng.randint(4, S - 1, (B,)), jnp.int32)
        layer = jnp.int32(1)
        sc = 1.0 / np.sqrt(D)

        def oracle():
            return at.flash_decode_xla(q, ck, cv, pos, layer, sc)
        for mode, kwargs in (("dot", {}), ("bfold", {"batch_fold": True})):
            def run(kwargs=kwargs):
                return at.flash_decode_pallas(q, ck, cv, pos, layer, sc,
                                              interpret=interpret, **kwargs)
            record(f"flash_decode/{tag}/{mode}", run, check=oracle)

        # uniform + per-slot KV append, bf16 and int8
        kn = jnp.asarray(rng.randn(B, kv, D).astype(np.float32), jnp.bfloat16)
        vn = jnp.asarray(rng.randn(B, kv, D).astype(np.float32), jnp.bfloat16)

        def run_append(pos=pos):
            return at.kv_append_pallas(kn, vn, ck, cv, pos, layer,
                                       interpret=interpret)[0]
        record(f"kv_append/{tag}/ragged", run_append)

        def run_append_u():
            return at.kv_append_pallas(kn, vn, ck, cv, jnp.int32(7), layer,
                                       interpret=interpret)[0]
        record(f"kv_append/{tag}/uniform", run_append_u)

        cki = jnp.zeros((2, B, kv, S, D), jnp.int8)
        ksc = jnp.zeros((2, B, kv, S), jnp.float32)

        def run_append_q():
            return at.kv_append_pallas(kn, vn, cki, cki, pos, layer,
                                       k_scale=ksc, v_scale=ksc,
                                       interpret=interpret)[0]
        record(f"kv_append/{tag}/int8", run_append_q)

        # append-FUSED flash decode (the round-4 serving default): one
        # kernel does the in-place append + attention; check the
        # attention output against the XLA append-then-attend oracle.
        def fused_oracle():
            u = at.kv_append_xla(kn, vn, ck, cv, pos, layer)
            return at.flash_decode_xla(q, u[0], u[1], pos, layer, sc)

        def run_fused():
            return at.fused_decode_append_pallas(
                q, kn, vn, ck, cv, pos, layer, sc,
                interpret=interpret)[0]
        record(f"fused_decode_append/{tag}/bf16", run_fused,
               check=fused_oracle)

        cki2 = jnp.asarray(rng.randint(-127, 128, (2, B, kv, S, D)),
                           jnp.int8)
        ksc2 = jnp.asarray(
            0.01 + 0.05 * rng.rand(2, B, kv, S).astype(np.float32))

        def fused_oracle_q():
            u = at.kv_append_xla(kn, vn, cki2, cki2, pos, layer,
                                 k_scale=ksc2, v_scale=ksc2)
            return at.flash_decode_xla(q, u[0], u[1], pos, layer, sc,
                                       k_scale=u[2], v_scale=u[3])

        def run_fused_q():
            return at.fused_decode_append_pallas(
                q, kn, vn, cki2, cki2, pos, layer, sc,
                k_scale=ksc2, v_scale=ksc2, interpret=interpret)[0]
        record(f"fused_decode_append/{tag}/int8", run_fused_q,
               check=fused_oracle_q)

        # long context: append window + scale block land in a non-zero
        # S-block (block_s=128 -> 2 blocks at S=256).
        def run_fused_blocks():
            return at.fused_decode_append_pallas(
                q, kn, vn, cki2, cki2, pos, layer, sc,
                k_scale=ksc2, v_scale=ksc2, block_s=128,
                interpret=interpret)[0]
        record(f"fused_decode_append/{tag}/int8-2blk", run_fused_blocks,
               check=fused_oracle_q)

    # ---- paged kernels ------------------------------------------------
    B, kv, PS, D, MAXP = 4, 8, 64, 64, 4
    pool_k = jnp.asarray(rng.randn(2, 8, kv, PS, D).astype(np.float32),
                         jnp.bfloat16)
    pool_v = jnp.asarray(rng.randn(2, 8, kv, PS, D).astype(np.float32),
                         jnp.bfloat16)
    pt = jnp.asarray(rng.randint(0, 8, (B, MAXP)), jnp.int32)
    qq = jnp.asarray(rng.randn(B, kv, D).astype(np.float32), jnp.bfloat16)
    ppos = jnp.asarray(rng.randint(4, MAXP * PS - 1, (B,)), jnp.int32)

    def run_paged():
        return pat.paged_flash_decode_pallas(
            qq, pool_k, pool_v, pt, ppos, jnp.int32(0), 1.0 / np.sqrt(D),
            interpret=interpret)

    def paged_oracle():
        return pat.paged_flash_decode_xla(
            qq, pool_k, pool_v, pt, ppos, jnp.int32(0), 1.0 / np.sqrt(D))
    record("paged_flash_decode/bf16", run_paged, check=paged_oracle)

    kn = jnp.asarray(rng.randn(B, kv, D).astype(np.float32), jnp.bfloat16)

    def run_paged_append():
        return pat.paged_kv_append_pallas(kn, kn, pool_k, pool_v, pt, ppos,
                                          jnp.int32(1),
                                          interpret=interpret)[0]
    record("paged_kv_append/bf16", run_paged_append)

    # Fused append+flash over the page pool (one launch/layer): needs a
    # well-formed table (distinct physical pages per row) because it
    # WRITES the append window through the table deref.
    sc = 1.0 / np.sqrt(D)
    pool2_k = jnp.asarray(rng.randn(2, B * MAXP + 1, kv, PS, D)
                          .astype(np.float32), jnp.bfloat16)
    pool2_v = jnp.asarray(rng.randn(2, B * MAXP + 1, kv, PS, D)
                          .astype(np.float32), jnp.bfloat16)
    pt2 = jnp.asarray(1 + rng.permutation(B * MAXP).reshape(B, MAXP),
                      jnp.int32)

    def run_paged_fused():
        return pat.paged_fused_decode_append_pallas(
            qq, kn, kn, pool2_k, pool2_v, pt2, ppos, jnp.int32(1), sc,
            interpret=interpret)[0]

    def paged_fused_oracle():
        u = pat.paged_kv_append_xla(kn, kn, pool2_k, pool2_v, pt2, ppos,
                                    jnp.int32(1))
        return pat.paged_flash_decode_xla(qq, u[0], u[1], pt2, ppos,
                                          jnp.int32(1), sc)
    record("paged_fused_decode_append/bf16", run_paged_fused,
           check=paged_fused_oracle)

    pool2_ki = jnp.asarray(rng.randint(-127, 128, pool2_k.shape), jnp.int8)
    psc = jnp.asarray(0.01 + rng.rand(*pool2_k.shape[:-1])
                      .astype(np.float32))

    def run_paged_fused_q():
        return pat.paged_fused_decode_append_pallas(
            qq, kn, kn, pool2_ki, pool2_ki, pt2, ppos, jnp.int32(1), sc,
            k_scale=psc, v_scale=psc, interpret=interpret)[0]

    def paged_fused_oracle_q():
        u = pat.paged_kv_append_xla(kn, kn, pool2_ki, pool2_ki, pt2, ppos,
                                    jnp.int32(1), k_scale=psc, v_scale=psc)
        return pat.paged_flash_decode_xla(qq, u[0], u[1], pt2, ppos,
                                          jnp.int32(1), sc,
                                          k_scale=u[2], v_scale=u[3])
    record("paged_fused_decode_append/int8", run_paged_fused_q,
           check=paged_fused_oracle_q)

    # ---- flash prefill (GQA-native + ALiBi) ---------------------------
    for tag, (pB, pKV, pT, pD, pG, alibi) in {
            "mha": (2, 8, 512, 64, 1, False),
            "gqa": (1, 4, 512, 128, 4, False),
            "alibi": (1, 8, 256, 64, 1, True)}.items():
        pH = pKV * pG
        pq = jnp.asarray(rng.randn(pB, pT, pH, pD).astype(np.float32),
                         jnp.bfloat16)
        pk = jnp.asarray(rng.randn(pB, pKV, pT, pD).astype(np.float32),
                         jnp.bfloat16)
        pv = jnp.asarray(rng.randn(pB, pKV, pT, pD).astype(np.float32),
                         jnp.bfloat16)
        psl = (jnp.linspace(0.02, 0.4, pH) if alibi else None)
        psc = 1.0 / np.sqrt(pD)

        def run_prefill(pq=pq, pk=pk, pv=pv, psl=psl, psc=psc):
            return at.flash_prefill_pallas(pq, pk, pv, psc,
                                           alibi_slopes=psl,
                                           interpret=interpret)

        def prefill_oracle(pq=pq, pk=pk, pv=pv, psl=psl, psc=psc,
                           pG=pG, pT=pT):
            k = jnp.repeat(pk, pG, axis=1).astype(jnp.float32)
            v = jnp.repeat(pv, pG, axis=1).astype(jnp.float32)
            pos = jnp.arange(pT)
            bias = jnp.where(pos[None, :] <= pos[:, None], 0.0, -jnp.inf)
            lg = jnp.einsum("bthd,bhsd->bhts", pq.astype(jnp.float32),
                            k) * psc + bias[None, None]
            if psl is not None:
                dist = (pos[None, :] - pos[:, None]).astype(jnp.float32)
                lg = lg + jnp.where(
                    pos[None, :] <= pos[:, None],
                    psl[None, :, None, None] * dist[None, None], 0.0)
            return jnp.einsum("bhts,bhsd->bthd",
                              jax.nn.softmax(lg, axis=-1), v)
        record(f"flash_prefill/{tag}", run_prefill, check=prefill_oracle)

    n_ok = sum(r["ok"] for r in results)
    summary = {"backend": backend, "cases": len(results), "ok": n_ok,
               "failed": [r["case"] for r in results if not r["ok"]],
               "results": results}
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"{n_ok}/{len(results)} kernel cases OK on {backend} -> {args.out}")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
