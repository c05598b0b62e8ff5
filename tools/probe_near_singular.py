"""Root-cause probe for the near_singular/4-bit/heavy parity cell.

PARITY_r04 carries ONE +2.96% divergence vs the reference: the heavy
pipeline on the near-singular layer, and the regression-split test
(tests/test_ab_reference.py) proves it enters through the DISCRETE
local-search path. This probe isolates the search itself: both sides
get the IDENTICAL scaled starting point (reference-side scaling + GPTQ
output), then

  * the reference ``LocalSearchQuantizer`` runs move by move,
  * a NumPy mirror of OUR dense-carry move step (local_search.py
    semantics: carried P = (Q-W) @ H, closed-form gains, per-row best
    flip) runs move by move in f32 AND in f64,

recording the objective (channelwise_error sum) per move, the first
move where the chosen columns differ, and whether at that move the
mirror's chosen gain is genuinely smaller than the reference's choice
(worse move) or equal within float noise (trajectory multiplicity).

Run: python tools/probe_near_singular.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def mirror_search(W, Q0, H, k, nb_moves, dtype):
    """NumPy mirror of sleekit_tpu.local_search.quantize_local_search
    (dense carried P, recomputed closed-form gains, per-row best flip;
    quantize_up/down are the CLOSED-FORM affine ops of our
    UniformCodebook evaluated at ``dtype``, codebooks.py:98-106),
    returning (Q, per-move err trace, per-move chosen cols, gains)."""
    import numpy as np

    W = W.astype(dtype)
    Q = Q0.astype(dtype).copy()
    H = H.astype(dtype)
    scale = dtype(2.0 / (k - 1))
    zero = dtype(-1.0)
    diag = np.diagonal(H)
    m, n = Q.shape
    rows = np.arange(m)

    def quantize_up(x):
        idx = np.clip(np.round((x - zero) / scale + 1), 1, k - 1)
        return (idx.astype(dtype) * scale + zero).astype(dtype)

    def quantize_down(x):
        idx = np.clip(np.round((x - zero) / scale - 1), 0, k - 2)
        return (idx.astype(dtype) * scale + zero).astype(dtype)

    P = (Q - W) @ H
    errs, cols, gains = [], [], []
    for _ in range(nb_moves):
        Qup, Qdn = quantize_up(Q), quantize_down(Q)
        Dup, Ddn = Qup - Q, Qdn - Q
        gain_up = -np.square(Dup) * diag[None, :] - 2 * P * Dup
        gain_dn = -np.square(Ddn) * diag[None, :] - 2 * P * Ddn
        best_up, col_up = gain_up.max(1), gain_up.argmax(1)
        best_dn, col_dn = gain_dn.max(1), gain_dn.argmax(1)
        take_up = (best_up > best_dn) & (best_up > 0)
        take_dn = (~take_up) & (best_dn > 0)
        col = np.where(take_up, col_up, col_dn)
        new_val = np.where(take_up, Qup[rows, col_up],
                           np.where(take_dn, Qdn[rows, col_dn],
                                    Q[rows, col]))
        d = new_val - Q[rows, col]
        Q[rows, col] += d
        P += d[:, None] * H[col]
        delta = Q - W
        errs.append(float(((delta @ H) * delta).sum()))
        cols.append(np.where(take_up | take_dn, col, -1))
        gains.append(np.where(take_up, best_up,
                              np.where(take_dn, best_dn, 0.0)))
    return Q, errs, cols, gains


def main():
    import numpy as np

    from sleekit_tpu.experiments.ab_reference import (gen_layers,
                                                      import_reference)

    ref_codebook, ref_obq, ref_scaling, _ = import_reference(
        "/root/reference")

    name, W0, H0, mean = [l for l in gen_layers()
                          if l[0] == "near_singular"][0]
    gk = dict(grid_size=40, min_factor=0.05, max_factor=1.0)
    k = 4
    cb = ref_codebook.UniformCodebook(k, -1, 1)
    Wr, Hr = W0.copy(), H0.copy()
    ref_obq.remove_dead_values(Hr, Wr)
    Hc = ref_obq.remove_input_bias(Hr, mean)
    print("ref-side dtypes: W", Wr.dtype, "Hc", Hc.dtype)
    sc = ref_scaling.compute_obq_scaling(Wr, cb, 0, H=Hc, act_order="sqerr",
                                         damp=0.03, **gk)
    # Reproduce quantize_with_scaling's interior: scaled W, GPTQ, then LS
    # in the SCALED space - identical starting point for every search.
    Ws = ref_scaling.apply_scaling(Wr, sc, 0)
    Q0 = ref_obq.quantize_opt(Ws, Hc, cb, act_order="sqerr", damp=0.03,
                              nb_ls_moves=0)
    print("scaled-space dtypes: Ws", Ws.dtype, "Q0", Q0.dtype)
    e0 = float(ref_obq.quantization_error(Ws, Q0, H=Hc))
    print(f"pre-LS err {e0:.6f}")

    moves = 100
    # Reference search, err trace per move.
    ls = ref_obq.LocalSearchQuantizer(Ws, Q0, Hc, cb)
    ref_errs, ref_cols, ref_gains = [], [], []
    for _ in range(moves):
        gu, gd = ls.gain_up.max(1), ls.gain_down.max(1)
        fu = (gu > gd) & (gu > 0)
        fd = ~fu & (gd > 0)
        col = np.where(fu, ls.gain_up.argmax(1), ls.gain_down.argmax(1))
        ref_cols.append(np.where(fu | fd, col, -1))
        ref_gains.append(np.where(fu, gu, np.where(fd, gd, 0.0)))
        ls.do_move()
        d = ls.Q - Ws
        ref_errs.append(float(((d @ Hc) * d).sum()))
    print(f"ref dtype inside LS: Q {ls.Q.dtype} gains {ls.gain_up.dtype}")

    _, f32_errs, f32_cols, f32_gains = mirror_search(
        Ws, Q0, Hc, k, moves, np.float32)
    _, f64_errs, f64_cols, f64_gains = mirror_search(
        Ws, Q0, Hc, k, moves, np.float64)

    print(f"final err: ref {ref_errs[-1]:.6f}  mirror-f32 "
          f"{f32_errs[-1]:.6f} ({(f32_errs[-1] / ref_errs[-1] - 1) * 100:+.3f}%)"
          f"  mirror-f64 {f64_errs[-1]:.6f} "
          f"({(f64_errs[-1] / ref_errs[-1] - 1) * 100:+.3f}%)")

    for tag, cols, gains in (("f32", f32_cols, f32_gains),
                             ("f64", f64_cols, f64_gains)):
        div = next((i for i in range(moves)
                    if not np.array_equal(cols[i], ref_cols[i])), None)
        if div is None:
            print(f"mirror-{tag}: identical move trajectory")
            continue
        rs = np.where(cols[div] != ref_cols[div])[0]
        r = rs[0]
        print(f"mirror-{tag}: first divergence at move {div}, "
              f"{len(rs)} rows differ; row {r}: "
              f"mirror col {cols[div][r]} gain {gains[div][r]:.8e} vs "
              f"ref col {ref_cols[div][r]} gain {ref_gains[div][r]:.8e} "
              f"(rel gap {abs(gains[div][r] - ref_gains[div][r]) / max(abs(ref_gains[div][r]), 1e-30):.2e})")

    # Is either side non-monotone (a sign of stale gains)?
    for tag, errs in (("ref", ref_errs), ("f32", f32_errs),
                      ("f64", f64_errs)):
        inc = sum(1 for i in range(1, moves) if errs[i] > errs[i - 1] + 1e-9)
        print(f"{tag}: {inc} objective-increasing moves; err[0] "
              f"{errs[0]:.6f} -> err[-1] {errs[-1]:.6f}")


if __name__ == "__main__":
    main()
