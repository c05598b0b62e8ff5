"""GPTQ/OBQ error-compensating solver, TPU-native.

Re-design of the reference solver (/root/reference/sleekit/obq.py:58-217)
as one jitted program with static shapes:

  * the sequential column sweep runs inside a ``lax.fori_loop`` over a
    column block (the block stays register/VMEM resident under XLA);
  * the O(m n^2 / B) trailing error correction is batched into full GEMMs
    on the MXU (the reference's own blocking trick, obq.py:121-137, with a
    single blocking level and TPU-lane-aligned block size);
  * column orderings are argsorts; permutations are gathers;
  * everything is parallel over output channels (rows of W).

The math contract is identical to the reference (validated by
tests/test_solver.py the same way the reference validates blocked vs
unblocked, tests/test_obq.py:57-70): per column i,
q = quantize(w_i), err = (w_i - q) / Hinv[i, i], trailing columns get
-= err * Hinv[i, i+1:], with block-level correction Q[:, e:] -= E @ Hinv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from sleekit_tpu.hessian import dampen, hessian_inv_chol, hessian_inv_chol_robust


# ---- error metrics (ref obq.py:89-103) ----------------------------------


def channelwise_error(W: jnp.ndarray, Q: jnp.ndarray, H: jnp.ndarray) -> jnp.ndarray:
    """Per-output-channel quadratic error ((E @ H) * E).sum(-1) - THE
    objective every component minimizes (ref obq.py:89-96)."""
    E = W - Q
    return jnp.sum((E @ H) * E, axis=-1)


def quantization_error(W: jnp.ndarray, Q: jnp.ndarray, H: jnp.ndarray) -> jnp.ndarray:
    """Mean channel error (ref obq.py:99-103)."""
    return jnp.mean(channelwise_error(W, Q, H))


# ---- column orderings (ref obq.py:58-86) --------------------------------

ORDER_MODES = ("diag", "err", "sqerr", "combined_diag", "inv_diag", "pivot", "none")


def cholesky_ordering(H: jnp.ndarray) -> jnp.ndarray:
    """Greedy pivoted-Cholesky ordering (ref obq.py:140-166).

    At step k the pivot maximizes the remaining conditional variance
    (diagonal of the Schur complement). Only the Schur update matters for
    the pivot sequence, so the sqrt/normalize steps of a full factorization
    are skipped. O(n^3) masked dense updates; kept for parity (the mode is
    rarely used - SURVEY.md §3.5).
    """
    n = H.shape[0]

    def body(k, carry):
        L, order = carry
        d = jnp.abs(jnp.diagonal(L))
        masked = jnp.where(jnp.arange(n) >= k, d, -jnp.inf)
        pivot = jnp.argmax(masked)
        perm = jnp.arange(n).at[k].set(pivot).at[pivot].set(k)
        L = L[perm][:, perm]
        order = order[perm]
        mask = (jnp.arange(n) > k).astype(L.dtype)
        b = L[k] * mask
        L = L - jnp.outer(b, b) / L[k, k]
        return L, order

    _, order = lax.fori_loop(0, n, body, (H, jnp.arange(n)))
    return order


def compute_order(W: jnp.ndarray, H: jnp.ndarray, quantizer, act_order: str) -> jnp.ndarray:
    """Column ordering for the greedy sweep (ref obq.py:58-86).

    ``diag`` is the GPTQ default; ``sqerr`` (diagonal x squared rounding
    error) is the Sleekit improvement (ref README.md:92-93).
    """
    diag = jnp.diagonal(H)
    if act_order == "diag":
        key = -diag
    elif act_order == "err":
        err = jnp.sum(jnp.abs(quantizer(W) - W), axis=0)
        key = -diag * err
    elif act_order == "sqerr":
        sqerr = jnp.sum(jnp.square(quantizer(W) - W), axis=0)
        key = -diag * sqerr
    elif act_order == "combined_diag":
        key = -diag / jnp.diagonal(jnp.linalg.inv(H))
    elif act_order == "inv_diag":
        key = jnp.diagonal(jnp.linalg.inv(H))
    elif act_order == "pivot":
        return cholesky_ordering(H)
    elif act_order == "none":
        return jnp.arange(W.shape[1])
    else:
        raise ValueError(f"Invalid act_order value {act_order}")
    return jnp.argsort(key)


# ---- blocked error-compensating sweep (ref obq.py:106-137) --------------


def _pad_cols(x: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (0, n_pad - x.shape[1])))


def gptq_sweep(
    W: jnp.ndarray,
    Hinv: jnp.ndarray,
    quantizer,
    block_size: int = 128,
) -> jnp.ndarray:
    """Blocked greedy sweep: quantize columns left-to-right with error
    compensation. ``Hinv`` is the upper Cholesky factor of the (dampened,
    permuted) inverse Hessian. Returns Q with the same column order as W.

    Single-level blocking: an inner ``fori_loop`` does the sequential
    rank-1 updates within a lane-aligned block, then one MXU GEMM corrects
    all trailing columns (ref obq.py:121-137; blocking is numerically
    exact, ref tests/test_obq.py:57-70).
    """
    m, n = W.shape
    B = min(block_size, n)
    n_pad = -(-n // B) * B
    nb = n_pad // B

    Q0 = _pad_cols(W.astype(jnp.float32), n_pad)
    # Padded Hinv: identity on the pad diagonal so padded columns are
    # no-ops (their error is exactly zero thanks to the valid-column mask).
    Hp = jnp.eye(n_pad, dtype=jnp.float32)
    Hp = lax.dynamic_update_slice(Hp, Hinv.astype(jnp.float32), (0, 0))
    valid = jnp.arange(n_pad) < n

    col_ids = jnp.arange(B)

    def block_step(Q, b):
        start = b * B
        Qb = lax.dynamic_slice(Q, (0, start), (m, B))
        Hb = lax.dynamic_slice(Hp, (start, start), (B, B))
        validb = lax.dynamic_slice(valid, (start,), (B,))

        def col_body(i, carry):
            Qb, Eb = carry
            w = lax.dynamic_index_in_dim(Qb, i, axis=1, keepdims=False)
            q = jnp.where(validb[i], quantizer(w), w)
            err = (w - q) / Hb[i, i]
            row = Hb[i] * (col_ids > i)
            Qb = Qb - jnp.outer(err, row)
            Qb = Qb.at[:, i].set(q)
            Eb = Eb.at[:, i].set(err)
            return Qb, Eb

        Qb, Eb = lax.fori_loop(0, B, col_body, (Qb, jnp.zeros_like(Qb)))

        # Trailing correction for everything after this block, one GEMM.
        Hrows = lax.dynamic_slice(Hp, (start, 0), (B, n_pad))
        trailing = (jnp.arange(n_pad) >= start + B).astype(Q.dtype)
        Q = Q - jnp.dot(Eb, Hrows * trailing[None, :],
                        preferred_element_type=jnp.float32)
        Q = lax.dynamic_update_slice(Q, Qb, (0, start))
        return Q, None

    Q, _ = lax.scan(block_step, Q0, jnp.arange(nb))
    return Q[:, :n]


# ---- top-level solve (ref obq.py:169-217) -------------------------------


def quantize_opt(
    W: jnp.ndarray,
    H: jnp.ndarray,
    quantizer,
    act_order: str = "diag",
    damp: float = 0.01,
    nb_ls_moves: int = 0,
    block_size: int = 128,
    damp_retry: bool = True,
) -> jnp.ndarray:
    """Quantize W minimizing the H-weighted squared error, GPTQ-style.

    Pipeline (ref obq.py:169-217): dampen H, order columns, permute,
    Cholesky of the inverse, blocked sweep, un-permute, optional
    best-first local search refinement. ``damp_retry`` escalates the
    dampening 10x (up to 4 times) when the Cholesky of a near-singular
    Hessian produces non-finite values (SURVEY.md §5.3; identical result
    whenever the first attempt succeeds).
    """
    assert W.ndim == 2 and H.ndim == 2
    assert H.shape[0] == H.shape[1] == W.shape[1]
    W = W.astype(jnp.float32)
    H = H.astype(jnp.float32)

    H_opt = dampen(H, damp)
    order = compute_order(W, H_opt, quantizer, act_order)

    Wp = W[:, order]
    if damp_retry:
        Hperm = H[order][:, order]
        Hinv, _ = hessian_inv_chol_robust(Hperm, damp)
    else:
        Hinv = hessian_inv_chol(H_opt[order][:, order])

    Qp = gptq_sweep(Wp, Hinv, quantizer, block_size=block_size)

    inv_order = jnp.argsort(order)
    Q = Qp[:, inv_order]

    if nb_ls_moves > 0:
        from sleekit_tpu.local_search import quantize_local_search

        Q = quantize_local_search(W, Q, H, quantizer, nb_ls_moves)
    return Q
