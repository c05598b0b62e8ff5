"""GPTQ solver tests, mirroring the reference's oracle-vs-optimized style
(ref tests/test_obq.py): literal GPTQ recursion vs the blocked sweep,
ordering quality monotonicity, Cholesky equivalence, bias removal algebra."""

import numpy as np
import jax.numpy as jnp

from sleekit_tpu.codebooks import UniformCodebook
from sleekit_tpu.hessian import (
    dampen,
    hessian_inv_chol,
    remove_dead_values,
    remove_input_bias,
)
from sleekit_tpu.solver import (
    channelwise_error,
    compute_order,
    gptq_sweep,
    quantization_error,
    quantize_opt,
)


def random_psd(size, rank, damp=0.0, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.randn(size, rank).astype(np.float32)
    h = a @ a.T
    return h + damp * np.linalg.norm(h, ord=2, axis=1) * np.eye(size)


def reference_gptq(W, Hinv, quantize):
    """Literal unblocked GPTQ recursion (oracle), straight from the
    published algorithm: per column quantize, err = (w-q)/Hinv[i,i],
    rank-1 update of the remaining columns."""
    Q = W.copy().astype(np.float32)
    n = W.shape[1]
    for i in range(n):
        w = Q[:, i].copy()
        q = quantize(w)
        err = (w - q) / Hinv[i, i]
        Q[:, i] = q
        Q[:, i + 1:] -= np.outer(err, Hinv[i, i + 1:])
    return Q


def test_hessian_inv_chol_identity():
    """U from the flip trick satisfies U^T diag relation: for H = I, U = I."""
    H = np.eye(8, dtype=np.float32)
    U = np.asarray(hessian_inv_chol(jnp.asarray(H)))
    assert np.allclose(U, np.eye(8), atol=1e-5)


def test_tri_inv_blocked_ragged_sizes():
    """The blocked triangular inverse must stay blocked (not fall back to
    the ~9 GB monolithic solve) for n NOT a multiple of the block - e.g.
    Llama2/Qwen FFN n=11008 - and stay exact (advisor round 2)."""
    import jax
    from sleekit_tpu.hessian import _tri_inv_lower

    rng = np.random.RandomState(5)
    for n, block in ((48, 32), (96, 32), (100, 32), (130, 64)):
        a = rng.randn(n, n).astype(np.float32)
        L = np.linalg.cholesky(a @ a.T / n + np.eye(n, dtype=np.float32))
        got = np.asarray(_tri_inv_lower(jnp.asarray(L), block=block))
        want = np.asarray(jax.scipy.linalg.solve_triangular(
            jnp.asarray(L), jnp.eye(n), lower=True))
        assert np.allclose(got, want, atol=1e-5), (n, block)


def test_hessian_inv_chol_vs_gptq():
    """Equivalent to GPTQ's cholesky(inv(H), upper) (ref tests/test_obq.py:21-32)."""
    H = random_psd(32, 64, damp=1e-3, seed=1)
    U = np.asarray(hessian_inv_chol(jnp.asarray(H)))
    expected = np.linalg.cholesky(np.linalg.inv(H).astype(np.float64)).T
    # Upper-triangular factor of inv(H) in the U^T U convention (same as
    # GPTQ's cholesky(inv(H), upper=True)).
    assert np.allclose(U.T @ U, np.linalg.inv(H), rtol=1e-2, atol=1e-4)
    assert np.allclose(np.triu(U), U, atol=1e-6)
    assert np.allclose(np.abs(U), np.abs(expected), rtol=1e-2, atol=1e-4)


def test_blocked_matches_unblocked():
    """Blocked sweep == literal recursion for many block sizes
    (ref tests/test_obq.py:57-70)."""
    rng = np.random.RandomState(2)
    m, n = 13, 29
    W = rng.randn(m, n).astype(np.float32)
    H = random_psd(n, n, damp=1e-2, seed=3)
    Hinv = np.asarray(hessian_inv_chol(jnp.asarray(dampen(jnp.asarray(H), 0.01))))
    cb = UniformCodebook(4, -2.0, 2.0)

    oracle = reference_gptq(W, Hinv, lambda x: np.asarray(cb(jnp.asarray(x))))
    for block_size in (3, 4, 7, 8, 29, 64):
        got = np.asarray(gptq_sweep(jnp.asarray(W), jnp.asarray(Hinv), cb,
                                    block_size=block_size))
        assert np.allclose(got, oracle, atol=1e-4), f"block_size={block_size}"


def test_quantize_opt_reduces_error():
    """GPTQ <= direct rounding; ordering helps (ref tests/test_obq.py:47-54)."""
    rng = np.random.RandomState(4)
    m, n = 32, 64
    W = rng.randn(m, n).astype(np.float32)
    H = jnp.asarray(random_psd(n, 32, damp=1e-2, seed=5))
    cb = UniformCodebook(4, -1.5, 1.5)
    Wj = jnp.asarray(W)

    direct = cb(Wj)
    err_direct = float(quantization_error(Wj, direct, H))
    for order in ("none", "diag", "err", "sqerr", "combined_diag", "inv_diag", "pivot"):
        Q = quantize_opt(Wj, H, cb, act_order=order)
        err = float(quantization_error(Wj, Q, H))
        assert err <= err_direct * 1.001, f"order={order}"
    err_none = float(quantization_error(Wj, quantize_opt(Wj, H, cb, act_order="none"), H))
    err_diag = float(quantization_error(Wj, quantize_opt(Wj, H, cb, act_order="diag"), H))
    # Ordered should usually beat unordered ("we may be unlucky": tolerance)
    assert err_diag <= err_none * 1.1


def test_quantize_opt_near_singular():
    """Low-rank Hessian with dampening still solves (ref tests/test_obq.py:38)."""
    rng = np.random.RandomState(6)
    W = rng.randn(8, 100).astype(np.float32)
    H = jnp.asarray(random_psd(100, 2, damp=1e-6, seed=7))
    cb = UniformCodebook(8, -1.0, 1.0)
    Q = quantize_opt(jnp.asarray(W), H, cb, damp=0.01)
    assert np.isfinite(np.asarray(Q)).all()


def test_remove_input_bias_psd():
    """H - mu mu^T stays PSD when H accumulated consistently with mu
    (ref tests/test_obq.py:73-109)."""
    rng = np.random.RandomState(8)
    X = rng.randn(500, 16).astype(np.float32) + 0.5
    H = X.T @ X / len(X)
    mu = X.mean(axis=0)
    Hc = np.asarray(remove_input_bias(jnp.asarray(H), jnp.asarray(mu)))
    # Algebraic equivalence: H - mu mu^T == E[(x-mu)(x-mu)^T]
    Xc = X - mu
    assert np.allclose(Hc, Xc.T @ Xc / len(X), atol=1e-4)
    eigs = np.linalg.eigvalsh(Hc)
    assert eigs.min() > -1e-4


def test_remove_dead_values():
    H = np.eye(4, dtype=np.float32) * 2.0
    H[1, 1] = 0.0
    W = np.ones((3, 4), np.float32)
    H2, W2 = remove_dead_values(jnp.asarray(H), jnp.asarray(W))
    H2, W2 = np.asarray(H2), np.asarray(W2)
    assert H2[1, 1] == 1.5  # mean of [2, 0, 2, 2]
    assert (W2[:, 1] == 0).all()
    assert (W2[:, [0, 2, 3]] == 1).all()


def test_channelwise_error_formula():
    rng = np.random.RandomState(9)
    W = rng.randn(5, 8).astype(np.float32)
    Q = rng.randn(5, 8).astype(np.float32)
    H = random_psd(8, 8, seed=10)
    got = np.asarray(channelwise_error(jnp.asarray(W), jnp.asarray(Q), jnp.asarray(H)))
    E = W - Q
    expected = np.einsum("ij,ci,cj->c", H, E, E)
    assert np.allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_order_modes_are_permutations():
    rng = np.random.RandomState(11)
    W = jnp.asarray(rng.randn(6, 12).astype(np.float32))
    H = jnp.asarray(random_psd(12, 12, damp=1e-2, seed=12))
    cb = UniformCodebook(4, -1.0, 1.0)
    for mode in ("diag", "err", "sqerr", "combined_diag", "inv_diag", "pivot", "none"):
        order = np.asarray(compute_order(W, H, cb, mode))
        assert sorted(order.tolist()) == list(range(12)), mode
