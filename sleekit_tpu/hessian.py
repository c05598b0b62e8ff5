"""Streaming layer statistics and Hessian utilities.

TPU-native re-design of the reference statistics accumulation
(/root/reference/sleekit/statistics.py:76-87) and Hessian helpers
(/root/reference/sleekit/obq.py:4-55).

Design: statistics live on device as a small pytree ``LayerStats`` and are
updated by a jitted, donate-friendly ``update`` step; the O(n^2 * s) Hessian
GEMM runs on the MXU in f32. Under a sharded mesh the same update runs per
device on its batch shard and ``finalize_psum`` merges partial statistics
with a single ``psum`` over the data axis (the reference is single-process,
serial; SURVEY.md §2.3).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LayerStats:
    """Running input statistics of one linear/conv layer.

    ``mean`` is the running mean of input features, ``hessian`` the running
    mean of x x^T over sample columns, ``count`` the number of sample columns
    seen (token positions / conv patches, NOT batches - semantics pinned by
    reference tests/test_statistics.py:7-46).
    """

    mean: jnp.ndarray     # (n,) f32
    hessian: jnp.ndarray  # (n, n) f32
    count: jnp.ndarray    # () f32


def init_stats(n: int) -> LayerStats:
    return LayerStats(
        mean=jnp.zeros((n,), jnp.float32),
        hessian=jnp.zeros((n, n), jnp.float32),
        count=jnp.zeros((), jnp.float32),
    )


@jax.jit
def update_stats(stats: LayerStats, x: jnp.ndarray) -> LayerStats:
    """Fold a batch of samples into the running statistics.

    ``x`` is (samples, features). Renormalization matches the reference
    exactly: factor = count / (count + added), then mean += sum(x)/new_count
    and H += X^T X / new_count (ref statistics.py:82-87).
    """
    assert x.ndim == 2
    x = x.astype(jnp.float32)
    added = jnp.float32(x.shape[0])
    new_count = stats.count + added
    factor = stats.count / new_count
    mean = stats.mean * factor + jnp.sum(x, axis=0) / new_count
    hessian = stats.hessian * factor + jnp.dot(
        x.T, x, preferred_element_type=jnp.float32) / new_count
    return LayerStats(mean=mean, hessian=hessian, count=new_count)


def finalize_psum(stats: LayerStats, axis_name: str) -> LayerStats:
    """Merge per-device partial statistics over a data mesh axis.

    Each device accumulated over its own shard; the global statistics are the
    count-weighted average, one psum per field (SURVEY.md §2.3).
    """
    total = jax.lax.psum(stats.count, axis_name)
    w = jnp.where(total > 0, stats.count / jnp.maximum(total, 1.0), 0.0)
    mean = jax.lax.psum(stats.mean * w, axis_name)
    hessian = jax.lax.psum(stats.hessian * w, axis_name)
    return LayerStats(mean=mean, hessian=hessian, count=total)


# ---- input canonicalization (reference _prepare_input) ------------------


def prepare_input_linear(x: jnp.ndarray) -> jnp.ndarray:
    """(..., features) -> (samples, features) (ref statistics.py:41-43)."""
    return x.reshape(-1, x.shape[-1])


def prepare_input_conv2d(
    x: jnp.ndarray,
    kernel_size: Tuple[int, int],
    dilation: Tuple[int, int] = (1, 1),
    padding: Tuple[int, int] = (0, 0),
    stride: Tuple[int, int] = (1, 1),
) -> jnp.ndarray:
    """Unfold NCHW conv input into (patches, C*kh*kw) patch rows.

    TPU-native replacement for torch.nn.functional.unfold
    (ref statistics.py:44-55) built on
    ``lax.conv_general_dilated_patches``. The feature order matches the
    torch convention: channel-major, then kernel row, then kernel column -
    i.e. feature index = c*kh*kw + i*kw + j.
    """
    if x.ndim == 3:
        x = x[None]
    patches = jax.lax.conv_general_dilated_patches(
        x.astype(jnp.float32),
        filter_shape=kernel_size,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=dilation,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    # patches: (N, C*kh*kw, H_out, W_out) with feature order (c, i, j)
    n, f = patches.shape[0], patches.shape[1]
    return patches.reshape(n, f, -1).transpose(0, 2, 1).reshape(-1, f)


def prepare_input_conv1d(
    x: jnp.ndarray,
    kernel_size: int,
    dilation: int = 1,
    padding: int = 0,
    stride: int = 1,
) -> jnp.ndarray:
    """Unfold NCL conv1d input into (patches, C*k) rows (ref statistics.py:56-69)."""
    if x.ndim == 2:
        x = x[None]
    return prepare_input_conv2d(
        x[..., None], (kernel_size, 1), (dilation, 1), (padding, 0), (stride, 1)
    )


# ---- Hessian transforms (reference obq.py helpers) ----------------------


def random_psd_matrix(key, size: int, rank: int, damp: float = 0.0) -> jnp.ndarray:
    """Random Wishart PSD matrix, the universal synthetic Hessian for tests
    (ref obq.py:4-11): A A^T with optional spectral-norm-row dampening."""
    a = jax.random.normal(key, (size, rank), jnp.float32)
    h = a @ a.T
    dampval = damp * jnp.linalg.norm(h, ord=2, axis=1)
    return h + dampval * jnp.eye(size)


def remove_input_bias(H: jnp.ndarray, input_mean: jnp.ndarray) -> jnp.ndarray:
    """Fold bias correction into the Hessian: H - mu mu^T (ref obq.py:14-25).

    The error component along the input mean can be absorbed into the layer
    bias, so it is removed from the quadratic objective.
    """
    assert H.ndim == 2 and input_mean.ndim == 1
    return H - jnp.outer(input_mean, input_mean)


def remove_dead_values(
    H: jnp.ndarray, W: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Repair dead input channels: zero-diagonal entries get the mean diagonal
    and the matching weight columns are zeroed (ref obq.py:28-35).

    Functional (returns new H, W) rather than in-place.
    """
    diag = jnp.diagonal(H)
    dead = diag == 0
    mean_diag = jnp.mean(diag)
    new_diag = jnp.where(dead, mean_diag, diag)
    H = H + jnp.diag(new_diag - diag)
    W = jnp.where(dead[None, :], 0.0, W)
    return H, W


def dampen(H: jnp.ndarray, damp: float) -> jnp.ndarray:
    """Standard GPTQ dampening: H + damp * mean(diag) * I (ref obq.py:198)."""
    n = H.shape[0]
    return H + damp * jnp.mean(jnp.diagonal(H)) * jnp.eye(n, dtype=H.dtype)


def hessian_inv_chol_robust(
    H: jnp.ndarray, damp: float, max_retries: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dampened inverse-Cholesky with automatic damp escalation.

    The reference acknowledges but does not handle Cholesky failure on
    semi-definite Hessians (ref obq.py:49 TODO); per SURVEY.md §5.3 the
    build retries with 10x dampening until the factor is finite. Returns
    (Hinv, damp_multiplier_used). When the first attempt succeeds the
    result is bit-identical to the undamp-retried path.
    """

    def attempt(eff_damp):
        return hessian_inv_chol(dampen(H, eff_damp))

    def cond(state):
        eff, hinv, tries = state
        return jnp.logical_and(~jnp.all(jnp.isfinite(hinv)),
                               tries < max_retries)

    def body(state):
        eff, _, tries = state
        # Jump straight to a meaningful dampening floor, then escalate:
        # a microscopic base damp (e.g. 1e-12) would never recover a
        # rank-deficient Hessian by x10 steps alone.
        eff = jnp.maximum(eff * 10.0, jnp.float32(1e-4))
        return eff, attempt(eff), tries + 1

    base = jnp.float32(damp)
    init = (base, attempt(base), jnp.int32(0))
    eff, hinv, _ = jax.lax.while_loop(cond, body, init)
    return hinv, eff / base


def _tri_inv_lower(L: jnp.ndarray, block: int = 1024) -> jnp.ndarray:
    """L^-1 for lower-triangular L, solved in RHS column blocks.

    One ``solve_triangular`` against the full identity compiles to ~9 GB
    of XLA temps at n=8192 (measured, round-2 journal) - enough to
    RESOURCE_EXHAUST a chip that also holds a model's calibration
    Hessians. Splitting the identity into column blocks under ``lax.map``
    is exact (the solve is linear in RHS columns) and caps temps at
    ~1/nb of the monolithic solve, same total FLOPs.
    """
    n = L.shape[0]
    if n <= block:
        return jax.scipy.linalg.solve_triangular(
            L, jnp.eye(n, dtype=L.dtype), lower=True)
    # Ragged n (Llama2/Qwen FFN n=11008, ...) pads the LAST block's RHS
    # columns with zeros - exact, solve(L, 0) == 0 and the pad columns are
    # sliced off - instead of falling back to the monolithic ~9 GB solve
    # (advisor round 2).
    nb = -(-n // block)
    rows = jnp.arange(n)[:, None]

    def one(j):
        cols = j * block + jnp.arange(block)[None, :]
        rhs = (rows == cols).astype(L.dtype)
        return jax.scipy.linalg.solve_triangular(L, rhs, lower=True)

    blocks = jax.lax.map(one, jnp.arange(nb))      # (nb, n, block)
    return jnp.moveaxis(blocks, 0, 1).reshape(n, nb * block)[:, :n]


def hessian_inv_chol(H: jnp.ndarray) -> jnp.ndarray:
    """Upper Cholesky factor of H^-1 via the flip trick.

    flip(H) -> lower Cholesky L -> L^-1 -> flip back gives an upper
    triangular U with U U^T proportional structure identical to GPTQ's
    ``cholesky(inv(H), upper=True)`` (equivalence asserted by the reference,
    tests/test_obq.py:21-32; ref obq.py:38-55). The triangular inverse is a
    blocked ``solve_triangular`` against the identity (:func:`_tri_inv_lower`).
    """
    Hf = H[::-1, ::-1]
    L = jnp.linalg.cholesky(Hf)
    return _tri_inv_lower(L)[::-1, ::-1]
