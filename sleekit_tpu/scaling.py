"""Per-channel scaling-factor search.

Re-design of the reference scaling layer (/root/reference/sleekit/scaling.py)
as jitted grid searches:

  * closed-form scalings (norm / non-saturating max) are one-liner
    reductions (ref scaling.py:35-55);
  * the MSE grid search evaluates all grid factors with a ``lax.scan``
    carrying the running per-channel argmin - O(m) state instead of
    materializing the (grid, m, n) candidate tensor (ref scaling.py:98-134);
  * the OBQ-aware grid search hoists ordering + Cholesky once and runs the
    full blocked GPTQ sweep per factor (ref scaling.py:137-190), the
    hottest path in the whole pipeline (SURVEY.md §3.5).

Mode-string dispatch (``mse`` / ``max`` / ``norm`` / ``obq`` /
``diag[P]`` / ``hessian[P]``) matches ref scaling.py:193-238 including the
percent-suffix extra dampening.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from sleekit_tpu.hessian import dampen, hessian_inv_chol
from sleekit_tpu.solver import compute_order, gptq_sweep, quantize_opt


# ---- application (ref scaling.py:11-32) ---------------------------------


def _broadcast_scaling(data: jnp.ndarray, scale: jnp.ndarray, axis: int) -> jnp.ndarray:
    assert scale.ndim == 1
    shape = [1] * data.ndim
    shape[axis] = -1
    return scale.reshape(shape)


def apply_scaling(data: jnp.ndarray, scale: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Divide out a per-channel scale along ``axis`` (ref scaling.py:21-25)."""
    return data / _broadcast_scaling(data, scale, axis)


# ---- closed-form scalings (ref scaling.py:35-55) ------------------------


def compute_norm_scaling(data: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Scale for unit RMS per channel (ref scaling.py:35-41)."""
    other = tuple(i for i in range(data.ndim) if i != axis)
    sqnorm = jnp.mean(jnp.square(data), axis=other)
    return jnp.sqrt(jnp.maximum(sqnorm, 1e-16))


def compute_non_saturating_scaling(
    data: jnp.ndarray, codebook, axis: int = 0
) -> jnp.ndarray:
    """Smallest per-channel scale with no saturation against the codebook
    range (ref scaling.py:44-55). Requires a mixed-sign codebook."""
    mincode, maxcode = codebook.min(), codebook.max()
    try:
        if float(mincode) >= 0 or float(maxcode) <= 0:
            raise ValueError(
                "Codebook should have both negative and positive values.")
    except jax.errors.ConcretizationTypeError:
        pass  # traced codebook values (inside jit): skip the host check
    other = tuple(i for i in range(data.ndim) if i != axis)
    mindata = jnp.min(data, axis=other)
    maxdata = jnp.max(data, axis=other)
    scale = jnp.maximum(maxdata / maxcode, mindata / mincode)
    return jnp.maximum(scale, jnp.float32(1e-16))


# ---- scale-then-optimize wrapper (ref scaling.py:58-81) -----------------


def quantize_with_scaling(
    data: jnp.ndarray,
    scale: jnp.ndarray,
    quantizer,
    H: Optional[jnp.ndarray] = None,
    act_order: str = "diag",
    damp: float = 0.01,
    nb_ls_moves: int = 0,
    block_size: int = 128,
) -> jnp.ndarray:
    """Divide by scale, solve (GPTQ if H given, else round), multiply back."""
    assert data.ndim == 2 and scale.ndim == 1
    assert data.shape[0] == scale.shape[0]
    scaled = data / scale[:, None]
    if H is not None:
        q = quantize_opt(scaled, H, quantizer, act_order=act_order,
                         damp=damp, nb_ls_moves=nb_ls_moves,
                         block_size=block_size)
    else:
        q = quantizer(scaled)
    return q * scale[:, None]


# ---- grid searches (ref scaling.py:84-190) ------------------------------


def _weighted_mse(H: Optional[jnp.ndarray], E: jnp.ndarray) -> jnp.ndarray:
    """Per-channel error: plain MSE (H None), diagonal-weighted (1-D H) or
    full quadratic form (2-D H) (ref scaling.py:84-95)."""
    if H is None:
        return jnp.sum(jnp.square(E), axis=1)
    if H.ndim == 1:
        return jnp.sum(H[None, :] * jnp.square(E), axis=1)
    assert H.ndim == 2
    return jnp.sum((E @ H) * E, axis=-1)


def _move_axis_first(data: jnp.ndarray, axis: int) -> jnp.ndarray:
    other = tuple(i for i in range(data.ndim) if i != axis)
    return jnp.transpose(data, (axis, *other)).reshape(data.shape[axis], -1)


def _grid_argmin(factors, eval_factor, num_channels, return_err=False):
    """Scan the factor grid keeping the per-channel best (first win on ties,
    matching the reference's strict-< update, scaling.py:129-133)."""

    def step(carry, s):
        best_err, best_choice = carry
        err = eval_factor(s)
        better = err < best_err
        best_err = jnp.where(better, err, best_err)
        best_choice = jnp.where(better, s, best_choice)
        return (best_err, best_choice), None

    init = (jnp.full((num_channels,), jnp.inf, jnp.float32),
            jnp.full((num_channels,), jnp.inf, jnp.float32))
    (best_err, best_choice), _ = lax.scan(step, init, factors)
    if return_err:
        return best_choice, best_err
    return best_choice


def compute_min_mse_scaling(
    data: jnp.ndarray,
    codebook,
    axis: int = 0,
    H: Optional[jnp.ndarray] = None,
    min_factor: float = 0.05,
    max_factor: float = 1.0,
    grid_size: int = 100,
) -> jnp.ndarray:
    """Grid search over [min_factor, max_factor] x non-saturating scale,
    scoring round-to-nearest error per channel (ref scaling.py:98-134)."""
    flat = _move_axis_first(data, axis).astype(jnp.float32)
    initial_scale = compute_non_saturating_scaling(flat, codebook, 0)
    factors = jnp.linspace(min_factor, max_factor, grid_size, dtype=jnp.float32)

    def eval_factor(s):
        scale = s * initial_scale
        quant = codebook(flat / scale[:, None]) * scale[:, None]
        return _weighted_mse(H, quant - flat)

    best = _grid_argmin(factors, eval_factor, flat.shape[0])
    return initial_scale * best


def compute_obq_scaling(
    data: jnp.ndarray,
    codebook,
    axis: int,
    H: jnp.ndarray,
    damp: float = 0.01,
    act_order: str = "diag",
    min_factor: float = 0.05,
    max_factor: float = 1.0,
    grid_size: int = 100,
    block_size: int = 128,
    refine: int = 0,
) -> jnp.ndarray:
    """The 'exhaustive' scaling: score every grid factor by a full blocked
    GPTQ sweep (ref scaling.py:137-190). Ordering and the inverse-Hessian
    Cholesky are hoisted out of the grid loop (ref scaling.py:166-174).

    ``refine > 0`` switches to the coarse-then-fine search (SURVEY.md §7
    hard-part 2): a coarse grid of ``refine`` factors over the full range,
    then ``refine`` more PER-CHANNEL factors spanning +-1 coarse step
    around each channel's winner - 2*refine sweeps instead of grid_size.
    Per-channel vector evaluation is free because GPTQ rows are
    independent (each output channel solves at its own scale inside one
    sweep). CAVEAT: the per-factor objective is rough (discrete GPTQ
    decisions), so the coarse stage can miss the flat grid's basin -
    measured within ~5% of the flat-grid error either way at refine=16
    (tests/test_scaling.py). On TPU the flat grid is NOT the wall-clock
    bottleneck (the vmapped batched solves absorb it; transfers dominate
    - round-3 journal), so the default (0) keeps the reference-exact
    flat grid; refine is for CPU-bound experiment sweeps.
    """
    W = _move_axis_first(data, axis).astype(jnp.float32)
    initial_scale = compute_non_saturating_scaling(W, codebook, 0)

    H = H.astype(jnp.float32)
    H_opt = dampen(H, damp)
    order = compute_order(W / initial_scale[:, None], H_opt, codebook, act_order)
    Wp = W[:, order]
    Hperm = H[order][:, order]
    Hinv = hessian_inv_chol(H_opt[order][:, order])

    def eval_factor(s):
        scale = s * initial_scale
        Qs = gptq_sweep(Wp / scale[:, None], Hinv, codebook, block_size=block_size)
        Q = Qs * scale[:, None]
        return _weighted_mse(Hperm, Q - Wp)

    m = W.shape[0]
    if refine > 0:
        coarse = jnp.linspace(min_factor, max_factor, refine,
                              dtype=jnp.float32)
        center, e_center = _grid_argmin(coarse, eval_factor, m,
                                        return_err=True)   # (m,), (m,)
        step = (max_factor - min_factor) / max(refine - 1, 1)
        offsets = jnp.linspace(-step, step, refine, dtype=jnp.float32)
        fine = jnp.clip(center[None, :] + offsets[:, None],
                        min_factor, max_factor)             # (refine, m)
        best, e_best = _grid_argmin(fine, eval_factor, m, return_err=True)
        # The coarse winner need not be a member of the clipped fine
        # grid; keep whichever scores lower per channel (errors already
        # tracked by the scans - no extra sweeps).
        best = jnp.where(e_center < e_best, center, best)
        return initial_scale * best

    factors = jnp.linspace(min_factor, max_factor, grid_size, dtype=jnp.float32)
    best = _grid_argmin(factors, eval_factor, m)
    return initial_scale * best


# ---- dispatcher (ref scaling.py:193-238) --------------------------------


def compute_scaling(
    data: jnp.ndarray,
    codebook,
    H: Optional[jnp.ndarray],
    mode: str = "mse",
    axis: int = 0,
    min_factor: float = 0.05,
    max_factor: float = 1.0,
    grid_size: int = 100,
    obq_damp: float = 0.01,
    obq_act_order: str = "diag",
    block_size: int = 128,
    obq_refine: int = 0,
) -> jnp.ndarray:
    """Mode-string dispatch with the reference's suffix semantics:
    ``diag[P]`` / ``hessian[P]`` add P% extra dampening before the grid
    search (ref scaling.py:217-227)."""
    if mode == "max":
        return compute_non_saturating_scaling(data, codebook, axis)
    if mode == "norm":
        return compute_norm_scaling(data, axis)
    if mode == "obq":
        return compute_obq_scaling(
            data, codebook, axis, H=H, damp=obq_damp, act_order=obq_act_order,
            grid_size=grid_size, min_factor=min_factor, max_factor=max_factor,
            block_size=block_size, refine=obq_refine)
    if mode == "mse":
        H = None
    elif mode.startswith("hessian"):
        if len(mode) > 7:
            penalty = 0.01 * float(mode[7:])
            H = dampen(H, penalty)
    elif mode.startswith("diag"):
        H = jnp.diagonal(H)
        if len(mode) > 4:
            penalty = 0.01 * float(mode[4:])
            H = H + penalty * jnp.mean(H)
    else:
        raise ValueError(f"Unknown scaling mode {mode}")
    return compute_min_mse_scaling(
        data, codebook, axis, H=H, grid_size=grid_size,
        min_factor=min_factor, max_factor=max_factor)
