"""Codebooks: the finite sets of representable weight values.

JAX-native re-design of the reference codebook layer
(/root/reference/sleekit/codebook.py:4-367). Both codebook kinds are
registered pytrees so they can be passed straight through ``jax.jit`` /
``vmap`` boundaries and into Pallas kernels; all quantization ops are pure
functions of jnp arrays with static shapes.

Semantics contract (validated by tests/test_codebooks.py against the
reference formulas):
  * ``UniformCodebook`` - evenly spaced values over [min_val, max_val] with
    closed-form round/clip quantization (ref codebook.py:4-96).
  * ``Codebook`` - arbitrary sorted values + bin thresholds, quantization by
    threshold search (ref np.digitize, codebook.py:151-160); includes the
    NF4 table (ref codebook.py:296-320), entropy/MSE metrics and Lloyd-Max
    training (ref codebook.py:338-367).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _index_dtype(codebook_size: int):
    """Smallest unsigned integer dtype able to index the codebook.

    Mirrors the uint8/uint16/uint32 choice of ref codebook.py:43-54.
    """
    if codebook_size <= 2**8:
        return jnp.uint8
    if codebook_size <= 2**16:
        return jnp.uint16
    return jnp.uint32


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class UniformCodebook:
    """Evenly spaced codebook over ``[min_val, max_val]``.

    The fast common case: quantization is a closed-form affine round/clip,
    no table lookup (ref codebook.py:4-96). ``codebook_size`` is static
    metadata; ``min_val``/``max_val`` are static floats so that scale/zero
    fold into compiled constants.
    """

    codebook_size: int = dataclasses.field(metadata=dict(static=True))
    min_val: float = dataclasses.field(metadata=dict(static=True))
    max_val: float = dataclasses.field(metadata=dict(static=True))

    def __post_init__(self):
        assert self.codebook_size >= 2
        assert self.min_val < self.max_val

    def __len__(self) -> int:
        return self.codebook_size

    @property
    def values(self) -> jnp.ndarray:
        # Same affine grid as quantize_value (idx * scale + zero) so table
        # and closed-form quantization agree bit-for-bit.
        idx = jnp.arange(self.codebook_size, dtype=jnp.float32)
        return idx * self.scale + self.zero

    def min(self) -> float:
        return self.min_val

    def max(self) -> float:
        return self.max_val

    @property
    def scale(self) -> float:
        return (self.max_val - self.min_val) / (self.codebook_size - 1)

    @property
    def zero(self) -> float:
        return self.min_val

    def _to_grid(self, data: jnp.ndarray) -> jnp.ndarray:
        return (data - self.zero) / self.scale

    def quantize_index(self, data: jnp.ndarray) -> jnp.ndarray:
        """Nearest codebook index, packed to the smallest uint dtype."""
        idx = jnp.clip(jnp.round(self._to_grid(data)), 0, self.codebook_size - 1)
        return idx.astype(_index_dtype(self.codebook_size))

    def quantize_value(self, data: jnp.ndarray) -> jnp.ndarray:
        """Nearest codebook value (round-to-nearest on the affine grid)."""
        idx = jnp.clip(jnp.round(self._to_grid(data)), 0, self.codebook_size - 1)
        return idx * self.scale + self.zero

    def quantize_up(self, data: jnp.ndarray) -> jnp.ndarray:
        """Next codebook value above, saturating at the top (ref codebook.py:66-76)."""
        idx = jnp.clip(jnp.round(self._to_grid(data) + 1.0), 1, self.codebook_size - 1)
        return idx * self.scale + self.zero

    def quantize_down(self, data: jnp.ndarray) -> jnp.ndarray:
        """Next codebook value below, saturating at the bottom (ref codebook.py:78-88)."""
        idx = jnp.clip(jnp.round(self._to_grid(data) - 1.0), 0, self.codebook_size - 2)
        return idx * self.scale + self.zero

    def __call__(self, data: jnp.ndarray) -> jnp.ndarray:
        return self.quantize_value(data)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Codebook:
    """Arbitrary scalar codebook: sorted values + bin thresholds.

    Quantization maps a scalar to the bin its value falls in
    (``searchsorted`` over thresholds - equivalent to the reference's
    ``np.digitize``, codebook.py:151-160). ``values`` has static length k,
    ``thresholds`` length k-1, so everything jits with static shapes.
    """

    values: jnp.ndarray     # (k,) float32, strictly increasing
    thresholds: jnp.ndarray  # (k-1,) float32, increasing, within value range

    @staticmethod
    def create(values: Sequence[float] | np.ndarray,
               limits: Optional[Sequence[float] | np.ndarray] = None) -> "Codebook":
        """Host-side constructor: sorts values, defaults thresholds to midpoints."""
        vals = np.asarray(values, dtype=np.float32)
        if limits is not None:
            thr = np.asarray(limits, dtype=np.float32)
        else:
            vals = np.sort(vals)
            thr = (vals[:-1] + vals[1:]) / 2
        cb = Codebook(jnp.asarray(vals), jnp.asarray(thr))
        cb.check()
        return cb

    def check(self):
        """Consistency check (host-side; ref codebook.py:119-132)."""
        vals = np.asarray(self.values)
        thr = np.asarray(self.thresholds)
        assert vals.ndim == 1 and vals.size > 0
        assert np.isfinite(vals).all()
        assert (vals[1:] > vals[:-1]).all()
        assert thr.ndim == 1 and thr.size == vals.size - 1
        assert np.isfinite(thr).all()
        if thr.size:
            assert (thr[1:] > thr[:-1]).all()
            assert (thr >= vals[:-1]).all()
            assert (thr <= vals[1:]).all()

    def clone(self) -> "Codebook":
        return Codebook(self.values, self.thresholds)

    def __len__(self) -> int:
        return self.values.shape[0]

    def min(self) -> jnp.ndarray:
        return self.values[0]

    def max(self) -> jnp.ndarray:
        return self.values[-1]

    def quantize_index(self, data: jnp.ndarray) -> jnp.ndarray:
        """Bin index: count of thresholds <= x (== np.digitize(x, thr))."""
        idx = jnp.searchsorted(self.thresholds, data, side="right")
        return idx.astype(_index_dtype(len(self)))

    def quantize_value(self, data: jnp.ndarray) -> jnp.ndarray:
        return jnp.take(self.values, self.quantize_index(data).astype(jnp.int32))

    def quantize_up(self, data: jnp.ndarray) -> jnp.ndarray:
        """Value one step above the containing bin, saturating (ref codebook.py:162-168)."""
        idx = self.quantize_index(data).astype(jnp.int32)
        up_vals = jnp.concatenate([self.values[1:], self.values[-1:]])
        return jnp.take(up_vals, idx)

    def quantize_down(self, data: jnp.ndarray) -> jnp.ndarray:
        """Value one step below the containing bin, saturating (ref codebook.py:170-176)."""
        idx = self.quantize_index(data).astype(jnp.int32)
        down_vals = jnp.concatenate([self.values[:1], self.values[:-1]])
        return jnp.take(down_vals, idx)

    def __call__(self, data: jnp.ndarray) -> jnp.ndarray:
        return self.quantize_value(data)

    # ---- metrics -----------------------------------------------------

    def probabilities(self, data: jnp.ndarray) -> jnp.ndarray:
        """Empirical codeword probabilities over flattened data (ref codebook.py:184-189)."""
        flat = data.reshape(-1)
        idx = self.quantize_index(flat).astype(jnp.int32)
        counts = jnp.zeros((len(self),), jnp.float32).at[idx].add(1.0)
        return counts / flat.shape[0]

    def entropy(self, data: jnp.ndarray) -> jnp.ndarray:
        """Empirical entropy in bits (ref codebook.py:191-197)."""
        p = self.probabilities(data)
        return -jnp.sum(jnp.where(p > 0, p * jnp.log2(jnp.where(p > 0, p, 1.0)), 0.0))

    def mse(self, data: jnp.ndarray) -> jnp.ndarray:
        q = self.quantize_value(data)
        return jnp.mean(jnp.square(data - q))

    def centroids(self, data: jnp.ndarray) -> jnp.ndarray:
        """Per-bin data centroid, with the reference's empty-bin fallbacks
        (first/last bins nudge past the boundary threshold, interior bins take
        the threshold midpoint; ref codebook.py:212-231)."""
        flat = data.reshape(-1)
        idx = self.quantize_index(flat).astype(jnp.int32)
        k = len(self)
        sums = jnp.zeros((k,), jnp.float32).at[idx].add(flat)
        counts = jnp.zeros((k,), jnp.float32).at[idx].add(1.0)
        thr = self.thresholds
        if k > 2:
            interior = (thr[:-1] + thr[1:]) / 2
            fallback = jnp.concatenate(
                [thr[:1] - 1e-6, interior, thr[-1:] + 1e-6])
        else:
            fallback = jnp.concatenate([thr[:1] - 1e-6, thr[-1:] + 1e-6])
        return jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), fallback)

    # ---- training (host-driven, offline) -----------------------------

    def remove_unused(self, data) -> "Codebook":
        """Drop codewords with zero mass; keeps old thresholds for surviving
        boundaries (ref codebook.py:233-246). Host-side: output shape is
        data-dependent."""
        counts = np.asarray(self.probabilities(data))
        vals = np.asarray(self.values)
        thr = np.asarray(self.thresholds)
        if (counts == 0).any():
            new_vals = vals[counts != 0]
            new_thr = thr[counts[:-1] != 0]
            if counts[-1] == 0:
                new_thr = new_thr[:-1]
            return Codebook.create(new_vals, new_thr)
        return self

    def improve(self, data, lagrange_mult: float = 0.0) -> "Codebook":
        """One Lloyd-Max round: thresholds to (penalized) midpoints, values to
        centroids (ref codebook.py:248-267)."""
        cb = self
        if lagrange_mult != 0.0:
            cb = cb.remove_unused(data)
            v = cb.values
            logp = -jnp.log2(cb.probabilities(data))
            penalty = (logp[1:] - logp[:-1]) / (v[1:] - v[:-1])
            thr = (v[:-1] + v[1:]) / 2 + lagrange_mult * penalty / 2
            # The penalty may destroy monotonicity; restore it by sorting
            # (reference workaround, codebook.py:259-260).
            thr = jnp.sort(thr)
        else:
            v = cb.values
            thr = (v[:-1] + v[1:]) / 2
        mid = Codebook(cb.values, thr)
        new_vals = mid.centroids(data)
        out = Codebook.create(np.asarray(new_vals), np.asarray(thr))
        return out

    def close_to(self, other: "Codebook", tol: float = 1e-6) -> bool:
        if len(self) != len(other):
            return False
        rng = max(float(jnp.max(self.values) - jnp.min(self.values)), 1e-10)
        return bool(jnp.allclose(self.values, other.values, atol=tol * rng))

    # ---- constructors ------------------------------------------------

    @staticmethod
    def uniform(codebook_size: int, min_val: float, max_val: float) -> "Codebook":
        assert min_val <= max_val
        return Codebook.create(np.linspace(min_val, max_val, codebook_size))

    @staticmethod
    def random(data, codebook_size: int, seed: int = 0) -> "Codebook":
        """Codebook from distinct random data samples (ref codebook.py:278-286)."""
        values = np.unique(np.asarray(data).reshape(-1))
        rng = np.random.default_rng(seed)
        pick = rng.choice(values, min(codebook_size, values.size), replace=False)
        return Codebook.create(pick)

    @staticmethod
    def nf4() -> "Codebook":
        """NormalFloat4 table (same 16 constants as ref codebook.py:296-320)."""
        return Codebook.create(_NF4_VALUES)

    @staticmethod
    def equiprobable(data, codebook_size: int) -> "Codebook":
        """Equal-mass bins from sorted data, values reset to centroids
        (ref codebook.py:322-335)."""
        flat = np.sort(np.asarray(data, dtype=np.float32).reshape(-1))
        parts = [p for p in np.array_split(flat, codebook_size) if len(p) > 0]
        limits = [(parts[i][-1] + parts[i + 1][0]) / 2 for i in range(len(parts) - 1)]
        values = [p.mean() for p in parts]
        cb = Codebook.create(values, limits)
        return Codebook.create(np.asarray(cb.centroids(flat)), limits)


# NormalFloat4 constants (public QLoRA datatype).
_NF4_VALUES = [
    -1.0,
    -0.6961928009986877,
    -0.5250730514526367,
    -0.39491748809814453,
    -0.28444138169288635,
    -0.18477343022823334,
    -0.09105003625154495,
    0.0,
    0.07958029955625534,
    0.16093020141124725,
    0.24611230194568634,
    0.33791524171829224,
    0.44070982933044434,
    0.5626170039176941,
    0.7229568362236023,
    1.0,
]


def lloyd_max(
    data,
    codebook_size: int,
    lagrange_mult: float = 0.0,
    max_iter: int = 100,
    tol: float = 1e-6,
    random_init: bool = False,
    sample_count: Optional[int] = None,
    seed: int = 0,
) -> Codebook:
    """Scalar Lloyd-Max / LBG codebook training (ref codebook.py:338-367).

    Offline, host-driven loop (codebook training happens once per tensor or
    model, not in the serving hot path); the per-iteration bin statistics run
    as jitted segment-sums on device.
    """
    flat = np.asarray(data, dtype=np.float32).reshape(-1)
    if sample_count is not None:
        nsamples = codebook_size * sample_count
        if nsamples < len(flat):
            rng = np.random.default_rng(seed)
            flat = rng.choice(flat, nsamples, replace=False)
    flat = np.sort(flat)
    dev_data = jnp.asarray(flat)
    if random_init:
        codebook = Codebook.random(flat, codebook_size, seed=seed)
    else:
        codebook = Codebook.equiprobable(flat, codebook_size)
    for _ in range(max_iter):
        new_codebook = codebook.improve(dev_data, lagrange_mult)
        if new_codebook.close_to(codebook, tol):
            break
        codebook = new_codebook
    return codebook
