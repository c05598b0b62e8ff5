"""Best-first local-search refinement of a quantized weight matrix.

Re-design of the reference local search (/root/reference/sleekit/obq.py:220-358)
as a ``lax.scan`` over moves with a dense incrementally-maintained state:

  * the reference maintains per-candidate gains with index-heavy sparse
    updates (obq.py:299-336); rows are independent, so the TPU-native form
    keeps ``P = (Q - W) @ H`` as the carried state instead - after a move
    that changes one entry per row, P updates by a per-row rank-1 gather
    ``P += d[:, None] * H[col]`` (O(m n), no GEMM, no scatter);
  * gains for all up/down candidates are then closed-form from P and
    diag(H) (the ``compute_gain`` algebra, obq.py:220-231);
  * per move each output channel applies its single best profitable flip
    (up xor down), exactly the reference ``do_move`` semantics
    (obq.py:338-346).

Equivalence with an exhaustive-gain oracle is pinned by
tests/test_local_search.py, mirroring ref tests/test_obq.py:112-140.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def compute_gain(W, Q, H, candidates):
    """Error improvement of moving Q to each single-entry candidate change.

    With D = C - Q (one nonzero per evaluation), the gain is
    -D^2 diag(H) - 2 ((Q - W) @ H) * D (ref obq.py:220-231).
    """
    delta = Q - W
    D = candidates - Q
    return -jnp.square(D) * jnp.diagonal(H)[None, :] - 2 * (delta @ H) * D


def quantize_local_search(W, Q, H, quantizer, nb_moves: int):
    """Run ``nb_moves`` rounds of per-row best-flip refinement."""
    if nb_moves == 0:
        return Q
    W = W.astype(jnp.float32)
    Q = Q.astype(jnp.float32)
    H = H.astype(jnp.float32)
    m, n = Q.shape
    diag = jnp.diagonal(H)
    rows = jnp.arange(m)

    def move(carry, _):
        Q, P = carry
        Qup = quantizer.quantize_up(Q)
        Qdn = quantizer.quantize_down(Q)
        Dup = Qup - Q
        Ddn = Qdn - Q
        gain_up = -jnp.square(Dup) * diag[None, :] - 2 * P * Dup
        gain_dn = -jnp.square(Ddn) * diag[None, :] - 2 * P * Ddn

        best_up = jnp.max(gain_up, axis=1)
        col_up = jnp.argmax(gain_up, axis=1)
        best_dn = jnp.max(gain_dn, axis=1)
        col_dn = jnp.argmax(gain_dn, axis=1)

        take_up = (best_up > best_dn) & (best_up > 0)
        take_dn = (~take_up) & (best_dn > 0)
        col = jnp.where(take_up, col_up, col_dn)
        new_val = jnp.where(
            take_up, Qup[rows, col_up],
            jnp.where(take_dn, Qdn[rows, col_dn], Q[rows, col]))
        d = new_val - Q[rows, col]  # exactly zero for rows with no move

        onehot = jax.nn.one_hot(col, n, dtype=Q.dtype)
        Q = Q + d[:, None] * onehot
        P = P + d[:, None] * H[col]
        return (Q, P), None

    P0 = jnp.dot(Q - W, H, preferred_element_type=jnp.float32)
    (Q, _), _ = lax.scan(move, (Q, P0), None, length=nb_moves)
    return Q
