"""Paged KV attention: kernels vs oracle vs the contiguous flash path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sleekit_tpu.ops.attention import flash_decode_xla, kv_append_xla
from sleekit_tpu.ops.paged_attention import (
    paged_decode_attention,
    paged_flash_decode_pallas,
    paged_flash_decode_xla,
    paged_fused_decode_append_pallas,
    paged_kv_append_pallas,
    paged_kv_append_xla,
)


def _setup(L=2, P=12, KV=2, PS=16, D=64, B=3, G=2, seed=0, quant=False):
    rng = np.random.RandomState(seed)
    pool_k = jnp.asarray(rng.randn(L, P, KV, PS, D), jnp.float32)
    pool_v = jnp.asarray(rng.randn(L, P, KV, PS, D), jnp.float32)
    MAXP = 3
    # Distinct physical pages per row, deliberately out of order.
    pt = jnp.asarray(rng.permutation(P)[:B * MAXP].reshape(B, MAXP),
                     jnp.int32)
    kn = jnp.asarray(rng.randn(B, KV, D), jnp.float32)
    vn = jnp.asarray(rng.randn(B, KV, D), jnp.float32)
    q = jnp.asarray(rng.randn(B, KV * G, D), jnp.float32)
    pos = jnp.asarray(rng.randint(0, MAXP * PS, B), jnp.int32)
    extra = {}
    if quant:
        pool_k = jnp.zeros(pool_k.shape, jnp.int8)
        pool_v = jnp.zeros(pool_v.shape, jnp.int8)
        extra = {"k_scale": jnp.zeros((L, P, KV, PS), jnp.float32),
                 "v_scale": jnp.zeros((L, P, KV, PS), jnp.float32)}
    return pool_k, pool_v, pt, kn, vn, q, pos, extra


def test_paged_append_matches_oracle():
    pool_k, pool_v, pt, kn, vn, q, pos, _ = _setup()
    layer = jnp.int32(1)
    k1, v1 = paged_kv_append_xla(kn, vn, pool_k, pool_v, pt, pos, layer)
    k2, v2 = paged_kv_append_pallas(kn, vn, pool_k, pool_v, pt, pos, layer,
                                    interpret=True)
    assert np.array_equal(np.asarray(k1), np.asarray(k2))
    assert np.array_equal(np.asarray(v1), np.asarray(v2))
    # Pages not referenced at pos are untouched.
    touched = set()
    PS = pool_k.shape[3]
    for b, p in enumerate(np.asarray(pos)):
        touched.add((1, int(np.asarray(pt)[b, p // PS])))
    for li in range(pool_k.shape[0]):
        for pg in range(pool_k.shape[1]):
            if (li, pg) not in touched:
                assert np.array_equal(np.asarray(pool_k)[li, pg],
                                      np.asarray(k1)[li, pg])


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("alibi", [False, True])
def test_paged_flash_matches_oracle(quant, alibi):
    pool_k, pool_v, pt, kn, vn, q, pos, extra = _setup(quant=quant)
    layer = jnp.int32(0)
    if quant:
        pool_k, pool_v, ks, vs = paged_kv_append_xla(
            kn, vn, pool_k, pool_v, pt, pos, layer, **extra)
        extra = {"k_scale": ks, "v_scale": vs}
    H = q.shape[1]
    slopes = jnp.linspace(0.05, 0.7, H) if alibi else None
    scale = 1.0 / np.sqrt(pool_k.shape[-1])
    o1 = paged_flash_decode_xla(q, pool_k, pool_v, pt, pos, layer, scale,
                                alibi_slopes=slopes, **extra)
    o2 = paged_flash_decode_pallas(q, pool_k, pool_v, pt, pos, layer, scale,
                                   alibi_slopes=slopes, interpret=True,
                                   **extra)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("alibi", [False, True])
def test_paged_fused_matches_oracle(quant, alibi):
    """Fused append+flash over the page pool == XLA append -> XLA flash
    on the output AND on every pool/scale plane (pages out of order)."""
    pool_k, pool_v, pt, kn, vn, q, pos, extra = _setup(quant=quant, seed=3)
    layer = jnp.int32(1)
    if quant:
        rng = np.random.RandomState(7)
        pool_k = jnp.asarray(rng.randint(-127, 128, pool_k.shape), jnp.int8)
        pool_v = jnp.asarray(rng.randint(-127, 128, pool_v.shape), jnp.int8)
        extra = {
            "k_scale": jnp.asarray(
                0.01 + rng.rand(*pool_k.shape[:-1]).astype(np.float32)),
            "v_scale": jnp.asarray(
                0.01 + rng.rand(*pool_v.shape[:-1]).astype(np.float32))}
    H = q.shape[1]
    slopes = jnp.linspace(0.05, 0.7, H) if alibi else None
    scale = 1.0 / np.sqrt(pool_k.shape[-1])

    ref_pool = paged_kv_append_xla(kn, vn, pool_k, pool_v, pt, pos, layer,
                                   **extra)
    ref_extra = ({"k_scale": ref_pool[2], "v_scale": ref_pool[3]}
                 if quant else {})
    o_ref = paged_flash_decode_xla(q, ref_pool[0], ref_pool[1], pt, pos,
                                   layer, scale, alibi_slopes=slopes,
                                   **ref_extra)
    res = paged_fused_decode_append_pallas(
        q, kn, vn, pool_k, pool_v, pt, pos, layer, scale,
        alibi_slopes=slopes, interpret=True, **extra)
    # int8 pools produce O(100) outputs: rtol-dominated comparison.
    np.testing.assert_allclose(np.asarray(res[0]), np.asarray(o_ref),
                               rtol=5e-5, atol=1e-4)
    for got, want in zip(res[1:], ref_pool):
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("quant", [False, True])
def test_paged_fused_edge_positions(quant):
    """pos = 0 (pool stream fully masked), page boundaries, and the last
    slot of the last page all round-trip through the fused kernel."""
    pool_k, pool_v, pt, kn, vn, q, _, extra = _setup(quant=quant, seed=11)
    PS = pool_k.shape[3]
    MAXP = pt.shape[1]
    layer = jnp.int32(0)
    if quant:
        rng = np.random.RandomState(13)
        extra = {
            "k_scale": jnp.asarray(
                0.01 + rng.rand(*pool_k.shape[:-1]).astype(np.float32)),
            "v_scale": jnp.asarray(
                0.01 + rng.rand(*pool_v.shape[:-1]).astype(np.float32))}
    scale = 1.0 / np.sqrt(pool_k.shape[-1])
    pos = jnp.asarray([0, PS - 1, MAXP * PS - 1], jnp.int32)

    ref_pool = paged_kv_append_xla(kn, vn, pool_k, pool_v, pt, pos, layer,
                                   **extra)
    ref_extra = ({"k_scale": ref_pool[2], "v_scale": ref_pool[3]}
                 if quant else {})
    o_ref = paged_flash_decode_xla(q, ref_pool[0], ref_pool[1], pt, pos,
                                   layer, scale, **ref_extra)
    res = paged_fused_decode_append_pallas(
        q, kn, vn, pool_k, pool_v, pt, pos, layer, scale,
        interpret=True, **extra)
    np.testing.assert_allclose(np.asarray(res[0]), np.asarray(o_ref),
                               rtol=5e-5, atol=1e-4)
    for got, want in zip(res[1:], ref_pool):
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=1e-6, atol=1e-6)


def test_paged_fused_scalar_pos_and_dispatch():
    """Scalar (uniform) pos broadcasts; paged_decode_attention routes to
    the fused kernel when FLASH_FUSED_APPEND is on and matches the
    two-kernel pair."""
    import sleekit_tpu.ops.attention as at

    pool_k, pool_v, pt, kn, vn, q, _, _ = _setup(seed=21)
    layer = jnp.int32(1)
    pos = jnp.int32(19)
    scale = 1.0 / np.sqrt(pool_k.shape[-1])
    res = paged_fused_decode_append_pallas(
        q, kn, vn, pool_k, pool_v, pt, pos, layer, scale, interpret=True)
    ref_pool = paged_kv_append_xla(kn, vn, pool_k, pool_v, pt, pos, layer)
    o_ref = paged_flash_decode_xla(q, *ref_pool, pt, pos, layer, scale)
    np.testing.assert_allclose(np.asarray(res[0]), np.asarray(o_ref),
                               rtol=1e-5, atol=1e-5)

    assert at.FLASH_FUSED_APPEND  # default on: dispatcher takes the fused path
    res_d = paged_decode_attention(q, kn, vn, pool_k, pool_v, pt, pos,
                                   layer, interpret=True)
    for got, want in zip(res_d, res):
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=1e-6, atol=1e-6)


def test_paged_equals_contiguous():
    """Identity page table == the contiguous flash-decode semantics."""
    L, KV, PS, D, B, G, MAXP = 2, 2, 16, 64, 3, 1, 4
    rng = np.random.RandomState(0)
    S = MAXP * PS
    ck = jnp.asarray(rng.randn(L, B, KV, S, D), jnp.float32)
    q = jnp.asarray(rng.randn(B, KV * G, D), jnp.float32)
    kn = jnp.asarray(rng.randn(B, KV, D), jnp.float32)
    vn = jnp.asarray(rng.randn(B, KV, D), jnp.float32)
    pos = jnp.asarray([5, 30, 63], jnp.int32)
    layer = jnp.int32(1)
    cv = jnp.asarray(rng.randn(L, B, KV, S, D), jnp.float32)

    # Pool layout: page (b * MAXP + j) holds row b's logical page j.
    pool_k = (ck.reshape(L, B, KV, MAXP, PS, D).transpose(0, 1, 3, 2, 4, 5)
              .reshape(L, B * MAXP, KV, PS, D))
    pool_v = (cv.reshape(L, B, KV, MAXP, PS, D).transpose(0, 1, 3, 2, 4, 5)
              .reshape(L, B * MAXP, KV, PS, D))
    pt = jnp.arange(B * MAXP, dtype=jnp.int32).reshape(B, MAXP)

    ref_k, ref_v = kv_append_xla(kn, vn, ck, cv, pos, layer)
    scale = 1.0 / np.sqrt(D)
    o_ref = flash_decode_xla(q, ref_k, ref_v, pos, layer, scale)

    res = paged_decode_attention(q, kn, vn, pool_k, pool_v, pt, pos, layer,
                                 use_pallas=False)
    np.testing.assert_allclose(np.asarray(res[0]), np.asarray(o_ref),
                               rtol=1e-5, atol=1e-5)
    res_p = paged_decode_attention(q, kn, vn, pool_k, pool_v, pt, pos,
                                   layer, use_pallas=False, interpret=True)
    np.testing.assert_allclose(np.asarray(res_p[0]), np.asarray(o_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("pf", [2, 4])
def test_paged_fused_page_fold_matches_unfolded(quant, pf):
    """page_fold > 1 (several logical pages per program, each with its
    own table-dereferencing BlockSpec) is numerically identical to one
    page per program on output and every pool plane."""
    L, P, KV, PS, D, B, G, MAXP = 2, 16, 2, 16, 64, 3, 2, 4
    rng = np.random.RandomState(31)
    if quant:
        pool_k = jnp.asarray(rng.randint(-127, 128, (L, P, KV, PS, D)),
                             jnp.int8)
        pool_v = jnp.asarray(rng.randint(-127, 128, (L, P, KV, PS, D)),
                             jnp.int8)
        extra = {"k_scale": jnp.asarray(
                     0.01 + rng.rand(L, P, KV, PS).astype(np.float32)),
                 "v_scale": jnp.asarray(
                     0.01 + rng.rand(L, P, KV, PS).astype(np.float32))}
    else:
        pool_k = jnp.asarray(rng.randn(L, P, KV, PS, D), jnp.float32)
        pool_v = jnp.asarray(rng.randn(L, P, KV, PS, D), jnp.float32)
        extra = {}
    pt = jnp.asarray(1 + rng.permutation(12).reshape(B, MAXP), jnp.int32)
    kn = jnp.asarray(rng.randn(B, KV, D), jnp.float32)
    vn = jnp.asarray(rng.randn(B, KV, D), jnp.float32)
    q = jnp.asarray(rng.randn(B, KV * G, D), jnp.float32)
    pos = jnp.asarray([0, PS + 3, MAXP * PS - 1], jnp.int32)
    layer = jnp.int32(1)
    scale = 1.0 / np.sqrt(D)

    base = paged_fused_decode_append_pallas(
        q, kn, vn, pool_k, pool_v, pt, pos, layer, scale,
        page_fold=1, interpret=True, **extra)
    got = paged_fused_decode_append_pallas(
        q, kn, vn, pool_k, pool_v, pt, pos, layer, scale,
        page_fold=pf, interpret=True, **extra)
    for a, b in zip(base, got):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-6, atol=1e-6)
