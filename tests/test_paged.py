"""Paged KV cache + page-table attention kernel.

Checks the paged write/read path against the dense contiguous cache and
the jnp attention reference (the test-backend-ops pattern: candidate vs
reference backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zllm.ops.layers import attention_ref
from zllm.runtime.kvcache import KVCache, causal_mask
from zllm.runtime.paged import PageAllocator, PagedKVCache

L, B, HKV, HQ, D, PS, MAXLEN = 2, 3, 2, 4, 64, 128, 512


def _mk(seed=0):
    r = np.random.default_rng(seed)
    return PagedKVCache.create(L, B, MAXLEN, HKV, D, jnp.float32, page_size=PS), r


def test_paged_write_matches_dense():
    paged, r = _mk()
    dense = KVCache.create(L, B, MAXLEN, HKV, D, jnp.float32)
    t = 16
    for step in range(3):
        k_new = jnp.asarray(r.standard_normal((B, t, HKV, D)), jnp.float32)
        v_new = jnp.asarray(r.standard_normal((B, t, HKV, D)), jnp.float32)
        pos = jnp.asarray(
            np.stack([np.arange(step * t, (step + 1) * t)] * B), jnp.int32
        )
        for il in range(L):
            paged = paged.update(il, k_new, v_new, pos)
            dense = dense.update(il, k_new, v_new, pos)
    for il in range(L):
        pk, _ = paged.layer(il)
        gk, gv = pk.gather()
        np.testing.assert_allclose(np.asarray(gk)[:, :, : 3 * t], np.asarray(dense.k[il])[:, :, : 3 * t])
        np.testing.assert_allclose(np.asarray(gv)[:, :, : 3 * t], np.asarray(dense.v[il])[:, :, : 3 * t])


def test_trash_positions_hit_page_zero():
    paged, r = _mk(1)
    k_new = jnp.ones((B, 4, HKV, D), jnp.float32)
    pos = jnp.full((B, 4), MAXLEN, jnp.int32)  # engine trash convention
    before = np.asarray(paged.k[0][:, PS:])  # everything beyond trash page 0
    paged = paged.update(0, k_new, k_new, pos)
    np.testing.assert_array_equal(np.asarray(paged.k[0][:, PS:]), before)


@pytest.mark.parametrize("t", [1, 8])
def test_paged_attention_matches_ref(t):
    paged, r = _mk(2)
    # fill 3 pages of history for every slot
    hist = 3 * PS
    k_h = jnp.asarray(r.standard_normal((B, hist, HKV, D)), jnp.float32)
    v_h = jnp.asarray(r.standard_normal((B, hist, HKV, D)), jnp.float32)
    pos_h = jnp.broadcast_to(jnp.arange(hist, dtype=jnp.int32)[None], (B, hist))
    for il in range(L):
        paged = paged.update(il, k_h, v_h, pos_h)

    q = jnp.asarray(r.standard_normal((B, t, HQ, D)), jnp.float32)
    k_new = jnp.asarray(r.standard_normal((B, t, HKV, D)), jnp.float32)
    v_new = jnp.asarray(r.standard_normal((B, t, HKV, D)), jnp.float32)
    pos = jnp.broadcast_to(hist + jnp.arange(t, dtype=jnp.int32)[None], (B, t))
    paged = paged.update(0, k_new, v_new, pos)

    from zllm.ops.attention import paged_attention

    pk, _ = paged.layer(0)
    got = paged_attention(
        q, pk.k, pk.v, pk.table, pos, page_size=PS, scale=0.125, interpret=True
    )

    gk, gv = pk.gather()
    mask = causal_mask(pos, MAXLEN, 0)
    want = attention_ref(q, gk, gv, mask, 0.125)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_prefix_sharing_via_allocator():
    """Two slots share physical prefix pages; the sharer attends the
    sharee's K/V without any copy."""
    alloc = PageAllocator(B, MAXLEN, PS)
    alloc.assign_slot(0, None, 0)
    paged, r = _mk(3)
    paged = paged.with_table(alloc.table)

    # slot 0 writes 2 full pages of prefix
    pre = 2 * PS
    k_h = jnp.asarray(r.standard_normal((1, pre, HKV, D)), jnp.float32)
    v_h = jnp.asarray(r.standard_normal((1, pre, HKV, D)), jnp.float32)
    pos_h = jnp.arange(pre, dtype=jnp.int32)[None]
    k_b = jnp.zeros((B, pre, HKV, D), jnp.float32).at[0].set(k_h[0])
    v_b = jnp.zeros((B, pre, HKV, D), jnp.float32).at[0].set(v_h[0])
    pos_b = jnp.broadcast_to(pos_h, (B, pre))
    # rows 1..: write to trash so only slot 0's pages fill
    pos_b = pos_b.at[1:].set(MAXLEN)
    for il in range(L):
        paged = paged.update(il, k_b, v_b, pos_b)

    # slot 1 shares slot 0's 2 prefix pages
    n_share = alloc.shareable_pages(pre)
    assert n_share == 2
    alloc.assign_slot(1, 0, n_share)
    assert alloc.table[1, 0] == alloc.table[0, 0]
    assert alloc.refs[alloc.table[0, 0]] == 2
    paged = paged.with_table(alloc.table)

    pk, _ = paged.layer(0)
    gk, gv = pk.gather()
    np.testing.assert_allclose(
        np.asarray(gk)[1, :, :pre], np.asarray(gk)[0, :, :pre]
    )

    # releasing slot 1 decrefs without freeing slot 0's pages
    alloc.release_slot(1)
    assert alloc.refs[alloc.table[0, 0]] == 1
    alloc.release_slot(0)
    assert alloc.refs[int(alloc.table[0, 0])] >= 0


def test_gather_scatter_row_roundtrip():
    paged, r = _mk(4)
    length = PS + 32
    k_row = jnp.asarray(r.standard_normal((HKV, length, D)), jnp.float32)
    v_row = jnp.asarray(r.standard_normal((HKV, length, D)), jnp.float32)
    paged = paged.scatter_row(0, 1, k_row, v_row)
    gk, gv = paged.gather_row(0, 1, length)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(k_row))
    np.testing.assert_allclose(np.asarray(gv), np.asarray(v_row))
