"""Paged KV cache with per-sequence page tables.

The TPU-native counterpart of the reference's cell-based unified KV cache
(reference: src/llama-kv-cache.{h,cpp} — find_slot free-run scan,
per-cell seq metadata, apply_ubatch) crossed with vLLM-style paging:

  * one physical page pool per layer, [Hkv, D, P * page_size] (tokens on
    the MINOR axis — for head_dim < 128 a token-major pool would be
    lane-padded to 128 in HBM, doubling pool bytes and making page-granular
    DMA slices illegal; token-minor is the layout XLA picks for caches
    anyway), shared by every slot — no per-slot max_len stripe
  * a per-slot page table [n_slots, LP + 1] int32 maps logical page ->
    physical page; the last logical column is pinned to the reserved
    trash page 0, absorbing the engine's inactive-row writes (positions
    >= horizon land there)
  * prefix sharing: full pages of one slot's prompt can be mapped
    read-only into another slot's table (pages are immutable once every
    slot position inside them is written), so a shared prefix is never
    prefetched twice — the paged form of the reference server's prompt
    cache (tools/server/server-context.cpp:105-121)

Writes are one token-granular scatter per layer (positions may be
arbitrary per column — the trash convention needs no special casing);
reads go through the page-table-indexed blockwise attention kernel
(ops.attention.paged_attention) on TPU or a gather fallback on CPU.

Allocation policy lives host-side in PageAllocator (refcounts, free
list) — the analogue of the reference's find_slot, simplified because
physical pages are interchangeable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class PagedKV(NamedTuple):
    """One layer's attention view: page pools + this step's page table.
    ops.attention dispatches on this type like QuantKV."""

    k: jax.Array  # [Hkv, D, P * ps]
    v: jax.Array
    table: jax.Array  # int32 [B, LP + 1]
    page_size: int

    @property
    def shape(self):
        # advertised as [B, Hkv, S, D] like a dense cache view
        b = self.table.shape[0]
        s = (self.table.shape[1] - 1) * self.page_size
        return (b, self.k.shape[0], s, self.k.shape[1])

    def gather(self, dtype=None):
        """Materialize contiguous [B, Hkv, S, D] K/V (CPU fallback and
        state save path)."""
        b, h, s, d = self.shape
        ps = self.page_size
        lp = s // ps
        # physical token index of each (slot, logical position)
        off = jnp.arange(s, dtype=jnp.int32)
        phys = self.table[:, :lp]  # [B, LP]
        idx = phys[:, off // ps] * ps + (off % ps)[None, :]  # [B, S]
        k = jnp.take(self.k, idx.reshape(-1), axis=2).reshape(h, d, b, s).transpose(2, 0, 3, 1)
        v = jnp.take(self.v, idx.reshape(-1), axis=2).reshape(h, d, b, s).transpose(2, 0, 3, 1)
        if dtype is not None:
            k, v = k.astype(dtype), v.astype(dtype)
        return k, v


@jax.tree_util.register_pytree_node_class
@dataclass
class PagedKVCache:
    k: tuple  # L x [Hkv, D, P * ps]
    v: tuple
    table: jax.Array  # int32 [n_slots, LP + 1]; last col = trash page 0
    page_size: int
    horizon: int  # attendable positions per slot (LP * ps)

    def tree_flatten(self):
        return (*self.k, *self.v, self.table), (len(self.k), self.page_size, self.horizon)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        n, ps, hz = aux
        return cls(
            k=tuple(leaves[:n]), v=tuple(leaves[n : 2 * n]),
            table=leaves[2 * n], page_size=ps, horizon=hz,
        )

    @classmethod
    def create(cls, n_layers: int, n_slots: int, max_len: int, n_kv_heads: int,
               head_dim: int, dtype=jnp.bfloat16, page_size: int = 128,
               n_pages: int | None = None):
        assert max_len % page_size == 0, (max_len, page_size)
        lp = max_len // page_size
        p = n_pages if n_pages is not None else n_slots * lp + 1  # +1 trash
        pool = lambda: jnp.zeros((n_kv_heads, head_dim, p * page_size), dtype)
        # identity-ish initial table: slot b owns pages [1 + b*lp, 1 + (b+1)*lp)
        tbl = np.zeros((n_slots, lp + 1), np.int32)
        for b in range(n_slots):
            tbl[b, :lp] = 1 + b * lp + np.arange(lp)
        return cls(
            k=tuple(pool() for _ in range(n_layers)),
            v=tuple(pool() for _ in range(n_layers)),
            table=jnp.asarray(tbl),
            page_size=page_size,
            horizon=max_len,
        )

    @property
    def n_layers(self) -> int:
        return len(self.k)

    @property
    def batch(self) -> int:
        return self.table.shape[0]

    @property
    def max_len(self) -> int:
        return self.horizon

    def with_table(self, table) -> "PagedKVCache":
        return PagedKVCache(self.k, self.v, jnp.asarray(table), self.page_size, self.horizon)

    def update(self, il: int, k_new: jax.Array, v_new: jax.Array, positions: jax.Array) -> "PagedKVCache":
        """Write k/v [B, T, H, D] at per-token `positions` [B, T] (any
        values; positions >= horizon route to the trash page via the
        pinned last table column).  One scatter of B*T token vectors per
        pool — tiny next to the pools, and XLA aliases it in-place under
        donation."""
        ps = self.page_size
        lp_max = self.table.shape[1] - 1
        lp = jnp.minimum(positions // ps, lp_max)  # [B, T]
        off = positions % ps
        phys = jnp.take_along_axis(self.table, lp, axis=1)  # [B, T]
        idx = (phys * ps + off).reshape(-1)  # [B*T]; trash rows hit page 0

        b, t, h, d = k_new.shape
        kt = k_new.transpose(2, 3, 0, 1).reshape(h, d, b * t).astype(self.k[il].dtype)
        vt = v_new.transpose(2, 3, 0, 1).reshape(h, d, b * t).astype(self.v[il].dtype)
        k = list(self.k)
        v = list(self.v)
        k[il] = self.k[il].at[:, :, idx].set(kt, mode="drop")
        v[il] = self.v[il].at[:, :, idx].set(vt, mode="drop")
        return PagedKVCache(tuple(k), tuple(v), self.table, ps, self.horizon)

    def copy_pages(self, copies: list[tuple[int, int]]) -> "PagedKVCache":
        """Copy page contents src->dst in every layer's pools (the device
        half of PageAllocator.unshare_slot)."""
        if not copies:
            return self
        ps = self.page_size
        src = np.concatenate([np.arange(o * ps, (o + 1) * ps) for o, _ in copies])
        dst = np.concatenate([np.arange(n * ps, (n + 1) * ps) for _, n in copies])
        src, dst = jnp.asarray(src), jnp.asarray(dst)
        k = tuple(p.at[:, :, dst].set(p[:, :, src]) for p in self.k)
        v = tuple(p.at[:, :, dst].set(p[:, :, src]) for p in self.v)
        return PagedKVCache(k, v, self.table, ps, self.horizon)

    def replace_layer(self, il: int, k, v) -> "PagedKVCache":
        """Swap one layer's pools (the fused decode kernel returns the
        in-place-updated, donated pool buffers)."""
        ks, vs = list(self.k), list(self.v)
        ks[il], vs[il] = k, v
        return PagedKVCache(tuple(ks), tuple(vs), self.table, self.page_size, self.horizon)

    def layer(self, il: int) -> tuple[PagedKV, PagedKV]:
        kv_k = PagedKV(self.k[il], self.v[il], self.table, self.page_size)
        return kv_k, kv_k  # attention reads both pools from the one view

    def gather_row(self, il: int, row: int, length: int):
        """Contiguous [Hkv, length, D] K/V of one slot (state save)."""
        ps = self.page_size
        off = jnp.arange(length, dtype=jnp.int32)
        idx = self.table[row, off // ps] * ps + (off % ps)
        return (jnp.take(self.k[il], idx, axis=2).transpose(0, 2, 1),
                jnp.take(self.v[il], idx, axis=2).transpose(0, 2, 1))

    def scatter_row(self, il: int, row: int, k_row, v_row) -> "PagedKVCache":
        """Inverse of gather_row (state restore): write [Hkv, L, D] into
        the slot's pages."""
        ps = self.page_size
        length = k_row.shape[1]
        off = jnp.arange(length, dtype=jnp.int32)
        idx = self.table[row, off // ps] * ps + (off % ps)
        k = list(self.k)
        v = list(self.v)
        k[il] = self.k[il].at[:, :, idx].set(k_row.transpose(0, 2, 1).astype(self.k[il].dtype))
        v[il] = self.v[il].at[:, :, idx].set(v_row.transpose(0, 2, 1).astype(self.v[il].dtype))
        return PagedKVCache(tuple(k), tuple(v), self.table, ps, self.horizon)


class PageAllocator:
    """Host-side physical-page bookkeeping: refcounts + free list +
    full-page prefix index for cross-slot sharing (the policy layer the
    reference implements in llama_kv_cache::find_slot)."""

    def __init__(self, n_slots: int, max_len: int, page_size: int):
        assert max_len % page_size == 0
        self.ps = page_size
        self.lp = max_len // page_size
        self.n_pages = n_slots * self.lp + 1
        self.refs = np.zeros(self.n_pages, np.int32)
        self.refs[0] = 2**30  # trash page: never freed
        self.free: list[int] = list(range(self.n_pages - 1, 0, -1))  # pop() -> low ids first
        self.table = np.zeros((n_slots, self.lp + 1), np.int32)  # logical -> phys
        self.owned = [0] * n_slots  # logical pages mapped per slot

    def _alloc(self) -> int:
        pid = self.free.pop()
        self.refs[pid] = 1
        return pid

    def release_slot(self, slot: int):
        for j in range(self.owned[slot]):
            pid = int(self.table[slot, j])
            self.refs[pid] -= 1
            if self.refs[pid] == 0:
                self.free.append(pid)
        self.table[slot, : self.lp] = 0
        self.owned[slot] = 0

    def assign_slot(self, slot: int, shared_from: int | None, n_shared_pages: int):
        """Map a fresh table row for `slot`: the first `n_shared_pages`
        logical pages alias `shared_from`'s physical pages (incref), the
        rest get fresh pages."""
        self.release_slot(slot)
        for j in range(n_shared_pages):
            pid = int(self.table[shared_from, j])
            self.refs[pid] += 1
            self.table[slot, j] = pid
        for j in range(n_shared_pages, self.lp):
            self.table[slot, j] = self._alloc()
        self.owned[slot] = self.lp

    def shareable_pages(self, prefix_tokens: int) -> int:
        """How many FULL pages a common prefix of `prefix_tokens` covers."""
        return prefix_tokens // self.ps

    def exclusively_owned(self, slot: int) -> bool:
        """True when none of the slot's pages are shared — the context
        shift rewrites page contents in place, which is only legal on
        refcount-1 pages."""
        return all(
            int(self.refs[int(self.table[slot, j])]) == 1
            for j in range(self.owned[slot])
        )

    def unshare_slot(self, slot: int) -> list[tuple[int, int]]:
        """Copy-on-write unshare: remap every page `slot` shares
        (refcount > 1) to a fresh private page, decref'ing the shared one.
        Returns [(src_pid, dst_pid), ...]; the caller must copy page
        contents src -> dst in the device pools (PagedKVCache.copy_pages)
        BEFORE any write through the new mapping.  Raises IndexError when
        the free list can't cover the copies (caller falls back to
        finishing the request).  Reference analogue: the unified cache has
        no sharing to break — this is the paged-prefix-sharing counterpart
        of seq_cp followed by in-place seq_add."""
        copies = []
        for j in range(self.owned[slot]):
            pid = int(self.table[slot, j])
            if self.refs[pid] > 1:
                new = self._alloc()
                self.refs[pid] -= 1
                self.table[slot, j] = new
                copies.append((pid, new))
        return copies


def shift_context_row_paged(kv: PagedKVCache, rope_params, row: int, n_keep: int,
                            n_discard: int) -> PagedKVCache:
    """Per-slot context shift on the paged pool (reference capability:
    llama_memory_seq_add + seq_rm on the cell-indexed cache,
    src/llama-kv-cache.cpp): gather the slot's logical row through its page
    table, drop `n_discard` entries after `n_keep`, re-rotate the moved K
    by -n_discard positions, scatter back into the SAME pages.  The table
    is untouched (the slot keeps its pages and regrows into the freed
    tail); pages must be exclusively owned (PageAllocator.exclusively_owned)
    since contents are rewritten in place."""
    import jax.numpy as jnp

    from ..ops.layers import apply_rope

    hz = kv.horizon
    for il in range(kv.n_layers):
        rk, rv = kv.gather_row(il, row, hz)  # [Hkv, hz, D]
        mk = rk[:, n_keep + n_discard:, :].transpose(1, 0, 2)[None]  # [1, T, H, D]
        delta = jnp.full((1, mk.shape[1]), -n_discard, jnp.int32)
        mk = apply_rope(mk, delta, rope_params)[0].transpose(1, 0, 2)
        zk = jnp.zeros_like(rk[:, :n_discard, :])
        nk = jnp.concatenate([rk[:, :n_keep, :], mk, zk], axis=1)
        nv = jnp.concatenate(
            [rv[:, :n_keep, :], rv[:, n_keep + n_discard:, :], zk], axis=1)
        kv = kv.scatter_row(il, row, nk, nv)
    return kv
