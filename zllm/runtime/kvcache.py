"""KV cache.

Per-layer arrays [B, H, S, D] (head-major so attention kernels slice per
(batch, head) without transposes; S contiguous with D on lanes).  Keeping
layers as separate pytree leaves — instead of one stacked [L, ...] array —
lets XLA alias the update chain leaf-by-leaf, so the cache stays in-place
both across donated jit steps and inside lax.scan generation loops (the
stacked layout forced whole-cache copies in scan carries).

Slot index == absolute token position (round-1 contiguous ring; the paged
layout with per-seq page tables arrives with the batching runtime v2).

Reference counterpart: src/llama-kv-cache.{h,cpp} (find_slot/apply_ubatch);
slot bookkeeping is trivial here because positions are the slots.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp



@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    k: tuple  # L x [B, H, S, D]
    v: tuple  # L x [B, H, S, D]

    def tree_flatten(self):
        return (*self.k, *self.v), len(self.k)

    @classmethod
    def tree_unflatten(cls, n_layers, leaves):
        return cls(k=tuple(leaves[:n_layers]), v=tuple(leaves[n_layers:]))

    @classmethod
    def create(cls, n_layers: int, batch: int, max_len: int, n_kv_heads: int, head_dim: int, dtype=jnp.bfloat16):
        shape = (batch, n_kv_heads, max_len, head_dim)
        return cls(
            k=tuple(jnp.zeros(shape, dtype) for _ in range(n_layers)),
            v=tuple(jnp.zeros(shape, dtype) for _ in range(n_layers)),
        )

    @classmethod
    def create_varied(cls, batch: int, max_len: int, kv_heads: list, head_dim: int,
                      dtype=jnp.bfloat16):
        """Per-layer kv-head widths (deci/nemotron-nas); layers with 0
        heads get an empty stub that update/layer must never touch."""
        def shape(h):
            return (batch, max(h, 1), max_len if h > 0 else 1, head_dim)

        return cls(
            k=tuple(jnp.zeros(shape(h), dtype) for h in kv_heads),
            v=tuple(jnp.zeros(shape(h), dtype) for h in kv_heads),
        )

    @property
    def max_len(self) -> int:
        return max(x.shape[2] for x in self.k)

    @property
    def batch(self) -> int:
        return self.k[0].shape[0]

    @property
    def n_layers(self) -> int:
        return len(self.k)

    def update(self, il: int, k_new: jax.Array, v_new: jax.Array, positions: jax.Array) -> "KVCache":
        """Write k/v [B, T, H, D] at `positions` [B, T] of layer il.

        Contract: positions are consecutive per row (positions[b, i] ==
        positions[b, 0] + i) — they index a contiguous run of slots, so the
        write lowers to one dynamic_update_slice per row instead of a TPU
        scatter (which measured ~10x slower).  Rows whose start exceeds
        S - T clamp to the tail (the engine's trash-row convention relies
        on write-before-attend making those slots safe)."""
        kt = k_new.transpose(0, 2, 1, 3).astype(self.k[il].dtype)  # [B, H, T, D]
        vt = v_new.transpose(0, 2, 1, 3).astype(self.v[il].dtype)
        pos0 = positions[:, 0]

        k = list(self.k)
        v = list(self.v)
        if kt.shape[0] == 1:
            # single-row fast path: a plain dynamic_update_slice with a
            # scalar start.  The vmap'd form below lowers to a scatter,
            # which XLA cannot alias in-place inside a scan/while carry —
            # it copied the whole cache per decode step (measured 69 MB/
            # step on TinyLlama); the scalar DUS aliases cleanly.
            k[il] = jax.lax.dynamic_update_slice(self.k[il], kt, (0, 0, pos0[0], 0))
            v[il] = jax.lax.dynamic_update_slice(self.v[il], vt, (0, 0, pos0[0], 0))
        else:
            def upd(cache_row, new_row, p):  # [H, S, D], [H, T, D]
                return jax.lax.dynamic_update_slice(cache_row, new_row, (0, p, 0))

            k[il] = jax.vmap(upd)(self.k[il], kt, pos0)
            v[il] = jax.vmap(upd)(self.v[il], vt, pos0)
        return self._rebuild(tuple(k), tuple(v))

    def _rebuild(self, k, v) -> "KVCache":
        """Type-preserving constructor hook for subclasses (KVCacheSWA)."""
        return KVCache(k=k, v=v)

    def replace_layer(self, il: int, k_layer: jax.Array, v_layer: jax.Array) -> "KVCache":
        """Swap in already-updated layer arrays (fused decode-attention
        kernels update the cache in-kernel via aliased in/out buffers)."""
        k = list(self.k)
        v = list(self.v)
        k[il] = k_layer
        v[il] = v_layer
        return self._rebuild(tuple(k), tuple(v))

    def layer(self, il: int) -> tuple[jax.Array, jax.Array]:
        """-> k, v as [B, H, S, D]."""
        return self.k[il], self.v[il]

    def stacked(self):
        """[L, B, H, S, D] views for state serialization."""
        return jnp.stack(self.k), jnp.stack(self.v)


def causal_mask(positions: jax.Array, kv_len: int, window: int = 0) -> jax.Array:
    """bool[B, T, kv_len]: slot s attendable from query position p iff
    s <= p (and p - s < window when sliding-window attention is on)."""
    s = jnp.arange(kv_len, dtype=jnp.int32)[None, None, :]
    p = positions[:, :, None]
    m = s <= p
    if window > 0:
        m = m & (s > p - window)
    return m


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCacheQ8:
    """Q8-quantized KV cache (reference: llama_context_params.type_k/type_v
    + quantized-KV flash-attention consumers, ggml-cuda/fattn-vec.cuh).

    Per-vector symmetric int8: each [D] key/value vector stores int8 codes
    and one f32 scale -> ~2x memory capacity vs bf16 at equal context.
    Round-1 consumers dequantize at attention time (capacity win); the
    fused-attention in-VMEM dequant lands with the paged cache rework.
    """

    k: tuple  # L x int8 [B, H, S, D]
    v: tuple
    ks: tuple  # L x f32 [B, H, S, 1]
    vs: tuple

    def tree_flatten(self):
        return (*self.k, *self.v, *self.ks, *self.vs), len(self.k)

    @classmethod
    def tree_unflatten(cls, n, leaves):
        return cls(
            k=tuple(leaves[:n]), v=tuple(leaves[n : 2 * n]),
            ks=tuple(leaves[2 * n : 3 * n]), vs=tuple(leaves[3 * n :]),
        )

    @classmethod
    def create(cls, n_layers: int, batch: int, max_len: int, n_kv_heads: int, head_dim: int, dtype=None):
        shape = (batch, n_kv_heads, max_len, head_dim)
        sshape = (batch, n_kv_heads, max_len, 1)
        z8 = lambda: jnp.zeros(shape, jnp.int8)
        zs = lambda: jnp.ones(sshape, jnp.float32)
        return cls(
            k=tuple(z8() for _ in range(n_layers)), v=tuple(z8() for _ in range(n_layers)),
            ks=tuple(zs() for _ in range(n_layers)), vs=tuple(zs() for _ in range(n_layers)),
        )

    @classmethod
    def create_varied(cls, batch: int, max_len: int, kv_heads: list, head_dim: int,
                      dtype=jnp.bfloat16):
        """Per-layer kv-head widths (deci/nemotron-nas); layers with 0
        heads get an empty stub that update/layer must never touch."""
        def shape(h):
            return (batch, max(h, 1), max_len if h > 0 else 1, head_dim)

        return cls(
            k=tuple(jnp.zeros(shape(h), dtype) for h in kv_heads),
            v=tuple(jnp.zeros(shape(h), dtype) for h in kv_heads),
        )

    @property
    def max_len(self) -> int:
        return max(x.shape[2] for x in self.k)

    @property
    def batch(self) -> int:
        return self.k[0].shape[0]

    @staticmethod
    def _quant(x):  # [B, H, T, D] -> int8 codes + f32 scales
        xf = x.astype(jnp.float32)
        s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        s = jnp.maximum(s, 1e-12)
        q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
        return q, s

    def update(self, il: int, k_new: jax.Array, v_new: jax.Array, positions: jax.Array) -> "KVCacheQ8":
        kq, ks = self._quant(k_new.transpose(0, 2, 1, 3))
        vq, vs = self._quant(v_new.transpose(0, 2, 1, 3))
        pos0 = positions[:, 0]

        def upd(cache_row, new_row, p):
            return jax.lax.dynamic_update_slice(cache_row, new_row, (0, p, 0))

        k = list(self.k); v = list(self.v); kss = list(self.ks); vss = list(self.vs)
        k[il] = jax.vmap(upd)(self.k[il], kq, pos0)
        v[il] = jax.vmap(upd)(self.v[il], vq, pos0)
        kss[il] = jax.vmap(upd)(self.ks[il], ks, pos0)
        vss[il] = jax.vmap(upd)(self.vs[il], vs, pos0)
        return KVCacheQ8(k=tuple(k), v=tuple(v), ks=tuple(kss), vs=tuple(vss))

    def layer(self, il: int):
        """QuantKV views — the blockwise attention kernel streams the int8
        codes from HBM at half the bf16 bandwidth and applies the scales
        in-VMEM (the capacity AND bandwidth win; dequant-on-read fallback
        lives in QuantKV.dequant for CPU/short-context paths)."""
        from ..ops.attention import QuantKV

        return (QuantKV(self.k[il], self.ks[il]), QuantKV(self.v[il], self.vs[il]))

    def _deq(self, il: int):
        k = self.k[il].astype(jnp.bfloat16) * self.ks[il].astype(jnp.bfloat16)
        v = self.v[il].astype(jnp.bfloat16) * self.vs[il].astype(jnp.bfloat16)
        return k, v

    def stacked(self):
        return jnp.stack([self._deq(i)[0] for i in range(len(self.k))]), jnp.stack(
            [self._deq(i)[1] for i in range(len(self.k))]
        )


def shift_context(kv: KVCache, rope_params, n_keep: int, n_discard: int) -> KVCache:
    """Context shift (reference: llama_memory_seq_add + set_input_k_shift
    K-rotation, src/llama-kv-cache.h:197 / server context-shift at
    server-context.cpp:1981): drop `n_discard` slots after the first
    `n_keep`, slide the rest down, and re-rotate the moved K entries by
    -n_discard positions so their rotary phase matches their new slots.

    Applies to every batch row; caller updates its position bookkeeping
    (new_pos = old_pos - n_discard)."""
    from ..ops.layers import apply_rope

    def one_layer(k, v):  # [B, H, S, D]
        b, h, s, d = k.shape
        moved_k = k[:, :, n_keep + n_discard :, :]
        moved_v = v[:, :, n_keep + n_discard :, :]
        # rotate K by a constant -n_discard: apply_rope wants [B, T, H, D]
        mk = moved_k.transpose(0, 2, 1, 3)
        delta = jnp.full((b, mk.shape[1]), -n_discard, jnp.int32)
        mk = apply_rope(mk, delta, rope_params).transpose(0, 2, 1, 3)
        k2 = jnp.concatenate([k[:, :, :n_keep, :], mk, jnp.zeros_like(k[:, :, : n_discard, :])], axis=2)
        v2 = jnp.concatenate([v[:, :, :n_keep, :], moved_v, jnp.zeros_like(v[:, :, : n_discard, :])], axis=2)
        return k2, v2

    ks, vs = [], []
    for il in range(len(kv.k)):
        k2, v2 = one_layer(kv.k[il], kv.v[il])
        ks.append(k2)
        vs.append(v2)
    return KVCache(k=tuple(ks), v=tuple(vs))


def _shift_context_row_q8(kv: "KVCacheQ8", rope_params, row: int, n_keep: int,
                          n_discard: int, horizon: int | None = None) -> "KVCacheQ8":
    """Per-row context shift on the int8 cache: the moved K region is
    dequantized, re-rotated by -n_discard, and requantized (per-vector
    scales recomputed); V codes and scales just slide down."""
    from ..ops.layers import apply_rope

    s_total = kv.max_len
    hz = s_total if horizon is None else horizon
    k, v, kss, vss = list(kv.k), list(kv.v), list(kv.ks), list(kv.vs)
    for il in range(len(kv.k)):
        rk, rs = kv.k[il][row], kv.ks[il][row]  # [H, S, D] int8, [H, S, 1] f32
        mk = rk[:, n_keep + n_discard : hz].astype(jnp.float32) * rs[:, n_keep + n_discard : hz]
        mk = mk.transpose(1, 0, 2)[None]  # [1, T, H, D]
        delta = jnp.full((1, mk.shape[1]), -n_discard, jnp.int32)
        mk = apply_rope(mk, delta, rope_params)[0].transpose(1, 0, 2)  # [H, T, D]
        mq, ms = KVCacheQ8._quant(mk[None])
        mq, ms = mq[0], ms[0]
        zq = jnp.zeros_like(rk[:, :n_discard])
        zs = jnp.ones_like(rs[:, :n_discard])

        def splice(a, mid, z):
            parts = [a[:, :n_keep], mid, z]
            if hz < s_total:
                parts.append(a[:, hz:])
            return jnp.concatenate(parts, axis=1)

        rv, rvs = kv.v[il][row], kv.vs[il][row]
        k[il] = kv.k[il].at[row].set(splice(rk, mq, zq))
        kss[il] = kv.ks[il].at[row].set(splice(rs, ms, zs))
        v[il] = kv.v[il].at[row].set(splice(rv, rv[:, n_keep + n_discard : hz], zq))
        vss[il] = kv.vs[il].at[row].set(splice(rvs, rvs[:, n_keep + n_discard : hz], zs))
    return KVCacheQ8(k=tuple(k), v=tuple(v), ks=tuple(kss), vs=tuple(vss))


def shift_context_row(kv: KVCache, rope_params, row: int, n_keep: int, n_discard: int, horizon: int | None = None) -> KVCache:
    """Per-row context shift for the serving engine (reference: server
    context-shift, tools/server/server-context.cpp:1981-2010, which calls
    llama_memory_seq_add on one sequence): within batch row `row`, drop
    `n_discard` slots after the first `n_keep`, slide [n_keep+n_discard,
    horizon) down, and re-rotate the moved K by -n_discard positions.
    `horizon` bounds the live region (slots >= horizon — the engine's
    trash region — are preserved untouched)."""
    if isinstance(kv, KVCacheQ8):
        return _shift_context_row_q8(kv, rope_params, row, n_keep, n_discard, horizon)
    if hasattr(kv, "page_size"):  # PagedKVCache: table-indexed row shift
        from .paged import shift_context_row_paged

        return shift_context_row_paged(kv, rope_params, row, n_keep, n_discard)
    from ..ops.layers import apply_rope

    s_total = kv.max_len
    hz = s_total if horizon is None else horizon

    def one(k, v):  # [B, H, S, D] each
        rk, rv = k[row], v[row]  # [H, S, D]
        mk = rk[:, n_keep + n_discard : hz, :].transpose(1, 0, 2)[None]  # [1, T, H, D]
        delta = jnp.full((1, mk.shape[1]), -n_discard, jnp.int32)
        mk = apply_rope(mk, delta, rope_params)[0].transpose(1, 0, 2)
        zk = jnp.zeros_like(rk[:, :n_discard, :])
        parts_k = [rk[:, :n_keep, :], mk, zk]
        parts_v = [rv[:, :n_keep, :], rv[:, n_keep + n_discard : hz, :], zk]
        if hz < s_total:
            parts_k.append(rk[:, hz:, :])
            parts_v.append(rv[:, hz:, :])
        return k.at[row].set(jnp.concatenate(parts_k, axis=1)), v.at[row].set(
            jnp.concatenate(parts_v, axis=1)
        )

    ks, vs = [], []
    for il in range(len(kv.k)):
        k2, v2 = one(kv.k[il], kv.v[il])
        ks.append(k2)
        vs.append(v2)
    return KVCache(k=tuple(ks), v=tuple(vs))


def seq_cp(kv, dst: int, src: int):
    """Copy one batch row's cache into another slot (llama_memory_seq_cp)."""
    return type(kv)(
        **{
            name: tuple(x.at[dst].set(x[src]) for x in getattr(kv, name))
            for name in ("k", "v", *(("ks", "vs") if hasattr(kv, "ks") else ()))
        }
    )


@jax.tree_util.register_pytree_node_class
class KVCacheSWA(KVCache):
    """Dual-size cache for sliding-window models (reference:
    llama-kv-cache-iswa.{h,cpp}: a pruned cache for SWA layers beside the
    full cache).  SWA layers keep only `ring` = round_up(window + chunk)
    slots addressed as position % ring, plus a `chunk`-sized trash region
    at [ring, ring+chunk) absorbing the engine's inactive-row writes
    (write positions >= the attendable horizon map there).  Memory for a
    gemma-style model drops from L*S to L_full*S + L_swa*ring.

    Contract: chunked writes start at multiples of `chunk` (the engine's
    prefill alignment), so a ring write never wraps mid-run.
    """

    def __init__(self, k, v, swa_mask, ring, horizon):
        self.k = k
        self.v = v
        self.swa_mask = swa_mask  # per-layer bool tuple
        self.ring = ring  # attendable ring slots of SWA layers
        self.horizon = horizon  # absolute attendable positions (max_len)

    def tree_flatten(self):
        aux = (len(self.k), self.swa_mask, self.ring, self.horizon)
        return (*self.k, *self.v), aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        n, swa_mask, ring, horizon = aux
        return cls(tuple(leaves[:n]), tuple(leaves[n:]), swa_mask, ring, horizon)

    @classmethod
    def create_swa(cls, cfg, batch: int, max_len: int, chunk: int, dtype=jnp.bfloat16):
        ring = ((cfg.sliding_window + chunk + 127) // 128) * 128
        ring = min(ring, max_len)
        swa_mask = tuple(cfg.is_swa_layer(il) for il in range(cfg.n_layers))
        ks, vs = [], []
        for il in range(cfg.n_layers):
            s = (ring + chunk) if swa_mask[il] else (max_len + chunk)
            shape = (batch, cfg.n_kv_heads, s, cfg.head_dim)
            ks.append(jnp.zeros(shape, dtype))
            vs.append(jnp.zeros(shape, dtype))
        return cls(tuple(ks), tuple(vs), swa_mask, ring, max_len)

    def _map_positions(self, il: int, positions):
        if not self.swa_mask[il]:
            return positions
        # ring slots for live positions; trash region for horizon writes
        p0 = positions[:, 0:1]
        ring_pos = positions - p0 + (p0 % self.ring)
        return jnp.where(p0 >= self.horizon, self.ring + (positions - p0), ring_pos)

    def _rebuild(self, k, v):
        return KVCacheSWA(k, v, self.swa_mask, self.ring, self.horizon)

    def update(self, il, k_new, v_new, positions):
        return super().update(il, k_new, v_new, self._map_positions(il, positions))

    def ring_size(self, il: int) -> int:
        return self.ring if self.swa_mask[il] else 0


def ring_mask(positions: jax.Array, ring: int, s_total: int, window: int) -> jax.Array:
    """bool[B, T, S] for a ring cache: slot s of a ring of size `ring`
    holds absolute position a_s = p - ((p - s) mod ring); attendable iff
    0 <= a_s <= p and a_s > p - window.  Slots >= ring (trash) never."""
    s_idx = jnp.arange(s_total, dtype=jnp.int32)[None, None, :]
    p = positions[:, :, None]
    a = p - ((p - s_idx) % ring)
    m = (a >= 0) & (a <= p) & (s_idx < ring)
    if window > 0:
        m &= a > p - window
    return m
