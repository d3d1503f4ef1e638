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

    @property
    def max_len(self) -> int:
        return self.k[0].shape[2]

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

        def upd(cache_row, new_row, p):  # [H, S, D], [H, T, D]
            return jax.lax.dynamic_update_slice(cache_row, new_row, (0, p, 0))

        k = list(self.k)
        v = list(self.v)
        k[il] = jax.vmap(upd)(self.k[il], kt, pos0)
        v[il] = jax.vmap(upd)(self.v[il], vt, pos0)
        return KVCache(k=tuple(k), v=tuple(v))

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
