"""KV cache.

Round-1 layout: one contiguous ring of slots per sequence,
[L, B, S_max, H_kv, D], where slot index == absolute token position
(the paged layout with per-seq page tables arrives with the batching
runtime).  Functional updates; callers thread the cache through jitted
steps with buffer donation so XLA updates it in place.

Reference counterpart: src/llama-kv-cache.{h,cpp} (find_slot/apply_ubatch);
here slot bookkeeping is trivial because positions are the slots.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    k: jax.Array  # [L, B, S, Hkv, D]
    v: jax.Array  # [L, B, S, Hkv, D]

    def tree_flatten(self):
        return (self.k, self.v), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    @classmethod
    def create(cls, n_layers: int, batch: int, max_len: int, n_kv_heads: int, head_dim: int, dtype=jnp.bfloat16):
        shape = (n_layers, batch, max_len, n_kv_heads, head_dim)
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    def update(self, il: int, k_new: jax.Array, v_new: jax.Array, positions: jax.Array) -> "KVCache":
        """Write k/v [B, T, H, D] at absolute `positions` [B, T] of layer il."""
        b_idx = jnp.arange(k_new.shape[0], dtype=jnp.int32)[:, None]
        k = self.k.at[il, b_idx, positions].set(k_new.astype(self.k.dtype))
        v = self.v.at[il, b_idx, positions].set(v_new.astype(self.v.dtype))
        return KVCache(k=k, v=v)

    def layer(self, il: int) -> tuple[jax.Array, jax.Array]:
        return self.k[il], self.v[il]


def causal_mask(positions: jax.Array, kv_len: int, window: int = 0) -> jax.Array:
    """bool[B, T, kv_len]: slot s attendable from query position p iff
    s <= p (and p - s < window when sliding-window attention is on)."""
    s = jnp.arange(kv_len, dtype=jnp.int32)[None, None, :]
    p = positions[:, :, None]
    m = s <= p
    if window > 0:
        m = m & (s > p - window)
    return m
