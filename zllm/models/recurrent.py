"""Unified dispatch for recurrent-memory model families (mamba, rwkv6).

The analogue of the reference's create_memory arch switch
(src/llama-model.cpp:7473: LLM_ARCH_MAMBA/RWKV6/... ->
llama_memory_recurrent) — one entry point the engine and tools use
without knowing which recurrent family is loaded.
"""

from __future__ import annotations

import jax


def make_state(cfg, batch: int, dtype=None):
    """Fresh per-sequence recurrent memory for `batch` rows."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    if cfg.wkv is not None:
        from .rwkv import RwkvState

        return RwkvState.create(cfg, batch, dtype)
    if cfg.ssm is not None:
        from .mamba import RecurrentState

        return RecurrentState.create(cfg, batch, dtype)
    raise ValueError(f"{cfg.arch} is not a recurrent architecture")


def recurrent_forward(params, cfg, tokens: jax.Array, state=None, *,
                      lengths: jax.Array | None = None, logits_for: str = "all"):
    """(logits, state') for any recurrent family; `lengths` [B] freezes
    per-row state after the row's valid tokens (batched serving)."""
    if cfg.wkv is not None:
        if cfg.arch in ("rwkv7", "arwkv7"):
            from .rwkv import rwkv7_forward

            return rwkv7_forward(params, cfg, tokens, state,
                                 lengths=lengths, logits_for=logits_for)
        from .rwkv import rwkv6_forward

        return rwkv6_forward(params, cfg, tokens, state, lengths=lengths, logits_for=logits_for)
    from .mamba import mamba_forward

    return mamba_forward(params, cfg, tokens, state, lengths=lengths, logits_for=logits_for)


def reset_rows(state, rows) -> object:
    """Zero the recurrent memory of the given batch rows (the analogue of
    llama_memory_seq_rm on a recurrent cache)."""
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(state)
    out = []
    for leaf in leaves:
        z = jnp.zeros_like(leaf[jnp.asarray(rows)])
        out.append(leaf.at[jnp.asarray(rows)].set(z))
    return jax.tree_util.tree_unflatten(treedef, out)
