"""Hybrid-memory model forward (jamba): attention + mamba layer mix.

Reference: src/models/jamba.cpp (per-layer n_head_kv(il)==0 selects the
mamba mixer, else rope-free attention; FFN is dense or MoE per layer) and
the composed memory class src/llama-memory-hybrid.cpp — here the KV cache
covers only the attention layers (indexed by compacted attention ordinal)
and a RecurrentState covers the mamba layers, both threaded functionally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.layers import rms_norm
from ..ops.linear import linear
from .llama import _ffn_block, embed, layer_forward
from .mamba import RecurrentState, mamba_layer


def make_hybrid_state(cfg, batch: int, dtype=jnp.float32) -> RecurrentState:
    """Recurrent memory sized to the recurrent-layer subset: mamba
    conv+ssm states (jamba) or shortconv tails (lfm2, ssm slots empty)."""
    if cfg.shortconv_l > 0:
        n = cfg.n_recurrent_layers
        conv = tuple(
            jnp.zeros((batch, cfg.n_embd, cfg.shortconv_l - 1), dtype) for _ in range(n)
        )
        ssm = tuple(jnp.zeros((batch, 1, 0), jnp.float32) for _ in range(n))
        return RecurrentState(conv=conv, ssm=ssm)
    return RecurrentState.create(cfg, batch, dtype, n_layers=cfg.n_recurrent_layers)


def hybrid_forward(
    params,
    cfg,
    tokens: jax.Array,  # [B, T]
    positions: jax.Array,  # [B, T]
    kv=None,  # KVCache over cfg.n_attn_layers layers (or None)
    state: RecurrentState | None = None,
    *,
    lengths: jax.Array | None = None,
    logits_for: str = "all",
    taps: dict | None = None,
    ep_axis: str | None = None,
):
    """Returns (logits, kv, state).  Attention layers consume `kv` at
    their compacted ordinal; mamba layers consume `state` at theirs."""
    x = embed(params, cfg, tokens)
    if state is None:
        state = make_hybrid_state(cfg, tokens.shape[0], x.dtype)
    ai = ri = 0
    for il, layer in enumerate(params["layers"]):
        if "ssm_in" in layer or "shortconv_in" in layer:
            h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
            if "shortconv_in" in layer:  # lfm2 conv mixer
                from .lfm2 import shortconv_layer

                y, conv = shortconv_layer(layer, cfg, h, state.conv[ri], lengths)
                state = state.with_layer(ri, conv, state.ssm[ri])
            else:  # jamba mamba mixer / bamba mamba2 mixer
                from .mamba import mamba2_layer

                mixer = mamba2_layer if cfg.ssm.is_mamba2 else mamba_layer
                y, conv, ssm = mixer(layer, cfg, h, state.conv[ri], state.ssm[ri], lengths)
                state = state.with_layer(ri, conv, ssm)
            ri += 1
            x = x + y
            x = _ffn_block(layer, cfg, x, f"blk.{il}", taps, ep_axis)
        else:
            x, kv = layer_forward(
                layer, cfg, x, positions, kv, ai, taps=taps, ep_axis=ep_axis
            )
            ai += 1
    x = rms_norm(x, params["out_norm"], cfg.norm_eps)
    if taps is not None:
        taps["hidden"] = x
    if logits_for == "last":
        x = x[:, -1:, :]
    logits = linear(x, params["output"]).astype(jnp.float32)
    if logits.shape[-1] != cfg.vocab_size:
        logits = logits[..., : cfg.vocab_size]
    return logits, kv, state
