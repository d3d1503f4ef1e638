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
    if cfg.arch == "plamo2":
        # conv over x channels only (group_count 0) + per-head SSD state
        n = cfg.n_recurrent_layers
        sc = cfg.ssm
        conv = tuple(jnp.zeros((batch, sc.d_inner, sc.d_conv - 1), dtype) for _ in range(n))
        ssm = tuple(jnp.zeros((batch, sc.n_head, sc.head_dim, sc.d_state), jnp.float32)
                    for _ in range(n))
        return RecurrentState(conv=conv, ssm=ssm)
    if cfg.arch == "qwen3next":
        # deltanet states: conv tail over the q|k|v channels + the
        # [Hv, dk, dv] delta-rule memory per linear layer
        n = cfg.n_recurrent_layers
        sc = cfg.ssm
        hk, hv, dk = sc.n_group, sc.dt_rank, sc.d_state
        dv = sc.d_inner // hv
        conv_dim = 2 * hk * dk + hv * dv
        conv = tuple(jnp.zeros((batch, conv_dim, sc.d_conv - 1), dtype) for _ in range(n))
        ssm = tuple(jnp.zeros((batch, hv, dk, dv), jnp.float32) for _ in range(n))
        return RecurrentState(conv=conv, ssm=ssm)
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
    their compacted ordinal; mamba layers consume `state` at theirs.
    Parallel hybrids (falcon-h1) run both per layer and sum."""
    x = embed(params, cfg, tokens)
    if state is None:
        state = make_hybrid_state(cfg, tokens.shape[0], x.dtype)
    if cfg.parallel_hybrid:
        return _parallel_hybrid_forward(
            params, cfg, x, positions, kv, state,
            lengths=lengths, logits_for=logits_for,
        )
    ai = ri = 0
    for il, layer in enumerate(params["layers"]):
        if "ssm_qkv" in layer:  # qwen3next gated-deltanet mixer
            from .deltanet import deltanet_layer

            h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
            y, conv, ssm = deltanet_layer(layer, cfg, h, state.conv[ri], state.ssm[ri], lengths)
            state = state.with_layer(ri, conv, ssm)
            ri += 1
            x = x + y
            x = _ffn_block(layer, cfg, x, f"blk.{il}", taps, ep_axis)
        elif cfg.arch == "qwen3next":
            from .deltanet import gated_attn_layer

            x, kv = gated_attn_layer(layer, cfg, x, positions, kv, ai, taps=taps)
            ai += 1
            x = _ffn_block(layer, cfg, x, f"blk.{il}", taps, ep_axis)
        elif "ssm_in" in layer or "shortconv_in" in layer:
            h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
            if "shortconv_in" in layer:  # lfm2 conv mixer
                from .lfm2 import shortconv_layer

                y, conv = shortconv_layer(layer, cfg, h, state.conv[ri], lengths)
                state = state.with_layer(ri, conv, state.ssm[ri])
            else:  # jamba mamba mixer / bamba mamba2 / plamo2 mixer
                from .mamba import mamba2_layer, plamo2_mamba_layer

                if cfg.arch == "plamo2":
                    mixer = plamo2_mamba_layer
                else:
                    mixer = mamba2_layer if cfg.ssm.is_mamba2 else mamba_layer
                y, conv, ssm = mixer(layer, cfg, h, state.conv[ri], state.ssm[ri], lengths)
                state = state.with_layer(ri, conv, ssm)
            ri += 1
            if "attn_post_norm" in layer:
                # plamo2 sandwich: mixer output normed before the residual
                y = rms_norm(y, layer["attn_post_norm"], cfg.norm_eps)
            x = x + y
            x = _ffn_block(layer, cfg, x, f"blk.{il}", taps, ep_axis)
        else:
            x, kv = layer_forward(
                layer, cfg, x, positions, kv, ai, taps=taps, ep_axis=ep_axis
            )
            if "wq" in layer or "wqkv" in layer:  # nemotron-h ffn-only
                ai += 1  # layers must not consume a kv ordinal
    x = rms_norm(x, params["out_norm"], cfg.norm_eps)
    if taps is not None:
        taps["hidden"] = x
    if logits_for == "last":
        x = x[:, -1:, :]
    logits = linear(x, params["output"]).astype(jnp.float32)
    if logits.shape[-1] != cfg.vocab_size:
        logits = logits[..., : cfg.vocab_size]
    return logits, kv, state


def _parallel_hybrid_forward(params, cfg, x, positions, kv, state, *,
                             lengths=None, logits_for="all"):
    """Falcon-H1 layer composition (reference src/models/falcon-h1.cpp):
    one shared pre-norm feeds attention AND the mamba2 mixer, their
    outputs sum into the residual, then a gated FFN block."""
    from ..ops.attention import attention
    from ..ops.layers import apply_rope, swiglu
    from .mamba import mamba2_layer

    scale = cfg.attn_scale if cfg.attn_scale else 1.0 / (cfg.head_dim**0.5)
    for il, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
        b, t = h.shape[:2]
        if "wqkv" in layer:  # load-time fused projection
            qkv = linear(h, layer["wqkv"])
            qd, kvd = cfg.q_dim, cfg.kv_dim
            q = qkv[..., :qd].reshape(b, t, -1, cfg.head_dim)
            k = qkv[..., qd : qd + kvd].reshape(b, t, -1, cfg.head_dim)
            v = qkv[..., qd + kvd :].reshape(b, t, -1, cfg.head_dim)
        else:
            q = linear(h, layer["wq"]).reshape(b, t, -1, cfg.head_dim)
            k = linear(h, layer["wk"]).reshape(b, t, -1, cfg.head_dim)
            v = linear(h, layer["wv"]).reshape(b, t, -1, cfg.head_dim)
        q = apply_rope(q, positions, cfg.rope)
        k = apply_rope(k, positions, cfg.rope)
        if kv is not None:
            kv = kv.update(il, k, v, positions)
            k_all, v_all = kv.layer(il)
        else:
            k_all, v_all = k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
        att = attention(q, k_all, v_all, positions, scale=scale)
        att = linear(att.reshape(b, t, -1), layer["wo"])

        y, conv, ssm = mamba2_layer(layer, cfg, h, state.conv[il], state.ssm[il], lengths)
        state = state.with_layer(il, conv, ssm)
        x = x + att + y

        h2 = rms_norm(x, layer["ffn_norm"], cfg.norm_eps)
        if "ffn_gateup" in layer:  # load-time fused gate|up
            gup = linear(h2, layer["ffn_gateup"])
            half = gup.shape[-1] // 2
            gu = swiglu(gup[..., :half], gup[..., half:])
        else:
            gu = swiglu(linear(h2, layer["ffn_gate"]), linear(h2, layer["ffn_up"]))
        x = x + linear(gu, layer["ffn_down"])
    x = rms_norm(x, params["out_norm"], cfg.norm_eps)
    if logits_for == "last":
        x = x[:, -1:, :]
    logits = linear(x, params["output"]).astype(jnp.float32)
    if logits.shape[-1] != cfg.vocab_size:
        logits = logits[..., : cfg.vocab_size]
    return logits, kv, state
