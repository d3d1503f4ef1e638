"""T5 encoder-decoder forward (functional JAX).

The encoder-decoder family (reference: src/models/t5-enc.cpp /
t5-dec.cpp; llama_encode + cross-attention state in
src/llama-context.cpp encode()): RMS-normed blocks with T5 relative
position buckets instead of rope, unscaled attention (scale=1), a
decoder with causal self-attention over a KV cache plus cross-attention
over the encoder output whose K/V are computed once per encode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.layers import attention_ref, rms_norm
from ..ops.linear import linear


def rel_bucket(rel: jax.Array, *, bidirectional: bool, num_buckets: int = 32,
               max_distance: int = 128) -> jax.Array:
    """T5 relative-position bucket (reference ggml_get_rel_pos / HF
    _relative_position_bucket): rel = key_pos - query_pos."""
    n = num_buckets
    out = jnp.zeros_like(rel)
    if bidirectional:
        n = n // 2
        out = out + jnp.where(rel > 0, n, 0)
        rel = jnp.abs(rel)
    else:
        rel = -jnp.minimum(rel, 0)
    max_exact = n // 2
    is_small = rel < max_exact
    big = max_exact + (
        jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact)
        * (n - max_exact)
    ).astype(rel.dtype)
    big = jnp.minimum(big, n - 1)
    return out + jnp.where(is_small, rel, big)


def _rel_bias(rel_b, q_pos, k_pos, *, bidirectional, num_buckets, max_distance):
    """[H, T, S] additive bias from the bucket embedding [num_buckets, H]."""
    rel = k_pos[None, :] - q_pos[:, None]  # [T, S]
    buckets = rel_bucket(rel, bidirectional=bidirectional,
                         num_buckets=num_buckets, max_distance=max_distance)
    return rel_b[buckets].transpose(2, 0, 1).astype(jnp.float32)  # [H, T, S]


def _t5_attn(layer, cfg, h, k_all, v_all, mask, bias, prefix=""):
    b, t = h.shape[:2]
    q = linear(h, layer[prefix + "wq"]).reshape(b, t, -1, cfg.head_dim)
    att = attention_ref(q, k_all, v_all, mask, scale=1.0, bias=bias)
    return linear(att.reshape(b, t, -1), layer[prefix + "wo"])


def _t5_ffn(layer, cfg, x):
    h = rms_norm(x, layer["ffn_norm"], cfg.norm_eps)
    if "ffn_gate" in layer:  # t5 v1.1 gated gelu
        g = jax.nn.gelu(linear(h, layer["ffn_gate"]).astype(jnp.float32), approximate=True)
        gu = g.astype(h.dtype) * linear(h, layer["ffn_up"])
    else:  # t5 v1.0 relu
        gu = jax.nn.relu(linear(h, layer["ffn_up"]).astype(jnp.float32)).astype(h.dtype)
    return x + linear(gu, layer["ffn_down"])


def t5_encode(params, cfg, tokens: jax.Array) -> jax.Array:
    """Bidirectional encoder: [B, S] -> hidden [B, S, D] (reference
    llm_build_t5_enc)."""
    x = params["tok_emb"][tokens]
    b, s = tokens.shape
    pos = jnp.arange(s)
    rel_b = params["enc_layers"][0]["rel_b"]
    bias = _rel_bias(rel_b, pos, pos, bidirectional=True,
                     num_buckets=cfg.rel_buckets, max_distance=cfg.rel_max_dist)
    mask = jnp.ones((b, s, s), bool)
    for layer in params["enc_layers"]:
        h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
        b_, t = h.shape[:2]
        k = linear(h, layer["wk"]).reshape(b_, t, -1, cfg.head_dim).transpose(0, 2, 1, 3)
        v = linear(h, layer["wv"]).reshape(b_, t, -1, cfg.head_dim).transpose(0, 2, 1, 3)
        x = x + _t5_attn(layer, cfg, h, k, v, mask, bias)
        x = _t5_ffn(layer, cfg, x)
    return rms_norm(x, params["enc_out_norm"], cfg.norm_eps)


def cross_kv(params, cfg, enc_hidden: jax.Array):
    """Per-decoder-layer cross-attention K/V from the encoder output,
    computed once per encode (reference: llama_context cross state)."""
    b, s = enc_hidden.shape[:2]
    out = []
    for layer in params["dec_layers"]:
        k = linear(enc_hidden, layer["cross_wk"]).reshape(b, s, -1, cfg.head_dim).transpose(0, 2, 1, 3)
        v = linear(enc_hidden, layer["cross_wv"]).reshape(b, s, -1, cfg.head_dim).transpose(0, 2, 1, 3)
        out.append((k, v))
    return tuple(out)


def t5_decode(
    params,
    cfg,
    tokens: jax.Array,  # [B, T] decoder tokens
    positions: jax.Array,  # [B, T] absolute decoder positions
    ckv,  # cross_kv() result
    kv=None,  # KVCache over decoder layers (or None = full-sequence)
    *,
    logits_for: str = "all",
):
    """Returns (logits, kv).  Reference llm_build_t5_dec."""
    x = params["tok_emb"][tokens]
    b, t = tokens.shape
    rel_b = params["dec_layers"][0]["rel_b"]
    s_enc = ckv[0][0].shape[2]

    if kv is not None:
        s_self = kv.k[0].shape[2]
        k_pos = jnp.arange(s_self)
    else:
        s_self = t
        k_pos = positions[0]
    bias = _rel_bias(rel_b, positions[0], k_pos, bidirectional=False,
                     num_buckets=cfg.rel_buckets, max_distance=cfg.rel_max_dist)
    self_mask = k_pos[None, None, :] <= positions[:, :, None]  # causal
    cross_mask = jnp.ones((b, t, s_enc), bool)

    for il, layer in enumerate(params["dec_layers"]):
        h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
        k = linear(h, layer["wk"]).reshape(b, t, -1, cfg.head_dim)
        v = linear(h, layer["wv"]).reshape(b, t, -1, cfg.head_dim)
        if kv is not None:
            kv = kv.update(il, k, v, positions)
            k_all, v_all = kv.layer(il)
        else:
            k_all, v_all = k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
        x = x + _t5_attn(layer, cfg, h, k_all, v_all, self_mask, bias)

        h2 = rms_norm(x, layer["cross_attn_norm"], cfg.norm_eps)
        ck, cv = ckv[il]
        x = x + _t5_attn(layer, cfg, h2, ck, cv, cross_mask, None, prefix="cross_")
        x = _t5_ffn(layer, cfg, x)

    x = rms_norm(x, params["dec_out_norm"], cfg.norm_eps)
    if logits_for == "last":
        x = x[:, -1:, :]
    logits = linear(x, params["output"]).astype(jnp.float32)
    if logits.shape[-1] != cfg.vocab_size:
        logits = logits[..., : cfg.vocab_size]
    if cfg.logit_scale != 1.0:  # tied t5 scales by d_model^-0.5
        logits = logits * cfg.logit_scale
    return logits, kv
