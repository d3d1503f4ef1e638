"""BERT-family encoder forward (embeddings + cross-encoder rerankers).

Reference: src/models/bert.cpp (token/type/position embeddings, post-LN
blocks, GELU FFN) and the pooling / rank classification head of
llm_graph_context::build_pooling (src/llama-graph.cpp:2080-2150).
Bidirectional attention, no KV cache — encoder batches are one-shot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.layers import apply_rope, layer_norm, rms_norm
from ..ops.linear import linear

# LLAMA_POOLING_TYPE_* (include/llama.h)
POOLING = {0: "none", 1: "mean", 2: "cls", 3: "last", 4: "rank"}


def bert_forward(
    params,
    cfg,
    tokens: jax.Array,  # [B, T] int32
    positions: jax.Array,  # [B, T] int32
    attn_mask: jax.Array | None = None,  # [B, T] 1=real token, 0=padding
) -> jax.Array:
    """-> last hidden states [B, T, K]."""
    b, t = tokens.shape
    x = params["tok_emb"][tokens]
    if "type_emb" in params:  # token types hardcoded to sentence A (row 0)
        x = x + params["type_emb"][0]
    if "pos_emb" in params:
        x = x + params["pos_emb"][positions]
    if "tok_norm" in params:  # neo-bert has no embedding norm
        x = layer_norm(x, params["tok_norm"], params.get("tok_norm_b"), cfg.norm_eps)

    scale = 1.0 / (cfg.head_dim**0.5)
    neg = jnp.asarray(-1e9, jnp.float32)
    if cfg.arch in ("modern-bert", "neo-bert"):
        return _prenorm_encoder_layers(params, cfg, x, positions, attn_mask,
                                       scale, neg)
    for layer in params["layers"]:
        q = linear(x, layer["wq"], layer.get("bq")).reshape(b, t, -1, cfg.head_dim)
        k = linear(x, layer["wk"], layer.get("bk")).reshape(b, t, -1, cfg.head_dim)
        v = linear(x, layer["wv"], layer.get("bv")).reshape(b, t, -1, cfg.head_dim)
        scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
        if attn_mask is not None:
            scores = scores + (1.0 - attn_mask[:, None, None, :].astype(jnp.float32)) * neg
        probs = jax.nn.softmax(scores, axis=-1)
        att = jnp.einsum("bhts,bshd->bthd", probs.astype(v.dtype), v).reshape(b, t, -1)
        att = linear(att, layer["wo"], layer.get("bo"))
        x = layer_norm(x + att, layer["attn_out_norm"], layer.get("attn_out_norm_b"), cfg.norm_eps)

        h = jax.nn.gelu(linear(x, layer["ffn_up"], layer.get("ffn_up_b")), approximate=False)
        f = linear(h, layer["ffn_down"], layer.get("ffn_down_b"))
        x = layer_norm(x + f, layer["layer_out_norm"], layer.get("layer_out_norm_b"), cfg.norm_eps)
    return x


def _prenorm_encoder_layers(params, cfg, x, positions, attn_mask, scale, neg):
    """ModernBERT / NeoBERT encoder blocks (reference
    src/models/modern-bert.cpp, neo-bert.cpp): PRE-norm bias-free blocks
    (LayerNorm for modern-bert — whose layer 0 carries no attn_norm, the
    embedding norm feeds it directly — RMS for neo-bert), fused wqkv,
    neox rope with a per-layer base (modern-bert local layers use
    rope.freq_base_swa), SYMMETRIC sliding window on local layers
    (|i-j| <= n_swa/2, llama-hparams.h LLAMA_SWA_TYPE_SYMMETRIC; every
    pattern-th layer global), fused [gate|up] GLU FFN (GEGLU for
    modern-bert, SwiGLU for neo-bert), and a final output norm
    (output_norm / neo-bert's enc.output_norm)."""
    b, t = x.shape[:2]
    if cfg.norm_kind == "layer":
        def nrm(a, w, wb):
            return layer_norm(a, w, wb, cfg.norm_eps)
    else:
        def nrm(a, w, wb):
            return rms_norm(a, w, cfg.norm_eps)
    gelu_glu = cfg.arch == "modern-bert"  # else SwiGLU (neo-bert)
    pad = (None if attn_mask is None
           else (1.0 - attn_mask[:, None, None, :].astype(jnp.float32)) * neg)
    win = None
    if cfg.sliding_window > 0:
        half = cfg.sliding_window // 2
        d = positions[:, :, None] - positions[:, None, :]  # [B, T, S]
        win = jnp.where((jnp.abs(d) > half)[:, None], neg, 0.0)
    for il, layer in enumerate(params["layers"]):
        swa = cfg.sliding_window > 0 and cfg.is_swa_layer(il)
        h = (nrm(x, layer["attn_norm"], layer.get("attn_norm_b"))
             if "attn_norm" in layer else x)
        # the fused Wqkv ships split by the loader (attn_qkv row split)
        q = linear(h, layer["wq"]).reshape(b, t, -1, cfg.head_dim)
        k = linear(h, layer["wk"]).reshape(b, t, -1, cfg.head_dim)
        v = linear(h, layer["wv"]).reshape(b, t, -1, cfg.head_dim)
        rp = cfg.rope_swa if (swa and cfg.rope_swa is not None) else cfg.rope
        q = apply_rope(q, positions, rp)
        k = apply_rope(k, positions, rp)
        if k.shape[2] != q.shape[2]:
            rep = q.shape[2] // k.shape[2]
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        s = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * scale
        if pad is not None:
            s = s + pad
        if swa and win is not None:
            s = s + win
        p = jax.nn.softmax(s, axis=-1)
        att = jnp.einsum("bhts,bshd->bthd", p.astype(v.dtype), v).reshape(b, t, -1)
        x = x + linear(att, layer["wo"])
        h2 = nrm(x, layer["ffn_norm"], layer.get("ffn_norm_b"))
        gu = linear(h2, layer["ffn_up"])
        half_f = gu.shape[-1] // 2
        gate = gu[..., :half_f].astype(jnp.float32)
        gate = (jax.nn.gelu(gate, approximate=True) if gelu_glu
                else jax.nn.silu(gate))
        x = x + linear(gate.astype(gu.dtype) * gu[..., half_f:], layer["ffn_down"])
    ow = params.get("out_norm", params.get("enc_out_norm"))
    return nrm(x, ow, params.get("out_norm_b"))


def pool(hidden: jax.Array, pooling: str, attn_mask: jax.Array | None = None) -> jax.Array:
    """[B, T, K] -> [B, K] per the model's pooling type."""
    if pooling == "mean":
        if attn_mask is None:
            return jnp.mean(hidden, axis=1)
        m = attn_mask[:, :, None].astype(hidden.dtype)
        return jnp.sum(hidden * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
    if pooling == "last":
        if attn_mask is None:
            return hidden[:, -1]
        idx = jnp.maximum(jnp.sum(attn_mask, axis=1).astype(jnp.int32) - 1, 0)
        return jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0]
    # cls / rank / default: first token
    return hidden[:, 0]


def rank_score(params, hidden: jax.Array) -> jax.Array:
    """Cross-encoder relevance score from the CLS position (reference
    LLAMA_POOLING_TYPE_RANK branch: optional pooler dense+tanh `cls`,
    then the `cls.output` projection to one logit)."""
    x = hidden[:, 0]
    if "cls_w" in params:
        x = jnp.tanh(linear(x, params["cls_w"], params.get("cls_b")))
    if "cls_out_w" in params:
        x = linear(x, params["cls_out_w"], params.get("cls_out_b"))
    return x[..., 0]
