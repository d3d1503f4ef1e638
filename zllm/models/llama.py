"""Llama-family transformer forward pass (functional JAX).

Covers the graph the reference builds in src/models/llama.cpp:4-160 (and
the shared pieces of src/llama-graph.cpp: build_ffn, build_moe_ffn,
build_attn): RMSNorm -> QKV(+bias) -> RoPE -> GQA attention -> SwiGLU FFN
(or MoE) with residuals, final norm, output head.  The same function
serves llama/mistral/tinyllama/qwen2(bias)/mixtral(MoE) GGUFs; per-arch
deviations (gemma's post-norms, softcaps, phi's partial rotary) hang off
ModelConfig flags.

Quantized weights arrive as QTensor planes; `linear` dispatches to the
fused Pallas dequant-matmul on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.attention import attention
from ..ops.layers import apply_rope, geglu, rms_norm, swiglu
from ..ops.linear import linear
from ..runtime.kvcache import KVCache


def lora_linear(layer: dict, key: str, x, bias=None):
    """linear() plus the low-rank adapter delta when `{key}.lora` is present
    (reference: build_lora_mm, src/llama-graph.h:675 — y += scale*(x@A)@B)."""
    y = linear(x, layer[key], bias)
    lora = layer.get(key + ".lora")
    if lora is not None:
        a, b, scale = lora
        y = y + scale * ((x @ a.astype(x.dtype)) @ b.astype(x.dtype))
    return y


def embed(params, cfg, tokens: jax.Array) -> jax.Array:
    x = params["tok_emb"][tokens]
    if cfg.arch.startswith("gemma"):
        x = x * jnp.asarray(cfg.n_embd**0.5, x.dtype)
    return x


def moe_ffn(layer, cfg, h: jax.Array) -> jax.Array:
    """Mixture-of-experts FFN (reference: build_moe_ffn,
    src/llama-graph.cpp:964-1140).  Dense-dispatch formulation: every
    expert runs, gated by the (renormalized) top-k router weights — exact
    for correctness; the sparse dispatch path comes with expert sharding."""
    moe = cfg.moe
    router = linear(h, layer["ffn_gate_inp"])  # [..., E]
    if moe.gate_func == "sigmoid":
        probs = jax.nn.sigmoid(router.astype(jnp.float32))
    else:
        probs = jax.nn.softmax(router.astype(jnp.float32), axis=-1)
    topv, topi = jax.lax.top_k(probs, moe.n_experts_used)
    if moe.norm_topk_prob:
        topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    # scatter the kept weights back to a dense [..., E] gate
    dense_gate = jnp.zeros_like(probs)
    dense_gate = jax.vmap(
        lambda g, i, v: g.at[i].set(v),
        in_axes=(0, 0, 0),
    )(dense_gate.reshape(-1, moe.n_experts), topi.reshape(-1, moe.n_experts_used), topv.reshape(-1, moe.n_experts_used))
    dense_gate = dense_gate.reshape(probs.shape)

    # experts: [E, K, N] stacked dense weights (quantized experts arrive
    # with the EP sharding work)
    gate_w, up_w, down_w = layer["ffn_gate_exps"], layer["ffn_up_exps"], layer["ffn_down_exps"]
    act = swiglu if cfg.act == "silu" else geglu
    ge = jnp.einsum("...k,ekf->...ef", h, gate_w)
    ue = jnp.einsum("...k,ekf->...ef", h, up_w)
    de = jnp.einsum("...ef,efk->...ek", act(ge, ue), down_w)
    out = jnp.einsum("...ek,...e->...k", de, dense_gate.astype(de.dtype))

    if "ffn_gate_shexp" in layer:
        sh = act(linear(h, layer["ffn_gate_shexp"]), linear(h, layer["ffn_up_shexp"]))
        out = out + linear(sh, layer["ffn_down_shexp"])
    return out.astype(h.dtype)


def forward(
    params,
    cfg,
    tokens: jax.Array,  # [B, T] int32
    positions: jax.Array,  # [B, T] int32 absolute positions
    kv: KVCache | None = None,
    *,
    logits_for: str = "all",  # "all" | "last"
    taps: dict | None = None,  # out-param: per-linear input activations
):
    """Returns (logits [B, T or 1, vocab] f32, updated kv).

    `taps`, when given a dict, receives each matmul's input activation
    keyed by GGUF tensor name — the analogue of the reference's eval
    callback (ggml_backend_sched_eval_callback, used by imatrix); the
    caller must return/consume them inside the same trace."""
    x = embed(params, cfg, tokens)
    scale = cfg.attn_scale if cfg.attn_scale else 1.0 / (cfg.head_dim**0.5)
    b, t = tokens.shape

    for il, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
        if taps is not None:
            taps[f"blk.{il}.attn_q.weight"] = h
        # head counts are derived from the (possibly tp-sharded) projections
        q = lora_linear(layer, "wq", h, layer.get("bq")).reshape(b, t, -1, cfg.head_dim)
        k = lora_linear(layer, "wk", h, layer.get("bk")).reshape(b, t, -1, cfg.head_dim)
        v = lora_linear(layer, "wv", h, layer.get("bv")).reshape(b, t, -1, cfg.head_dim)

        if "attn_q_norm" in layer:  # qwen3/olmo2-style per-head QK norm
            q = rms_norm(q, layer["attn_q_norm"], cfg.norm_eps)
            k = rms_norm(k, layer["attn_k_norm"], cfg.norm_eps)

        q = apply_rope(q, positions, cfg.rope)
        k = apply_rope(k, positions, cfg.rope)

        window = cfg.sliding_window if cfg.is_swa_layer(il) else 0
        if kv is not None:
            kv = kv.update(il, k, v, positions)
            k_all, v_all = kv.layer(il)  # [B, Hkv, S, D]
        else:
            k_all, v_all = k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)

        att = attention(
            q, k_all, v_all, positions, scale=scale,
            softcap=cfg.attn_logit_softcap, window=window,
            sinks=layer.get("attn_sinks"),
        )
        # under tensor parallelism wo carries a psum flag (zllm.parallel);
        # bias is added after the reduce
        att = att.reshape(b, t, -1)
        if taps is not None:
            taps[f"blk.{il}.attn_output.weight"] = att
        att = lora_linear(layer, "wo", att)
        if "bo" in layer:
            att = att + layer["bo"].astype(att.dtype)
        if "attn_post_norm" in layer:
            att = rms_norm(att, layer["attn_post_norm"], cfg.norm_eps)
        x = x + att

        h2 = rms_norm(x, layer["ffn_norm"], cfg.norm_eps)
        if taps is not None:
            taps[f"blk.{il}.ffn_gate.weight"] = h2
        if cfg.moe is not None and "ffn_gate_inp" in layer:
            ff = moe_ffn(layer, cfg, h2)
        else:
            act = swiglu if cfg.act == "silu" else geglu
            gu = act(lora_linear(layer, "ffn_gate", h2), lora_linear(layer, "ffn_up", h2))
            if taps is not None:
                taps[f"blk.{il}.ffn_down.weight"] = gu
            ff = lora_linear(layer, "ffn_down", gu)
        if "ffn_post_norm" in layer:
            ff = rms_norm(ff, layer["ffn_post_norm"], cfg.norm_eps)
        x = x + ff

    x = rms_norm(x, params["out_norm"], cfg.norm_eps)
    if taps is not None:
        taps["hidden"] = x  # final hidden states (embeddings/pooling)
    if logits_for == "last":
        x = x[:, -1:, :]
    logits = linear(x, params["output"]).astype(jnp.float32)
    if cfg.logit_scale != 1.0:
        logits = logits * cfg.logit_scale
    if cfg.final_logit_softcap > 0:
        logits = jnp.tanh(logits / cfg.final_logit_softcap) * cfg.final_logit_softcap
    return logits, kv
