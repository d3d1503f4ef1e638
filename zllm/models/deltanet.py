"""Gated DeltaNet linear attention (qwen3next).

The linear-attention mixer of the qwen3next hybrid stack (reference:
src/models/qwen3next.cpp build_layer_attn_linear + the chunked delta rule
build_delta_net_chunking; HF torch_recurrent_gated_delta_rule): a causal
depthwise conv over the concatenated q|k|v projections, l2-normalized
q/k, and the gated delta-rule recurrence

    S_t = S_{t-1} * exp(g_t) + k_t (beta_t * (v_t - S_{t-1}^T k_t))^T
    o_t = S_t^T q_t

with per-value-head decay g = ssm_a * softplus(a + dt_bias) (ssm_a is
-exp(A_log), baked at conversion) and write strength beta = sigmoid(b).
The state scan runs as ONE lax.scan over time with all heads/batch rows
vectorized — the TPU-idiomatic form of the reference's chunked ggml
graph; a chunked parallel formulation is a later optimization.

The full-attention layers of the stack carry an output gate: q_proj emits
[query | gate] interleaved per head, and sigmoid(gate) scales the
attention output before wo (qwen3next.cpp build_layer_attn).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.attention import attention
from ..ops.layers import apply_rope, rms_norm
from ..ops.linear import linear


def _l2norm(x, eps=1e-6):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def deltanet_layer(layer, cfg, h, conv_state, rec_state, lengths=None):
    """-> (y [B, T, K], conv_state' [B, conv_dim, d_conv-1],
    rec_state' [B, Hv, dk, dv]).  `lengths` freezes each row's state after
    its valid prefix (mixed prefill+decode batching)."""
    ssm = cfg.ssm
    b, t, _ = h.shape
    hk = ssm.n_group  # linear_num_key_heads
    hv = ssm.dt_rank  # linear_num_value_heads
    dk = ssm.d_state  # linear_key_head_dim
    dv = ssm.d_inner // hv  # linear_value_head_dim
    key_dim, val_dim = hk * dk, hv * dv

    qkv = linear(h, layer["ssm_qkv"]).astype(jnp.float32)  # [B, T, 2*key+val]
    z = linear(h, layer["ssm_z"]).astype(jnp.float32)  # [B, T, val_dim]
    ba = linear(h, layer["ssm_ba"]).astype(jnp.float32)  # [B, T, 2*Hv] (b|a)
    bb, aa = ba[..., :hv], ba[..., hv:]

    # causal depthwise conv over channels with carried tail state
    w = layer["ssm_conv1d"].astype(jnp.float32)  # [conv_dim, d_conv]
    dconv = w.shape[1]
    xc = qkv.transpose(0, 2, 1)  # [B, C, T]
    full = jnp.concatenate([conv_state.astype(jnp.float32), xc], axis=2)
    out = jnp.zeros_like(xc)
    for j in range(dconv):
        out = out + w[None, :, j : j + 1] * full[:, :, j : j + t]
    qkv = jax.nn.silu(out).transpose(0, 2, 1)  # [B, T, C]
    if lengths is None:
        new_conv = full[:, :, t:]
    else:
        # freeze the tail at each row's last valid token
        idx = jnp.arange(dconv - 1)[None, :] + lengths[:, None]
        new_conv = jnp.take_along_axis(full, idx[:, None, :].astype(jnp.int32), axis=2)

    q = qkv[..., :key_dim].reshape(b, t, hk, dk)
    k = qkv[..., key_dim : 2 * key_dim].reshape(b, t, hk, dk)
    v = qkv[..., 2 * key_dim :].reshape(b, t, hv, dv)
    q = _l2norm(q) * dk**-0.5
    k = _l2norm(k)
    if hv != hk:  # repeat k-heads across the value-head group
        q = jnp.repeat(q, hv // hk, axis=2)
        k = jnp.repeat(k, hv // hk, axis=2)

    beta = jax.nn.sigmoid(bb)  # [B, T, Hv]
    g = layer["ssm_a"].astype(jnp.float32) * jax.nn.softplus(
        aa + layer["ssm_dt_b"].astype(jnp.float32)
    )  # [B, T, Hv]; ssm_a = -exp(A_log) baked at conversion

    valid = None
    if lengths is not None:
        valid = (jnp.arange(t)[None, :] < lengths[:, None])  # [B, T]

    def step(S, inp):
        q_t, k_t, v_t, g_t, b_t, v_ok = inp  # [B, Hv, d*] / [B, Hv] / [B]
        S_new = S * jnp.exp(g_t)[..., None, None]
        kv_mem = jnp.einsum("bhkv,bhk->bhv", S_new, k_t)
        delta = (v_t - kv_mem) * b_t[..., None]
        S_new = S_new + jnp.einsum("bhk,bhv->bhkv", k_t, delta)
        o_t = jnp.einsum("bhkv,bhk->bhv", S_new, q_t)
        if v_ok is not None:
            S_new = jnp.where(v_ok[:, None, None, None], S_new, S)
        return S_new, o_t

    xs = (
        q.transpose(1, 0, 2, 3), k.transpose(1, 0, 2, 3), v.transpose(1, 0, 2, 3),
        g.transpose(1, 0, 2), beta.transpose(1, 0, 2),
        valid.transpose(1, 0) if valid is not None else jnp.ones((t, b), bool),
    )
    S0 = rec_state.astype(jnp.float32)
    S, outs = jax.lax.scan(step, S0, xs)  # outs [T, B, Hv, dv]
    out = outs.transpose(1, 0, 2, 3)  # [B, T, Hv, dv]

    # gated RMS norm per value head (weight NOT zero-centered —
    # linear_attn.norm is excluded from the +1 conversion), silu(z) gate
    zg = z.reshape(b, t, hv, dv)
    out = rms_norm(out, layer["ssm_norm"], cfg.norm_eps) * jax.nn.silu(zg)
    y = linear(out.reshape(b, t, val_dim).astype(h.dtype), layer["ssm_out"])
    return y, new_conv.astype(conv_state.dtype), S.astype(rec_state.dtype)


def gated_attn_layer(layer, cfg, x, positions, kv, il, taps=None):
    """qwen3next full-attention layer: per-head [query | gate] in wq,
    zero-centered per-head q/k norms (+1 baked at conversion), partial
    neox rope, sigmoid(gate)-scaled attention output
    (reference qwen3next.cpp build_layer_attn)."""
    h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
    b, t = h.shape[:2]
    d = cfg.head_dim
    qg = linear(h, layer["wq"]).reshape(b, t, -1, 2 * d)
    q, gate = qg[..., :d], qg[..., d:]
    k = linear(h, layer["wk"]).reshape(b, t, -1, d)
    v = linear(h, layer["wv"]).reshape(b, t, -1, d)
    q = rms_norm(q, layer["attn_q_norm"], cfg.norm_eps)
    k = rms_norm(k, layer["attn_k_norm"], cfg.norm_eps)
    q = apply_rope(q, positions, cfg.rope)
    k = apply_rope(k, positions, cfg.rope)
    if kv is not None:
        kv = kv.update(il, k, v, positions)
        k_all, v_all = kv.layer(il)
    else:
        k_all, v_all = k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
    scale = cfg.attn_scale if cfg.attn_scale else 1.0 / d**0.5
    att = attention(q, k_all, v_all, positions, scale=scale)
    att = att * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(att.dtype)
    att = linear(att.reshape(b, t, -1), layer["wo"])
    return x + att, kv
