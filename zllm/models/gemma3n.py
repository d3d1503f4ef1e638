"""gemma3n forward (AltUp + LAuReL + per-layer inputs + shared KV).

Reference: src/models/gemma3n-iswa.cpp (the MatFormer/AltUp graph) and HF
modeling_gemma3n.  The hidden state is a STACK of n_altup parallel
streams [A, B, T, D]: per layer, `predict` mixes the streams with
router-derived coefficients, the transformer block runs on the active
stream only, `correct` broadcasts the block's innovation back to every
stream, and a gated per-layer embedding (tok_embd_per_layer) is injected
into streams 1..A-1.  A low-rank LAuReL branch rides beside attention,
the first layers sparsify the FFN gate (gaussian top-k), and the last
`n_kv_shared` layers REUSE the KV written by the last earlier layer of
the same attention type (full/sliding) instead of projecting their own.

The KV cache is the standard per-layer KVCache; only layers below the
shared region write to it, shared layers read their source layer's slot,
so serving (continuous batching, context handling) works unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.attention import attention
from ..ops.layers import apply_rope, rms_norm
from ..ops.linear import linear


def _magnitude(x):
    # HF: sqrt(max(mean(x^2), eps)) — the reference's sum-of-squares form
    # differs only by a factor that cancels in the target/new ratio
    return jnp.sqrt(jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True), 1e-5))


def _gelu(x):
    return jax.nn.gelu(x.astype(jnp.float32), approximate=True).astype(x.dtype)


def _router_modalities(layer, cfg, x):
    """tanh(router(norm(x) / D)) — [B, T, A]."""
    r = rms_norm(x, layer["altup_router_norm"], cfg.norm_eps) / cfg.n_embd
    return jnp.tanh(linear(r, layer["altup_router"]).astype(jnp.float32)).astype(x.dtype)


def _altup_predict(layer, cfg, hs):
    """hs [A, B, T, D] -> predictions [A, B, T, D]."""
    a = cfg.altup.n_altup
    modalities = _router_modalities(layer, cfg, hs[cfg.altup.active_idx])
    coefs = linear(modalities, layer["altup_predict_coef"])  # [B, T, A*A]
    coefs = coefs.reshape(*modalities.shape[:-1], a, a).swapaxes(-1, -2)
    # HF: matmul(hs.permute(1,2,3,0) [B,T,D,A], coefs [B,T,A,A]) -> [B,T,D,A]
    pred = jnp.einsum("abtd,btae->ebtd", hs, coefs)
    return pred + hs


def _altup_correct(layer, cfg, predictions, activated):
    """predictions [A, B, T, D], activated [B, T, D] -> [A, B, T, D]."""
    modalities = _router_modalities(layer, cfg, activated)
    innovation = activated - predictions[cfg.altup.active_idx]  # [B, T, D]
    coefs = linear(modalities, layer["altup_correct_coef"]) + 1.0  # [B, T, A]
    corrected = innovation[None] * coefs.transpose(2, 0, 1)[..., None]
    return corrected + predictions


def _gaussian_topk(x, std_mul: float):
    """relu(x - (mean + std_mul * std)) over the FFN dim (activation
    sparsity).  HF uses the BIASED std (unbiased=False) — the reference's
    ggml graph divides by n-1, a small deviation from the HF model this
    implementation does not copy."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    std = jnp.sqrt(jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True))
    return jax.nn.relu(xf - (mean + std_mul * std)).astype(x.dtype)


def gemma3n_forward(
    params,
    cfg,
    tokens: jax.Array,  # [B, T]
    positions: jax.Array,  # [B, T]
    kv=None,
    *,
    logits_for: str = "all",
    taps: dict | None = None,
    ep_axis: str | None = None,
    stats: dict | None = None,
):
    """Returns (logits, kv) like llama.forward (dispatched from there)."""
    au = cfg.altup
    a = au.n_altup
    d = cfg.n_embd
    # gemma3n attends at scale 1.0 (reference hparams.f_attention_scale;
    # the per-head q-norm replaces the 1/sqrt(d) scaling)
    scale = cfg.attn_scale if cfg.attn_scale else 1.0

    h0 = params["tok_emb"][tokens] * jnp.asarray(d**0.5, params["tok_emb"].dtype)

    # per-layer inputs: scaled per-layer embeddings + projected h0
    per = au.per_layer_dim
    nl = cfg.n_layers
    pl_emb = params["plt_emb"][tokens].reshape(*tokens.shape, nl, per)
    pl_emb = pl_emb * jnp.asarray(per**0.5, pl_emb.dtype)
    pl_proj = linear(h0, params["pl_model_proj"]) * jnp.asarray(d**-0.5, h0.dtype)
    pl_proj = pl_proj.reshape(*tokens.shape, nl, per)
    pl_proj = rms_norm(pl_proj, params["pl_proj_norm"], cfg.norm_eps)
    per_layer_inputs = (pl_proj + pl_emb) * jnp.asarray(2.0**-0.5, h0.dtype)

    # replicate h0 into the altup streams with magnitude matching
    target = _magnitude(h0)
    streams = [h0]
    for i in range(a - 1):
        proj = jnp.einsum("btd,od->bto", h0, params["altup_proj"][i].astype(h0.dtype))
        streams.append(proj * target / _magnitude(proj))
    hs = jnp.stack(streams)  # [A, B, T, D]

    first_shared = nl - au.n_kv_shared
    # shared-KV sources: the LAST non-shared layer of each attention type
    # (reference llama-model.cpp:7548; HF kv_shared_layer_index)
    src_swa = max(i for i in range(first_shared) if cfg.is_swa_layer(i)) if au.n_kv_shared else -1
    src_full = max(i for i in range(first_shared) if not cfg.is_swa_layer(i)) if au.n_kv_shared else -1
    stash: dict = {}

    for il, layer in enumerate(params["layers"]):
        is_swa = cfg.is_swa_layer(il)
        window = cfg.sliding_window if is_swa else 0
        rope = cfg.rope_swa if (is_swa and cfg.rope_swa is not None) else cfg.rope

        predictions = _altup_predict(layer, cfg, hs)
        active = predictions[au.active_idx]
        act_n = rms_norm(active, layer["attn_norm"], cfg.norm_eps)

        laurel = linear(linear(act_n, layer["laurel_l"]), layer["laurel_r"])
        laurel = rms_norm(laurel, layer["laurel_post_norm"], cfg.norm_eps) + act_n

        b, t = act_n.shape[:2]
        q = linear(act_n, layer["wq"]).reshape(b, t, -1, cfg.head_dim)
        q = rms_norm(q, layer["attn_q_norm"], cfg.norm_eps)
        q = apply_rope(q, positions, rope)
        if il >= first_shared and au.n_kv_shared:
            src = src_swa if is_swa else src_full
            if kv is not None:
                k_all, v_all = kv.layer(src)
            else:
                k_all, v_all = stash[src]
        else:
            k = linear(act_n, layer["wk"]).reshape(b, t, -1, cfg.head_dim)
            k = rms_norm(k, layer["attn_k_norm"], cfg.norm_eps)
            k = apply_rope(k, positions, rope)
            v = linear(act_n, layer["wv"]).reshape(b, t, -1, cfg.head_dim)
            # v-norm is weightless (HF with_scale=False)
            v = rms_norm(v, jnp.ones((cfg.head_dim,), jnp.float32), cfg.norm_eps)
            if kv is not None:
                kv = kv.update(il, k, v, positions)
                k_all, v_all = kv.layer(il)
            else:
                k_all, v_all = k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
            if il in (src_swa, src_full):
                stash[il] = (k_all, v_all)
        att = attention(q, k_all, v_all, positions, scale=scale, window=window)
        att = linear(att.reshape(b, t, -1), layer["wo"])
        att = rms_norm(att, layer["attn_post_norm"], cfg.norm_eps)

        attn_gated = active + att
        attn_laurel = (attn_gated + laurel) * jnp.asarray(2.0**-0.5, att.dtype)

        ffn_in = rms_norm(attn_laurel, layer["ffn_norm"], cfg.norm_eps)
        gate = linear(ffn_in, layer["ffn_gate"])
        if il < len(au.sparsity) and au.sparsity[il] > 0:
            gate = _gaussian_topk(gate, au.sparsity[il])
        ff = _gelu(gate) * linear(ffn_in, layer["ffn_up"])
        ff = linear(ff, layer["ffn_down"])
        ff = rms_norm(ff, layer["ffn_post_norm"], cfg.norm_eps)
        activated = attn_laurel + ff

        corrected = _altup_correct(layer, cfg, predictions, activated)
        first = corrected[au.active_idx] * layer["altup_correct_scale"].astype(corrected.dtype)
        first = _gelu(linear(first, layer["pli_gate"]))
        first = first * per_layer_inputs[:, :, il, :]
        first = linear(first, layer["pli_proj"])
        first = rms_norm(first, layer["pli_post_norm"], cfg.norm_eps)
        hs = jnp.concatenate([corrected[:1], corrected[1:] + first[None]], axis=0)

    # unembed: magnitude-matched merge of the streams
    target = _magnitude(hs[0])
    outs = [hs[0]]
    for i in range(a - 1):
        proj = jnp.einsum("btd,od->bto", hs[i + 1],
                          params["altup_unembd_proj"][i].astype(hs.dtype))
        outs.append(proj * target / _magnitude(proj))
    x = sum(outs) / a

    x = rms_norm(x, params["out_norm"], cfg.norm_eps)
    if taps is not None:
        taps["hidden"] = x
    if logits_for == "last":
        x = x[:, -1:, :]
    logits = linear(x, params["output"]).astype(jnp.float32)
    if logits.shape[-1] != cfg.vocab_size:
        logits = logits[..., : cfg.vocab_size]
    if cfg.final_logit_softcap > 0:
        logits = jnp.tanh(logits / cfg.final_logit_softcap) * cfg.final_logit_softcap
    return logits, kv
