"""Arch wave 5, batch 1 (no offline HF classes): deepseek v1, grok,
arctic, smallthinker, bailingmoe v1/v2, exaone, jais — verified against a
direct numpy implementation of each reference graph (src/models/*.cpp)
or by cross-conversion equivalence where the graph is an exact llama
clone (exaone; bailingmoe v1 vs deepseek)."""

import numpy as np
import pytest

from zllm.gguf.constants import GGMLType

H, NH, NKV, HD, F, V, NL = 64, 4, 2, 16, 48, 149, 2


def _w(rng, *shape):
    return (rng.standard_normal(shape) * 0.05).astype(np.float32)


def _rms(x, w, eps=1e-6):
    x = x.astype(np.float64)
    return x / np.sqrt(np.mean(x * x, axis=-1, keepdims=True) + eps) * w


def _ln(x, w, b, eps=1e-5):
    x = x.astype(np.float64)
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _neox_rope(x, pos, n_rot, theta):
    """x [T, H, D]: HF rotate_half over the first n_rot dims."""
    t, nh, d = x.shape
    half = n_rot // 2
    inv = theta ** (-np.arange(half) * 2.0 / n_rot)
    ang = pos[:, None] * inv[None, :]
    cos, sin = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
    x1, x2, tail = x[..., :half], x[..., half:n_rot], x[..., n_rot:]
    return np.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos, tail], axis=-1)


def _silu(x):
    return x / (1.0 + np.exp(-x))


def _gelu_tanh(x):
    return 0.5 * x * (1.0 + np.tanh(0.7978845608028654 * (x + 0.044715 * x**3)))


def _attn(q, k, v, scale, softcap=0.0, alibi=None, window=0):
    """q [T, NH, D], k/v [T, NKV, D] causal -> [T, NH*D]."""
    t, nh, d = q.shape
    g = nh // k.shape[1]
    kk = np.repeat(k, g, axis=1)
    vv = np.repeat(v, g, axis=1)
    s = np.einsum("thd,shd->hts", q, kk) * scale
    if softcap:
        s = softcap * np.tanh(s / softcap)
    if alibi is not None:
        s = s + alibi[:, None, None] * np.arange(t)[None, None, :]
    mask = np.tril(np.ones((t, t), bool))
    if window > 0:
        mask &= (np.arange(t)[:, None] - np.arange(t)[None, :]) < window
    s = np.where(mask[None], s, -np.inf)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("hts,shd->thd", p, vv).reshape(t, nh * d)


def _moe(x, rx, lw, ne, topk, gate_func, norm_topk, act, scale=1.0,
         softcap=0.0, bias=None):
    """x: [T, H] ffn input, rx: router input, lw: layer weight dict."""
    t = x.shape[0]
    logits = rx @ lw["router"].T
    if softcap:
        logits = softcap * np.tanh(logits / softcap)
    if gate_func == "sigmoid":
        probs = 1.0 / (1.0 + np.exp(-logits))
    else:
        e = np.exp(logits - logits.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
    sel = probs + bias[None] if bias is not None else probs
    out = np.zeros_like(x)
    for ti in range(t):
        idx = np.argsort(-sel[ti])[:topk]
        wts = probs[ti, idx]
        if norm_topk:
            wts = wts / wts.sum()
        wts = wts * scale
        for e_i, wt in zip(idx, wts):
            ge = x[ti] @ lw["gate"][e_i].T
            ue = x[ti] @ lw["up"][e_i].T
            out[ti] += wt * (act(ge) * ue) @ lw["down"][e_i].T
    return out


@pytest.fixture()
def toks():
    return np.random.default_rng(7).integers(0, V, (1, 10)).astype(np.int32)


def _logits(path, toks, hybrid=False):
    import jax
    import jax.numpy as jnp

    from zllm.models.llama import forward
    from zllm.models.loader import Model

    m = Model.load(path, quantized=False, dtype=jnp.float32)
    pos = np.broadcast_to(np.arange(toks.shape[1], dtype=np.int32), toks.shape)
    fwd = jax.jit(lambda p, t, q: forward(p, m.cfg, t, q, None)[0])
    return np.asarray(fwd(m.params, jnp.asarray(toks), jnp.asarray(pos)))


# ---------------------------------------------------------------------------
# deepseek v1 (reference src/models/deepseek.cpp): llama attention +
# softmax MoE with shared experts and leading dense layers
# ---------------------------------------------------------------------------

def test_deepseek_v1_matches_numpy_spec(tmp_path, toks):
    from zllm.convert import convert_hf_llama

    rng = np.random.default_rng(0)
    ne, topk, nsh, fx = 4, 2, 2, 32
    cfg = dict(vocab_size=V, hidden_size=H, intermediate_size=F,
               num_hidden_layers=NL, num_attention_heads=NH,
               num_key_value_heads=NKV, max_position_embeddings=128,
               rms_norm_eps=1e-6, rope_theta=10000.0,
               n_routed_experts=ne, num_experts_per_tok=topk,
               moe_intermediate_size=fx, n_shared_experts=nsh,
               first_k_dense_replace=1, scoring_func="softmax",
               norm_topk_prob=False, tie_word_embeddings=False)
    sd = {"model.embed_tokens.weight": _w(rng, V, H),
          "model.norm.weight": _w(rng, H) + 1.0,
          "lm_head.weight": _w(rng, V, H)}
    for il in range(NL):
        p = f"model.layers.{il}."
        sd[p + "input_layernorm.weight"] = _w(rng, H) + 1.0
        sd[p + "post_attention_layernorm.weight"] = _w(rng, H) + 1.0
        sd[p + "self_attn.q_proj.weight"] = _w(rng, NH * HD, H)
        sd[p + "self_attn.k_proj.weight"] = _w(rng, NKV * HD, H)
        sd[p + "self_attn.v_proj.weight"] = _w(rng, NKV * HD, H)
        sd[p + "self_attn.o_proj.weight"] = _w(rng, H, NH * HD)
        if il == 0:  # leading dense layer
            sd[p + "mlp.gate_proj.weight"] = _w(rng, F, H)
            sd[p + "mlp.up_proj.weight"] = _w(rng, F, H)
            sd[p + "mlp.down_proj.weight"] = _w(rng, H, F)
        else:
            sd[p + "mlp.gate.weight"] = _w(rng, ne, H)
            for e in range(ne):
                q = f"{p}mlp.experts.{e}."
                sd[q + "gate_proj.weight"] = _w(rng, fx, H)
                sd[q + "up_proj.weight"] = _w(rng, fx, H)
                sd[q + "down_proj.weight"] = _w(rng, H, fx)
            sd[p + "mlp.shared_experts.gate_proj.weight"] = _w(rng, fx * nsh, H)
            sd[p + "mlp.shared_experts.up_proj.weight"] = _w(rng, fx * nsh, H)
            sd[p + "mlp.shared_experts.down_proj.weight"] = _w(rng, H, fx * nsh)

    # numpy spec
    t = toks.shape[1]
    pos = np.arange(t)
    x = sd["model.embed_tokens.weight"][toks[0]].astype(np.float64)
    for il in range(NL):
        p = f"model.layers.{il}."
        h = _rms(x, sd[p + "input_layernorm.weight"])
        q = (h @ sd[p + "self_attn.q_proj.weight"].T).reshape(t, NH, HD)
        k = (h @ sd[p + "self_attn.k_proj.weight"].T).reshape(t, NKV, HD)
        v = (h @ sd[p + "self_attn.v_proj.weight"].T).reshape(t, NKV, HD)
        q = _neox_rope(q, pos, HD, 10000.0)
        k = _neox_rope(k, pos, HD, 10000.0)
        x = x + _attn(q, k, v, HD**-0.5) @ sd[p + "self_attn.o_proj.weight"].T
        h2 = _rms(x, sd[p + "post_attention_layernorm.weight"])
        if il == 0:
            ff = (_silu(h2 @ sd[p + "mlp.gate_proj.weight"].T)
                  * (h2 @ sd[p + "mlp.up_proj.weight"].T)) @ sd[p + "mlp.down_proj.weight"].T
        else:
            lw = dict(router=sd[p + "mlp.gate.weight"],
                      gate=np.stack([sd[f"{p}mlp.experts.{e}.gate_proj.weight"] for e in range(ne)]),
                      up=np.stack([sd[f"{p}mlp.experts.{e}.up_proj.weight"] for e in range(ne)]),
                      down=np.stack([sd[f"{p}mlp.experts.{e}.down_proj.weight"] for e in range(ne)]))
            ff = _moe(h2, h2, lw, ne, topk, "softmax", False, _silu)
            ff = ff + (_silu(h2 @ sd[p + "mlp.shared_experts.gate_proj.weight"].T)
                       * (h2 @ sd[p + "mlp.shared_experts.up_proj.weight"].T)
                       ) @ sd[p + "mlp.shared_experts.down_proj.weight"].T
        x = x + ff
    want = _rms(x, sd["model.norm.weight"]) @ sd["lm_head.weight"].T

    path = str(tmp_path / "ds.gguf")
    convert_hf_llama(sd, cfg, path, arch="deepseek", gtype=GGMLType.F32)
    got = _logits(path, toks)
    np.testing.assert_allclose(got[0], want, rtol=3e-4, atol=3e-5)


# ---------------------------------------------------------------------------
# grok (reference src/models/grok.cpp): sandwich norms, gelu MoE (+
# grok-2 parallel dense scaled sqrt(2)/2), attn/router soft-caps, scales
# ---------------------------------------------------------------------------

def test_grok_matches_numpy_spec(tmp_path, toks):
    from zllm.convert import convert_hf_llama

    rng = np.random.default_rng(1)
    ne, topk = 4, 2
    emb_scale, out_scale, attn_mult = 2.0, 0.25, 0.2
    cfg = dict(vocab_size=V, hidden_size=H, intermediate_size=F,
               num_hidden_layers=NL, num_attention_heads=NH,
               num_key_value_heads=NKV, head_dim=HD,
               max_position_embeddings=128, rms_norm_eps=1e-6,
               rope_theta=10000.0, num_local_experts=ne,
               num_experts_per_tok=topk, moe_intermediate_size=F,
               attn_logit_softcapping=30.0, router_logit_softcapping=30.0,
               attn_output_multiplier=attn_mult,
               embedding_multiplier_scale=emb_scale,
               output_multiplier_scale=out_scale, tie_word_embeddings=False)
    sd = {"model.embed_tokens.weight": _w(rng, V, H),
          "model.norm.weight": _w(rng, H) + 1.0,
          "lm_head.weight": _w(rng, V, H)}
    for il in range(NL):
        p = f"model.layers.{il}."
        sd[p + "pre_attn_norm.weight"] = _w(rng, H) + 1.0
        sd[p + "post_attn_norm.weight"] = _w(rng, H) + 1.0
        sd[p + "pre_moe_norm.weight"] = _w(rng, H) + 1.0
        sd[p + "post_moe_norm.weight"] = _w(rng, H) + 1.0
        sd[p + "self_attn.q_proj.weight"] = _w(rng, NH * HD, H)
        sd[p + "self_attn.k_proj.weight"] = _w(rng, NKV * HD, H)
        sd[p + "self_attn.v_proj.weight"] = _w(rng, NKV * HD, H)
        sd[p + "self_attn.o_proj.weight"] = _w(rng, H, NH * HD)
        sd[p + "block_sparse_moe.gate.weight"] = _w(rng, ne, H)
        for e in range(ne):
            q = f"{p}block_sparse_moe.experts.{e}."
            sd[q + "w1.weight"] = _w(rng, F, H)  # gate
            sd[q + "w2.weight"] = _w(rng, H, F)  # down
            sd[q + "w3.weight"] = _w(rng, F, H)  # up
        if il == 1:  # grok-2 parallel dense ffn on one layer
            sd[p + "mlp.gate_proj.weight"] = _w(rng, F, H)
            sd[p + "mlp.up_proj.weight"] = _w(rng, F, H)
            sd[p + "mlp.down_proj.weight"] = _w(rng, H, F)

    t = toks.shape[1]
    pos = np.arange(t)
    x = sd["model.embed_tokens.weight"][toks[0]].astype(np.float64) * emb_scale
    for il in range(NL):
        p = f"model.layers.{il}."
        h = _rms(x, sd[p + "pre_attn_norm.weight"])
        q = (h @ sd[p + "self_attn.q_proj.weight"].T).reshape(t, NH, HD)
        k = (h @ sd[p + "self_attn.k_proj.weight"].T).reshape(t, NKV, HD)
        v = (h @ sd[p + "self_attn.v_proj.weight"].T).reshape(t, NKV, HD)
        q = _neox_rope(q, pos, HD, 10000.0)
        k = _neox_rope(k, pos, HD, 10000.0)
        att = _attn(q, k, v, attn_mult, softcap=30.0) @ sd[p + "self_attn.o_proj.weight"].T
        x = x + _rms(att, sd[p + "post_attn_norm.weight"])
        h2 = _rms(x, sd[p + "pre_moe_norm.weight"])
        lw = dict(router=sd[p + "block_sparse_moe.gate.weight"],
                  gate=np.stack([sd[f"{p}block_sparse_moe.experts.{e}.w1.weight"] for e in range(ne)]),
                  up=np.stack([sd[f"{p}block_sparse_moe.experts.{e}.w3.weight"] for e in range(ne)]),
                  down=np.stack([sd[f"{p}block_sparse_moe.experts.{e}.w2.weight"] for e in range(ne)]))
        ff = _moe(h2, h2, lw, ne, topk, "softmax", True, _gelu_tanh, softcap=30.0)
        if p + "mlp.gate_proj.weight" in sd:
            dense = (_gelu_tanh(h2 @ sd[p + "mlp.gate_proj.weight"].T)
                     * (h2 @ sd[p + "mlp.up_proj.weight"].T)) @ sd[p + "mlp.down_proj.weight"].T
            ff = (ff + dense) * np.sqrt(2.0) / 2.0
        x = x + _rms(ff, sd[p + "post_moe_norm.weight"])
    want = (_rms(x, sd["model.norm.weight"]) @ sd["lm_head.weight"].T) * out_scale

    path = str(tmp_path / "grok.gguf")
    convert_hf_llama(sd, cfg, path, arch="grok", gtype=GGMLType.F32)
    got = _logits(path, toks)
    np.testing.assert_allclose(got[0], want, rtol=3e-4, atol=3e-5)


# ---------------------------------------------------------------------------
# arctic (reference src/models/arctic.cpp): dense ffn + parallel residual
# MoE fed from the raw layer input through its own norm
# ---------------------------------------------------------------------------

def test_arctic_matches_numpy_spec(tmp_path, toks):
    from zllm.convert import convert_hf_llama

    rng = np.random.default_rng(2)
    ne, topk = 4, 2
    cfg = dict(vocab_size=V, hidden_size=H, intermediate_size=F,
               num_hidden_layers=NL, num_attention_heads=NH,
               num_key_value_heads=NKV, max_position_embeddings=128,
               rms_norm_eps=1e-6, rope_theta=10000.0, num_local_experts=ne,
               num_experts_per_tok=topk, tie_word_embeddings=False)
    sd = {"model.embed_tokens.weight": _w(rng, V, H),
          "model.norm.weight": _w(rng, H) + 1.0,
          "lm_head.weight": _w(rng, V, H)}
    for il in range(NL):
        p = f"model.layers.{il}."
        sd[p + "input_layernorm.weight"] = _w(rng, H) + 1.0
        sd[p + "residual_layernorm.weight"] = _w(rng, H) + 1.0
        sd[p + "post_attention_layernorm.weight"] = _w(rng, H) + 1.0
        sd[p + "self_attn.q_proj.weight"] = _w(rng, NH * HD, H)
        sd[p + "self_attn.k_proj.weight"] = _w(rng, NKV * HD, H)
        sd[p + "self_attn.v_proj.weight"] = _w(rng, NKV * HD, H)
        sd[p + "self_attn.o_proj.weight"] = _w(rng, H, NH * HD)
        sd[p + "residual_mlp.w1.weight"] = _w(rng, F, H)  # gate
        sd[p + "residual_mlp.w3.weight"] = _w(rng, F, H)  # up
        sd[p + "residual_mlp.w2.weight"] = _w(rng, H, F)  # down
        sd[p + "block_sparse_moe.gate.weight"] = _w(rng, ne, H)
        for e in range(ne):
            q = f"{p}block_sparse_moe.experts.{e}."
            sd[q + "w1.weight"] = _w(rng, F, H)
            sd[q + "w2.weight"] = _w(rng, H, F)
            sd[q + "w3.weight"] = _w(rng, F, H)

    t = toks.shape[1]
    pos = np.arange(t)
    x = sd["model.embed_tokens.weight"][toks[0]].astype(np.float64)
    for il in range(NL):
        p = f"model.layers.{il}."
        x_in = x
        h = _rms(x, sd[p + "input_layernorm.weight"])
        q = (h @ sd[p + "self_attn.q_proj.weight"].T).reshape(t, NH, HD)
        k = (h @ sd[p + "self_attn.k_proj.weight"].T).reshape(t, NKV, HD)
        v = (h @ sd[p + "self_attn.v_proj.weight"].T).reshape(t, NKV, HD)
        q = _neox_rope(q, pos, HD, 10000.0)
        k = _neox_rope(k, pos, HD, 10000.0)
        x = x + _attn(q, k, v, HD**-0.5) @ sd[p + "self_attn.o_proj.weight"].T
        h2 = _rms(x, sd[p + "residual_layernorm.weight"])
        dense = (_silu(h2 @ sd[p + "residual_mlp.w1.weight"].T)
                 * (h2 @ sd[p + "residual_mlp.w3.weight"].T)) @ sd[p + "residual_mlp.w2.weight"].T
        moe_h = _rms(x_in, sd[p + "post_attention_layernorm.weight"])
        lw = dict(router=sd[p + "block_sparse_moe.gate.weight"],
                  gate=np.stack([sd[f"{p}block_sparse_moe.experts.{e}.w1.weight"] for e in range(ne)]),
                  up=np.stack([sd[f"{p}block_sparse_moe.experts.{e}.w3.weight"] for e in range(ne)]),
                  down=np.stack([sd[f"{p}block_sparse_moe.experts.{e}.w2.weight"] for e in range(ne)]))
        x = x + dense + _moe(moe_h, moe_h, lw, ne, topk, "softmax", True, _silu)
    want = _rms(x, sd["model.norm.weight"]) @ sd["lm_head.weight"].T

    path = str(tmp_path / "arctic.gguf")
    convert_hf_llama(sd, cfg, path, arch="arctic", gtype=GGMLType.F32)
    got = _logits(path, toks)
    np.testing.assert_allclose(got[0], want, rtol=3e-4, atol=3e-5)


# ---------------------------------------------------------------------------
# smallthinker (reference src/models/smallthinker.cpp): MoE routed on the
# RAW layer input, gated-relu experts, dense-first SWA + NoPE pattern
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("swa", [False, True], ids=["noswa", "swa"])
def test_smallthinker_matches_numpy_spec(tmp_path, toks, swa):
    from zllm.convert import convert_hf_llama

    rng = np.random.default_rng(3)
    ne, topk, nl = 4, 2, 4 if swa else NL
    window = 4
    cfg = dict(vocab_size=V, hidden_size=H, intermediate_size=F,
               num_hidden_layers=nl, num_attention_heads=NH,
               num_key_value_heads=NKV, max_position_embeddings=128,
               rms_norm_eps=1e-6, rope_theta=10000.0,
               moe_num_primary_experts=ne, moe_num_active_primary_experts=topk,
               moe_ffn_hidden_size=F, moe_primary_router_apply_softmax=False,
               tie_word_embeddings=False)
    if swa:
        cfg["sliding_window_size"] = window
        cfg["sliding_window_layout"] = [0 if i % 4 == 0 else 1 for i in range(nl)]
    sd = {"model.embed_tokens.weight": _w(rng, V, H),
          "model.norm.weight": _w(rng, H) + 1.0,
          "lm_head.weight": _w(rng, V, H)}
    for il in range(nl):
        p = f"model.layers.{il}."
        sd[p + "input_layernorm.weight"] = _w(rng, H) + 1.0
        sd[p + "post_attention_layernorm.weight"] = _w(rng, H) + 1.0
        sd[p + "self_attn.q_proj.weight"] = _w(rng, NH * HD, H)
        sd[p + "self_attn.k_proj.weight"] = _w(rng, NKV * HD, H)
        sd[p + "self_attn.v_proj.weight"] = _w(rng, NKV * HD, H)
        sd[p + "self_attn.o_proj.weight"] = _w(rng, H, NH * HD)
        sd[p + "block_sparse_moe.primary_router.weight"] = _w(rng, ne, H)
        for e in range(ne):
            q = f"{p}block_sparse_moe.experts.{e}."
            sd[q + "gate.weight"] = _w(rng, F, H)
            sd[q + "up.weight"] = _w(rng, F, H)
            sd[q + "down.weight"] = _w(rng, H, F)

    relu = lambda z: np.maximum(z, 0.0)
    t = toks.shape[1]
    pos = np.arange(t)
    x = sd["model.embed_tokens.weight"][toks[0]].astype(np.float64)
    for il in range(nl):
        p = f"model.layers.{il}."
        x_in = x
        h = _rms(x, sd[p + "input_layernorm.weight"])
        q = (h @ sd[p + "self_attn.q_proj.weight"].T).reshape(t, NH, HD)
        k = (h @ sd[p + "self_attn.k_proj.weight"].T).reshape(t, NKV, HD)
        v = (h @ sd[p + "self_attn.v_proj.weight"].T).reshape(t, NKV, HD)
        full = il % 4 == 0  # dense-first pattern
        use_rope = not (swa and full)
        win = 0 if (not swa or full) else window
        if use_rope:
            q = _neox_rope(q, pos, HD, 10000.0)
            k = _neox_rope(k, pos, HD, 10000.0)
        x = x + _attn(q, k, v, HD**-0.5, window=win) @ sd[p + "self_attn.o_proj.weight"].T
        h2 = _rms(x, sd[p + "post_attention_layernorm.weight"])
        lw = dict(router=sd[p + "block_sparse_moe.primary_router.weight"],
                  gate=np.stack([sd[f"{p}block_sparse_moe.experts.{e}.gate.weight"] for e in range(ne)]),
                  up=np.stack([sd[f"{p}block_sparse_moe.experts.{e}.up.weight"] for e in range(ne)]),
                  down=np.stack([sd[f"{p}block_sparse_moe.experts.{e}.down.weight"] for e in range(ne)]))
        x = x + _moe(h2, x_in, lw, ne, topk, "sigmoid", True, relu)
    want = _rms(x, sd["model.norm.weight"]) @ sd["lm_head.weight"].T

    path = str(tmp_path / "st.gguf")
    convert_hf_llama(sd, cfg, path, arch="smallthinker", gtype=GGMLType.F32)
    got = _logits(path, toks)
    np.testing.assert_allclose(got[0], want, rtol=3e-4, atol=3e-5)


# ---------------------------------------------------------------------------
# bailingmoe2 (reference src/models/bailingmoe2.cpp): neox partial rope,
# per-head q/k RMS norms, sigmoid router + selection bias + shared expert
# ---------------------------------------------------------------------------

def test_bailingmoe2_matches_numpy_spec(tmp_path, toks):
    from zllm.convert.hf import convert_hf_bailingmoe

    rng = np.random.default_rng(4)
    ne, topk, fx = 4, 2, 32
    n_rot = HD // 2
    cfg = dict(vocab_size=V, hidden_size=H, intermediate_size=F,
               num_hidden_layers=NL, num_attention_heads=NH,
               num_key_value_heads=NKV, head_dim=HD,
               partial_rotary_factor=0.5,
               max_position_embeddings=128, rms_norm_eps=1e-6,
               rope_theta=10000.0, num_experts=ne, num_experts_per_tok=topk,
               moe_intermediate_size=fx, num_shared_experts=1,
               moe_shared_expert_intermediate_size=fx,
               first_k_dense_replace=1, scoring_func="sigmoid",
               norm_topk_prob=True, routed_scaling_factor=1.5,
               num_nextn_predict_layers=0, tie_word_embeddings=False)
    sd = {"model.word_embeddings.weight": _w(rng, V, H),
          "model.norm.weight": _w(rng, H) + 1.0,
          "lm_head.weight": _w(rng, V, H)}
    for il in range(NL):
        p = f"model.layers.{il}."
        sd[p + "input_layernorm.weight"] = _w(rng, H) + 1.0
        sd[p + "post_attention_layernorm.weight"] = _w(rng, H) + 1.0
        qkv = _w(rng, (NH + 2 * NKV) * HD, H)
        sd[p + "attention.query_key_value.weight"] = qkv
        sd[p + "attention.dense.weight"] = _w(rng, H, NH * HD)
        sd[p + "attention.query_layernorm.weight"] = _w(rng, HD) + 1.0
        sd[p + "attention.key_layernorm.weight"] = _w(rng, HD) + 1.0
        if il == 0:
            sd[p + "mlp.gate_proj.weight"] = _w(rng, F, H)
            sd[p + "mlp.up_proj.weight"] = _w(rng, F, H)
            sd[p + "mlp.down_proj.weight"] = _w(rng, H, F)
        else:
            sd[p + "mlp.gate.weight"] = _w(rng, ne, H)
            sd[p + "mlp.gate.e_score_correction_bias"] = _w(rng, ne)
            for e in range(ne):
                q = f"{p}mlp.experts.{e}."
                sd[q + "gate_proj.weight"] = _w(rng, fx, H)
                sd[q + "up_proj.weight"] = _w(rng, fx, H)
                sd[q + "down_proj.weight"] = _w(rng, H, fx)
            sd[p + "mlp.shared_experts.gate_proj.weight"] = _w(rng, fx, H)
            sd[p + "mlp.shared_experts.up_proj.weight"] = _w(rng, fx, H)
            sd[p + "mlp.shared_experts.down_proj.weight"] = _w(rng, H, fx)

    t = toks.shape[1]
    pos = np.arange(t)
    x = sd["model.word_embeddings.weight"][toks[0]].astype(np.float64)
    for il in range(NL):
        p = f"model.layers.{il}."
        h = _rms(x, sd[p + "input_layernorm.weight"])
        qkv = h @ sd[p + "attention.query_key_value.weight"].T
        qd, kvd = NH * HD, NKV * HD
        q = qkv[:, :qd].reshape(t, NH, HD)
        k = qkv[:, qd:qd + kvd].reshape(t, NKV, HD)
        v = qkv[:, qd + kvd:].reshape(t, NKV, HD)
        q = _rms(q, sd[p + "attention.query_layernorm.weight"])
        k = _rms(k, sd[p + "attention.key_layernorm.weight"])
        q = _neox_rope(q, pos, n_rot, 10000.0)
        k = _neox_rope(k, pos, n_rot, 10000.0)
        x = x + _attn(q, k, v, HD**-0.5) @ sd[p + "attention.dense.weight"].T
        h2 = _rms(x, sd[p + "post_attention_layernorm.weight"])
        if il == 0:
            ff = (_silu(h2 @ sd[p + "mlp.gate_proj.weight"].T)
                  * (h2 @ sd[p + "mlp.up_proj.weight"].T)) @ sd[p + "mlp.down_proj.weight"].T
        else:
            lw = dict(router=sd[p + "mlp.gate.weight"],
                      gate=np.stack([sd[f"{p}mlp.experts.{e}.gate_proj.weight"] for e in range(ne)]),
                      up=np.stack([sd[f"{p}mlp.experts.{e}.up_proj.weight"] for e in range(ne)]),
                      down=np.stack([sd[f"{p}mlp.experts.{e}.down_proj.weight"] for e in range(ne)]))
            ff = _moe(h2, h2, lw, ne, topk, "sigmoid", True, _silu, scale=1.5,
                      bias=sd[p + "mlp.gate.e_score_correction_bias"])
            ff = ff + (_silu(h2 @ sd[p + "mlp.shared_experts.gate_proj.weight"].T)
                       * (h2 @ sd[p + "mlp.shared_experts.up_proj.weight"].T)
                       ) @ sd[p + "mlp.shared_experts.down_proj.weight"].T
        x = x + ff
    want = _rms(x, sd["model.norm.weight"]) @ sd["lm_head.weight"].T

    path = str(tmp_path / "b2.gguf")
    convert_hf_bailingmoe(sd, cfg, path, arch="bailingmoe2", gtype=GGMLType.F32)
    got = _logits(path, toks)
    np.testing.assert_allclose(got[0], want, rtol=3e-4, atol=3e-5)


# ---------------------------------------------------------------------------
# jais (reference src/models/jais.cpp): LayerNorm + ALiBi + SwiGLU with
# biases, muP scales baked into embedding/output weights
# ---------------------------------------------------------------------------

def test_jais_matches_numpy_spec(tmp_path, toks):
    from zllm.convert.hf import convert_hf_jais

    rng = np.random.default_rng(5)
    emb_scale, width_scale = 3.0, 0.5
    cfg = dict(vocab_size=V, n_embd=H, n_inner=F, n_layer=NL, n_head=NH,
               n_positions=128, layer_norm_epsilon=1e-5,
               mup_embeddings_scale=emb_scale, mup_output_alpha=width_scale,
               mup_width_scale=1.0)
    hd = H // NH
    sd = {"transformer.wte.weight": _w(rng, V, H),
          "transformer.ln_f.weight": _w(rng, H) + 1.0,
          "transformer.ln_f.bias": _w(rng, H),
          "lm_head.weight": _w(rng, V, H)}
    for il in range(NL):
        p = f"transformer.h.{il}."
        sd[p + "ln_1.weight"] = _w(rng, H) + 1.0
        sd[p + "ln_1.bias"] = _w(rng, H)
        sd[p + "ln_2.weight"] = _w(rng, H) + 1.0
        sd[p + "ln_2.bias"] = _w(rng, H)
        sd[p + "attn.c_attn.weight"] = _w(rng, H, 3 * H)  # Conv1D [in, out]
        sd[p + "attn.c_attn.bias"] = _w(rng, 3 * H)
        sd[p + "attn.c_proj.weight"] = _w(rng, H, H)
        sd[p + "attn.c_proj.bias"] = _w(rng, H)
        sd[p + "mlp.c_fc.weight"] = _w(rng, H, F)  # up
        sd[p + "mlp.c_fc.bias"] = _w(rng, F)
        sd[p + "mlp.c_fc2.weight"] = _w(rng, H, F)  # gate
        sd[p + "mlp.c_fc2.bias"] = _w(rng, F)
        sd[p + "mlp.c_proj.weight"] = _w(rng, F, H)
        sd[p + "mlp.c_proj.bias"] = _w(rng, H)

    # ALiBi slopes for power-of-two heads: 2^(-8i/n)
    slopes = np.asarray([2.0 ** (-8.0 * (i + 1) / NH) for i in range(NH)])
    t = toks.shape[1]
    x = sd["transformer.wte.weight"][toks[0]].astype(np.float64) * emb_scale
    for il in range(NL):
        p = f"transformer.h.{il}."
        h = _ln(x, sd[p + "ln_1.weight"], sd[p + "ln_1.bias"])
        qkv = h @ sd[p + "attn.c_attn.weight"].astype(np.float64) + sd[p + "attn.c_attn.bias"]
        q = qkv[:, :H].reshape(t, NH, hd)
        k = qkv[:, H:2 * H].reshape(t, NH, hd)
        v = qkv[:, 2 * H:].reshape(t, NH, hd)
        att = _attn(q, k, v, 1.0 / hd, alibi=slopes)
        x = x + att @ sd[p + "attn.c_proj.weight"].astype(np.float64) + sd[p + "attn.c_proj.bias"]
        h2 = _ln(x, sd[p + "ln_2.weight"], sd[p + "ln_2.bias"])
        gate = h2 @ sd[p + "mlp.c_fc2.weight"].astype(np.float64) + sd[p + "mlp.c_fc2.bias"]
        up = h2 @ sd[p + "mlp.c_fc.weight"].astype(np.float64) + sd[p + "mlp.c_fc.bias"]
        x = x + (_silu(gate) * up) @ sd[p + "mlp.c_proj.weight"].astype(np.float64) + sd[p + "mlp.c_proj.bias"]
    xf = _ln(x, sd["transformer.ln_f.weight"], sd["transformer.ln_f.bias"])
    want = (xf @ sd["lm_head.weight"].T) * width_scale

    path = str(tmp_path / "jais.gguf")
    convert_hf_jais(sd, cfg, path, gtype=GGMLType.F32)
    got = _logits(path, toks)
    np.testing.assert_allclose(got[0], want, rtol=3e-4, atol=5e-5)


# ---------------------------------------------------------------------------
# exaone / bailingmoe v1: exact llama-graph clones, verified by
# cross-conversion equivalence (reference src/models/exaone.cpp,
# bailingmoe.cpp differ from llama.cpp only in tensor packing + KVs)
# ---------------------------------------------------------------------------

def _llama_sd(rng):
    sd = {"model.embed_tokens.weight": _w(rng, V, H),
          "model.norm.weight": _w(rng, H) + 1.0,
          "lm_head.weight": _w(rng, V, H)}
    for il in range(NL):
        p = f"model.layers.{il}."
        sd[p + "input_layernorm.weight"] = _w(rng, H) + 1.0
        sd[p + "post_attention_layernorm.weight"] = _w(rng, H) + 1.0
        sd[p + "self_attn.q_proj.weight"] = _w(rng, NH * HD, H)
        sd[p + "self_attn.k_proj.weight"] = _w(rng, NKV * HD, H)
        sd[p + "self_attn.v_proj.weight"] = _w(rng, NKV * HD, H)
        sd[p + "self_attn.o_proj.weight"] = _w(rng, H, NH * HD)
        sd[p + "mlp.gate_proj.weight"] = _w(rng, F, H)
        sd[p + "mlp.up_proj.weight"] = _w(rng, F, H)
        sd[p + "mlp.down_proj.weight"] = _w(rng, H, F)
    return sd


def test_exaone_matches_llama(tmp_path, toks):
    from zllm.convert import convert_hf_llama
    from zllm.convert.hf import convert_hf_exaone

    rng = np.random.default_rng(6)
    sd = _llama_sd(rng)
    base_cfg = dict(vocab_size=V, hidden_size=H, intermediate_size=F,
                    num_hidden_layers=NL, num_attention_heads=NH,
                    num_key_value_heads=NKV, max_position_embeddings=128,
                    rms_norm_eps=1e-6, rope_theta=10000.0,
                    tie_word_embeddings=False)
    ref = str(tmp_path / "ref.gguf")
    convert_hf_llama(sd, base_cfg, ref, arch="qwen3", gtype=GGMLType.F32)
    want = _logits(ref, toks)

    ex = {}
    for k, v in sd.items():
        k = (k.replace("model.embed_tokens.weight", "transformer.wte.weight")
             .replace("model.norm.", "transformer.ln_f.")
             .replace("model.layers.", "transformer.h.")
             .replace(".input_layernorm.", ".ln_1.")
             .replace(".post_attention_layernorm.", ".ln_2.")
             .replace(".self_attn.o_proj.", ".attn.attention.out_proj.")
             .replace(".self_attn.", ".attn.attention.")
             .replace(".mlp.gate_proj.", ".mlp.c_fc_0.")
             .replace(".mlp.up_proj.", ".mlp.c_fc_1.")
             .replace(".mlp.down_proj.", ".mlp.c_proj."))
        ex[k] = v
    path = str(tmp_path / "exaone.gguf")
    convert_hf_exaone(ex, base_cfg, path, gtype=GGMLType.F32)
    got = _logits(path, toks)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bailingmoe_v1_matches_deepseek(tmp_path, toks):
    """Same logical weights through the bailingmoe packing (fused
    query_key_value, word_embeddings naming) and through the deepseek
    route must agree — the graphs are identical (softmax MoE + shared
    experts + dense lead, permuted llama rope)."""
    from zllm.convert import convert_hf_llama
    from zllm.convert.hf import convert_hf_bailingmoe

    rng = np.random.default_rng(8)
    ne, topk, fx = 4, 2, 32
    ds_cfg = dict(vocab_size=V, hidden_size=H, intermediate_size=F,
                  num_hidden_layers=NL, num_attention_heads=NH,
                  num_key_value_heads=NKV, max_position_embeddings=128,
                  rms_norm_eps=1e-6, rope_theta=10000.0,
                  n_routed_experts=ne, num_experts_per_tok=topk,
                  moe_intermediate_size=fx, n_shared_experts=1,
                  first_k_dense_replace=1, scoring_func="softmax",
                  norm_topk_prob=True, tie_word_embeddings=False)
    sd = {"model.embed_tokens.weight": _w(rng, V, H),
          "model.norm.weight": _w(rng, H) + 1.0,
          "lm_head.weight": _w(rng, V, H)}
    for il in range(NL):
        p = f"model.layers.{il}."
        sd[p + "input_layernorm.weight"] = _w(rng, H) + 1.0
        sd[p + "post_attention_layernorm.weight"] = _w(rng, H) + 1.0
        sd[p + "self_attn.q_proj.weight"] = _w(rng, NH * HD, H)
        sd[p + "self_attn.k_proj.weight"] = _w(rng, NKV * HD, H)
        sd[p + "self_attn.v_proj.weight"] = _w(rng, NKV * HD, H)
        sd[p + "self_attn.o_proj.weight"] = _w(rng, H, NH * HD)
        if il == 0:
            sd[p + "mlp.gate_proj.weight"] = _w(rng, F, H)
            sd[p + "mlp.up_proj.weight"] = _w(rng, F, H)
            sd[p + "mlp.down_proj.weight"] = _w(rng, H, F)
        else:
            sd[p + "mlp.gate.weight"] = _w(rng, ne, H)
            for e in range(ne):
                q = f"{p}mlp.experts.{e}."
                sd[q + "gate_proj.weight"] = _w(rng, fx, H)
                sd[q + "up_proj.weight"] = _w(rng, fx, H)
                sd[q + "down_proj.weight"] = _w(rng, H, fx)
            sd[p + "mlp.shared_experts.gate_proj.weight"] = _w(rng, fx, H)
            sd[p + "mlp.shared_experts.up_proj.weight"] = _w(rng, fx, H)
            sd[p + "mlp.shared_experts.down_proj.weight"] = _w(rng, H, fx)

    ref = str(tmp_path / "ds.gguf")
    convert_hf_llama(sd, ds_cfg, ref, arch="deepseek", gtype=GGMLType.F32)
    want = _logits(ref, toks)

    bl_cfg = dict(ds_cfg)
    bl_cfg.update(num_experts=ne, num_shared_experts=1)
    for key in ("n_routed_experts", "n_shared_experts"):
        bl_cfg.pop(key)
    bl = {}
    for k, v in sd.items():
        if k == "model.embed_tokens.weight":
            bl["model.word_embeddings.weight"] = v
        elif k.endswith("self_attn.q_proj.weight"):
            p = k[: -len("self_attn.q_proj.weight")]
            bl[p + "attention.query_key_value.weight"] = np.concatenate([
                sd[p + "self_attn.q_proj.weight"],
                sd[p + "self_attn.k_proj.weight"],
                sd[p + "self_attn.v_proj.weight"]], axis=0)
        elif k.endswith(("self_attn.k_proj.weight", "self_attn.v_proj.weight")):
            continue
        elif k.endswith("self_attn.o_proj.weight"):
            bl[k.replace("self_attn.o_proj", "attention.dense")] = v
        else:
            bl[k] = v
    path = str(tmp_path / "bl.gguf")
    convert_hf_bailingmoe(bl, bl_cfg, path, arch="bailingmoe", gtype=GGMLType.F32)
    got = _logits(path, toks)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
