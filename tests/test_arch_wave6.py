"""Arch wave 6: plamo v1 and grovemoe, each verified against a numpy spec
of the reference graph (src/models/plamo.cpp, src/models/grovemoe.cpp +
build_moe_ffn's GROVEMOE cases in src/llama-graph.cpp) computed directly
on the HF-layout state dict."""

import numpy as np

from test_arch_wave5 import _attn, _neox_rope, _rms, _silu, _w
from zllm.gguf.constants import GGMLType


def _fwd(sd_path_cfg, toks):
    import jax
    import jax.numpy as jnp

    from zllm.models.llama import forward
    from zllm.models.loader import Model

    m = Model.load(sd_path_cfg, quantized=False, dtype=jnp.float32)
    t = toks.shape[1]
    pos = np.broadcast_to(np.arange(t, dtype=np.int32), toks.shape)
    out = jax.jit(lambda p, tk, q: forward(p, m.cfg, tk, q, None)[0])(
        m.params, jnp.asarray(toks), jnp.asarray(pos))
    return np.asarray(out)[0], m


# ---------------------------------------------------------------- plamo v1

PV, PH, PNH, PNKV, PNL, PF = 151, 64, 8, 2, 2, 44
PHD = PH // PNH


def _plamo_sd(rng):
    sd = {"model.embed_tokens.weight": _w(rng, PV, PH),
          "model.norm.weight": _w(rng, PH) + 1.0,
          "lm_head.weight": _w(rng, PV, PH)}
    for il in range(PNL):
        p = f"model.layers.layers.{il}."
        sd[p + "norm.weight"] = _w(rng, PH) + 1.0
        sd[p + "self_attn.q_proj.weight"] = _w(rng, PH, PH)
        sd[p + "self_attn.k_proj.weight"] = _w(rng, PNKV * PHD, PH)
        sd[p + "self_attn.v_proj.weight"] = _w(rng, PNKV * PHD, PH)
        sd[p + "self_attn.o_proj.weight"] = _w(rng, PH, PH)
        sd[p + "mlp.gate_proj.weight"] = _w(rng, PF, PH)
        sd[p + "mlp.up_proj.weight"] = _w(rng, PF, PH)
        sd[p + "mlp.down_proj.weight"] = _w(rng, PH, PF)
    return sd


def _plamo_spec(sd, toks):
    """HF-convention spec: q/o heads are GROUP-MAJOR (head h = g*n_kv + j
    attends kv head j = h % n_kv); the converter's kv-major shuffle maps
    this onto the reference's contiguous-group broadcast.  Parallel
    residual: attn and mlp both read the shared `norm` output and the
    layer emits x + attn + mlp (src/models/plamo.cpp:73-90)."""
    t = toks.shape[0]
    pos = np.arange(t)
    x = sd["model.embed_tokens.weight"][toks].astype(np.float64)
    grp = PNH // PNKV
    for il in range(PNL):
        p = f"model.layers.layers.{il}."
        h = _rms(x, sd[p + "norm.weight"], 1e-6)
        q = (h @ sd[p + "self_attn.q_proj.weight"].T).reshape(t, PNH, PHD)
        k = (h @ sd[p + "self_attn.k_proj.weight"].T).reshape(t, PNKV, PHD)
        v = (h @ sd[p + "self_attn.v_proj.weight"].T).reshape(t, PNKV, PHD)
        q = _neox_rope(q, pos, PHD, 10000.0)
        k = _neox_rope(k, pos, PHD, 10000.0)
        # group-major broadcast: q head g*n_kv+j reads kv head j
        kk, vv = np.tile(k, (1, grp, 1)), np.tile(v, (1, grp, 1))
        s = np.einsum("thd,shd->hts", q, kk) * PHD**-0.5
        mask = np.tril(np.ones((t, t), bool))
        s = np.where(mask[None], s, -np.inf)
        pr = np.exp(s - s.max(-1, keepdims=True))
        pr /= pr.sum(-1, keepdims=True)
        att = np.einsum("hts,shd->thd", pr, vv).reshape(t, PNH * PHD)
        att = att @ sd[p + "self_attn.o_proj.weight"].T
        mlp = (_silu(h @ sd[p + "mlp.gate_proj.weight"].T)
               * (h @ sd[p + "mlp.up_proj.weight"].T)
               ) @ sd[p + "mlp.down_proj.weight"].T
        x = x + att + mlp
    return _rms(x, sd["model.norm.weight"], 1e-6) @ sd["lm_head.weight"].T


def test_plamo_v1_parity(tmp_path):
    from zllm.convert.hf import convert_hf_plamo

    rng = np.random.default_rng(0)
    sd = _plamo_sd(rng)
    cfg = dict(num_hidden_layers=PNL, hidden_size=PH, num_attention_heads=PNH,
               num_key_value_heads=PNKV, intermediate_size=PF,
               rms_norm_eps=1e-6, rope_theta=10000.0, vocab_size=PV)
    path = str(tmp_path / "plamo.gguf")
    convert_hf_plamo(sd, cfg, path, gtype=GGMLType.F32)
    toks = np.random.default_rng(1).integers(0, PV, (1, 9)).astype(np.int32)
    got, m = _fwd(path, toks)
    assert m.cfg.parallel_residual == "shared"
    want = _plamo_spec(sd, toks[0])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


# ---------------------------------------------------------------- grovemoe

GV, GH, GNH, GNKV, GNL = 157, 64, 4, 2, 2
GHD = GH // GNH
GE, GK, GFE = 8, 3, 32     # routed experts, top-k, expert ff
GPG, GFC = 2, 16           # experts per group, chunk ff
GNC = GE // GPG
GSCALE = 0.05


def _grove_sd(rng):
    sd = {"model.embed_tokens.weight": _w(rng, GV, GH),
          "model.norm.weight": _w(rng, GH) + 1.0,
          "lm_head.weight": _w(rng, GV, GH)}
    for il in range(GNL):
        p = f"model.layers.{il}."
        a = p + "self_attn."
        sd[p + "input_layernorm.weight"] = _w(rng, GH) + 1.0
        sd[p + "post_attention_layernorm.weight"] = _w(rng, GH) + 1.0
        sd[a + "q_proj.weight"] = _w(rng, GH, GH)
        sd[a + "k_proj.weight"] = _w(rng, GNKV * GHD, GH)
        sd[a + "v_proj.weight"] = _w(rng, GNKV * GHD, GH)
        sd[a + "o_proj.weight"] = _w(rng, GH, GH)
        sd[a + "q_norm.weight"] = _w(rng, GHD) + 1.0
        sd[a + "k_norm.weight"] = _w(rng, GHD) + 1.0
        sd[p + "mlp.gate.weight"] = _w(rng, GE, GH)
        for e in range(GE):
            sd[f"{p}mlp.experts.{e}.gate_proj.weight"] = _w(rng, GFE, GH)
            sd[f"{p}mlp.experts.{e}.up_proj.weight"] = _w(rng, GFE, GH)
            sd[f"{p}mlp.experts.{e}.down_proj.weight"] = _w(rng, GH, GFE)
        for e in range(GNC):
            sd[f"{p}mlp.chunk_experts.{e}.gate_proj.weight"] = _w(rng, GFC, GH)
            sd[f"{p}mlp.chunk_experts.{e}.up_proj.weight"] = _w(rng, GFC, GH)
            sd[f"{p}mlp.chunk_experts.{e}.down_proj.weight"] = _w(rng, GH, GFC)
    return sd


def _expert(sd, p, group, e, y):
    g = _silu(y @ sd[f"{p}mlp.{group}.{e}.gate_proj.weight"].T)
    u = y @ sd[f"{p}mlp.{group}.{e}.up_proj.weight"].T
    return (g * u) @ sd[f"{p}mlp.{group}.{e}.down_proj.weight"].T


def _grove_spec(sd, toks):
    """Reference grovemoe.cpp graph: qwen3-style attention, then ONE set
    of router logits drives both MoEs — main (softmax weights over top-k,
    norm_w) and adjugate chunk experts (ids // experts_per_group, weights
    = softmax probs AT the divided ids, 6.1e-5-clamped norm, input = the
    MAIN MoE's output, scaled by expert_group_scale)."""
    t = toks.shape[0]
    pos = np.arange(t)
    x = sd["model.embed_tokens.weight"][toks].astype(np.float64)
    for il in range(GNL):
        p = f"model.layers.{il}."
        a = p + "self_attn."
        h = _rms(x, sd[p + "input_layernorm.weight"], 1e-6)
        q = (h @ sd[a + "q_proj.weight"].T).reshape(t, GNH, GHD)
        k = (h @ sd[a + "k_proj.weight"].T).reshape(t, GNKV, GHD)
        v = (h @ sd[a + "v_proj.weight"].T).reshape(t, GNKV, GHD)
        q = _rms(q, sd[a + "q_norm.weight"], 1e-6)
        k = _rms(k, sd[a + "k_norm.weight"], 1e-6)
        q = _neox_rope(q, pos, GHD, 10000.0)
        k = _neox_rope(k, pos, GHD, 10000.0)
        x = x + _attn(q, k, v, GHD**-0.5) @ sd[a + "o_proj.weight"].T
        h2 = _rms(x, sd[p + "post_attention_layernorm.weight"], 1e-6)
        logits = h2 @ sd[p + "mlp.gate.weight"].T  # [T, E]
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        # main MoE: selection via sigmoid(logits) == top-k of logits
        topi = np.argsort(-logits, axis=-1)[:, :GK]
        wv = np.take_along_axis(probs, topi, axis=-1)
        wv = wv / wv.sum(-1, keepdims=True)
        moe = np.zeros((t, GH))
        for ti in range(t):
            for s in range(GK):
                moe[ti] += wv[ti, s] * _expert(sd, p, "experts",
                                               topi[ti, s], h2[ti])
        # adjugate chunk MoE on the MAIN MoE OUTPUT
        k2 = min(GK, GNC)
        topi2 = np.argsort(-logits, axis=-1)[:, :k2]
        cid = topi2 // GPG
        w2 = np.take_along_axis(probs, cid, axis=-1)
        w2 = w2 / np.maximum(w2.sum(-1, keepdims=True), 6.103515625e-5)
        adj = np.zeros((t, GH))
        for ti in range(t):
            for s in range(k2):
                adj[ti] += w2[ti, s] * _expert(sd, p, "chunk_experts",
                                               cid[ti, s], moe[ti])
        x = x + moe + GSCALE * adj
    return _rms(x, sd["model.norm.weight"], 1e-6) @ sd["lm_head.weight"].T


def test_grovemoe_parity(tmp_path):
    from zllm.convert.hf import convert_hf_llama

    rng = np.random.default_rng(0)
    sd = _grove_sd(rng)
    cfg = dict(num_hidden_layers=GNL, hidden_size=GH, num_attention_heads=GNH,
               num_key_value_heads=GNKV, intermediate_size=GFE,
               num_experts=GE, num_experts_per_tok=GK,
               moe_intermediate_size=GFE, head_dim=GHD,
               n_group_experts=GPG, expert_group_scale=GSCALE,
               rms_norm_eps=1e-6, rope_theta=10000.0,
               max_position_embeddings=128, vocab_size=GV)
    path = str(tmp_path / "grove.gguf")
    convert_hf_llama(sd, cfg, path, arch="grovemoe", gtype=GGMLType.F32)
    toks = np.random.default_rng(1).integers(0, GV, (1, 7)).astype(np.int32)
    got, m = _fwd(path, toks)
    assert m.cfg.moe is not None and m.cfg.moe.group_experts == GPG
    assert "ffn_up_chexps" in m.params["layers"][0]
    want = _grove_spec(sd, toks[0])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


# ------------------------------------------------------------------ bitnet

BV, BH, BNH, BNKV, BNL, BF = 163, 64, 4, 2, 2, 256
BHD = BH // BNH


def _tq(x):
    s = max(np.abs(x).mean(), 1e-5)
    return (np.round(x / s).clip(-1, 1) * s).astype(np.float32)


def _bitnet_sd(rng):
    sd = {"model.embed_tokens.weight": _w(rng, BV, BH),
          "model.norm.weight": _w(rng, BH) + 1.0}
    for il in range(BNL):
        p = f"model.layers.{il}."
        sd[p + "input_layernorm.weight"] = _w(rng, BH) + 1.0
        sd[p + "post_attention_layernorm.weight"] = _w(rng, BH) + 1.0
        sd[p + "self_attn.inner_attn_ln.weight"] = _w(rng, BH) + 1.0
        sd[p + "mlp.ffn_layernorm.weight"] = _w(rng, BF) + 1.0
        sd[p + "self_attn.q_proj.weight"] = _w(rng, BH, BH)
        sd[p + "self_attn.k_proj.weight"] = _w(rng, BNKV * BHD, BH)
        sd[p + "self_attn.v_proj.weight"] = _w(rng, BNKV * BHD, BH)
        sd[p + "self_attn.o_proj.weight"] = _w(rng, BH, BH)
        sd[p + "mlp.gate_proj.weight"] = _w(rng, BF, BH)
        sd[p + "mlp.up_proj.weight"] = _w(rng, BF, BH)
        sd[p + "mlp.down_proj.weight"] = _w(rng, BH, BF)
    return sd


def _bitnet_spec(sd, toks):
    """Reference bitnet.cpp graph on ternary-fake-quantized weights:
    llama-style block with an EXTRA rms norm on the attention output
    before o_proj (inner_attn_ln) and on the activated ffn hidden before
    down_proj (ffn_layernorm); lm_head tied to the embedding."""
    t = toks.shape[0]
    pos = np.arange(t)
    x = sd["model.embed_tokens.weight"][toks].astype(np.float64)
    for il in range(BNL):
        p = f"model.layers.{il}."
        h = _rms(x, sd[p + "input_layernorm.weight"], 1e-5)
        q = (h @ _tq(sd[p + "self_attn.q_proj.weight"]).T).reshape(t, BNH, BHD)
        k = (h @ _tq(sd[p + "self_attn.k_proj.weight"]).T).reshape(t, BNKV, BHD)
        v = (h @ _tq(sd[p + "self_attn.v_proj.weight"]).T).reshape(t, BNKV, BHD)
        q = _neox_rope(q, pos, BHD, 10000.0)
        k = _neox_rope(k, pos, BHD, 10000.0)
        att = _attn(q, k, v, BHD**-0.5)
        att = _rms(att, sd[p + "self_attn.inner_attn_ln.weight"], 1e-5)
        x = x + att @ _tq(sd[p + "self_attn.o_proj.weight"]).T
        h2 = _rms(x, sd[p + "post_attention_layernorm.weight"], 1e-5)
        gu = (_silu(h2 @ _tq(sd[p + "mlp.gate_proj.weight"]).T)
              * (h2 @ _tq(sd[p + "mlp.up_proj.weight"]).T))
        gu = _rms(gu, sd[p + "mlp.ffn_layernorm.weight"], 1e-5)
        x = x + gu @ _tq(sd[p + "mlp.down_proj.weight"]).T
    xn = _rms(x, sd["model.norm.weight"], 1e-5)
    return xn @ sd["model.embed_tokens.weight"].T


def test_bitnet_parity(tmp_path):
    from zllm.convert.hf import convert_hf_bitnet

    rng = np.random.default_rng(0)
    sd = _bitnet_sd(rng)
    cfg = dict(num_hidden_layers=BNL, hidden_size=BH, num_attention_heads=BNH,
               num_key_value_heads=BNKV, intermediate_size=BF,
               rms_norm_eps=1e-5, rope_theta=10000.0, vocab_size=BV)
    path = str(tmp_path / "bitnet.gguf")
    convert_hf_bitnet(sd, cfg, path, gtype=GGMLType.F32)
    toks = np.random.default_rng(1).integers(0, BV, (1, 9)).astype(np.int32)
    got, m = _fwd(path, toks)
    want = _bitnet_spec(sd, toks[0])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


def test_bitnet_tq2_roundtrip(tmp_path):
    """The ternary weights survive TQ2_0 packing (per-256-block max-abs
    scale == the shared fake-quant scale), so a TQ2_0 GGUF decodes to the
    same ternary planes and the forward stays within dequant tolerance."""
    from zllm.convert.hf import convert_hf_bitnet

    rng = np.random.default_rng(2)
    sd = _bitnet_sd(rng)
    cfg = dict(num_hidden_layers=BNL, hidden_size=BH, num_attention_heads=BNH,
               num_key_value_heads=BNKV, intermediate_size=BF,
               rms_norm_eps=1e-5, rope_theta=10000.0, vocab_size=BV)
    path = str(tmp_path / "bitnet_tq.gguf")
    convert_hf_bitnet(sd, cfg, path, gtype=GGMLType.TQ2_0)
    toks = np.random.default_rng(3).integers(0, BV, (1, 7)).astype(np.int32)
    got, m = _fwd(path, toks)
    want = _bitnet_spec(sd, toks[0])
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)


# ---------------------------------------------------- qwen-vl text stacks

def _mrope(x, pos_thwe, n_rot, theta, sections, interleaved=False):
    """ggml_rope_multi semantics (reference ggml-cpu/ops.cpp:5565-5630):
    each pair-sector s in [0, n_rot/2) draws its POSITION from the t/h/w/e
    component chosen by `sections` (contiguous blocks, or %3-interleaved
    for qwen3vl's IMROPE), while the frequency theta^(-2s/n_rot)
    progression is shared; rotation pairs (s, s+n_rot/2) like neox.
    pos_thwe: [4, T] position components."""
    t, nh, d = x.shape
    half = n_rot // 2
    sec = list(sections) + [0] * (4 - len(sections))
    comp = np.zeros(half, np.int32)
    for s in range(half):
        if interleaved:
            if s % 3 == 1 and s < 3 * sec[1]:
                comp[s] = 1
            elif s % 3 == 2 and s < 3 * sec[2]:
                comp[s] = 2
            elif s % 3 == 0 and s < 3 * sec[0]:
                comp[s] = 0
            else:
                comp[s] = 3
        else:
            sw = sec[0] + sec[1]
            comp[s] = (0 if s < sec[0] else 1 if s < sw
                       else 2 if s < sw + sec[2] else 3)
    inv = theta ** (-np.arange(half) * 2.0 / n_rot)
    p = pos_thwe[comp, :].T  # [T, half]
    ang = p * inv[None, :]
    cos, sin = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
    x1, x2 = x[..., :half], x[..., half:n_rot]
    return np.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos,
                           x[..., n_rot:]], axis=-1)


QVV, QVH, QVNH, QVNKV, QVNL, QVF = 167, 64, 4, 2, 2, 48
QVHD = QVH // QVNH


def _qwenvl_sd(rng, qk_norm):
    sd = {"model.embed_tokens.weight": _w(rng, QVV, QVH),
          "model.norm.weight": _w(rng, QVH) + 1.0,
          "lm_head.weight": _w(rng, QVV, QVH)}
    for il in range(QVNL):
        p = f"model.layers.{il}."
        a = p + "self_attn."
        sd[p + "input_layernorm.weight"] = _w(rng, QVH) + 1.0
        sd[p + "post_attention_layernorm.weight"] = _w(rng, QVH) + 1.0
        sd[a + "q_proj.weight"] = _w(rng, QVH, QVH)
        sd[a + "k_proj.weight"] = _w(rng, QVNKV * QVHD, QVH)
        sd[a + "v_proj.weight"] = _w(rng, QVNKV * QVHD, QVH)
        sd[a + "o_proj.weight"] = _w(rng, QVH, QVH)
        if qk_norm:
            sd[a + "q_norm.weight"] = _w(rng, QVHD) + 1.0
            sd[a + "k_norm.weight"] = _w(rng, QVHD) + 1.0
        else:
            sd[a + "q_proj.bias"] = _w(rng, QVH)
            sd[a + "k_proj.bias"] = _w(rng, QVNKV * QVHD)
            sd[a + "v_proj.bias"] = _w(rng, QVNKV * QVHD)
        sd[p + "mlp.gate_proj.weight"] = _w(rng, QVF, QVH)
        sd[p + "mlp.up_proj.weight"] = _w(rng, QVF, QVH)
        sd[p + "mlp.down_proj.weight"] = _w(rng, QVH, QVF)
    return sd


def _qwenvl_spec(sd, toks, sections, interleaved, qk_norm):
    """qwen2vl.cpp / qwen3vl.cpp text path with REAL m-rope: text tokens
    carry equal t/h/w/e position components, so this must coincide with
    the plain-neox forward zllm runs."""
    t = toks.shape[0]
    pos4 = np.broadcast_to(np.arange(t), (4, t)).astype(np.float64)
    x = sd["model.embed_tokens.weight"][toks].astype(np.float64)
    for il in range(QVNL):
        p = f"model.layers.{il}."
        a = p + "self_attn."
        h = _rms(x, sd[p + "input_layernorm.weight"], 1e-6)
        q = h @ sd[a + "q_proj.weight"].T
        k = h @ sd[a + "k_proj.weight"].T
        v = h @ sd[a + "v_proj.weight"].T
        if not qk_norm:
            q = q + sd[a + "q_proj.bias"]
            k = k + sd[a + "k_proj.bias"]
            v = v + sd[a + "v_proj.bias"]
        q = q.reshape(t, QVNH, QVHD)
        k = k.reshape(t, QVNKV, QVHD)
        v = v.reshape(t, QVNKV, QVHD)
        if qk_norm:
            q = _rms(q, sd[a + "q_norm.weight"], 1e-6)
            k = _rms(k, sd[a + "k_norm.weight"], 1e-6)
        q = _mrope(q, pos4, QVHD, 10000.0, sections, interleaved)
        k = _mrope(k, pos4, QVHD, 10000.0, sections, interleaved)
        x = x + _attn(q, k, v, QVHD**-0.5) @ sd[a + "o_proj.weight"].T
        h2 = _rms(x, sd[p + "post_attention_layernorm.weight"], 1e-6)
        x = x + (_silu(h2 @ sd[p + "mlp.gate_proj.weight"].T)
                 * (h2 @ sd[p + "mlp.up_proj.weight"].T)
                 ) @ sd[p + "mlp.down_proj.weight"].T
    return _rms(x, sd["model.norm.weight"], 1e-6) @ sd["lm_head.weight"].T


def _run_qwenvl(tmp_path, arch, sections, interleaved, qk_norm, seed):
    from zllm.convert.hf import convert_hf_llama

    rng = np.random.default_rng(seed)
    sd = _qwenvl_sd(rng, qk_norm)
    cfg = dict(num_hidden_layers=QVNL, hidden_size=QVH,
               num_attention_heads=QVNH, num_key_value_heads=QVNKV,
               intermediate_size=QVF, rms_norm_eps=1e-6, rope_theta=10000.0,
               vocab_size=QVV, max_position_embeddings=128,
               rope_scaling={"type": "mrope", "mrope_section": sections})
    path = str(tmp_path / f"{arch}.gguf")
    convert_hf_llama(sd, cfg, path, arch=arch, gtype=GGMLType.F32)
    toks = np.random.default_rng(seed + 1).integers(0, QVV, (1, 9)).astype(np.int32)
    got, _ = _fwd(path, toks)
    want = _qwenvl_spec(sd, toks[0], sections, interleaved, qk_norm)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


def test_qwen2vl_text_mrope(tmp_path):
    # sectioned m-rope [t,h,w] (qwen2vl.cpp), qwen2-style attn biases
    _run_qwenvl(tmp_path, "qwen2vl", [2, 3, 3], False, qk_norm=False, seed=0)


def test_qwen3vl_text_imrope(tmp_path):
    # interleaved m-rope (qwen3vl.cpp IMROPE), qwen3 per-head QK norm
    _run_qwenvl(tmp_path, "qwen3vl", [2, 3, 3], True, qk_norm=True, seed=4)


def test_qwen3vlmoe_text_equals_qwen3moe(tmp_path):
    """qwen3vl-moe.cpp's text graph is qwen3moe's + m-rope; with text
    positions the two GGUFs (same weights, archs qwen3vlmoe vs qwen3moe)
    must produce identical logits."""
    from zllm.convert.hf import convert_hf_llama

    rng = np.random.default_rng(7)
    sd = {k: v for k, v in _grove_sd(rng).items() if "chunk_experts" not in k}
    cfg = dict(num_hidden_layers=GNL, hidden_size=GH, num_attention_heads=GNH,
               num_key_value_heads=GNKV, intermediate_size=GFE,
               num_experts=GE, num_experts_per_tok=GK,
               moe_intermediate_size=GFE, norm_topk_prob=True,
               rms_norm_eps=1e-6, rope_theta=10000.0,
               max_position_embeddings=128, vocab_size=GV)
    toks = np.random.default_rng(8).integers(0, GV, (1, 7)).astype(np.int32)
    pa = str(tmp_path / "a.gguf")
    convert_hf_llama(sd, cfg, pa, arch="qwen3moe", gtype=GGMLType.F32)
    got_a, _ = _fwd(pa, toks)
    cfg["rope_scaling"] = {"type": "mrope", "mrope_section": [2, 3, 3]}
    pb = str(tmp_path / "b.gguf")
    convert_hf_llama(sd, cfg, pb, arch="qwen3vlmoe", gtype=GGMLType.F32)
    got_b, _ = _fwd(pb, toks)
    np.testing.assert_allclose(got_a, got_b, rtol=1e-6, atol=1e-7)


# ----------------------------------------------------------------- plamo3

P3V, P3H, P3NH, P3NKV, P3NL, P3F = 173, 64, 4, 2, 2, 40
P3HD = P3H // P3NH
P3W, P3PAT = 4, 2          # window, pattern (layer il swa iff (il+1)%2 != 0)
P3B, P3BSWA = 10000.0, 100000.0


def _plamo3_sd(rng):
    sd = {"model.embed_tokens.weight": _w(rng, P3V, P3H),
          "model.norm.weight": _w(rng, P3H),
          "lm_head.weight": _w(rng, P3V, P3H)}
    for il in range(P3NL):
        p = f"model.layers.layers.{il}."
        sd[p + "pre_mixer_norm.weight"] = _w(rng, P3H)
        sd[p + "mixer.qkv_proj.weight"] = _w(rng, (P3NH + 2 * P3NKV) * P3HD, P3H)
        sd[p + "mixer.q_norm.weight"] = _w(rng, P3HD)
        sd[p + "mixer.k_norm.weight"] = _w(rng, P3HD)
        sd[p + "mixer.o_proj.weight"] = _w(rng, P3H, P3H)
        sd[p + "post_mixer_norm.weight"] = _w(rng, P3H)
        sd[p + "pre_mlp_norm.weight"] = _w(rng, P3H)
        sd[p + "mlp.gate_up_proj.weight"] = _w(rng, 2 * P3F, P3H)
        sd[p + "mlp.down_proj.weight"] = _w(rng, P3H, P3F)
        sd[p + "post_mlp_norm.weight"] = _w(rng, P3H)
    return sd


def _plamo3_spec(sd, toks):
    """Reference plamo3.cpp graph with the converter's baked norm offsets
    (+1 pre norms and q/k norms, +1/5 post_mixer, +1/5^1.5 post_mlp):
    sandwich-normed attention with fused qkv, per-head q/k RMS norm, neox
    rope (swa layers use window + the swa rope base; full layers are
    every pattern-th), and a fused-[gate|up] SwiGLU FFN."""
    t = toks.shape[0]
    pos = np.arange(t)
    x = sd["model.embed_tokens.weight"][toks].astype(np.float64)
    for il in range(P3NL):
        p = f"model.layers.layers.{il}."
        swa = (il + 1) % P3PAT != 0
        base, win = (P3BSWA, P3W) if swa else (P3B, 0)
        h = _rms(x, sd[p + "pre_mixer_norm.weight"] + 1.0, 1e-5)
        qkv = h @ sd[p + "mixer.qkv_proj.weight"].T
        qd = P3NH * P3HD
        kvd = P3NKV * P3HD
        q = qkv[:, :qd].reshape(t, P3NH, P3HD)
        k = qkv[:, qd:qd + kvd].reshape(t, P3NKV, P3HD)
        v = qkv[:, qd + kvd:].reshape(t, P3NKV, P3HD)
        q = _rms(q, sd[p + "mixer.q_norm.weight"] + 1.0, 1e-5)
        k = _rms(k, sd[p + "mixer.k_norm.weight"] + 1.0, 1e-5)
        q = _neox_rope(q, pos, P3HD, base)
        k = _neox_rope(k, pos, P3HD, base)
        att = _attn(q, k, v, P3HD**-0.5, window=win)
        att = att @ sd[p + "mixer.o_proj.weight"].T
        att = _rms(att, sd[p + "post_mixer_norm.weight"] + 0.2, 1e-5)
        x = x + att
        h2 = _rms(x, sd[p + "pre_mlp_norm.weight"] + 1.0, 1e-5)
        gu = h2 @ sd[p + "mlp.gate_up_proj.weight"].T
        ff = (_silu(gu[:, :P3F]) * gu[:, P3F:]) @ sd[p + "mlp.down_proj.weight"].T
        ff = _rms(ff, sd[p + "post_mlp_norm.weight"] + 5**-1.5, 1e-5)
        x = x + ff
    return _rms(x, sd["model.norm.weight"] + 1.0, 1e-5) @ sd["lm_head.weight"].T


def test_plamo3_parity(tmp_path):
    from zllm.convert.hf import convert_hf_plamo3

    rng = np.random.default_rng(0)
    sd = _plamo3_sd(rng)
    cfg = dict(num_hidden_layers=P3NL, hidden_size=P3H,
               num_attention_heads=P3NH, num_key_value_heads=P3NKV,
               intermediate_size=P3F, rms_norm_eps=1e-5, rope_theta=P3B,
               rope_local_theta=P3BSWA, window_size=P3W,
               sliding_window_pattern=P3PAT, vocab_size=P3V,
               max_position_embeddings=128)
    path = str(tmp_path / "plamo3.gguf")
    convert_hf_plamo3(sd, cfg, path, gtype=GGMLType.F32)
    toks = np.random.default_rng(1).integers(0, P3V, (1, 9)).astype(np.int32)
    got, m = _fwd(path, toks)
    assert m.cfg.swa_pattern == P3PAT and m.cfg.sliding_window == P3W
    assert m.cfg.rope_swa is not None and m.cfg.rope_swa.base == P3BSWA
    want = _plamo3_spec(sd, toks[0])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


# ------------------------------------------------------------- modern-bert

MBV, MBH, MBNH, MBNL, MBF = 179, 64, 4, 4, 40
MBHD = MBH // MBNH
MBW, MBPAT = 4, 2          # symmetric window (half=2), global every 2nd
MBB, MBBSWA = 10000.0, 1000.0


def _mbert_sd(rng):
    sd = {"model.embeddings.tok_embeddings.weight": _w(rng, MBV, MBH),
          "model.embeddings.norm.weight": _w(rng, MBH) + 1.0,
          "model.final_norm.weight": _w(rng, MBH) + 1.0}
    for il in range(MBNL):
        p = f"model.layers.{il}."
        if il > 0:  # layer 0 ships no attn_norm (modern-bert.cpp:32-37)
            sd[p + "attn_norm.weight"] = _w(rng, MBH) + 1.0
        sd[p + "attn.Wqkv.weight"] = _w(rng, 3 * MBH, MBH)
        sd[p + "attn.Wo.weight"] = _w(rng, MBH, MBH)
        sd[p + "mlp_norm.weight"] = _w(rng, MBH) + 1.0
        sd[p + "mlp.Wi.weight"] = _w(rng, 2 * MBF, MBH)
        sd[p + "mlp.Wo.weight"] = _w(rng, MBH, MBF)
    return sd


def _ln0(x, w, eps=1e-5):
    x = x.astype(np.float64)
    mu = x.mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(x.var(-1, keepdims=True) + eps) * w


def _gelu_tanh_np(x):
    return 0.5 * x * (1.0 + np.tanh(0.7978845608028654 * (x + 0.044715 * x**3)))


def _mbert_spec(sd, toks):
    """src/models/modern-bert.cpp: bias-free pre-norm LN encoder, fused
    Wqkv, neox rope (local layers use the swa base), SYMMETRIC window
    |i-j| <= n_swa/2 on local layers (every pattern-th layer global),
    fused-GEGLU Wi, final_norm."""
    t = toks.shape[0]
    pos = np.arange(t)
    x = _ln0(sd["model.embeddings.tok_embeddings.weight"][toks],
             sd["model.embeddings.norm.weight"])
    for il in range(MBNL):
        p = f"model.layers.{il}."
        swa = (il + 1) % MBPAT != 0
        h = _ln0(x, sd[p + "attn_norm.weight"]) if il > 0 else x
        qkv = h @ sd[p + "attn.Wqkv.weight"].T
        q = qkv[:, :MBH].reshape(t, MBNH, MBHD)
        k = qkv[:, MBH:2 * MBH].reshape(t, MBNH, MBHD)
        v = qkv[:, 2 * MBH:].reshape(t, MBNH, MBHD)
        base = MBBSWA if swa else MBB
        q = _neox_rope(q, pos, MBHD, base)
        k = _neox_rope(k, pos, MBHD, base)
        s = np.einsum("thd,shd->hts", q, k) * MBHD**-0.5
        if swa:
            keep = np.abs(pos[:, None] - pos[None, :]) <= MBW // 2
            s = np.where(keep[None], s, -np.inf)
        pr = np.exp(s - s.max(-1, keepdims=True))
        pr /= pr.sum(-1, keepdims=True)
        att = np.einsum("hts,shd->thd", pr, v).reshape(t, MBH)
        x = x + att @ sd[p + "attn.Wo.weight"].T
        h2 = _ln0(x, sd[p + "mlp_norm.weight"])
        gu = h2 @ sd[p + "mlp.Wi.weight"].T
        x = x + (_gelu_tanh_np(gu[:, :MBF]) * gu[:, MBF:]) @ sd[p + "mlp.Wo.weight"].T
    return _ln0(x, sd["model.final_norm.weight"])


def test_modern_bert_parity(tmp_path):
    import jax
    import jax.numpy as jnp

    from zllm.convert.hf import convert_hf_modern_bert
    from zllm.models.bert import bert_forward
    from zllm.models.loader import Model

    rng = np.random.default_rng(0)
    sd = _mbert_sd(rng)
    cfg = dict(num_hidden_layers=MBNL, hidden_size=MBH,
               num_attention_heads=MBNH, intermediate_size=MBF,
               norm_eps=1e-5, global_rope_theta=MBB, local_rope_theta=MBBSWA,
               local_attention=MBW, global_attn_every_n_layers=MBPAT,
               vocab_size=MBV, max_position_embeddings=128)
    path = str(tmp_path / "mbert.gguf")
    convert_hf_modern_bert(sd, cfg, path, gtype=GGMLType.F32)
    m = Model.load(path, quantized=False, dtype=jnp.float32)
    assert m.cfg.is_encoder and m.cfg.swa_pattern == MBPAT
    assert "attn_norm" not in m.params["layers"][0]
    assert "attn_norm" in m.params["layers"][1]
    toks = np.random.default_rng(1).integers(0, MBV, (1, 9)).astype(np.int32)
    pos = np.broadcast_to(np.arange(9, dtype=np.int32), toks.shape)
    got = np.asarray(jax.jit(
        lambda p, t, q: bert_forward(p, m.cfg, t, q)
    )(m.params, jnp.asarray(toks), jnp.asarray(pos)))[0]
    want = _mbert_spec(sd, toks[0])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


# --------------------------------------------------------------- neo-bert

NBV, NBH, NBNH, NBNL, NBF = 181, 64, 4, 2, 36
NBHD = NBH // NBNH


def _nrope(x, pos, n_rot, theta):
    """NORM-style rope: adjacent (even, odd) pairs (neo-bert is in the
    reference's LLAMA_ROPE_TYPE_NORM case list)."""
    t, nh, d = x.shape
    half = n_rot // 2
    inv = theta ** (-np.arange(half) * 2.0 / n_rot)
    ang = pos[:, None] * inv[None, :]
    cos, sin = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
    x1, x2 = x[..., 0::2], x[..., 1::2]
    o1, o2 = x1 * cos - x2 * sin, x1 * sin + x2 * cos
    out = np.empty_like(x)
    out[..., 0::2], out[..., 1::2] = o1, o2
    return out


def _nbert_sd(rng):
    sd = {"model.encoder.weight": _w(rng, NBV, NBH),
          "model.layer_norm.weight": _w(rng, NBH) + 1.0}
    for il in range(NBNL):
        p = f"model.transformer_encoder.{il}."
        sd[p + "attention_norm.weight"] = _w(rng, NBH) + 1.0
        sd[p + "qkv.weight"] = _w(rng, 3 * NBH, NBH)
        sd[p + "wo.weight"] = _w(rng, NBH, NBH)
        sd[p + "ffn_norm.weight"] = _w(rng, NBH) + 1.0
        sd[p + "ffn.w12.weight"] = _w(rng, 2 * NBF, NBH)
        sd[p + "ffn.w3.weight"] = _w(rng, NBH, NBF)
    return sd


def _nbert_spec(sd, toks):
    """src/models/neo-bert.cpp: RMS pre-norm bidirectional encoder, no
    embedding norm, fused qkv, NORM rope, fused-SwiGLU w12, final RMS
    norm (output_norm_enc)."""
    t = toks.shape[0]
    pos = np.arange(t)
    x = sd["model.encoder.weight"][toks].astype(np.float64)
    for il in range(NBNL):
        p = f"model.transformer_encoder.{il}."
        h = _rms(x, sd[p + "attention_norm.weight"], 1e-6)
        qkv = h @ sd[p + "qkv.weight"].T
        q = qkv[:, :NBH].reshape(t, NBNH, NBHD)
        k = qkv[:, NBH:2 * NBH].reshape(t, NBNH, NBHD)
        v = qkv[:, 2 * NBH:].reshape(t, NBNH, NBHD)
        q = _nrope(q, pos, NBHD, 10000.0)
        k = _nrope(k, pos, NBHD, 10000.0)
        s = np.einsum("thd,shd->hts", q, k) * NBHD**-0.5
        pr = np.exp(s - s.max(-1, keepdims=True))
        pr /= pr.sum(-1, keepdims=True)
        att = np.einsum("hts,shd->thd", pr, v).reshape(t, NBH)
        x = x + att @ sd[p + "wo.weight"].T
        h2 = _rms(x, sd[p + "ffn_norm.weight"], 1e-6)
        gu = h2 @ sd[p + "ffn.w12.weight"].T
        x = x + (_silu(gu[:, :NBF]) * gu[:, NBF:]) @ sd[p + "ffn.w3.weight"].T
    return _rms(x, sd["model.layer_norm.weight"], 1e-6)


def test_neo_bert_parity(tmp_path):
    import jax
    import jax.numpy as jnp

    from zllm.convert.hf import convert_hf_neo_bert
    from zllm.models.bert import bert_forward
    from zllm.models.loader import Model

    rng = np.random.default_rng(0)
    sd = _nbert_sd(rng)
    cfg = dict(num_hidden_layers=NBNL, hidden_size=NBH,
               num_attention_heads=NBNH, intermediate_size=3 * NBF // 2,
               norm_eps=1e-6, rope_theta=10000.0, vocab_size=NBV,
               max_position_embeddings=128)
    path = str(tmp_path / "nbert.gguf")
    convert_hf_neo_bert(sd, cfg, path, gtype=GGMLType.F32)
    m = Model.load(path, quantized=False, dtype=jnp.float32)
    assert m.cfg.is_encoder and m.cfg.pooling == "cls"
    assert m.cfg.n_ff == NBF
    toks = np.random.default_rng(1).integers(0, NBV, (1, 8)).astype(np.int32)
    pos = np.broadcast_to(np.arange(8, dtype=np.int32), toks.shape)
    got = np.asarray(jax.jit(
        lambda p, t, q: bert_forward(p, m.cfg, t, q)
    )(m.params, jnp.asarray(toks), jnp.asarray(pos)))[0]
    want = _nbert_spec(sd, toks[0])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)
