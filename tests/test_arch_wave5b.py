"""Arch wave 5, batch 3: orion, xverse, pangu-embedded, maincoder,
refact — verified by numpy spec (orion's LayerNorm+bias stack, refact's
NoPE attention) or cross-conversion equivalence where the graph is an
exact clone of a validated arch (xverse/maincoder = llama; pangu-embedded
= qwen2-with-o-bias). Reference: src/models/{orion,xverse,
pangu-embedded,maincoder,refact}.cpp."""

import numpy as np
import pytest

from test_arch_wave5 import (
    H, HD, NH, NKV, NL, F, V, _attn, _logits, _neox_rope, _rms, _silu, _w,
)
from zllm.gguf.constants import GGMLType


def _base_sd(rng, qkv_bias=False, o_bias=False, norm_bias=False):
    sd = {"model.embed_tokens.weight": _w(rng, V, H),
          "model.norm.weight": _w(rng, H) + 1.0,
          "lm_head.weight": _w(rng, V, H)}
    if norm_bias:
        sd["model.norm.bias"] = _w(rng, H)
    for il in range(NL):
        p = f"model.layers.{il}."
        sd[p + "input_layernorm.weight"] = _w(rng, H) + 1.0
        sd[p + "post_attention_layernorm.weight"] = _w(rng, H) + 1.0
        if norm_bias:
            sd[p + "input_layernorm.bias"] = _w(rng, H)
            sd[p + "post_attention_layernorm.bias"] = _w(rng, H)
        sd[p + "self_attn.q_proj.weight"] = _w(rng, NH * HD, H)
        sd[p + "self_attn.k_proj.weight"] = _w(rng, NKV * HD, H)
        sd[p + "self_attn.v_proj.weight"] = _w(rng, NKV * HD, H)
        sd[p + "self_attn.o_proj.weight"] = _w(rng, H, NH * HD)
        if qkv_bias:
            sd[p + "self_attn.q_proj.bias"] = _w(rng, NH * HD)
            sd[p + "self_attn.k_proj.bias"] = _w(rng, NKV * HD)
            sd[p + "self_attn.v_proj.bias"] = _w(rng, NKV * HD)
        if o_bias:
            sd[p + "self_attn.o_proj.bias"] = _w(rng, H)
        sd[p + "mlp.gate_proj.weight"] = _w(rng, F, H)
        sd[p + "mlp.up_proj.weight"] = _w(rng, F, H)
        sd[p + "mlp.down_proj.weight"] = _w(rng, H, F)
    return sd


def _cfg(**kw):
    cfg = dict(vocab_size=V, hidden_size=H, intermediate_size=F,
               num_hidden_layers=NL, num_attention_heads=NH,
               num_key_value_heads=NKV, max_position_embeddings=128,
               rms_norm_eps=1e-6, layer_norm_eps=1e-6, rope_theta=10000.0,
               tie_word_embeddings=False)
    cfg.update(kw)
    return cfg


@pytest.fixture()
def toks():
    return np.random.default_rng(13).integers(0, V, (1, 9)).astype(np.int32)


def _ln(x, wt, bias, eps=1e-6):
    x = x.astype(np.float64)
    mu = x.mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(x.var(-1, keepdims=True) + eps) * wt + bias


def test_orion_matches_numpy_spec(tmp_path, toks):
    """orion: LayerNorm WITH bias on every norm, neox rope, silu FFN."""
    from zllm.convert import convert_hf_llama

    rng = np.random.default_rng(0)
    sd = _base_sd(rng, norm_bias=True)
    t = toks.shape[1]
    pos = np.arange(t)
    x = sd["model.embed_tokens.weight"][toks[0]].astype(np.float64)
    for il in range(NL):
        p = f"model.layers.{il}."
        h = _ln(x, sd[p + "input_layernorm.weight"], sd[p + "input_layernorm.bias"])
        q = (h @ sd[p + "self_attn.q_proj.weight"].T).reshape(t, NH, HD)
        k = (h @ sd[p + "self_attn.k_proj.weight"].T).reshape(t, NKV, HD)
        v = (h @ sd[p + "self_attn.v_proj.weight"].T).reshape(t, NKV, HD)
        q = _neox_rope(q, pos, HD, 10000.0)
        k = _neox_rope(k, pos, HD, 10000.0)
        x = x + _attn(q, k, v, HD**-0.5) @ sd[p + "self_attn.o_proj.weight"].T
        h2 = _ln(x, sd[p + "post_attention_layernorm.weight"],
                 sd[p + "post_attention_layernorm.bias"])
        x = x + (_silu(h2 @ sd[p + "mlp.gate_proj.weight"].T)
                 * (h2 @ sd[p + "mlp.up_proj.weight"].T)) @ sd[p + "mlp.down_proj.weight"].T
    want = _ln(x, sd["model.norm.weight"], sd["model.norm.bias"]) @ sd["lm_head.weight"].T

    path = str(tmp_path / "orion.gguf")
    convert_hf_llama(sd, _cfg(), path, arch="orion", gtype=GGMLType.F32)
    got = _logits(path, toks)
    np.testing.assert_allclose(got[0], want, rtol=3e-4, atol=3e-5)


def test_refact_matches_numpy_spec(tmp_path, toks):
    """refact: RMS norms + silu FFN, NO positional encoding at all
    (reference refact.cpp never calls rope_ext)."""
    from zllm.convert import convert_hf_llama

    rng = np.random.default_rng(1)
    sd = _base_sd(rng)
    t = toks.shape[1]
    x = sd["model.embed_tokens.weight"][toks[0]].astype(np.float64)
    for il in range(NL):
        p = f"model.layers.{il}."
        h = _rms(x, sd[p + "input_layernorm.weight"])
        q = (h @ sd[p + "self_attn.q_proj.weight"].T).reshape(t, NH, HD)
        k = (h @ sd[p + "self_attn.k_proj.weight"].T).reshape(t, NKV, HD)
        v = (h @ sd[p + "self_attn.v_proj.weight"].T).reshape(t, NKV, HD)
        x = x + _attn(q, k, v, HD**-0.5) @ sd[p + "self_attn.o_proj.weight"].T
        h2 = _rms(x, sd[p + "post_attention_layernorm.weight"])
        x = x + (_silu(h2 @ sd[p + "mlp.gate_proj.weight"].T)
                 * (h2 @ sd[p + "mlp.up_proj.weight"].T)) @ sd[p + "mlp.down_proj.weight"].T
    want = _rms(x, sd["model.norm.weight"]) @ sd["lm_head.weight"].T

    path = str(tmp_path / "refact.gguf")
    convert_hf_llama(sd, _cfg(), path, arch="refact", gtype=GGMLType.F32)
    got = _logits(path, toks)
    np.testing.assert_allclose(got[0], want, rtol=3e-4, atol=3e-5)


@pytest.mark.parametrize("arch", ["xverse", "maincoder"])
def test_llama_clones_match_llama(tmp_path, toks, arch):
    """xverse / maincoder build the exact llama graph — cross-conversion
    equivalence on identical weights."""
    from zllm.convert import convert_hf_llama

    rng = np.random.default_rng(2)
    sd = _base_sd(rng)
    pa = str(tmp_path / "l.gguf")
    pb = str(tmp_path / f"{arch}.gguf")
    convert_hf_llama(sd, _cfg(), pa, arch="llama", gtype=GGMLType.F32)
    convert_hf_llama(sd, _cfg(), pb, arch=arch, gtype=GGMLType.F32)
    np.testing.assert_allclose(_logits(pb, toks), _logits(pa, toks),
                               rtol=2e-5, atol=2e-5)


def test_pangu_embedded_matches_qwen2_plus_obias(tmp_path, toks):
    """pangu-embedded = qwen2 attention (neox rope, qkv bias) + an output
    projection bias."""
    from zllm.convert import convert_hf_llama

    rng = np.random.default_rng(3)
    sd = _base_sd(rng, qkv_bias=True, o_bias=True)
    sd_nob = {k: v for k, v in sd.items() if not k.endswith("o_proj.bias")}
    pa = str(tmp_path / "q2.gguf")
    pb = str(tmp_path / "pangu.gguf")
    convert_hf_llama(sd_nob, _cfg(), pa, arch="qwen2", gtype=GGMLType.F32)
    convert_hf_llama(sd, _cfg(), pb, arch="pangu-embedded", gtype=GGMLType.F32)
    base = _logits(pa, toks)
    got = _logits(pb, toks)
    # with the o-bias zeroed the graphs must agree exactly; with it set
    # they must differ (i.e. the bias is actually consumed)
    assert not np.allclose(got, base, atol=1e-6)
    sd_zero = dict(sd)
    for il in range(NL):
        sd_zero[f"model.layers.{il}.self_attn.o_proj.bias"] = np.zeros(H, np.float32)
    pc = str(tmp_path / "pangu0.gguf")
    convert_hf_llama(sd_zero, _cfg(), pc, arch="pangu-embedded", gtype=GGMLType.F32)
    np.testing.assert_allclose(_logits(pc, toks), base, rtol=2e-5, atol=2e-5)


def test_qwen_v1_matches_numpy_spec(tmp_path, toks):
    """qwen v1: fused c_attn (split at conversion), RMS norms, neox rope,
    silu FFN with gate=w2/up=w1 (reference src/models/qwen.cpp)."""
    from zllm.convert.hf import convert_hf_qwen
    from zllm.gguf.constants import GGMLType as _G

    rng = np.random.default_rng(6)
    sd = {"transformer.wte.weight": _w(rng, V, H),
          "transformer.ln_f.weight": _w(rng, H) + 1.0,
          "lm_head.weight": _w(rng, V, H)}
    for il in range(NL):
        p = f"transformer.h.{il}."
        sd[p + "ln_1.weight"] = _w(rng, H) + 1.0
        sd[p + "ln_2.weight"] = _w(rng, H) + 1.0
        sd[p + "attn.c_attn.weight"] = _w(rng, 3 * H, H)
        sd[p + "attn.c_attn.bias"] = _w(rng, 3 * H)
        sd[p + "attn.c_proj.weight"] = _w(rng, H, H)
        sd[p + "mlp.w1.weight"] = _w(rng, F, H)   # up
        sd[p + "mlp.w2.weight"] = _w(rng, F, H)   # gate
        sd[p + "mlp.c_proj.weight"] = _w(rng, H, F)

    hd = H // NH  # qwen v1 is MHA
    t = toks.shape[1]
    pos = np.arange(t)
    x = sd["transformer.wte.weight"][toks[0]].astype(np.float64)
    for il in range(NL):
        p = f"transformer.h.{il}."
        h = _rms(x, sd[p + "ln_1.weight"])
        qkv = h @ sd[p + "attn.c_attn.weight"].T + sd[p + "attn.c_attn.bias"]
        q = qkv[:, :H].reshape(t, NH, hd)
        k = qkv[:, H : 2 * H].reshape(t, NH, hd)
        v = qkv[:, 2 * H :].reshape(t, NH, hd)
        q = _neox_rope(q, pos, hd, 10000.0)
        k = _neox_rope(k, pos, hd, 10000.0)
        x = x + _attn(q, k, v, hd**-0.5) @ sd[p + "attn.c_proj.weight"].T
        h2 = _rms(x, sd[p + "ln_2.weight"])
        x = x + (_silu(h2 @ sd[p + "mlp.w2.weight"].T)
                 * (h2 @ sd[p + "mlp.w1.weight"].T)) @ sd[p + "mlp.c_proj.weight"].T
    want = _rms(x, sd["transformer.ln_f.weight"]) @ sd["lm_head.weight"].T

    cfg = dict(num_hidden_layers=NL, hidden_size=H, num_attention_heads=NH,
               intermediate_size=2 * F, layer_norm_epsilon=1e-6,
               rotary_emb_base=10000.0, vocab_size=V)
    path = str(tmp_path / "qwen1.gguf")
    convert_hf_qwen(sd, cfg, path, gtype=_G.F32)
    got = _logits(path, toks)
    np.testing.assert_allclose(got[0], want, rtol=3e-4, atol=3e-5)


def test_codeshell_matches_numpy_spec(tmp_path, toks):
    """codeshell: LayerNorm+bias blocks, grouped-query fused c_attn,
    non-gated tanh-GELU FFN with biases, neox rope
    (reference src/models/codeshell.cpp)."""
    from zllm.convert.hf import convert_hf_codeshell
    from zllm.gguf.constants import GGMLType as _G

    rng = np.random.default_rng(7)
    hd = H // NH
    kvd = NKV * hd
    sd = {"transformer.wte.weight": _w(rng, V, H),
          "transformer.ln_f.weight": _w(rng, H) + 1.0,
          "transformer.ln_f.bias": _w(rng, H),
          "lm_head.weight": _w(rng, V, H)}
    for il in range(NL):
        p = f"transformer.h.{il}."
        for nm in ("ln_1", "ln_2"):
            sd[p + nm + ".weight"] = _w(rng, H) + 1.0
            sd[p + nm + ".bias"] = _w(rng, H)
        sd[p + "attn.c_attn.weight"] = _w(rng, H + 2 * kvd, H)
        sd[p + "attn.c_attn.bias"] = _w(rng, H + 2 * kvd)
        sd[p + "attn.c_proj.weight"] = _w(rng, H, H)
        sd[p + "attn.c_proj.bias"] = _w(rng, H)
        sd[p + "mlp.c_fc.weight"] = _w(rng, F, H)
        sd[p + "mlp.c_fc.bias"] = _w(rng, F)
        sd[p + "mlp.c_proj.weight"] = _w(rng, H, F)
        sd[p + "mlp.c_proj.bias"] = _w(rng, H)

    def gelu_tanh(x):
        return 0.5 * x * (1.0 + np.tanh(0.7978845608 * (x + 0.044715 * x**3)))

    t = toks.shape[1]
    pos = np.arange(t)
    x = sd["transformer.wte.weight"][toks[0]].astype(np.float64)
    for il in range(NL):
        p = f"transformer.h.{il}."
        h = _ln(x, sd[p + "ln_1.weight"], sd[p + "ln_1.bias"])
        qkv = h @ sd[p + "attn.c_attn.weight"].T + sd[p + "attn.c_attn.bias"]
        q = qkv[:, :H].reshape(t, NH, hd)
        k = qkv[:, H : H + kvd].reshape(t, NKV, hd)
        v = qkv[:, H + kvd :].reshape(t, NKV, hd)
        q = _neox_rope(q, pos, hd, 10000.0)
        k = _neox_rope(k, pos, hd, 10000.0)
        att = _attn(q, k, v, hd**-0.5)
        x = x + att @ sd[p + "attn.c_proj.weight"].T + sd[p + "attn.c_proj.bias"]
        h2 = _ln(x, sd[p + "ln_2.weight"], sd[p + "ln_2.bias"])
        up = gelu_tanh(h2 @ sd[p + "mlp.c_fc.weight"].T + sd[p + "mlp.c_fc.bias"])
        x = x + up @ sd[p + "mlp.c_proj.weight"].T + sd[p + "mlp.c_proj.bias"]
    want = _ln(x, sd["transformer.ln_f.weight"], sd["transformer.ln_f.bias"]) \
        @ sd["lm_head.weight"].T

    cfg = dict(n_layer=NL, n_embd=H, n_head=NH, num_query_groups=NKV,
               layer_norm_epsilon=1e-6, n_positions=128, vocab_size=V)
    path = str(tmp_path / "codeshell.gguf")
    convert_hf_codeshell(sd, cfg, path, gtype=_G.F32)
    got = _logits(path, toks)
    np.testing.assert_allclose(got[0], want, rtol=3e-4, atol=3e-5)


def test_starcoder_v1_matches_numpy_spec(tmp_path, toks):
    """starcoder v1: learned positions, LayerNorm+bias blocks, multi-query
    fused c_attn, tanh-GELU FFN with biases, NO rope
    (reference src/models/starcoder.cpp)."""
    from zllm.convert.hf import convert_hf_starcoder
    from zllm.gguf.constants import GGMLType as _G

    rng = np.random.default_rng(8)
    hd = H // NH
    kvd = hd  # multi-query: 1 kv head
    sd = {"transformer.wte.weight": _w(rng, V, H),
          "transformer.wpe.weight": _w(rng, 128, H),
          "transformer.ln_f.weight": _w(rng, H) + 1.0,
          "transformer.ln_f.bias": _w(rng, H),
          "lm_head.weight": _w(rng, V, H)}
    for il in range(NL):
        p = f"transformer.h.{il}."
        for nm in ("ln_1", "ln_2"):
            sd[p + nm + ".weight"] = _w(rng, H) + 1.0
            sd[p + nm + ".bias"] = _w(rng, H)
        sd[p + "attn.c_attn.weight"] = _w(rng, H + 2 * kvd, H)
        sd[p + "attn.c_attn.bias"] = _w(rng, H + 2 * kvd)
        sd[p + "attn.c_proj.weight"] = _w(rng, H, H)
        sd[p + "attn.c_proj.bias"] = _w(rng, H)
        sd[p + "mlp.c_fc.weight"] = _w(rng, F, H)
        sd[p + "mlp.c_fc.bias"] = _w(rng, F)
        sd[p + "mlp.c_proj.weight"] = _w(rng, H, F)
        sd[p + "mlp.c_proj.bias"] = _w(rng, H)

    def gelu_tanh(x):
        return 0.5 * x * (1.0 + np.tanh(0.7978845608 * (x + 0.044715 * x**3)))

    t = toks.shape[1]
    x = (sd["transformer.wte.weight"][toks[0]]
         + sd["transformer.wpe.weight"][np.arange(t)]).astype(np.float64)
    for il in range(NL):
        p = f"transformer.h.{il}."
        h = _ln(x, sd[p + "ln_1.weight"], sd[p + "ln_1.bias"])
        qkv = h @ sd[p + "attn.c_attn.weight"].T + sd[p + "attn.c_attn.bias"]
        q = qkv[:, :H].reshape(t, NH, hd)
        k = qkv[:, H : H + kvd].reshape(t, 1, hd)
        v = qkv[:, H + kvd :].reshape(t, 1, hd)
        att = _attn(q, k, v, hd**-0.5)
        x = x + att @ sd[p + "attn.c_proj.weight"].T + sd[p + "attn.c_proj.bias"]
        h2 = _ln(x, sd[p + "ln_2.weight"], sd[p + "ln_2.bias"])
        up = gelu_tanh(h2 @ sd[p + "mlp.c_fc.weight"].T + sd[p + "mlp.c_fc.bias"])
        x = x + up @ sd[p + "mlp.c_proj.weight"].T + sd[p + "mlp.c_proj.bias"]
    want = _ln(x, sd["transformer.ln_f.weight"], sd["transformer.ln_f.bias"]) \
        @ sd["lm_head.weight"].T

    cfg = dict(n_layer=NL, n_embd=H, n_head=NH, multi_query=True,
               layer_norm_epsilon=1e-6, n_positions=128, n_inner=F,
               vocab_size=V)
    path = str(tmp_path / "starcoder.gguf")
    convert_hf_starcoder(sd, cfg, path, gtype=_G.F32)
    got = _logits(path, toks)
    np.testing.assert_allclose(got[0], want, rtol=3e-4, atol=3e-5)


def test_mistral3_and_llama_embed_match_llama(tmp_path, toks):
    """mistral3 / llama-embed are llama-graph clones."""
    from zllm.convert import convert_hf_llama

    rng = np.random.default_rng(9)
    sd = _base_sd(rng)
    pa = str(tmp_path / "l.gguf")
    convert_hf_llama(sd, _cfg(), pa, arch="llama", gtype=GGMLType.F32)
    base = _logits(pa, toks)
    for arch in ("mistral3", "llama-embed"):
        pb = str(tmp_path / f"{arch}.gguf")
        convert_hf_llama(sd, _cfg(), pb, arch=arch, gtype=GGMLType.F32)
        np.testing.assert_allclose(_logits(pb, toks), base, rtol=2e-5, atol=2e-5)
