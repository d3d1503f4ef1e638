"""Architectures whose HF classes need remote code (unavailable offline):
baichuan, internlm2, minicpm.  Verified by CROSS-CONVERSION equivalence —
the same underlying weights expressed in each arch's native HF layout must
produce logits identical to the llama-converted model (these graphs ARE
llama graphs; reference convert_hf_to_gguf.py BaichuanModel /
InternLM2Model / MiniCPMModel differ only in tensor packing + scale kvs),
plus analytic checks of minicpm's scaling knobs (reference
src/llama-model.cpp minicpm loading + src/models/minicpm.cpp)."""

import numpy as np
import pytest

from zllm.gguf.constants import GGMLType

CFG = dict(
    vocab_size=151,
    hidden_size=64,
    intermediate_size=96,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=128,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    tie_word_embeddings=False,
)


def _llama_sd(seed=0):
    """Tiny random llama-layout HF state dict (numpy)."""
    rng = np.random.default_rng(seed)
    h, f, v = CFG["hidden_size"], CFG["intermediate_size"], CFG["vocab_size"]
    nh, nkv = CFG["num_attention_heads"], CFG["num_key_value_heads"]
    hd = h // nh

    def w(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    sd = {"model.embed_tokens.weight": w(v, h), "model.norm.weight": w(h) + 1.0,
          "lm_head.weight": w(v, h)}
    for il in range(CFG["num_hidden_layers"]):
        p = f"model.layers.{il}."
        sd[p + "input_layernorm.weight"] = w(h) + 1.0
        sd[p + "post_attention_layernorm.weight"] = w(h) + 1.0
        sd[p + "self_attn.q_proj.weight"] = w(nh * hd, h)
        sd[p + "self_attn.k_proj.weight"] = w(nkv * hd, h)
        sd[p + "self_attn.v_proj.weight"] = w(nkv * hd, h)
        sd[p + "self_attn.o_proj.weight"] = w(h, nh * hd)
        sd[p + "mlp.gate_proj.weight"] = w(f, h)
        sd[p + "mlp.up_proj.weight"] = w(f, h)
        sd[p + "mlp.down_proj.weight"] = w(h, f)
    return sd


def _logits(path, toks):
    import jax
    import jax.numpy as jnp

    from zllm.models.llama import forward
    from zllm.models.loader import Model

    m = Model.load(path, quantized=False, dtype=jnp.float32)
    pos = np.broadcast_to(np.arange(toks.shape[1], dtype=np.int32), toks.shape)
    fwd = jax.jit(lambda p, t, q: forward(p, m.cfg, t, q, None)[0])
    return np.asarray(fwd(m.params, jnp.asarray(toks), jnp.asarray(pos)))


@pytest.fixture(scope="module")
def toks():
    return np.random.default_rng(7).integers(0, CFG["vocab_size"], (2, 10)).astype(np.int32)


@pytest.fixture(scope="module")
def want(tmp_path_factory, toks):
    """Reference logits: the same weights through the qwen3-style (neox,
    no-permute) conversion — the convention the three archs use."""
    from zllm.convert import convert_hf_llama

    path = str(tmp_path_factory.mktemp("l") / "ref.gguf")
    cfg = dict(CFG)
    convert_hf_llama(_llama_sd(), cfg, path, arch="qwen3", gtype=GGMLType.F32)
    return _logits(path, toks)


def test_baichuan_matches_llama(tmp_path, toks, want):
    """baichuan = llama with fused W_pack; same weights -> same logits."""
    from zllm.convert import convert_hf_llama

    sd = _llama_sd()
    out = {}
    for k, v in sd.items():
        if ".self_attn.q_proj.weight" in k:
            p = k.replace("q_proj.weight", "")
            out[p + "W_pack.weight"] = np.concatenate(
                [sd[p + "q_proj.weight"], sd[p + "k_proj.weight"], sd[p + "v_proj.weight"]])
        elif ".k_proj." in k or ".v_proj." in k:
            continue
        else:
            out[k] = v
    path = str(tmp_path / "baichuan.gguf")
    convert_hf_llama(out, CFG, path, arch="baichuan", gtype=GGMLType.F32)
    got = _logits(path, toks)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_internlm2_matches_llama(tmp_path, toks, want):
    """internlm2's grouped wqkv + w1/w3/w2 names unpack to the llama graph."""
    from zllm.convert.hf import convert_hf_internlm2

    h = CFG["hidden_size"]
    nh, nkv = CFG["num_attention_heads"], CFG["num_key_value_heads"]
    hd, qpk = h // nh, nh // nkv
    sd = _llama_sd()
    out = {}
    for k, v in sd.items():
        if ".self_attn.q_proj.weight" in k:
            p = k.replace("self_attn.q_proj.weight", "")
            q = sd[p + "self_attn.q_proj.weight"].reshape(nkv, qpk, hd, h)
            kk = sd[p + "self_attn.k_proj.weight"].reshape(nkv, 1, hd, h)
            vv = sd[p + "self_attn.v_proj.weight"].reshape(nkv, 1, hd, h)
            out[p + "attention.wqkv.weight"] = np.concatenate(
                [q, kk, vv], axis=1).reshape(nkv * (qpk + 2) * hd, h)
        elif ".k_proj." in k or ".v_proj." in k:
            continue
        else:
            out[(k.replace("model.embed_tokens", "model.tok_embeddings")
                 .replace("self_attn.o_proj", "attention.wo")
                 .replace("input_layernorm", "attention_norm")
                 .replace("mlp.gate_proj", "feed_forward.w1")
                 .replace("mlp.up_proj", "feed_forward.w3")
                 .replace("mlp.down_proj", "feed_forward.w2")
                 .replace("post_attention_layernorm", "ffn_norm")
                 .replace("lm_head.weight", "output.weight")
                 if not k.startswith("model.norm") else k)] = v
    path = str(tmp_path / "internlm2.gguf")
    convert_hf_internlm2(out, CFG, path, gtype=GGMLType.F32)
    got = _logits(path, toks)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_minicpm_neutral_scales_match_llama(tmp_path, toks, want):
    """minicpm with identity-valued scale knobs == llama."""
    from zllm.convert import convert_hf_llama

    cfg = dict(CFG, scale_emb=1.0,
               scale_depth=float(CFG["num_hidden_layers"]) ** 0.5,
               dim_model_base=CFG["hidden_size"])
    path = str(tmp_path / "minicpm0.gguf")
    convert_hf_llama(_llama_sd(), cfg, path, arch="minicpm", gtype=GGMLType.F32)
    got = _logits(path, toks)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_minicpm_logit_scale_analytic(tmp_path, toks):
    """dim_model_base = hidden/2 must scale logits by exactly 0.5
    (reference: minicpm logits / (n_embd / dim_model_base))."""
    from zllm.convert import convert_hf_llama

    sd = _llama_sd()
    base = dict(CFG, scale_emb=1.0,
                scale_depth=float(CFG["num_hidden_layers"]) ** 0.5,
                dim_model_base=CFG["hidden_size"])
    p1 = str(tmp_path / "m1.gguf")
    convert_hf_llama(sd, base, p1, arch="minicpm", gtype=GGMLType.F32)
    half = dict(base, dim_model_base=CFG["hidden_size"] // 2)
    p2 = str(tmp_path / "m2.gguf")
    convert_hf_llama(sd, half, p2, arch="minicpm", gtype=GGMLType.F32)
    np.testing.assert_allclose(_logits(p2, toks), 0.5 * _logits(p1, toks),
                               rtol=1e-5, atol=1e-6)


def test_minicpm_scales_engage(tmp_path, toks):
    """scale_emb and scale_depth must change the distribution (knobs are
    wired, not dropped)."""
    from zllm.convert import convert_hf_llama

    sd = _llama_sd()
    neutral = dict(CFG, scale_emb=1.0,
                   scale_depth=float(CFG["num_hidden_layers"]) ** 0.5,
                   dim_model_base=CFG["hidden_size"])
    p0 = str(tmp_path / "n.gguf")
    convert_hf_llama(sd, neutral, p0, arch="minicpm", gtype=GGMLType.F32)
    base = _logits(p0, toks)
    for knob, val in (("scale_emb", 12.0), ("scale_depth", 1.4)):
        cfg = dict(neutral, **{knob: val})
        p = str(tmp_path / f"{knob}.gguf")
        convert_hf_llama(sd, cfg, p, arch="minicpm", gtype=GGMLType.F32)
        got = _logits(p, toks)
        assert np.abs(got - base).max() > 1e-3, f"{knob} had no effect"
