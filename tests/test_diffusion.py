"""Diffusion LM family (dream, llada, llada-moe, rnd1): non-causal
forward parity against numpy specs / causal-twin cross-conversions, and
the iterative denoising loop of tools/diffusion.py (reference:
examples/diffusion/diffusion-cli.cpp + src/models/{dream,llada}*.cpp)."""

import numpy as np
import pytest

from test_arch_wave5 import (
    H, HD, NH, NKV, NL, F, V, _attn, _logits, _neox_rope, _rms, _silu, _w,
)
from zllm.gguf.constants import GGMLType


@pytest.fixture()
def toks():
    return np.random.default_rng(11).integers(0, V, (1, 9)).astype(np.int32)


def _attn_full(q, k, v, scale):
    """Bidirectional (non-causal) attention, numpy."""
    t, nh, d = q.shape
    g = nh // k.shape[1]
    kk = np.repeat(k, g, axis=1)
    vv = np.repeat(v, g, axis=1)
    s = np.einsum("thd,shd->hts", q, kk) * scale
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("hts,shd->thd", p, vv).reshape(t, nh * d)


def _qwen2_sd(rng, bias=True):
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
        if bias:
            sd[p + "self_attn.q_proj.bias"] = _w(rng, NH * HD)
            sd[p + "self_attn.k_proj.bias"] = _w(rng, NKV * HD)
            sd[p + "self_attn.v_proj.bias"] = _w(rng, NKV * HD)
        sd[p + "mlp.gate_proj.weight"] = _w(rng, F, H)
        sd[p + "mlp.up_proj.weight"] = _w(rng, F, H)
        sd[p + "mlp.down_proj.weight"] = _w(rng, H, F)
    return sd


def _base_cfg(**kw):
    cfg = dict(vocab_size=V, hidden_size=H, intermediate_size=F,
               num_hidden_layers=NL, num_attention_heads=NH,
               num_key_value_heads=NKV, max_position_embeddings=128,
               rms_norm_eps=1e-6, rope_theta=10000.0,
               tie_word_embeddings=False)
    cfg.update(kw)
    return cfg


def test_dream_matches_numpy_spec(tmp_path, toks):
    """dream = qwen2 weights + bidirectional attention, no cache
    (reference src/models/dream.cpp build_attn_inp_no_cache)."""
    from zllm.convert import convert_hf_llama

    rng = np.random.default_rng(0)
    sd = _qwen2_sd(rng, bias=True)

    t = toks.shape[1]
    pos = np.arange(t)
    x = sd["model.embed_tokens.weight"][toks[0]].astype(np.float64)
    for il in range(NL):
        p = f"model.layers.{il}."
        h = _rms(x, sd[p + "input_layernorm.weight"])
        q = (h @ sd[p + "self_attn.q_proj.weight"].T
             + sd[p + "self_attn.q_proj.bias"]).reshape(t, NH, HD)
        k = (h @ sd[p + "self_attn.k_proj.weight"].T
             + sd[p + "self_attn.k_proj.bias"]).reshape(t, NKV, HD)
        v = (h @ sd[p + "self_attn.v_proj.weight"].T
             + sd[p + "self_attn.v_proj.bias"]).reshape(t, NKV, HD)
        q = _neox_rope(q, pos, HD, 10000.0)
        k = _neox_rope(k, pos, HD, 10000.0)
        x = x + _attn_full(q, k, v, HD**-0.5) @ sd[p + "self_attn.o_proj.weight"].T
        h2 = _rms(x, sd[p + "post_attention_layernorm.weight"])
        x = x + (_silu(h2 @ sd[p + "mlp.gate_proj.weight"].T)
                 * (h2 @ sd[p + "mlp.up_proj.weight"].T)) @ sd[p + "mlp.down_proj.weight"].T
    want = _rms(x, sd["model.norm.weight"]) @ sd["lm_head.weight"].T

    path = str(tmp_path / "dream.gguf")
    convert_hf_llama(sd, _base_cfg(), path, arch="dream", gtype=GGMLType.F32)
    got = _logits(path, toks)
    np.testing.assert_allclose(got[0], want, rtol=3e-4, atol=3e-5)


def test_llada_matches_numpy_spec(tmp_path, toks):
    """llada = llama weights (undo_permute) + bidirectional attention
    (reference src/models/llada.cpp)."""
    from zllm.convert import convert_hf_llama

    rng = np.random.default_rng(1)
    sd = _qwen2_sd(rng, bias=False)

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
        x = x + _attn_full(q, k, v, HD**-0.5) @ sd[p + "self_attn.o_proj.weight"].T
        h2 = _rms(x, sd[p + "post_attention_layernorm.weight"])
        x = x + (_silu(h2 @ sd[p + "mlp.gate_proj.weight"].T)
                 * (h2 @ sd[p + "mlp.up_proj.weight"].T)) @ sd[p + "mlp.down_proj.weight"].T
    want = _rms(x, sd["model.norm.weight"]) @ sd["lm_head.weight"].T

    path = str(tmp_path / "llada.gguf")
    convert_hf_llama(sd, _base_cfg(), path, arch="llada", gtype=GGMLType.F32)
    got = _logits(path, toks)
    np.testing.assert_allclose(got[0], want, rtol=3e-4, atol=3e-5)


def _moe_sd(rng, qk_norm, bias, shared):
    ne, fx = 4, 32
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
        if qk_norm:
            sd[p + "self_attn.q_norm.weight"] = _w(rng, HD) + 1.0
            sd[p + "self_attn.k_norm.weight"] = _w(rng, HD) + 1.0
        if bias:
            sd[p + "self_attn.q_proj.bias"] = _w(rng, NH * HD)
            sd[p + "self_attn.k_proj.bias"] = _w(rng, NKV * HD)
            sd[p + "self_attn.v_proj.bias"] = _w(rng, NKV * HD)
        sd[p + "mlp.gate.weight"] = _w(rng, ne, H)
        for e in range(ne):
            q = f"{p}mlp.experts.{e}."
            sd[q + "gate_proj.weight"] = _w(rng, fx, H)
            sd[q + "up_proj.weight"] = _w(rng, fx, H)
            sd[q + "down_proj.weight"] = _w(rng, H, fx)
        if shared:
            sd[p + "mlp.shared_expert.gate_proj.weight"] = _w(rng, fx, H)
            sd[p + "mlp.shared_expert.up_proj.weight"] = _w(rng, fx, H)
            sd[p + "mlp.shared_expert.down_proj.weight"] = _w(rng, H, fx)
            sd[p + "mlp.shared_expert_gate.weight"] = _w(rng, 1, H)
    return sd


def _moe_cfg(**kw):
    return _base_cfg(num_experts=4, num_experts_per_tok=2,
                     moe_intermediate_size=32, norm_topk_prob=False,
                     decoder_sparse_step=1, **kw)


def test_llada_moe_matches_causal_twin(tmp_path, toks):
    """llada-moe is the qwen3moe graph with non-causal attention: logits
    must equal the qwen3moe conversion evaluated under an explicit
    full-visibility mask."""
    import jax
    import jax.numpy as jnp

    from zllm.convert import convert_hf_llama
    from zllm.models.llama import forward
    from zllm.models.loader import Model

    rng = np.random.default_rng(2)
    sd = _moe_sd(rng, qk_norm=True, bias=False, shared=False)
    pa = str(tmp_path / "q3moe.gguf")
    pb = str(tmp_path / "lladamoe.gguf")
    convert_hf_llama(sd, _moe_cfg(head_dim=HD), pa, arch="qwen3moe", gtype=GGMLType.F32)
    convert_hf_llama(sd, _moe_cfg(head_dim=HD), pb, arch="llada-moe", gtype=GGMLType.F32)

    t = toks.shape[1]
    pos = np.broadcast_to(np.arange(t, dtype=np.int32), toks.shape)
    ma = Model.load(pa, quantized=False, dtype=jnp.float32)
    full = jnp.ones((1, t, t), bool)
    want = np.asarray(forward(ma.params, ma.cfg, jnp.asarray(toks),
                              jnp.asarray(pos), None, mask=full)[0])
    got = _logits(pb, toks)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


def test_rnd1_matches_causal_twin(tmp_path, toks):
    """rnd1 = qwen2moe (shared expert + gate) with non-causal attention."""
    import jax.numpy as jnp

    from zllm.convert import convert_hf_llama
    from zllm.models.llama import forward
    from zllm.models.loader import Model

    rng = np.random.default_rng(3)
    sd = _moe_sd(rng, qk_norm=False, bias=True, shared=True)
    cfg = _moe_cfg(shared_expert_intermediate_size=32)
    pa = str(tmp_path / "q2moe.gguf")
    pb = str(tmp_path / "rnd1.gguf")
    convert_hf_llama(sd, cfg, pa, arch="qwen2moe", gtype=GGMLType.F32)
    convert_hf_llama(sd, cfg, pb, arch="rnd1", gtype=GGMLType.F32)

    t = toks.shape[1]
    pos = np.broadcast_to(np.arange(t, dtype=np.int32), toks.shape)
    ma = Model.load(pa, quantized=False, dtype=jnp.float32)
    full = jnp.ones((1, t, t), bool)
    want = np.asarray(forward(ma.params, ma.cfg, jnp.asarray(toks),
                              jnp.asarray(pos), None, mask=full)[0])
    got = _logits(pb, toks)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


@pytest.fixture(scope="module")
def dream_model(tmp_path_factory):
    import jax.numpy as jnp

    from zllm.convert import convert_hf_llama
    from zllm.models.loader import Model

    rng = np.random.default_rng(5)
    sd = _qwen2_sd(rng, bias=True)
    path = str(tmp_path_factory.mktemp("dg") / "dream.gguf")
    convert_hf_llama(sd, _base_cfg(), path, arch="dream", gtype=GGMLType.F32)
    return Model.load(path, quantized=False, dtype=jnp.float32)


def test_diffusion_generate_denoises(dream_model):
    """The denoising loop fills every masked position, preserves the
    prompt, and is deterministic at temperature 0."""
    sys_path_tools()
    from diffusion import diffusion_generate

    prompt = [3, 1, 4, 1, 5]
    out = diffusion_generate(dream_model, prompt, 16, steps=8,
                             mask_id=V - 1, algorithm="confidence")
    assert out[:5] == prompt
    assert all(t != V - 1 for t in out[5:])
    out2 = diffusion_generate(dream_model, prompt, 16, steps=8,
                              mask_id=V - 1, algorithm="confidence")
    assert out == out2


def test_diffusion_block_schedule_and_cfg(dream_model):
    sys_path_tools()
    from diffusion import diffusion_generate

    prompt = [2, 7]
    out = diffusion_generate(dream_model, prompt, 10, steps=4,
                             mask_id=V - 1, algorithm="entropy",
                             schedule="block", block_length=4, cfg_scale=1.0)
    assert out[:2] == prompt
    assert all(t != V - 1 for t in out[2:])


def test_diffusion_sampled_algorithms(dream_model):
    sys_path_tools()
    from diffusion import diffusion_generate

    for alg in ("origin", "random", "margin"):
        out = diffusion_generate(dream_model, [1, 2], 8, steps=4,
                                 mask_id=V - 1, algorithm=alg,
                                 temperature=0.8, top_k=20, seed=3)
        assert out[:2] == [1, 2]
        assert all(t != V - 1 for t in out[2:])


def test_engine_rejects_diffusion(dream_model):
    from zllm.server.engine import Engine

    with pytest.raises(ValueError):
        Engine(dream_model, n_slots=2, max_len=64)


def sys_path_tools():
    import os
    import sys

    tools = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools")
    if tools not in sys.path:
        sys.path.insert(0, tools)
