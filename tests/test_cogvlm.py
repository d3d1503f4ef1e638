"""cogvlm text stack: dual expert weight sets — language weights for
token batches, vision-expert weights for image-embedding batches
(reference src/models/cogvlm.cpp), verified against numpy specs of both
paths on the same GGUF."""

import numpy as np
import pytest

from test_arch_wave5 import _attn, _neox_rope, _rms, _silu, _w
from zllm.gguf.constants import GGMLType

V, H, NH, NL, F = 149, 64, 4, 2, 48
HD = H // NH


def _sd(rng):
    sd = {"model.embed_tokens.weight": _w(rng, V, H),
          "model.norm.weight": _w(rng, H) + 1.0,
          "lm_head.weight": _w(rng, V, H)}
    for il in range(NL):
        p = f"model.layers.{il}."
        a = p + "self_attn."
        sd[p + "input_layernorm.weight"] = _w(rng, H) + 1.0
        sd[p + "post_attention_layernorm.weight"] = _w(rng, H) + 1.0
        for pre in ("language_expert", "vision_expert"):
            sd[a + f"{pre}_query_key_value.weight"] = _w(rng, 3 * H, H)
            sd[a + f"{pre}_dense.weight"] = _w(rng, H, H)
        for mlp in ("language_mlp", "vision_mlp"):
            sd[p + f"mlp.{mlp}.gate_proj.weight"] = _w(rng, F, H)
            sd[p + f"mlp.{mlp}.up_proj.weight"] = _w(rng, F, H)
            sd[p + f"mlp.{mlp}.down_proj.weight"] = _w(rng, H, F)
    return sd


CFG = dict(num_hidden_layers=NL, hidden_size=H, num_attention_heads=NH,
           intermediate_size=F, rms_norm_eps=1e-6, rope_theta=10000.0,
           max_position_embeddings=128, vocab_size=V)


def _spec(sd, x0, expert):
    """expert: 'language' or 'vision'; x0 [T, H] input embeddings."""
    t = x0.shape[0]
    pos = np.arange(t)
    x = x0.astype(np.float64)
    for il in range(NL):
        p = f"model.layers.{il}."
        a = p + "self_attn."
        h = _rms(x, sd[p + "input_layernorm.weight"])
        qkv = h @ sd[a + f"{expert}_expert_query_key_value.weight"].T
        q = qkv[:, :H].reshape(t, NH, HD)
        k = qkv[:, H : 2 * H].reshape(t, NH, HD)
        v = qkv[:, 2 * H :].reshape(t, NH, HD)
        q = _neox_rope(q, pos, HD, 10000.0)
        k = _neox_rope(k, pos, HD, 10000.0)
        x = x + _attn(q, k, v, HD**-0.5) @ sd[a + f"{expert}_expert_dense.weight"].T
        h2 = _rms(x, sd[p + "post_attention_layernorm.weight"])
        mlp = f"mlp.{expert}_mlp"
        x = x + (_silu(h2 @ sd[f"{p}{mlp}.gate_proj.weight"].T)
                 * (h2 @ sd[f"{p}{mlp}.up_proj.weight"].T)
                 ) @ sd[f"{p}{mlp}.down_proj.weight"].T
    return _rms(x, sd["model.norm.weight"]) @ sd["lm_head.weight"].T


def test_cogvlm_text_and_vision_paths(tmp_path):
    import jax
    import jax.numpy as jnp

    from zllm.convert.hf import convert_hf_cogvlm
    from zllm.models.llama import forward
    from zllm.models.loader import Model

    rng = np.random.default_rng(0)
    sd = _sd(rng)
    path = str(tmp_path / "cogvlm.gguf")
    convert_hf_cogvlm(sd, CFG, path, gtype=GGMLType.F32)
    m = Model.load(path, quantized=False, dtype=jnp.float32)
    assert "visexp_wq" in m.params["layers"][0]

    toks = np.random.default_rng(1).integers(0, V, (1, 9)).astype(np.int32)
    t = toks.shape[1]
    pos = np.broadcast_to(np.arange(t, dtype=np.int32), toks.shape)

    # token batch -> language expert
    want = _spec(sd, sd["model.embed_tokens.weight"][toks[0]], "language")
    got = np.asarray(jax.jit(
        lambda p, tk, q: forward(p, m.cfg, tk, q, None)[0]
    )(m.params, jnp.asarray(toks), jnp.asarray(pos)))[0]
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)

    # embedding batch -> vision expert
    emb = np.random.default_rng(2).standard_normal((1, t, H)).astype(np.float32) * 0.1
    want_v = _spec(sd, emb[0], "vision")
    got_v = np.asarray(forward(m.params, m.cfg, jnp.asarray(toks),
                               jnp.asarray(pos), None,
                               embeds=jnp.asarray(emb))[0])[0]
    np.testing.assert_allclose(got_v, want_v, rtol=3e-4, atol=3e-5)
    # and the two paths genuinely differ
    assert not np.allclose(got, got_v, atol=1e-3)
