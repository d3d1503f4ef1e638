"""chameleon: llama graph + per-head q/k LAYERNORM (weight+bias, before
rope) and the swin_norm post-normalization ordering (reference
src/models/chameleon.cpp; convert_hf_to_gguf.py ChameleonModel with the
q/k-norm half-split interleave)."""

import numpy as np
import pytest

from test_arch_wave5 import _attn, _neox_rope, _rms, _silu, _w
from zllm.gguf.constants import GGMLType

V, H, NH, NKV, HD, NL, F = 149, 64, 4, 2, 16, 2, 48


def _ln_head(x, wt, bias, eps=1e-6):
    """LayerNorm over head_dim; wt/bias [head_dim] (HF stores identical
    rows per head)."""
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * wt + bias


def _sd(rng):
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
        # HF ChameleonLayerNorm([n_heads, head_dim]) with identical rows
        sd[p + "self_attn.q_norm.weight"] = np.tile(_w(rng, HD) + 1.0, (NH, 1))
        sd[p + "self_attn.q_norm.bias"] = np.tile(_w(rng, HD), (NH, 1))
        sd[p + "self_attn.k_norm.weight"] = np.tile(_w(rng, HD) + 1.0, (NKV, 1))
        sd[p + "self_attn.k_norm.bias"] = np.tile(_w(rng, HD), (NKV, 1))
        sd[p + "mlp.gate_proj.weight"] = _w(rng, F, H)
        sd[p + "mlp.up_proj.weight"] = _w(rng, F, H)
        sd[p + "mlp.down_proj.weight"] = _w(rng, H, F)
    return sd


def _spec(sd, toks, swin):
    t = toks.shape[1]
    pos = np.arange(t)
    x = sd["model.embed_tokens.weight"][toks[0]].astype(np.float64)
    for il in range(NL):
        p = f"model.layers.{il}."
        h = x if swin else _rms(x, sd[p + "input_layernorm.weight"])
        q = (h @ sd[p + "self_attn.q_proj.weight"].T).reshape(t, NH, HD)
        k = (h @ sd[p + "self_attn.k_proj.weight"].T).reshape(t, NKV, HD)
        v = (h @ sd[p + "self_attn.v_proj.weight"].T).reshape(t, NKV, HD)
        q = _ln_head(q, sd[p + "self_attn.q_norm.weight"][0],
                     sd[p + "self_attn.q_norm.bias"][0])
        k = _ln_head(k, sd[p + "self_attn.k_norm.weight"][0],
                     sd[p + "self_attn.k_norm.bias"][0])
        q = _neox_rope(q, pos, HD, 10000.0)
        k = _neox_rope(k, pos, HD, 10000.0)
        att = _attn(q, k, v, HD**-0.5) @ sd[p + "self_attn.o_proj.weight"].T
        if swin:
            att = _rms(att, sd[p + "input_layernorm.weight"])
        x = x + att
        ffin = x if swin else _rms(x, sd[p + "post_attention_layernorm.weight"])
        ff = (_silu(ffin @ sd[p + "mlp.gate_proj.weight"].T)
              * (ffin @ sd[p + "mlp.up_proj.weight"].T)) @ sd[p + "mlp.down_proj.weight"].T
        if swin:
            ff = _rms(ff, sd[p + "post_attention_layernorm.weight"])
        x = x + ff
    return _rms(x, sd["model.norm.weight"]) @ sd["lm_head.weight"].T


@pytest.fixture()
def toks():
    return np.random.default_rng(7).integers(0, V, (1, 9)).astype(np.int32)


@pytest.mark.parametrize("swin", [False, True])
def test_chameleon_matches_numpy_spec(tmp_path, toks, swin):
    import jax
    import jax.numpy as jnp

    from zllm.convert import convert_hf_llama
    from zllm.models.llama import forward
    from zllm.models.loader import Model

    rng = np.random.default_rng(int(swin))
    sd = _sd(rng)
    want = _spec(sd, toks, swin)

    cfg = dict(vocab_size=V, hidden_size=H, intermediate_size=F,
               num_hidden_layers=NL, num_attention_heads=NH,
               num_key_value_heads=NKV, max_position_embeddings=128,
               rms_norm_eps=1e-6, rope_theta=10000.0, swin_norm=swin,
               tie_word_embeddings=False)
    path = str(tmp_path / f"cham{int(swin)}.gguf")
    convert_hf_llama(sd, cfg, path, arch="chameleon", gtype=GGMLType.F32)
    m = Model.load(path, quantized=False, dtype=jnp.float32)
    assert m.cfg.qk_norm_layer and m.cfg.swin_norm == swin
    t = toks.shape[1]
    posj = np.broadcast_to(np.arange(t, dtype=np.int32), toks.shape)
    fwd = jax.jit(lambda p, tk, q: forward(p, m.cfg, tk, q, None)[0])
    got = np.asarray(fwd(m.params, jnp.asarray(toks), jnp.asarray(posj)))
    np.testing.assert_allclose(got[0], want, rtol=3e-4, atol=3e-5)


def test_chameleon_serves_in_engine(tmp_path, toks):
    import jax.numpy as jnp

    from zllm.convert import convert_hf_llama
    from zllm.models.loader import Model
    from zllm.server.engine import Engine, Request

    rng = np.random.default_rng(4)
    cfg = dict(vocab_size=V, hidden_size=H, intermediate_size=F,
               num_hidden_layers=NL, num_attention_heads=NH,
               num_key_value_heads=NKV, max_position_embeddings=128,
               rms_norm_eps=1e-6, rope_theta=10000.0, swin_norm=True,
               tie_word_embeddings=False)
    path = str(tmp_path / "chams.gguf")
    convert_hf_llama(_sd(rng), cfg, path, arch="chameleon", gtype=GGMLType.F32)
    m = Model.load(path, quantized=False, dtype=jnp.float32)
    eng = Engine(m, n_slots=2, max_len=64, prefill_chunk=8)
    eng.start()
    try:
        req = Request(prompt_tokens=toks[0].tolist(), max_new=8, temp=0.0)
        eng.submit(req)
        while not req.done:
            if req.stream_q.get(timeout=120) is None:
                break
        assert not req.error, req.error
        assert len(req.out_tokens) == 8
    finally:
        eng.stop()
