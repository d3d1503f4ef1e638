"""plm: deepseek2-lite MLA (dense wq, no q_lora) + non-gated squared-relu
FFN + tied embeddings (reference src/models/plm.cpp), verified against a
numpy implementation of the plain (non-absorbed) MLA graph."""

import numpy as np
import pytest

from test_arch_wave5 import _rms, _w
from test_minicpm3 import _norm_rope
from zllm.gguf.constants import GGMLType

V, H, NH, NL, F = 149, 64, 4, 2, 48
DN, DR, DV, R = 16, 8, 16, 24


@pytest.fixture()
def toks():
    return np.random.default_rng(9).integers(0, V, (1, 9)).astype(np.int32)


def test_plm_matches_numpy_spec(tmp_path, toks):
    import jax
    import jax.numpy as jnp

    from zllm.convert.hf import convert_hf_deepseek2
    from zllm.models.llama import forward
    from zllm.models.loader import Model

    rng = np.random.default_rng(0)
    cfg = dict(vocab_size=V, hidden_size=H, intermediate_size=F,
               num_hidden_layers=NL, num_attention_heads=NH,
               qk_nope_head_dim=DN, qk_rope_head_dim=DR, v_head_dim=DV,
               kv_lora_rank=R, q_lora_rank=None,
               max_position_embeddings=128, rms_norm_eps=1e-6,
               rope_theta=10000.0, tie_word_embeddings=True)
    sd = {"model.embed_tokens.weight": _w(rng, V, H),
          "model.norm.weight": _w(rng, H) + 1.0}
    for il in range(NL):
        p = f"model.layers.{il}."
        sd[p + "input_layernorm.weight"] = _w(rng, H) + 1.0
        sd[p + "post_attention_layernorm.weight"] = _w(rng, H) + 1.0
        sd[p + "self_attn.q_proj.weight"] = _w(rng, NH * (DN + DR), H)
        sd[p + "self_attn.kv_a_proj_with_mqa.weight"] = _w(rng, R + DR, H)
        sd[p + "self_attn.kv_a_layernorm.weight"] = _w(rng, R) + 1.0
        sd[p + "self_attn.kv_b_proj.weight"] = _w(rng, NH * (DN + DV), R)
        sd[p + "self_attn.o_proj.weight"] = _w(rng, H, NH * DV)
        sd[p + "mlp.up_proj.weight"] = _w(rng, F, H)
        sd[p + "mlp.down_proj.weight"] = _w(rng, H, F)

    t = toks.shape[1]
    pos = np.arange(t)
    kq_scale = (DN + DR) ** -0.5
    x = sd["model.embed_tokens.weight"][toks[0]].astype(np.float64)
    for il in range(NL):
        p = f"model.layers.{il}."
        h = _rms(x, sd[p + "input_layernorm.weight"])
        q = (h @ sd[p + "self_attn.q_proj.weight"].T).reshape(t, NH, DN + DR)
        q_nope, q_pe = q[..., :DN], q[..., DN:]
        kv_pe = h @ sd[p + "self_attn.kv_a_proj_with_mqa.weight"].T
        kv_c = _rms(kv_pe[:, :R], sd[p + "self_attn.kv_a_layernorm.weight"])
        k_pe = kv_pe[:, None, R:]
        kv = (kv_c @ sd[p + "self_attn.kv_b_proj.weight"].T).reshape(t, NH, DN + DV)
        k_nope, v = kv[..., :DN], kv[..., DN:]
        q_pe = _norm_rope(q_pe, pos, DR, 10000.0)
        k_pe = _norm_rope(k_pe, pos, DR, 10000.0)
        qh = np.concatenate([q_nope, q_pe], axis=-1)
        kh = np.concatenate([k_nope, np.broadcast_to(k_pe, (t, NH, DR))], axis=-1)
        s = np.einsum("thd,shd->hts", qh, kh) * kq_scale
        mask = np.tril(np.ones((t, t), bool))
        s = np.where(mask[None], s, -np.inf)
        pm = np.exp(s - s.max(-1, keepdims=True))
        pm /= pm.sum(-1, keepdims=True)
        att = np.einsum("hts,shd->thd", pm, v).reshape(t, NH * DV)
        x = x + att @ sd[p + "self_attn.o_proj.weight"].T
        h2 = _rms(x, sd[p + "post_attention_layernorm.weight"])
        up = np.maximum(h2 @ sd[p + "mlp.up_proj.weight"].T, 0.0) ** 2
        x = x + up @ sd[p + "mlp.down_proj.weight"].T
    want = _rms(x, sd["model.norm.weight"]) @ sd["model.embed_tokens.weight"].T

    path = str(tmp_path / "plm.gguf")
    convert_hf_deepseek2(sd, cfg, path, arch="plm", gtype=GGMLType.F32)
    m = Model.load(path, quantized=False, dtype=jnp.float32)
    assert m.cfg.mla is not None and m.cfg.mla.q_lora_rank == 0
    assert m.cfg.act == "relu2"
    posj = np.broadcast_to(np.arange(t, dtype=np.int32), toks.shape)
    fwd = jax.jit(lambda p_, tk, q: forward(p_, m.cfg, tk, q, None)[0])
    got = np.asarray(fwd(m.params, jnp.asarray(toks), jnp.asarray(posj)))
    np.testing.assert_allclose(got[0], want, rtol=3e-4, atol=3e-5)
