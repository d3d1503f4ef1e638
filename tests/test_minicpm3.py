"""minicpm3: multi-head latent attention (deepseek2-style, q_lora always
present) + the minicpm scaling stack — scale_emb on embeddings,
scale_depth/sqrt(L) on both residual branches, dim_model_base/n_embd on
the LM head (reference src/models/minicpm3.cpp:4-8, 99-117, 151-153).
Verified against a direct numpy implementation of the reference graph in
the plain (non-absorbed) MLA form — equality with zllm's absorbed MQA
form is exactly the absorption identity."""

import numpy as np
import pytest

from test_arch_wave5 import _rms, _silu, _w


def _norm_rope(x, pos, n_rot, theta):
    """ggml NORM-mode rope (adjacent pairs) over the first n_rot dims —
    the convention zllm's deepseek2/minicpm3 MLA pe-rope runs in (HF's
    view/transpose interleave trick makes this equal to its compute)."""
    t = x.shape[0]
    half = n_rot // 2
    inv = theta ** (-np.arange(half) * 2.0 / n_rot)
    ang = pos[:, None] * inv[None, :]
    cos, sin = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
    x1, x2 = x[..., 0:n_rot:2], x[..., 1:n_rot:2]
    out = np.empty_like(x)
    out[..., 0:n_rot:2] = x1 * cos - x2 * sin
    out[..., 1:n_rot:2] = x1 * sin + x2 * cos
    out[..., n_rot:] = x[..., n_rot:]
    return out
from zllm.gguf.constants import GGMLType

V, H, NH, NL, F = 149, 64, 4, 2, 48
DN, DR, DV, R, QR = 16, 8, 16, 24, 20  # nope/rope/v dims, kv rank, q rank
SCALE_EMB, SCALE_DEPTH, DIM_BASE = 12.0, 1.4, 32.0


@pytest.fixture()
def toks():
    return np.random.default_rng(3).integers(0, V, (1, 9)).astype(np.int32)


def test_minicpm3_matches_numpy_spec(tmp_path, toks):
    import jax
    import jax.numpy as jnp

    from zllm.convert.hf import convert_hf_deepseek2
    from zllm.models.llama import forward
    from zllm.models.loader import Model

    rng = np.random.default_rng(0)
    cfg = dict(vocab_size=V, hidden_size=H, intermediate_size=F,
               num_hidden_layers=NL, num_attention_heads=NH,
               qk_nope_head_dim=DN, qk_rope_head_dim=DR, v_head_dim=DV,
               kv_lora_rank=R, q_lora_rank=QR,
               max_position_embeddings=128, rms_norm_eps=1e-6,
               rope_theta=10000.0, scale_emb=SCALE_EMB,
               scale_depth=SCALE_DEPTH, dim_model_base=DIM_BASE,
               tie_word_embeddings=False)
    sd = {"model.embed_tokens.weight": _w(rng, V, H),
          "model.norm.weight": _w(rng, H) + 1.0,
          "lm_head.weight": _w(rng, V, H)}
    for il in range(NL):
        p = f"model.layers.{il}."
        sd[p + "input_layernorm.weight"] = _w(rng, H) + 1.0
        sd[p + "post_attention_layernorm.weight"] = _w(rng, H) + 1.0
        sd[p + "self_attn.q_a_proj.weight"] = _w(rng, QR, H)
        sd[p + "self_attn.q_a_layernorm.weight"] = _w(rng, QR) + 1.0
        sd[p + "self_attn.q_b_proj.weight"] = _w(rng, NH * (DN + DR), QR)
        sd[p + "self_attn.kv_a_proj_with_mqa.weight"] = _w(rng, R + DR, H)
        sd[p + "self_attn.kv_a_layernorm.weight"] = _w(rng, R) + 1.0
        sd[p + "self_attn.kv_b_proj.weight"] = _w(rng, NH * (DN + DV), R)
        sd[p + "self_attn.o_proj.weight"] = _w(rng, H, NH * DV)
        sd[p + "mlp.gate_proj.weight"] = _w(rng, F, H)
        sd[p + "mlp.up_proj.weight"] = _w(rng, F, H)
        sd[p + "mlp.down_proj.weight"] = _w(rng, H, F)

    # numpy spec: plain (non-absorbed) MLA
    t = toks.shape[1]
    pos = np.arange(t)
    scale_res = SCALE_DEPTH / np.sqrt(NL)
    kq_scale = (DN + DR) ** -0.5
    x = sd["model.embed_tokens.weight"][toks[0]].astype(np.float64) * SCALE_EMB
    for il in range(NL):
        p = f"model.layers.{il}."
        h = _rms(x, sd[p + "input_layernorm.weight"])
        qa = _rms(h @ sd[p + "self_attn.q_a_proj.weight"].T,
                  sd[p + "self_attn.q_a_layernorm.weight"])
        q = (qa @ sd[p + "self_attn.q_b_proj.weight"].T).reshape(t, NH, DN + DR)
        q_nope, q_pe = q[..., :DN], q[..., DN:]
        kv_pe = h @ sd[p + "self_attn.kv_a_proj_with_mqa.weight"].T
        kv_c = _rms(kv_pe[:, :R], sd[p + "self_attn.kv_a_layernorm.weight"])
        k_pe = kv_pe[:, None, R:]  # [T, 1, DR]
        kv = (kv_c @ sd[p + "self_attn.kv_b_proj.weight"].T).reshape(t, NH, DN + DV)
        k_nope, v = kv[..., :DN], kv[..., DN:]
        q_pe = _norm_rope(q_pe, pos, DR, 10000.0)
        k_pe = _norm_rope(k_pe, pos, DR, 10000.0)
        qh = np.concatenate([q_nope, q_pe], axis=-1)
        kh = np.concatenate([k_nope, np.broadcast_to(k_pe, (t, NH, DR))], axis=-1)
        s = np.einsum("thd,shd->hts", qh, kh) * kq_scale
        mask = np.tril(np.ones((t, t), bool))
        s = np.where(mask[None], s, -np.inf)
        pmat = np.exp(s - s.max(-1, keepdims=True))
        pmat /= pmat.sum(-1, keepdims=True)
        att = np.einsum("hts,shd->thd", pmat, v).reshape(t, NH * DV)
        x = x + att @ sd[p + "self_attn.o_proj.weight"].T * scale_res
        h2 = _rms(x, sd[p + "post_attention_layernorm.weight"])
        ff = (_silu(h2 @ sd[p + "mlp.gate_proj.weight"].T)
              * (h2 @ sd[p + "mlp.up_proj.weight"].T)) @ sd[p + "mlp.down_proj.weight"].T
        x = x + ff * scale_res
    want = (_rms(x, sd["model.norm.weight"]) * (DIM_BASE / H)) @ sd["lm_head.weight"].T

    path = str(tmp_path / "mc3.gguf")
    convert_hf_deepseek2(sd, cfg, path, arch="minicpm3", gtype=GGMLType.F32)
    m = Model.load(path, quantized=False, dtype=jnp.float32)
    assert m.cfg.mla is not None and m.cfg.mla.q_lora_rank == QR
    assert abs(m.cfg.emb_scale - SCALE_EMB) < 1e-9
    posj = np.broadcast_to(np.arange(t, dtype=np.int32), toks.shape)
    fwd = jax.jit(lambda p, tk, q: forward(p, m.cfg, tk, q, None)[0])
    got = np.asarray(fwd(m.params, jnp.asarray(toks), jnp.asarray(posj)))
    np.testing.assert_allclose(got[0], want, rtol=3e-4, atol=3e-5)


def test_minicpm3_serves_in_engine(tmp_path, toks):
    """MLA + the MQA [rope|latent] cache serve through the CB engine."""
    import jax.numpy as jnp

    from zllm.convert.hf import convert_hf_deepseek2
    from zllm.models.loader import Model
    from zllm.server.engine import Engine, Request

    rng = np.random.default_rng(1)
    cfg = dict(vocab_size=V, hidden_size=H, intermediate_size=F,
               num_hidden_layers=NL, num_attention_heads=NH,
               qk_nope_head_dim=DN, qk_rope_head_dim=DR, v_head_dim=DV,
               kv_lora_rank=R, q_lora_rank=QR,
               max_position_embeddings=128, rms_norm_eps=1e-6,
               rope_theta=10000.0, scale_emb=SCALE_EMB,
               scale_depth=SCALE_DEPTH, dim_model_base=DIM_BASE,
               tie_word_embeddings=False)
    sd = {"model.embed_tokens.weight": _w(rng, V, H),
          "model.norm.weight": _w(rng, H) + 1.0,
          "lm_head.weight": _w(rng, V, H)}
    for il in range(NL):
        p = f"model.layers.{il}."
        sd[p + "input_layernorm.weight"] = _w(rng, H) + 1.0
        sd[p + "post_attention_layernorm.weight"] = _w(rng, H) + 1.0
        sd[p + "self_attn.q_a_proj.weight"] = _w(rng, QR, H)
        sd[p + "self_attn.q_a_layernorm.weight"] = _w(rng, QR) + 1.0
        sd[p + "self_attn.q_b_proj.weight"] = _w(rng, NH * (DN + DR), QR)
        sd[p + "self_attn.kv_a_proj_with_mqa.weight"] = _w(rng, R + DR, H)
        sd[p + "self_attn.kv_a_layernorm.weight"] = _w(rng, R) + 1.0
        sd[p + "self_attn.kv_b_proj.weight"] = _w(rng, NH * (DN + DV), R)
        sd[p + "self_attn.o_proj.weight"] = _w(rng, H, NH * DV)
        sd[p + "mlp.gate_proj.weight"] = _w(rng, F, H)
        sd[p + "mlp.up_proj.weight"] = _w(rng, F, H)
        sd[p + "mlp.down_proj.weight"] = _w(rng, H, F)
    path = str(tmp_path / "mc3s.gguf")
    convert_hf_deepseek2(sd, cfg, path, arch="minicpm3", gtype=GGMLType.F32)
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
