"""afmoe (Arcee AFMoE): MuP-scaled embeddings, per-head QK norm,
sigmoid-gated attention output, sandwich norms, NoPE on every 4th
(full-attention) layer, sigmoid MoE with expert bias + shared expert and
leading dense layers (reference src/models/afmoe.cpp)."""

import numpy as np
import pytest

from test_arch_wave5 import _attn, _moe, _neox_rope, _rms, _silu, _w
from zllm.gguf.constants import GGMLType

V, H, NH, NKV, HD, NL, F = 149, 64, 4, 2, 16, 4, 48
NE, TOPK, FX = 4, 2, 32
ROUTE_SCALE = 2.0


@pytest.fixture()
def toks():
    return np.random.default_rng(17).integers(0, V, (1, 9)).astype(np.int32)


def test_afmoe_matches_numpy_spec(tmp_path, toks):
    import jax
    import jax.numpy as jnp

    from zllm.convert import convert_hf_llama
    from zllm.models.llama import forward
    from zllm.models.loader import Model

    rng = np.random.default_rng(0)
    cfg = dict(vocab_size=V, hidden_size=H, intermediate_size=F,
               num_hidden_layers=NL, num_attention_heads=NH,
               num_key_value_heads=NKV, head_dim=HD,
               max_position_embeddings=128, rms_norm_eps=1e-6,
               rope_theta=10000.0, num_experts=NE, num_experts_per_tok=TOPK,
               moe_intermediate_size=FX, num_shared_experts=1,
               n_dense_layers=1, route_norm=True, route_scale=ROUTE_SCALE,
               norm_topk_prob=True, tie_word_embeddings=False)
    sd = {"model.embed_tokens.weight": _w(rng, V, H),
          "model.norm.weight": _w(rng, H) + 1.0,
          "lm_head.weight": _w(rng, V, H)}
    for il in range(NL):
        p = f"model.layers.{il}."
        sd[p + "input_layernorm.weight"] = _w(rng, H) + 1.0
        sd[p + "post_attention_layernorm.weight"] = _w(rng, H) + 1.0
        sd[p + "pre_mlp_layernorm.weight"] = _w(rng, H) + 1.0
        sd[p + "post_mlp_layernorm.weight"] = _w(rng, H) + 1.0
        sd[p + "self_attn.q_proj.weight"] = _w(rng, NH * HD, H)
        sd[p + "self_attn.k_proj.weight"] = _w(rng, NKV * HD, H)
        sd[p + "self_attn.v_proj.weight"] = _w(rng, NKV * HD, H)
        sd[p + "self_attn.o_proj.weight"] = _w(rng, H, NH * HD)
        sd[p + "self_attn.gate_proj.weight"] = _w(rng, NH * HD, H)
        sd[p + "self_attn.q_norm.weight"] = _w(rng, HD) + 1.0
        sd[p + "self_attn.k_norm.weight"] = _w(rng, HD) + 1.0
        if il == 0:  # leading dense layer
            sd[p + "mlp.gate_proj.weight"] = _w(rng, F, H)
            sd[p + "mlp.up_proj.weight"] = _w(rng, F, H)
            sd[p + "mlp.down_proj.weight"] = _w(rng, H, F)
        else:
            sd[p + "mlp.router.gate.weight"] = _w(rng, NE, H)
            sd[p + "mlp.expert_bias"] = _w(rng, NE)
            for e in range(NE):
                q = f"{p}mlp.experts.{e}."
                sd[q + "gate_proj.weight"] = _w(rng, FX, H)
                sd[q + "up_proj.weight"] = _w(rng, FX, H)
                sd[q + "down_proj.weight"] = _w(rng, H, FX)
            sd[p + "mlp.shared_experts.gate_proj.weight"] = _w(rng, FX, H)
            sd[p + "mlp.shared_experts.up_proj.weight"] = _w(rng, FX, H)
            sd[p + "mlp.shared_experts.down_proj.weight"] = _w(rng, H, FX)

    # numpy spec
    t = toks.shape[1]
    pos = np.arange(t)
    x = sd["model.embed_tokens.weight"][toks[0]].astype(np.float64) * np.sqrt(H)
    for il in range(NL):
        p = f"model.layers.{il}."
        h = _rms(x, sd[p + "input_layernorm.weight"])
        q = (h @ sd[p + "self_attn.q_proj.weight"].T).reshape(t, NH, HD)
        k = (h @ sd[p + "self_attn.k_proj.weight"].T).reshape(t, NKV, HD)
        v = (h @ sd[p + "self_attn.v_proj.weight"].T).reshape(t, NKV, HD)
        q = _rms(q, sd[p + "self_attn.q_norm.weight"])
        k = _rms(k, sd[p + "self_attn.k_norm.weight"])
        if (il + 1) % 4 != 0:  # every 4th layer is NoPE
            q = _neox_rope(q, pos, HD, 10000.0)
            k = _neox_rope(k, pos, HD, 10000.0)
        att = _attn(q, k, v, HD**-0.5)
        gate = 1.0 / (1.0 + np.exp(-(h @ sd[p + "self_attn.gate_proj.weight"].T)))
        att = att * gate
        att = att @ sd[p + "self_attn.o_proj.weight"].T
        att = _rms(att, sd[p + "post_attention_layernorm.weight"])
        x = x + att
        h2 = _rms(x, sd[p + "pre_mlp_layernorm.weight"])
        if il == 0:
            ff = (_silu(h2 @ sd[p + "mlp.gate_proj.weight"].T)
                  * (h2 @ sd[p + "mlp.up_proj.weight"].T)) @ sd[p + "mlp.down_proj.weight"].T
        else:
            lw = dict(router=sd[p + "mlp.router.gate.weight"],
                      gate=np.stack([sd[f"{p}mlp.experts.{e}.gate_proj.weight"] for e in range(NE)]),
                      up=np.stack([sd[f"{p}mlp.experts.{e}.up_proj.weight"] for e in range(NE)]),
                      down=np.stack([sd[f"{p}mlp.experts.{e}.down_proj.weight"] for e in range(NE)]))
            ff = _moe(h2, h2, lw, NE, TOPK, "sigmoid", True, _silu,
                      scale=ROUTE_SCALE, bias=sd[p + "mlp.expert_bias"])
            ff = ff + (_silu(h2 @ sd[p + "mlp.shared_experts.gate_proj.weight"].T)
                       * (h2 @ sd[p + "mlp.shared_experts.up_proj.weight"].T)
                       ) @ sd[p + "mlp.shared_experts.down_proj.weight"].T
        ff = _rms(ff, sd[p + "post_mlp_layernorm.weight"])
        x = x + ff
    want = _rms(x, sd["model.norm.weight"]) @ sd["lm_head.weight"].T

    path = str(tmp_path / "afmoe.gguf")
    convert_hf_llama(sd, cfg, path, arch="afmoe", gtype=GGMLType.F32)
    m = Model.load(path, quantized=False, dtype=jnp.float32)
    assert m.cfg.nope_step == 4 and abs(m.cfg.emb_scale - np.sqrt(H)) < 1e-6
    assert m.cfg.moe is not None and m.cfg.moe.gate_func == "sigmoid"
    assert m.cfg.moe.n_dense_lead == 1
    posj = np.broadcast_to(np.arange(t, dtype=np.int32), toks.shape)
    fwd = jax.jit(lambda p_, tk, qp: forward(p_, m.cfg, tk, qp, None)[0])
    got = np.asarray(fwd(m.params, jnp.asarray(toks), jnp.asarray(posj)))
    np.testing.assert_allclose(got[0], want, rtol=4e-4, atol=4e-4)


def test_exaone_moe_matches_numpy_spec(tmp_path, toks):
    """exaone-moe: exaone4-style iSWA attention (per-head QK norm, rope
    ONLY on sliding layers) + deepseek-style sigmoid MoE with shared
    expert (reference src/models/exaone-moe.cpp)."""
    import jax
    import jax.numpy as jnp

    from test_arch_wave5 import _moe
    from zllm.convert import convert_hf_llama
    from zllm.models.llama import forward
    from zllm.models.loader import Model

    rng = np.random.default_rng(5)
    WIN = 4
    cfg = dict(vocab_size=V, hidden_size=H, intermediate_size=F,
               num_hidden_layers=NL, num_attention_heads=NH,
               num_key_value_heads=NKV, head_dim=HD,
               max_position_embeddings=128, rms_norm_eps=1e-6,
               rope_theta=10000.0, sliding_window=WIN,
               n_routed_experts=NE, num_experts_per_tok=TOPK,
               moe_intermediate_size=FX, n_shared_experts=1,
               scoring_func="sigmoid", norm_topk_prob=True,
               routed_scaling_factor=ROUTE_SCALE, tie_word_embeddings=False)
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
        sd[p + "self_attn.q_norm.weight"] = _w(rng, HD) + 1.0
        sd[p + "self_attn.k_norm.weight"] = _w(rng, HD) + 1.0
        sd[p + "mlp.gate.weight"] = _w(rng, NE, H)
        for e in range(NE):
            q = f"{p}mlp.experts.{e}."
            sd[q + "gate_proj.weight"] = _w(rng, FX, H)
            sd[q + "up_proj.weight"] = _w(rng, FX, H)
            sd[q + "down_proj.weight"] = _w(rng, H, FX)
        sd[p + "mlp.shared_experts.gate_proj.weight"] = _w(rng, FX, H)
        sd[p + "mlp.shared_experts.up_proj.weight"] = _w(rng, FX, H)
        sd[p + "mlp.shared_experts.down_proj.weight"] = _w(rng, H, FX)

    t = toks.shape[1]
    pos = np.arange(t)
    x = sd["model.embed_tokens.weight"][toks[0]].astype(np.float64)
    for il in range(NL):
        p = f"model.layers.{il}."
        is_swa = (il + 1) % 4 != 0
        h = _rms(x, sd[p + "input_layernorm.weight"])
        q = (h @ sd[p + "self_attn.q_proj.weight"].T).reshape(t, NH, HD)
        k = (h @ sd[p + "self_attn.k_proj.weight"].T).reshape(t, NKV, HD)
        v = (h @ sd[p + "self_attn.v_proj.weight"].T).reshape(t, NKV, HD)
        q = _rms(q, sd[p + "self_attn.q_norm.weight"])
        k = _rms(k, sd[p + "self_attn.k_norm.weight"])
        if is_swa:  # rope only on sliding layers
            q = _neox_rope(q, pos, HD, 10000.0)
            k = _neox_rope(k, pos, HD, 10000.0)
        att = _attn(q, k, v, HD**-0.5, window=WIN if is_swa else 0)
        x = x + att @ sd[p + "self_attn.o_proj.weight"].T
        h2 = _rms(x, sd[p + "post_attention_layernorm.weight"])
        lw = dict(router=sd[p + "mlp.gate.weight"],
                  gate=np.stack([sd[f"{p}mlp.experts.{e}.gate_proj.weight"] for e in range(NE)]),
                  up=np.stack([sd[f"{p}mlp.experts.{e}.up_proj.weight"] for e in range(NE)]),
                  down=np.stack([sd[f"{p}mlp.experts.{e}.down_proj.weight"] for e in range(NE)]))
        ff = _moe(h2, h2, lw, NE, TOPK, "sigmoid", True, _silu, scale=ROUTE_SCALE)
        ff = ff + (_silu(h2 @ sd[p + "mlp.shared_experts.gate_proj.weight"].T)
                   * (h2 @ sd[p + "mlp.shared_experts.up_proj.weight"].T)
                   ) @ sd[p + "mlp.shared_experts.down_proj.weight"].T
        x = x + ff
    want = _rms(x, sd["model.norm.weight"]) @ sd["lm_head.weight"].T

    path = str(tmp_path / "exmoe.gguf")
    convert_hf_llama(sd, cfg, path, arch="exaone-moe", gtype=GGMLType.F32)
    m = Model.load(path, quantized=False, dtype=jnp.float32)
    assert m.cfg.nope_step == 4 and m.cfg.swa_pattern == 4
    assert m.cfg.sliding_window == WIN
    posj = np.broadcast_to(np.arange(t, dtype=np.int32), toks.shape)
    fwd = jax.jit(lambda p_, tk, qp: forward(p_, m.cfg, tk, qp, None)[0])
    got = np.asarray(fwd(m.params, jnp.asarray(toks), jnp.asarray(posj)))
    np.testing.assert_allclose(got[0], want, rtol=4e-4, atol=4e-4)
