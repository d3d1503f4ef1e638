"""nemotron-h: hybrid_override_pattern assigns each layer ONE component —
mamba2 mixer (M), NoPE attention (*), or squared-relu MLP (-) — with a
single shared pre-norm and plain residual (reference
src/models/nemotron-h.cpp).  The mamba2 mixer math is the bamba-validated
zllm.models.mamba.mamba2_layer; this test verifies the nemotron-h
composition (dispatch, kv ordinals, NoPE, component-per-layer residuals)
against a numpy spec for the attention/MLP layers with the mixer called
through the same verified primitive."""

import numpy as np
import pytest

from zllm.gguf.constants import GGMLType

V, H, NH, NKV, HD, F = 149, 64, 4, 2, 16, 96
MH, MHD, DS, DCONV, NG = 4, 16, 8, 4, 1  # mamba heads/head_dim/state/conv/groups
DI = MH * MHD
PATTERN = "M*-M-"
NL = len(PATTERN)


def _w(rng, *shape):
    return (rng.standard_normal(shape) * 0.1).astype(np.float32)


def _sd(rng):
    sd = {"backbone.embeddings.weight": _w(rng, V, H),
          "backbone.norm_f.weight": _w(rng, H) + 1.0,
          "lm_head.weight": _w(rng, V, H)}
    for il, kind in enumerate(PATTERN):
        p = f"backbone.layers.{il}."
        m = p + "mixer."
        sd[p + "norm.weight"] = _w(rng, H) + 1.0
        if kind == "M":
            # in_proj: [z | x | B | C | dt] like HF mamba2
            d_in = 2 * DI + 2 * NG * DS + MH
            sd[m + "in_proj.weight"] = _w(rng, d_in, H)
            sd[m + "conv1d.weight"] = _w(rng, DI + 2 * NG * DS, 1, DCONV)
            sd[m + "conv1d.bias"] = _w(rng, DI + 2 * NG * DS)
            sd[m + "dt_bias"] = _w(rng, MH)
            sd[m + "A_log"] = np.abs(_w(rng, MH)) + 0.5
            sd[m + "D"] = _w(rng, MH) + 1.0
            sd[m + "norm.weight"] = _w(rng, DI) + 1.0
            sd[m + "out_proj.weight"] = _w(rng, H, DI)
        elif kind == "*":
            sd[m + "q_proj.weight"] = _w(rng, NH * HD, H)
            sd[m + "k_proj.weight"] = _w(rng, NKV * HD, H)
            sd[m + "v_proj.weight"] = _w(rng, NKV * HD, H)
            sd[m + "o_proj.weight"] = _w(rng, H, NH * HD)
        else:
            sd[m + "up_proj.weight"] = _w(rng, F, H)
            sd[m + "down_proj.weight"] = _w(rng, H, F)
    return sd


CFG = dict(num_hidden_layers=NL, hidden_size=H, num_attention_heads=NH,
           num_key_value_heads=NKV, head_dim=HD, intermediate_size=F,
           hybrid_override_pattern=PATTERN, mamba_num_heads=MH,
           mamba_head_dim=MHD, ssm_state_size=DS, conv_kernel=DCONV,
           n_groups=NG, rms_norm_eps=1e-5, vocab_size=V,
           max_position_embeddings=128)


def _rms(x, w, eps=1e-5):
    x = x.astype(np.float64)
    return x / np.sqrt(np.mean(x * x, -1, keepdims=True) + eps) * w


def test_nemotron_h_composition(tmp_path):
    import jax
    import jax.numpy as jnp

    from zllm.convert.hf import convert_hf_nemotron_h
    from zllm.models.hybrid import hybrid_forward
    from zllm.models.loader import Model
    from zllm.models.mamba import mamba2_layer

    rng = np.random.default_rng(0)
    sd = _sd(rng)
    path = str(tmp_path / "nh.gguf")
    convert_hf_nemotron_h(sd, CFG, path, gtype=GGMLType.F32)
    m = Model.load(path, quantized=False, dtype=jnp.float32)
    assert m.cfg.is_hybrid and not m.cfg.use_rope and m.cfg.act == "relu2"
    assert m.cfg.attn_layers == tuple(ch == "*" for ch in PATTERN)

    toks = np.random.default_rng(7).integers(0, V, (1, 9)).astype(np.int32)
    t = toks.shape[1]
    pos = np.broadcast_to(np.arange(t, dtype=np.int32), toks.shape)
    got = np.asarray(jax.jit(
        lambda p, tk, q: hybrid_forward(p, m.cfg, tk, q, None, None)[0]
    )(m.params, jnp.asarray(toks), jnp.asarray(pos)))[0]

    # reference composition: numpy attention/MLP, the verified mamba2
    # primitive for M layers, one pre-norm + residual per layer
    x = sd["backbone.embeddings.weight"][toks[0]].astype(np.float64)
    ri = 0
    for il, kind in enumerate(PATTERN):
        p = f"backbone.layers.{il}."
        mx = p + "mixer."
        h = _rms(x, sd[p + "norm.weight"])
        if kind == "M":
            layer = m.params["layers"][il]
            from zllm.models.recurrent import make_state

            st = make_state(m.cfg, 1)
            y, _, _ = mamba2_layer(layer, m.cfg, jnp.asarray(h[None], jnp.float32),
                                   st.conv[ri], st.ssm[ri], None)
            ri += 1
            x = x + np.asarray(y)[0].astype(np.float64)
        elif kind == "*":
            q = (h @ sd[mx + "q_proj.weight"].T).reshape(t, NH, HD)
            k = (h @ sd[mx + "k_proj.weight"].T).reshape(t, NKV, HD)
            v = (h @ sd[mx + "v_proj.weight"].T).reshape(t, NKV, HD)
            g = NH // NKV
            kk = np.repeat(k, g, axis=1)
            vv = np.repeat(v, g, axis=1)
            s = np.einsum("thd,shd->hts", q, kk) * HD**-0.5
            maskm = np.tril(np.ones((t, t), bool))
            s = np.where(maskm[None], s, -np.inf)
            pm = np.exp(s - s.max(-1, keepdims=True))
            pm /= pm.sum(-1, keepdims=True)
            att = np.einsum("hts,shd->thd", pm, vv).reshape(t, NH * HD)
            x = x + att @ sd[mx + "o_proj.weight"].T
        else:
            up = np.maximum(h @ sd[mx + "up_proj.weight"].T, 0.0) ** 2
            x = x + up @ sd[mx + "down_proj.weight"].T
    want = _rms(x, sd["backbone.norm_f.weight"]) @ sd["lm_head.weight"].T
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_nemotron_h_engine_serving(tmp_path):
    import time

    import jax.numpy as jnp

    from zllm.convert.hf import convert_hf_nemotron_h
    from zllm.models.loader import Model
    from zllm.server.engine import Engine, Request

    rng = np.random.default_rng(1)
    path = str(tmp_path / "nhs.gguf")
    convert_hf_nemotron_h(_sd(rng), CFG, path, gtype=GGMLType.F32)
    m = Model.load(path, quantized=False, dtype=jnp.float32)

    eng = Engine(m, n_slots=2, max_len=64, prefill_chunk=8, kv_dtype=jnp.float32)
    assert eng.hybrid
    eng.start()
    try:
        reqs = [Request(prompt_tokens=np.random.default_rng(s).integers(
                    1, V, 7 + 4 * s).tolist(), max_new=6, temp=0.0)
                for s in range(2)]
        for r in reqs:
            eng.submit(r)
        deadline = time.time() + 180
        while not all(r.done for r in reqs):
            assert time.time() < deadline
            time.sleep(0.02)
        assert all(not r.error for r in reqs), [r.error for r in reqs]
        assert all(len(r.out_tokens) == 6 for r in reqs)
    finally:
        eng.stop()
