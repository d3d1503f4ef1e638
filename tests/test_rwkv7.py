"""rwkv7 (Goose) + arwkv7: generalized delta rule time-mix verified
against a direct numpy implementation of the reference kernel
(ggml_compute_forward_rwkv_wkv7_f32, ggml-cpu/ops.cpp:9901) and graph
(src/models/rwkv7-base.cpp, rwkv7.cpp, arwkv7.cpp), plus state-carry
continuation and engine serving."""

import numpy as np
import pytest

from zllm.gguf.constants import GGMLType

V, C, HS, NL, F, DW, DA, DV, DG = 149, 64, 16, 3, 96, 24, 16, 12, 32
NH = C // HS


def _w(rng, *shape):
    return (rng.standard_normal(shape) * 0.2).astype(np.float32)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _sd(rng, arch):
    gate = True
    sd = {"model.embeddings.weight": _w(rng, V, C),
          "model.norm.weight": _w(rng, C) + 1.0,
          "lm_head.weight": _w(rng, V, C)}
    if arch == "rwkv7":
        sd["model.norm.bias"] = _w(rng, C)
        sd["model.pre_ln.weight"] = _w(rng, C) + 1.0
        sd["model.pre_ln.bias"] = _w(rng, C)
    for il in range(NL):
        p = f"model.layers.{il}."
        a = p + "attention."
        if arch == "arwkv7":
            sd[p + "input_layernorm.weight"] = _w(rng, C) + 1.0
            sd[p + "post_attention_layernorm.weight"] = _w(rng, C) + 1.0
            sd[p + "feed_forward.gate_proj.weight"] = _w(rng, F, C)
            sd[p + "feed_forward.up_proj.weight"] = _w(rng, F, C)
            sd[p + "feed_forward.down_proj.weight"] = _w(rng, C, F)
        else:
            sd[p + "ln1.weight"] = _w(rng, C) + 1.0
            sd[p + "ln1.bias"] = _w(rng, C)
            sd[p + "ln2.weight"] = _w(rng, C) + 1.0
            sd[p + "ln2.bias"] = _w(rng, C)
            sd[p + "feed_forward.x_k"] = _w(rng, C)
            sd[p + "feed_forward.key.weight"] = _w(rng, F, C)
            sd[p + "feed_forward.value.weight"] = _w(rng, C, F)
        sd[a + "x_x"] = _w(rng, 6, C)
        sd[a + "w0"] = _w(rng, C) - 4.0
        sd[a + "w1"] = _w(rng, C, DW)
        sd[a + "w2"] = _w(rng, DW, C) * 0.1
        sd[a + "a0"] = _w(rng, C)
        sd[a + "a1"] = _w(rng, C, DA)
        sd[a + "a2"] = _w(rng, DA, C) * 0.1
        if il > 0:
            sd[a + "v0"] = _w(rng, C)
            sd[a + "v1"] = _w(rng, C, DV)
            sd[a + "v2"] = _w(rng, DV, C) * 0.1
        sd[a + "g1"] = _w(rng, C, DG)
        sd[a + "g2"] = _w(rng, DG, C) * 0.1
        sd[a + "k_k"] = _w(rng, C) + 0.5
        sd[a + "k_a"] = _w(rng, C) + 0.5
        sd[a + "r_k"] = _w(rng, C)
        sd[a + "receptance.weight"] = _w(rng, C, C)
        sd[a + "key.weight"] = _w(rng, C, C)
        sd[a + "value.weight"] = _w(rng, C, C)
        sd[a + "output.weight"] = _w(rng, C, C)
        sd[a + "ln_x.weight"] = _w(rng, C) + 1.0
        sd[a + "ln_x.bias"] = _w(rng, C)
    return sd


def _ln(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(x.var(-1, keepdims=True) + eps) * w + b


def _rmsn(x, w, eps=1e-5):
    return x / np.sqrt(np.mean(x * x, -1, keepdims=True) + eps) * w


def _spec(sd, toks, arch):
    """Reference rwkv7 graph in numpy (f64)."""
    t = toks.shape[0]
    sd = {k: v.astype(np.float64) for k, v in sd.items()}
    x = sd["model.embeddings.weight"][toks]
    if arch == "rwkv7":
        x = _ln(x, sd["model.pre_ln.weight"], sd["model.pre_ln.bias"])
    v_first = None
    for il in range(NL):
        p = f"model.layers.{il}."
        a = p + "attention."
        if arch == "arwkv7":
            att_norm = _rmsn(x, sd[p + "input_layernorm.weight"], 1e-6)
        else:
            att_norm = _ln(x, sd[p + "ln1.weight"], sd[p + "ln1.bias"])
        x_prev = np.vstack([np.zeros((1, C)), att_norm[:-1]])
        sx = x_prev - att_norm
        mixed = att_norm[:, None, :] + sx[:, None, :] * sd[a + "x_x"][None]
        xr, xw, xk, xv, xa, xg = (mixed[:, i] for i in range(6))
        r = xr @ sd[a + "receptance.weight"].T
        w = _sigmoid(np.tanh(xw @ sd[a + "w1"]) @ sd[a + "w2"] + sd[a + "w0"])
        w = np.exp(-0.606531 * w)
        k = xk @ sd[a + "key.weight"].T
        v = xv @ sd[a + "value.weight"].T
        if v_first is None:
            v_first = v
        else:
            vg = _sigmoid(xv @ sd[a + "v1"] @ sd[a + "v2"] + sd[a + "v0"])
            v = v + (v_first - v) * vg
        g = _sigmoid(xg @ sd[a + "g1"]) @ sd[a + "g2"]
        aa = _sigmoid(xa @ sd[a + "a1"] @ sd[a + "a2"] + sd[a + "a0"])
        kk = (k * sd[a + "k_k"]).reshape(t, NH, HS)
        kk = kk / np.maximum(np.linalg.norm(kk, axis=-1, keepdims=True), 1e-12)
        ka = k * sd[a + "k_a"]
        k = k + aa * ka - ka
        # the wkv7 recurrence (CPU kernel semantics)
        rh, wh, khh, vh, ah = (z.reshape(t, NH, HS) for z in (r, w, k, v, aa))
        an, bn = -kk, kk * ah
        S = np.zeros((NH, HS, HS))  # [h, i (value), j (key)]
        y = np.zeros((t, NH, HS))
        for tt in range(t):
            for h in range(NH):
                sa = S[h] @ an[tt, h]  # [i]
                S[h] = (S[h] * wh[tt, h][None, :]
                        + np.outer(vh[tt, h], khh[tt, h])
                        + np.outer(sa, bn[tt, h]))
                y[tt, h] = S[h] @ rh[tt, h]
        # group norm + bonus + gate
        mu = y.mean(-1, keepdims=True)
        yn = (y - mu) / np.sqrt(y.var(-1, keepdims=True) + 64e-5)
        yn = yn.reshape(t, C) * sd[a + "ln_x.weight"] + sd[a + "ln_x.bias"]
        rk = np.sum(khh * rh * sd[a + "r_k"].reshape(NH, HS)[None], -1, keepdims=True)
        yn = yn + (vh * rk).reshape(t, C)
        yn = yn * g
        x = x + yn @ sd[a + "output.weight"].T
        if arch == "arwkv7":
            h2 = _rmsn(x, sd[p + "post_attention_layernorm.weight"], 1e-6)
            gg = h2 @ sd[p + "feed_forward.gate_proj.weight"].T
            ff = (gg * _sigmoid(gg)) * (h2 @ sd[p + "feed_forward.up_proj.weight"].T)
            x = x + ff @ sd[p + "feed_forward.down_proj.weight"].T
        else:
            ffn_norm = _ln(x, sd[p + "ln2.weight"], sd[p + "ln2.bias"])
            f_prev = np.vstack([np.zeros((1, C)), ffn_norm[:-1]])
            xk2 = (f_prev - ffn_norm) * sd[p + "feed_forward.x_k"] + ffn_norm
            kk2 = np.square(np.maximum(xk2 @ sd[p + "feed_forward.key.weight"].T, 0.0))
            x = x + kk2 @ sd[p + "feed_forward.value.weight"].T
    if arch == "arwkv7":
        x = _rmsn(x, sd["model.norm.weight"], 1e-6)
    else:
        x = _ln(x, sd["model.norm.weight"], sd["model.norm.bias"])
    return x @ sd["lm_head.weight"].T


@pytest.mark.parametrize("arch", ["rwkv7", "arwkv7"])
def test_rwkv7_matches_numpy_spec(tmp_path, arch):
    import jax
    import jax.numpy as jnp

    from zllm.convert.hf import convert_hf_rwkv7
    from zllm.models.loader import Model
    from zllm.models.recurrent import recurrent_forward

    rng = np.random.default_rng(0 if arch == "rwkv7" else 1)
    sd = _sd(rng, arch)
    cfg = dict(num_hidden_layers=NL, hidden_size=C, head_size=HS,
               intermediate_size=F, vocab_size=V,
               layer_norm_epsilon=1e-5, rms_norm_eps=1e-6)
    path = str(tmp_path / f"{arch}.gguf")
    convert_hf_rwkv7(sd, cfg, path, arch=arch, gtype=GGMLType.F32)
    m = Model.load(path, quantized=False, dtype=jnp.float32)
    assert m.cfg.is_recurrent and m.cfg.wkv is not None

    toks = np.random.default_rng(7).integers(0, V, 9).astype(np.int32)
    want = _spec(sd, toks, arch)
    fwd = jax.jit(lambda p, tk: recurrent_forward(p, m.cfg, tk)[0])
    got = np.asarray(fwd(m.params, jnp.asarray(toks[None])))
    np.testing.assert_allclose(got[0], want, rtol=3e-4, atol=3e-4)


def test_rwkv7_state_carry(tmp_path):
    """Split-call generation == one-shot (the recurrent state carries the
    full context, incl. v_first handling and token-shift rows)."""
    import jax
    import jax.numpy as jnp

    from zllm.convert.hf import convert_hf_rwkv7
    from zllm.models.loader import Model
    from zllm.models.recurrent import recurrent_forward

    rng = np.random.default_rng(2)
    sd = _sd(rng, "rwkv7")
    cfg = dict(num_hidden_layers=NL, hidden_size=C, head_size=HS,
               intermediate_size=F, vocab_size=V, layer_norm_epsilon=1e-5)
    path = str(tmp_path / "r7.gguf")
    convert_hf_rwkv7(sd, cfg, path, gtype=GGMLType.F32)
    m = Model.load(path, quantized=False, dtype=jnp.float32)

    toks = np.random.default_rng(8).integers(0, V, 12).astype(np.int32)
    full, _ = recurrent_forward(m.params, m.cfg, jnp.asarray(toks[None]))
    l1, st = recurrent_forward(m.params, m.cfg, jnp.asarray(toks[None, :7]))
    l2, _ = recurrent_forward(m.params, m.cfg, jnp.asarray(toks[None, 7:]), st)
    got = np.concatenate([np.asarray(l1), np.asarray(l2)], axis=1)
    np.testing.assert_allclose(got, np.asarray(full), rtol=2e-4, atol=2e-4)


def test_rwkv7_engine_serving(tmp_path):
    from test_recurrent_engine import _check_model
    from zllm.convert.hf import convert_hf_rwkv7

    rng = np.random.default_rng(3)
    sd = _sd(rng, "arwkv7")
    cfg = dict(num_hidden_layers=NL, hidden_size=C, head_size=HS,
               intermediate_size=F, vocab_size=V, rms_norm_eps=1e-6)
    path = str(tmp_path / "ar7.gguf")
    convert_hf_rwkv7(sd, cfg, path, arch="arwkv7", gtype=GGMLType.F32)
    _check_model(path)
