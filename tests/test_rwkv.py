"""RWKV6 parity tests.

No HF oracle exists for RWKV6 in stock transformers, so the checks are:
  * the wkv6 recurrence vs an independent numpy scalar-loop oracle written
    from the reference kernel semantics (ggml-cpu/ops.cpp:9410-9560)
  * an end-to-end numpy forward (written from src/models/rwkv6*.cpp, HF
    weight orientation, per-token recurrence) vs the GGUF-loaded JAX path
  * incremental decode through RwkvState == full-sequence forward
"""

import numpy as np
import pytest

from zllm.gguf.constants import GGMLType

RWKV_CFG = dict(
    vocab_size=256,
    hidden_size=64,
    num_hidden_layers=3,
    head_size=16,
    intermediate_size=96,
    rescale_every=2,
    layer_norm_epsilon=1e-5,
)


def _rng_state_dict(cfg, seed=0):
    r = np.random.default_rng(seed)
    c = cfg["hidden_size"]
    nl = cfg["num_hidden_layers"]
    hs = cfg["head_size"]
    nh = c // hs
    ff = cfg["intermediate_size"]
    tm, td = 32, 64  # time_mix/time_decay extra dims (reference defaults)

    def w(*shape, s=0.2):
        return (r.standard_normal(shape) * s).astype(np.float32)

    sd = {
        "rwkv.embeddings.weight": w(cfg["vocab_size"], c, s=0.5),
        "rwkv.blocks.0.pre_ln.weight": 1.0 + w(c, s=0.05),
        "rwkv.blocks.0.pre_ln.bias": w(c, s=0.05),
        "rwkv.ln_out.weight": 1.0 + w(c, s=0.05),
        "rwkv.ln_out.bias": w(c, s=0.05),
        "head.weight": w(cfg["vocab_size"], c, s=0.3),
    }
    for il in range(nl):
        p = f"rwkv.blocks.{il}."
        sd[p + "ln1.weight"] = 1.0 + w(c, s=0.05)
        sd[p + "ln1.bias"] = w(c, s=0.05)
        sd[p + "ln2.weight"] = 1.0 + w(c, s=0.05)
        sd[p + "ln2.bias"] = w(c, s=0.05)
        a = p + "attention."
        sd[a + "time_maa_x"] = w(1, 1, c, s=0.3)
        for nm in "wkvrg":
            sd[a + f"time_maa_{nm}"] = w(1, 1, c, s=0.3)
        sd[a + "time_maa_w1"] = w(c, 5 * tm)
        sd[a + "time_maa_w2"] = w(5, tm, c)
        sd[a + "time_decay"] = w(1, 1, c, s=0.5)
        sd[a + "time_decay_w1"] = w(c, td)
        sd[a + "time_decay_w2"] = w(td, c)
        sd[a + "time_faaaa"] = w(nh, hs, s=0.5)
        for nm in ("receptance", "key", "value", "gate", "output"):
            sd[a + nm + ".weight"] = w(c, c)
        sd[a + "ln_x.weight"] = 1.0 + w(c, s=0.05)
        sd[a + "ln_x.bias"] = w(c, s=0.05)
        ffp = p + "feed_forward."
        sd[ffp + "time_maa_k"] = w(1, 1, c, s=0.3)
        sd[ffp + "time_maa_r"] = w(1, 1, c, s=0.3)
        sd[ffp + "key.weight"] = w(ff, c)
        sd[ffp + "receptance.weight"] = w(c, c)
        sd[ffp + "value.weight"] = w(c, ff)
    return sd


def _ln(x, wt, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * wt + b


def _numpy_forward(sd, cfg, tokens):
    """Independent per-token numpy forward in HF weight orientation
    (reference graph: src/models/rwkv6.cpp + rwkv6-base.cpp)."""
    c = cfg["hidden_size"]
    hs = cfg["head_size"]
    nh = c // hs
    nl = cfg["num_hidden_layers"]
    resc = cfg["rescale_every"]

    x_seq = sd["rwkv.embeddings.weight"][tokens]  # [T, C]
    x_seq = _ln(x_seq, sd["rwkv.blocks.0.pre_ln.weight"], sd["rwkv.blocks.0.pre_ln.bias"])
    T = len(tokens)

    att_shift = [np.zeros(c, np.float32) for _ in range(nl)]
    ffn_shift = [np.zeros(c, np.float32) for _ in range(nl)]
    wkv_state = [np.zeros((nh, hs, hs), np.float32) for _ in range(nl)]
    logits = []

    for t in range(T):
        x = x_seq[t]
        for il in range(nl):
            p = f"rwkv.blocks.{il}."
            a = p + "attention."
            cur = _ln(x, sd[p + "ln1.weight"], sd[p + "ln1.bias"])
            sx = att_shift[il] - cur
            att_shift[il] = cur.copy()

            xxx = cur + sx * sd[a + "time_maa_x"].reshape(-1)
            h = np.tanh(xxx @ sd[a + "time_maa_w1"])  # [5*tm]
            tm = h.shape[0] // 5
            mixed = {}
            for i, nm in enumerate("wkvrg"):
                off = h[i * tm : (i + 1) * tm] @ sd[a + "time_maa_w2"][i]  # [C]
                mixed[nm] = cur + sx * (off + sd[a + f"time_maa_{nm}"].reshape(-1))
            rr = mixed["r"] @ sd[a + "receptance.weight"].T
            kk = mixed["k"] @ sd[a + "key.weight"].T
            vv = mixed["v"] @ sd[a + "value.weight"].T
            gg = mixed["g"] @ sd[a + "gate.weight"].T
            gg = gg / (1 + np.exp(-gg))  # silu

            dw = np.tanh(mixed["w"] @ sd[a + "time_decay_w1"]) @ sd[a + "time_decay_w2"]
            ww = np.exp(-np.exp(dw + sd[a + "time_decay"].reshape(-1)))

            u = sd[a + "time_faaaa"]  # [nh, hs]
            kh = kk.reshape(nh, hs)
            vh = vv.reshape(nh, hs)
            rh = rr.reshape(nh, hs)
            wh = ww.reshape(nh, hs)
            y = np.zeros((nh, hs), np.float32)
            for hh in range(nh):
                for i in range(hs):
                    for j in range(hs):
                        kv = kh[hh, i] * vh[hh, j]
                        y[hh, j] += rh[hh, i] * (u[hh, i] * kv + wkv_state[il][hh, i, j])
                        wkv_state[il][hh, i, j] = wkv_state[il][hh, i, j] * wh[hh, i] + kv
            # group norm, eps 64e-5
            mu = y.mean(-1, keepdims=True)
            var = y.var(-1, keepdims=True)
            y = (y - mu) / np.sqrt(var + 64e-5)
            y = y.reshape(-1) * sd[a + "ln_x.weight"] + sd[a + "ln_x.bias"]
            y = y * gg
            scale = 0.5 ** (il // resc)  # converter pre-divides output.weight
            x = x + (y @ sd[a + "output.weight"].T) * scale

            ffp = p + "feed_forward."
            fcur = _ln(x, sd[p + "ln2.weight"], sd[p + "ln2.bias"])
            fsx = ffn_shift[il] - fcur
            ffn_shift[il] = fcur.copy()
            xk = fcur + fsx * sd[ffp + "time_maa_k"].reshape(-1)
            xr = fcur + fsx * sd[ffp + "time_maa_r"].reshape(-1)
            rgate = 1 / (1 + np.exp(-(xr @ sd[ffp + "receptance.weight"].T)))
            kf = np.square(np.maximum(xk @ sd[ffp + "key.weight"].T, 0.0))
            scale = 0.5 ** (il // resc)
            x = x + rgate * (kf @ sd[ffp + "value.weight"].T) * scale
            if resc > 0 and (il + 1) % resc == 0:
                x = x * 0.5
        xf = _ln(x, sd["rwkv.ln_out.weight"], sd["rwkv.ln_out.bias"])
        logits.append(xf @ sd["head.weight"].T)
    return np.stack(logits)


def test_wkv6_vs_scalar_oracle():
    """Vectorized lax.scan wkv6 == reference-kernel scalar semantics."""
    import jax.numpy as jnp

    from zllm.models.rwkv import wkv6

    r = np.random.default_rng(1)
    B, T, H, S = 2, 5, 3, 8
    k, v, rr, w = (r.standard_normal((B, T, H, S)).astype(np.float32) for _ in range(4))
    w = 1 / (1 + np.exp(-w))  # decay in (0, 1)
    u = r.standard_normal((H, S)).astype(np.float32)
    s0 = r.standard_normal((B, H, S, S)).astype(np.float32)

    y, s = wkv6(*(jnp.asarray(a) for a in (k, v, rr, w)), jnp.asarray(u), jnp.asarray(s0))

    want_y = np.zeros((B, T, H, S), np.float32)
    st = s0.copy()
    for b in range(B):
        sb = s0[b].copy()
        for t in range(T):
            for h in range(H):
                for i in range(S):
                    for j in range(S):
                        kv = k[b, t, h, i] * v[b, t, h, j]
                        want_y[b, t, h, j] += rr[b, t, h, i] * (u[h, i] * kv + sb[h, i, j])
                for i in range(S):
                    for j in range(S):
                        sb[h, i, j] = sb[h, i, j] * w[b, t, h, i] + k[b, t, h, i] * v[b, t, h, j]
        st[b] = sb
    np.testing.assert_allclose(np.asarray(y), want_y, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s), st, rtol=2e-5, atol=2e-5)


@pytest.fixture(scope="module")
def rwkv_gguf(tmp_path_factory):
    from zllm.convert.hf import convert_hf_rwkv6

    sd = _rng_state_dict(RWKV_CFG)
    path = str(tmp_path_factory.mktemp("r") / "rwkv6.gguf")
    convert_hf_rwkv6(sd, RWKV_CFG, path, gtype=GGMLType.F32)
    return sd, path


def test_rwkv6_logit_parity(rwkv_gguf):
    import jax
    import jax.numpy as jnp

    from zllm.models.loader import Model
    from zllm.models.rwkv import rwkv6_forward

    sd, path = rwkv_gguf
    m = Model.load(path, quantized=False, dtype=jnp.float32)
    assert m.cfg.is_recurrent and m.cfg.wkv.head_size == 16
    assert m.cfg.wkv.rescale_every == 2

    toks = np.array([3, 99, 7, 42, 250, 11], np.int32)
    want = _numpy_forward(sd, RWKV_CFG, toks)
    fwd = jax.jit(lambda p, t: rwkv6_forward(p, m.cfg, t)[0])
    got = np.asarray(fwd(m.params, jnp.asarray(toks[None])))[0]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_rwkv6_incremental_state(rwkv_gguf):
    """Token-by-token decode through RwkvState == full-sequence forward."""
    import jax
    import jax.numpy as jnp

    from zllm.models.loader import Model
    from zllm.models.rwkv import RwkvState, rwkv6_forward

    _, path = rwkv_gguf
    m = Model.load(path, quantized=False, dtype=jnp.float32)
    toks = np.array([[5, 17, 42, 7, 123]], np.int32)

    full = np.asarray(rwkv6_forward(m.params, m.cfg, jnp.asarray(toks))[0])

    step = jax.jit(lambda p, t, s: rwkv6_forward(p, m.cfg, t, s, logits_for="last"))
    state = RwkvState.create(m.cfg, 1)
    outs = []
    for t in toks[0]:
        logits, state = step(m.params, jnp.asarray([[int(t)]], jnp.int32), state)
        outs.append(np.asarray(logits)[0, -1])
    np.testing.assert_allclose(np.stack(outs), full[0], rtol=3e-4, atol=3e-4)
