"""openelm: per-layer query AND kv head counts + per-layer FFN widths
(apple's layer-wise scaling), fused qkv/proj_1 splits, per-head q/k RMS
norms before neox rope, tied embeddings (reference
src/models/openelm.cpp; convert_hf_to_gguf.py OpenELMModel)."""

import numpy as np
import pytest

from test_arch_wave5 import _neox_rope, _rms, _silu, _w
from zllm.gguf.constants import GGMLType

V, H, HD, NL = 149, 64, 16, 2
NQ = [4, 8]   # per-layer query heads
NKV = [2, 2]  # per-layer kv heads
FFM = [0.75, 1.0]  # ffn multipliers -> 48, 64 at divisor 16


def _sd(rng):
    sd = {"transformer.token_embeddings.weight": _w(rng, V, H),
          "transformer.norm.weight": _w(rng, H) + 1.0}
    for il in range(NL):
        p = f"transformer.layers.{il}."
        f_il = int(FFM[il] * H)
        sd[p + "attn_norm.weight"] = _w(rng, H) + 1.0
        sd[p + "ffn_norm.weight"] = _w(rng, H) + 1.0
        sd[p + "attn.qkv_proj.weight"] = _w(rng, (NQ[il] + 2 * NKV[il]) * HD, H)
        sd[p + "attn.q_norm.weight"] = _w(rng, HD) + 1.0
        sd[p + "attn.k_norm.weight"] = _w(rng, HD) + 1.0
        sd[p + "attn.out_proj.weight"] = _w(rng, H, NQ[il] * HD)
        sd[p + "ffn.proj_1.weight"] = _w(rng, 2 * f_il, H)
        sd[p + "ffn.proj_2.weight"] = _w(rng, H, f_il)
    return sd


CFG = dict(num_transformer_layers=NL, model_dim=H, head_dim=HD,
           num_query_heads=NQ, num_kv_heads=NKV, ffn_multipliers=FFM,
           ffn_dim_divisor=16, max_context_length=128,
           rope_freq_constant=10000.0, vocab_size=V)


@pytest.fixture()
def toks():
    return np.random.default_rng(5).integers(0, V, (1, 9)).astype(np.int32)


def test_openelm_matches_numpy_spec(tmp_path, toks):
    import jax
    import jax.numpy as jnp

    from zllm.convert.hf import convert_hf_openelm
    from zllm.models.llama import forward
    from zllm.models.loader import Model

    rng = np.random.default_rng(0)
    sd = _sd(rng)

    t = toks.shape[1]
    pos = np.arange(t)
    x = sd["transformer.token_embeddings.weight"][toks[0]].astype(np.float64)
    for il in range(NL):
        p = f"transformer.layers.{il}."
        nq, nkv, f_il = NQ[il], NKV[il], int(FFM[il] * H)
        h = _rms(x, sd[p + "attn_norm.weight"])
        qkv = h @ sd[p + "attn.qkv_proj.weight"].T
        q = qkv[:, : nq * HD].reshape(t, nq, HD)
        k = qkv[:, nq * HD : (nq + nkv) * HD].reshape(t, nkv, HD)
        v = qkv[:, (nq + nkv) * HD :].reshape(t, nkv, HD)
        q = _rms(q, sd[p + "attn.q_norm.weight"])
        k = _rms(k, sd[p + "attn.k_norm.weight"])
        q = _neox_rope(q, pos, HD, 10000.0)
        k = _neox_rope(k, pos, HD, 10000.0)
        g = nq // nkv
        kk = np.repeat(k, g, axis=1)
        vv = np.repeat(v, g, axis=1)
        s = np.einsum("thd,shd->hts", q, kk) * HD**-0.5
        mask = np.tril(np.ones((t, t), bool))
        s = np.where(mask[None], s, -np.inf)
        pm = np.exp(s - s.max(-1, keepdims=True))
        pm /= pm.sum(-1, keepdims=True)
        att = np.einsum("hts,shd->thd", pm, vv).reshape(t, nq * HD)
        x = x + att @ sd[p + "attn.out_proj.weight"].T
        h2 = _rms(x, sd[p + "ffn_norm.weight"])
        p1 = sd[p + "ffn.proj_1.weight"]
        ff = (_silu(h2 @ p1[:f_il].T) * (h2 @ p1[f_il:].T)) @ sd[p + "ffn.proj_2.weight"].T
        x = x + ff
    # tied embeddings
    want = _rms(x, sd["transformer.norm.weight"]) @ sd["transformer.token_embeddings.weight"].T

    path = str(tmp_path / "oe.gguf")
    convert_hf_openelm(sd, CFG, path, gtype=GGMLType.F32)
    m = Model.load(path, quantized=False, dtype=jnp.float32)
    assert m.cfg.kv_heads_layers == tuple(NKV)
    posj = np.broadcast_to(np.arange(t, dtype=np.int32), toks.shape)
    fwd = jax.jit(lambda pp, tk, q: forward(pp, m.cfg, tk, q, None)[0])
    got = np.asarray(fwd(m.params, jnp.asarray(toks), jnp.asarray(posj)))
    np.testing.assert_allclose(got[0], want, rtol=3e-4, atol=3e-5)


def test_openelm_serves_in_engine(tmp_path, toks):
    """Per-layer varied GQA widths serve through the CB engine's
    varied-width KV cache (the deci machinery)."""
    import jax.numpy as jnp

    from zllm.convert.hf import convert_hf_openelm
    from zllm.models.loader import Model
    from zllm.server.engine import Engine, Request

    rng = np.random.default_rng(1)
    path = str(tmp_path / "oes.gguf")
    convert_hf_openelm(_sd(rng), CFG, path, gtype=GGMLType.F32)
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
