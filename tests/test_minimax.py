"""minimax-m2 (no offline HF class): verified against a direct numpy
implementation of the reference graph (src/models/minimax-m2.cpp):
full-width q/k RMS norms before the head split, neox rope over
rotary_dim < head_dim, and a mixtral-layout MoE with a sigmoid router,
deepseek3-style selection bias, and top-k weight renormalization."""

import numpy as np
import pytest

from zllm.gguf.constants import GGMLType

CFG = dict(
    vocab_size=149,
    hidden_size=64,
    intermediate_size=48,  # per-expert ff (reference MiniMaxM2Model maps
    # intermediate_size -> expert_feed_forward_length)
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    partial_rotary_factor=0.5,  # rotary_dim 8 < head_dim 16
    max_position_embeddings=128,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    num_local_experts=8,
    num_experts_per_tok=2,
    scoring_func="sigmoid",
    tie_word_embeddings=False,
)


def _m2_sd(seed=0):
    rng = np.random.default_rng(seed)
    h, v = CFG["hidden_size"], CFG["vocab_size"]
    nh, nkv, hd = CFG["num_attention_heads"], CFG["num_key_value_heads"], CFG["head_dim"]
    f, ne = CFG["intermediate_size"], CFG["num_local_experts"]

    def w(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    sd = {"model.embed_tokens.weight": w(v, h), "model.norm.weight": w(h) + 1.0,
          "lm_head.weight": w(v, h)}
    for il in range(CFG["num_hidden_layers"]):
        p = f"model.layers.{il}."
        sd[p + "input_layernorm.weight"] = w(h) + 1.0
        sd[p + "post_attention_layernorm.weight"] = w(h) + 1.0
        sd[p + "self_attn.q_proj.weight"] = w(nh * hd, h)
        sd[p + "self_attn.k_proj.weight"] = w(nkv * hd, h)
        sd[p + "self_attn.v_proj.weight"] = w(nkv * hd, h)
        sd[p + "self_attn.o_proj.weight"] = w(h, nh * hd)
        sd[p + "self_attn.q_norm.weight"] = w(nh * hd) + 1.0  # FULL width
        sd[p + "self_attn.k_norm.weight"] = w(nkv * hd) + 1.0
        sd[p + "block_sparse_moe.gate.weight"] = w(ne, h)
        sd[p + "block_sparse_moe.gate.e_score_correction_bias"] = w(ne)
        for e in range(ne):
            q = f"{p}block_sparse_moe.experts.{e}."
            sd[q + "w1.weight"] = w(f, h)   # gate
            sd[q + "w2.weight"] = w(h, f)   # down
            sd[q + "w3.weight"] = w(f, h)   # up
    return sd


def _rms(x, w, eps=1e-6):
    ms = np.mean(x.astype(np.float64) ** 2, axis=-1, keepdims=True)
    return (x / np.sqrt(ms + eps) * w).astype(np.float64)


def _neox_rope(x, pos, n_rot, theta):
    """x [T, H, D]: rotate the first n_rot dims in neox half-split pairs
    (i, i + n_rot/2); the tail passes through."""
    t, nh, d = x.shape
    half = n_rot // 2
    inv = theta ** (-np.arange(half) * 2.0 / n_rot)
    ang = pos[:, None] * inv[None, :]  # [T, half]
    cos, sin = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
    x1, x2, tail = x[..., :half], x[..., half:n_rot], x[..., n_rot:]
    return np.concatenate(
        [x1 * cos - x2 * sin, x1 * sin + x2 * cos, tail], axis=-1)


def _m2_numpy(sd, toks):
    """Direct implementation of the reference minimax-m2 graph."""
    h = CFG["hidden_size"]
    nh, nkv, hd = CFG["num_attention_heads"], CFG["num_key_value_heads"], CFG["head_dim"]
    n_rot = int(hd * CFG["partial_rotary_factor"])
    topk = CFG["num_experts_per_tok"]
    out = []
    for row in toks:
        x = sd["model.embed_tokens.weight"][row].astype(np.float64)  # [T, h]
        t = len(row)
        pos = np.arange(t)
        for il in range(CFG["num_hidden_layers"]):
            p = f"model.layers.{il}."
            hn = _rms(x, sd[p + "input_layernorm.weight"])
            q = hn @ sd[p + "self_attn.q_proj.weight"].T.astype(np.float64)
            k = hn @ sd[p + "self_attn.k_proj.weight"].T.astype(np.float64)
            v = hn @ sd[p + "self_attn.v_proj.weight"].T.astype(np.float64)
            q = _rms(q, sd[p + "self_attn.q_norm.weight"])  # FULL-row norm
            k = _rms(k, sd[p + "self_attn.k_norm.weight"])
            q = _neox_rope(q.reshape(t, nh, hd), pos, n_rot, CFG["rope_theta"])
            k = _neox_rope(k.reshape(t, nkv, hd), pos, n_rot, CFG["rope_theta"])
            v = v.reshape(t, nkv, hd)
            g = nh // nkv
            att_out = np.zeros((t, nh, hd))
            mask = np.tril(np.ones((t, t), bool))
            for ih in range(nh):
                kk, vv = k[:, ih // g], v[:, ih // g]
                sc = (q[:, ih] @ kk.T) / np.sqrt(hd)
                sc = np.where(mask, sc, -np.inf)
                w_ = np.exp(sc - sc.max(-1, keepdims=True))
                w_ /= w_.sum(-1, keepdims=True)
                att_out[:, ih] = w_ @ vv
            x = x + att_out.reshape(t, nh * hd) @ sd[p + "self_attn.o_proj.weight"].T.astype(np.float64)
            hn = _rms(x, sd[p + "post_attention_layernorm.weight"])
            router = hn @ sd[p + "block_sparse_moe.gate.weight"].T.astype(np.float64)
            probs = 1.0 / (1.0 + np.exp(-router))  # sigmoid gating
            sel_score = probs + sd[p + "block_sparse_moe.gate.e_score_correction_bias"]
            moe = np.zeros_like(hn)
            for it in range(t):
                idx = np.argsort(-sel_score[it])[:topk]
                wts = probs[it, idx]
                wts = wts / wts.sum()  # norm_topk_prob
                acc = np.zeros(h)
                for e, wt in zip(idx, wts):
                    qq = f"{p}block_sparse_moe.experts.{e}."
                    gg = hn[it] @ sd[qq + "w1.weight"].T.astype(np.float64)
                    uu = hn[it] @ sd[qq + "w3.weight"].T.astype(np.float64)
                    dd = (gg / (1.0 + np.exp(-gg)) * uu) @ sd[qq + "w2.weight"].T.astype(np.float64)
                    acc += wt * dd
                moe[it] = acc
            x = x + moe
        x = _rms(x, sd["model.norm.weight"])
        out.append(x @ sd["lm_head.weight"].T.astype(np.float64))
    return np.stack(out)


@pytest.fixture(scope="module")
def toks():
    return np.random.default_rng(7).integers(0, CFG["vocab_size"], (2, 9)).astype(np.int32)


def test_minimax_m2_matches_numpy_spec(tmp_path, toks):
    from zllm.convert import convert_hf_llama
    from zllm.models.loader import Model

    sd = _m2_sd()
    path = str(tmp_path / "m2.gguf")
    convert_hf_llama(sd, CFG, path, arch="minimax-m2", gtype=GGMLType.F32)
    import jax
    import jax.numpy as jnp

    from zllm.models.llama import forward

    m = Model.load(path, quantized=False, dtype=jnp.float32)
    assert m.cfg.arch == "minimax-m2"
    assert m.cfg.rope.dim == 8 and m.cfg.head_dim == 16
    assert m.cfg.moe is not None and m.cfg.moe.gate_func == "sigmoid"
    assert m.cfg.moe.norm_topk_prob
    pos = np.broadcast_to(np.arange(toks.shape[1], dtype=np.int32), toks.shape)
    fwd = jax.jit(lambda p, t, q: forward(p, m.cfg, t, q, None)[0])
    got = np.asarray(fwd(m.params, jnp.asarray(toks), jnp.asarray(pos)))
    want = _m2_numpy(_m2_sd(), toks)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_minimax_m2_engine_serves(tmp_path, toks):
    import queue

    import jax.numpy as jnp

    from zllm.convert import convert_hf_llama
    from zllm.models.loader import Model
    from zllm.server.engine import Engine, Request

    path = str(tmp_path / "m2e.gguf")
    convert_hf_llama(_m2_sd(), CFG, path, arch="minimax-m2", gtype=GGMLType.F32)
    m = Model.load(path, quantized=False, dtype=jnp.float32)
    eng = Engine(m, n_slots=2, max_len=64)
    eng.start()
    try:
        req = Request(prompt_tokens=[5, 17, 42, 7], max_new=6, temp=0.0, top_k=1)
        eng.submit(req)
        while not req.done:
            try:
                req.stream_q.get(timeout=30)
            except queue.Empty:
                raise AssertionError("engine stalled")
        assert req.error == "" and len(req.out_tokens) == 6
    finally:
        eng.stop()
