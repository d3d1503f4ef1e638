"""Jamba hybrid (attention + mamba + MoE) parity vs HF JambaForCausalLM
(reference: src/models/jamba.cpp + the composed memory class
src/llama-memory-hybrid.cpp)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from zllm.gguf.constants import GGMLType

JAMBA_CFG = dict(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=4,
    num_attention_heads=4,
    num_key_value_heads=2,
    mamba_d_state=16,
    mamba_d_conv=4,
    mamba_expand=2,
    mamba_dt_rank=4,
    num_experts=4,
    num_experts_per_tok=2,
    expert_layer_period=2,
    expert_layer_offset=1,
    attn_layer_period=2,
    attn_layer_offset=1,
    use_mamba_kernels=False,
    rms_norm_eps=1e-5,
    tie_word_embeddings=False,
)


@pytest.fixture(scope="module")
def jamba_ref(tmp_path_factory):
    from conftest import subprocess_env

    out = tmp_path_factory.mktemp("hf") / "jamba.npz"
    script = os.path.join(os.path.dirname(__file__), "hf_oracle.py")
    r = subprocess.run(
        [sys.executable, script, str(out), json.dumps(JAMBA_CFG), "jamba"],
        timeout=600, capture_output=True, env=subprocess_env(),
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    data = np.load(str(out))
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    return sd, data["toks"], data["logits"], data["greedy"]


@pytest.fixture(scope="module")
def jamba_gguf(jamba_ref, tmp_path_factory):
    from zllm.convert.hf import convert_hf_jamba

    sd, *_ = jamba_ref
    path = str(tmp_path_factory.mktemp("m") / "jamba.gguf")
    convert_hf_jamba(sd, JAMBA_CFG, path, gtype=GGMLType.F32)
    return path


def test_jamba_config(jamba_gguf):
    import jax.numpy as jnp

    from zllm.models.loader import Model

    m = Model.load(jamba_gguf, quantized=False, dtype=jnp.float32)
    cfg = m.cfg
    assert cfg.is_hybrid and not cfg.is_recurrent
    # attn_layer_offset=1, period=2 over 4 layers -> attn at 1, 3
    assert cfg.attn_layers == (False, True, False, True)
    assert cfg.n_attn_layers == 2 and cfg.n_recurrent_layers == 2
    assert not cfg.use_rope
    assert cfg.moe is not None and cfg.moe.n_experts == 4
    # MoE on layers 1, 3 (expert offset 1, period 2); dense elsewhere
    assert "ffn_gate_inp" in m.params["layers"][1]
    assert "ffn_gate" in m.params["layers"][0] or "ffn_gateup" in m.params["layers"][0]


def test_jamba_logit_parity(jamba_ref, jamba_gguf):
    import jax
    import jax.numpy as jnp

    from zllm.models.hybrid import hybrid_forward
    from zllm.models.loader import Model

    _, toks, want, _ = jamba_ref
    m = Model.load(jamba_gguf, quantized=False, dtype=jnp.float32)

    fwd = jax.jit(lambda p, t: hybrid_forward(p, m.cfg, t, jnp.broadcast_to(
        jnp.arange(t.shape[1], dtype=jnp.int32), t.shape))[0])
    got = np.asarray(fwd(m.params, jnp.asarray(toks.astype(np.int32))))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_jamba_incremental_decode(jamba_ref, jamba_gguf):
    """Prefill + token-by-token decode through (KVCache, RecurrentState)
    matches the full-sequence forward, and greedy matches HF."""
    import jax
    import jax.numpy as jnp

    from zllm.models.hybrid import hybrid_forward, make_hybrid_state
    from zllm.models.loader import Model
    from zllm.runtime.kvcache import KVCache

    _, toks, want, greedy = jamba_ref
    m = Model.load(jamba_gguf, quantized=False, dtype=jnp.float32)
    cfg = m.cfg

    prompt = [5, 17, 42, 7]
    max_len = 16
    kv = KVCache.create(cfg.n_attn_layers, 1, max_len, cfg.n_kv_heads,
                        cfg.head_dim, jnp.float32)
    state = make_hybrid_state(cfg, 1)

    t = jnp.asarray([prompt], jnp.int32)
    pos = jnp.arange(len(prompt), dtype=jnp.int32)[None]
    logits, kv, state = hybrid_forward(m.params, cfg, t, pos, kv, state,
                                       logits_for="last")
    out = []
    cur = int(np.argmax(np.asarray(logits)[0, -1]))
    out.append(cur)
    for i in range(5):
        p = jnp.asarray([[len(prompt) + i]], jnp.int32)
        logits, kv, state = hybrid_forward(
            m.params, cfg, jnp.asarray([[cur]], jnp.int32), p, kv, state,
            logits_for="last")
        cur = int(np.argmax(np.asarray(logits)[0, -1]))
        out.append(cur)
    assert out == list(greedy), (out, list(greedy))


def _hybrid_oracle(model, prompt, n_new):
    """Lone sequence greedy decode through (KVCache, RecurrentState)."""
    import jax.numpy as jnp

    from zllm.models.hybrid import hybrid_forward, make_hybrid_state
    from zllm.runtime.kvcache import KVCache

    cfg = model.cfg
    kv = KVCache.create(cfg.n_attn_layers, 1, 256, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    state = make_hybrid_state(cfg, 1)
    t = jnp.asarray([prompt], jnp.int32)
    pos = jnp.arange(len(prompt), dtype=jnp.int32)[None]
    logits, kv, state = hybrid_forward(model.params, cfg, t, pos, kv, state, logits_for="last")
    out = [int(np.asarray(logits)[0, -1].argmax())]
    for i in range(n_new - 1):
        p = jnp.asarray([[len(prompt) + i]], jnp.int32)
        logits, kv, state = hybrid_forward(
            model.params, cfg, jnp.asarray([[out[-1]]], jnp.int32), p, kv, state,
            logits_for="last")
        out.append(int(np.asarray(logits)[0, -1].argmax()))
    return out


def test_jamba_engine_serving(jamba_gguf):
    """Concurrent slots (one chunk-prefilling, one decoding) produce
    exactly what lone greedy decodes produce — the hybrid step's trash
    positions + lengths masking keep KV and mamba state isolated."""
    import time

    import jax.numpy as jnp

    from zllm.models.loader import Model
    from zllm.server.engine import Engine, Request

    model = Model.load(jamba_gguf, quantized=False, dtype=jnp.float32)
    prompts = [
        list(np.random.default_rng(0).integers(1, 200, size=21)),
        list(np.random.default_rng(1).integers(1, 200, size=3)),
    ]
    n_new = 8
    eng = Engine(model, n_slots=2, max_len=256, prefill_chunk=8,
                 kv_dtype=jnp.float32)
    assert eng.hybrid and not eng.recurrent
    eng.start()
    try:
        reqs = [eng.submit(Request(prompt_tokens=p, max_new=n_new, temp=0.0))
                for p in prompts]
        deadline = time.time() + 120
        while not all(r.done for r in reqs):
            assert time.time() < deadline, "engine timed out"
            time.sleep(0.02)
        assert all(r.error == "" for r in reqs), [r.error for r in reqs]
    finally:
        eng.stop()
    for p, r in zip(prompts, reqs):
        want = _hybrid_oracle(model, p, n_new)
        assert r.out_tokens == want, (r.out_tokens, want)


BAMBA_CFG = dict(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=96,
    num_hidden_layers=4,
    num_attention_heads=4,
    num_key_value_heads=2,
    mamba_n_heads=4,
    mamba_d_head=32,
    mamba_n_groups=1,
    mamba_d_state=32,
    mamba_d_conv=4,
    mamba_expand=2,
    attn_layer_indices=[1, 3],
    partial_rotary_factor=0.5,
    rope_theta=10000.0,
    rms_norm_eps=1e-5,
    max_position_embeddings=128,
    tie_word_embeddings=False,
)


def test_bamba_mamba2_hybrid_parity(tmp_path):
    """Bamba (mamba2 + attention hybrid; reference src/models/
    granite-hybrid.cpp build_mamba2_layer path): HF logit parity through
    hybrid_forward."""
    import jax
    import jax.numpy as jnp

    from conftest import subprocess_env
    from zllm.convert.hf import convert_hf_bamba
    from zllm.models.hybrid import hybrid_forward
    from zllm.models.loader import Model

    out = tmp_path / "bamba.npz"
    script = os.path.join(os.path.dirname(__file__), "hf_oracle.py")
    r = subprocess.run(
        [sys.executable, script, str(out), json.dumps(BAMBA_CFG), "bamba"],
        timeout=600, capture_output=True, env=subprocess_env(),
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    data = np.load(str(out))
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}

    path = str(tmp_path / "bamba.gguf")
    convert_hf_bamba(sd, BAMBA_CFG, path, gtype=GGMLType.F32)
    m = Model.load(path, quantized=False, dtype=jnp.float32)
    cfg = m.cfg
    assert cfg.is_hybrid and cfg.ssm.is_mamba2
    assert cfg.attn_layers == (False, True, False, True)

    toks = data["toks"].astype(np.int32)
    fwd = jax.jit(lambda p, t: hybrid_forward(p, cfg, t, jnp.broadcast_to(
        jnp.arange(t.shape[1], dtype=jnp.int32), t.shape))[0])
    got = np.asarray(fwd(m.params, jnp.asarray(toks)))
    np.testing.assert_allclose(got, data["logits"], rtol=3e-4, atol=3e-4)


FH1_CFG = dict(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=96,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    mamba_n_heads=4,
    mamba_d_head=32,
    mamba_n_groups=1,
    mamba_d_state=32,
    mamba_d_conv=4,
    mamba_d_ssm=128,
    mamba_expand=2,
    key_multiplier=0.5,
    attention_in_multiplier=1.5,
    attention_out_multiplier=0.8,
    ssm_in_multiplier=1.2,
    ssm_out_multiplier=0.9,
    mlp_multipliers=[1.1, 0.7],
    ssm_multipliers=[1.0, 1.2, 0.9, 1.1, 0.8],
    embedding_multiplier=2.0,
    lm_head_multiplier=0.5,
    rope_theta=10000.0,
    rms_norm_eps=1e-5,
    max_position_embeddings=128,
    tie_word_embeddings=False,
)


def test_falcon_h1_parallel_hybrid_parity(tmp_path):
    """Falcon-H1 (attention + mamba2 in parallel each layer, scalar
    multipliers folded at conversion; reference src/models/falcon-h1.cpp
    + convert_hf_to_gguf.py FalconH1Model)."""
    import jax
    import jax.numpy as jnp

    from conftest import subprocess_env
    from zllm.convert.hf import convert_hf_falcon_h1
    from zllm.models.hybrid import hybrid_forward
    from zllm.models.loader import Model

    out = tmp_path / "fh1.npz"
    script = os.path.join(os.path.dirname(__file__), "hf_oracle.py")
    r = subprocess.run(
        [sys.executable, script, str(out), json.dumps(FH1_CFG), "falcon-h1"],
        timeout=600, capture_output=True, env=subprocess_env(),
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    data = np.load(str(out))
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}

    path = str(tmp_path / "fh1.gguf")
    convert_hf_falcon_h1(sd, FH1_CFG, path, gtype=GGMLType.F32)
    m = Model.load(path, quantized=False, dtype=jnp.float32)
    cfg = m.cfg
    assert cfg.is_hybrid and cfg.parallel_hybrid and cfg.ssm.is_mamba2
    assert cfg.n_attn_layers == 2 and cfg.n_recurrent_layers == 2

    toks = data["toks"].astype(np.int32)
    fwd = jax.jit(lambda p, t: hybrid_forward(p, cfg, t, jnp.broadcast_to(
        jnp.arange(t.shape[1], dtype=jnp.int32), t.shape))[0])
    got = np.asarray(fwd(m.params, jnp.asarray(toks)))
    np.testing.assert_allclose(got, data["logits"], rtol=3e-4, atol=3e-4)
