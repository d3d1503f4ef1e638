"""LFM2 hybrid (short-conv + attention) parity vs HF Lfm2ForCausalLM
(reference: src/models/lfm2.cpp build_shortconv_block + hybrid memory)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from zllm.gguf.constants import GGMLType

LFM2_CFG = dict(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=96,
    num_hidden_layers=4,
    num_attention_heads=4,
    num_key_value_heads=2,
    layer_types=["conv", "full_attention", "conv", "full_attention"],
    conv_L_cache=3,
    norm_eps=1e-5,
    rope_theta=10000.0,
    max_position_embeddings=128,
    tie_word_embeddings=False,
)


@pytest.fixture(scope="module")
def lfm2_ref(tmp_path_factory):
    from conftest import subprocess_env

    out = tmp_path_factory.mktemp("hf") / "lfm2.npz"
    script = os.path.join(os.path.dirname(__file__), "hf_oracle.py")
    r = subprocess.run(
        [sys.executable, script, str(out), json.dumps(LFM2_CFG), "lfm2"],
        timeout=600, capture_output=True, env=subprocess_env(),
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    data = np.load(str(out))
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    return sd, data["toks"], data["logits"], data["greedy"]


@pytest.fixture(scope="module")
def lfm2_gguf(lfm2_ref, tmp_path_factory):
    from zllm.convert.hf import convert_hf_lfm2

    sd, *_ = lfm2_ref
    path = str(tmp_path_factory.mktemp("m") / "lfm2.gguf")
    convert_hf_lfm2(sd, LFM2_CFG, path, gtype=GGMLType.F32)
    return path


def test_lfm2_config_and_parity(lfm2_ref, lfm2_gguf):
    import jax
    import jax.numpy as jnp

    from zllm.models.hybrid import hybrid_forward
    from zllm.models.loader import Model

    _, toks, want, _ = lfm2_ref
    m = Model.load(lfm2_gguf, quantized=False, dtype=jnp.float32)
    cfg = m.cfg
    assert cfg.is_hybrid and cfg.shortconv_l == 3
    assert cfg.attn_layers == (False, True, False, True)

    fwd = jax.jit(lambda p, t: hybrid_forward(p, cfg, t, jnp.broadcast_to(
        jnp.arange(t.shape[1], dtype=jnp.int32), t.shape))[0])
    got = np.asarray(fwd(m.params, jnp.asarray(toks.astype(np.int32))))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_lfm2_incremental_decode(lfm2_ref, lfm2_gguf):
    """Prefill + token-by-token decode through (KVCache, conv state)
    matches HF greedy."""
    import jax.numpy as jnp

    from zllm.models.hybrid import hybrid_forward, make_hybrid_state
    from zllm.models.loader import Model
    from zllm.runtime.kvcache import KVCache

    _, _, _, greedy = lfm2_ref
    m = Model.load(lfm2_gguf, quantized=False, dtype=jnp.float32)
    cfg = m.cfg
    prompt = [5, 17, 42, 7]
    kv = KVCache.create(cfg.n_attn_layers, 1, 16, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    state = make_hybrid_state(cfg, 1)
    t = jnp.asarray([prompt], jnp.int32)
    pos = jnp.arange(len(prompt), dtype=jnp.int32)[None]
    logits, kv, state = hybrid_forward(m.params, cfg, t, pos, kv, state, logits_for="last")
    out = [int(np.asarray(logits)[0, -1].argmax())]
    for i in range(5):
        p = jnp.asarray([[len(prompt) + i]], jnp.int32)
        logits, kv, state = hybrid_forward(
            m.params, cfg, jnp.asarray([[out[-1]]], jnp.int32), p, kv, state,
            logits_for="last")
        out.append(int(np.asarray(logits)[0, -1].argmax()))
    assert out == list(greedy), (out, list(greedy))


def test_lfm2_engine_serving(lfm2_gguf):
    """The hybrid engine path serves lfm2 (conv state in place of mamba)."""
    import time

    import jax.numpy as jnp

    from zllm.models.loader import Model
    from zllm.server.engine import Engine, Request

    model = Model.load(lfm2_gguf, quantized=False, dtype=jnp.float32)
    eng = Engine(model, n_slots=2, max_len=64, prefill_chunk=8, kv_dtype=jnp.float32)
    assert eng.hybrid
    eng.start()
    try:
        reqs = [eng.submit(Request(prompt_tokens=list(np.random.default_rng(s).integers(1, 200, size=n)),
                                   max_new=6, temp=0.0))
                for s, n in ((0, 17), (1, 3))]
        deadline = time.time() + 120
        while not all(r.done for r in reqs):
            assert time.time() < deadline, "engine timed out"
            time.sleep(0.02)
        assert all(r.error == "" for r in reqs), [r.error for r in reqs]
        assert all(len(r.out_tokens) == 6 for r in reqs)
    finally:
        eng.stop()
