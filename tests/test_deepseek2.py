"""DeepSeek-V2 (MLA) parity vs HF DeepseekV2ForCausalLM (reference:
src/models/deepseek2.cpp — absorbed MLA attention as MQA over the
[rope | latent] cache, MoE with shared experts)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from zllm.gguf.constants import GGMLType

DS2_CFG = dict(
    vocab_size=256,
    hidden_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=4,
    q_lora_rank=32,
    kv_lora_rank=16,
    qk_rope_head_dim=8,
    qk_nope_head_dim=16,
    v_head_dim=16,
    intermediate_size=128,
    moe_intermediate_size=64,
    n_routed_experts=4,
    num_experts_per_tok=2,
    n_shared_experts=1,
    first_k_dense_replace=1,
    moe_layer_freq=1,
    routed_scaling_factor=1.0,
    scoring_func="softmax",
    topk_method="greedy",
    norm_topk_prob=False,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    max_position_embeddings=256,
    attention_bias=False,
    tie_word_embeddings=False,
)


@pytest.fixture(scope="module")
def ds2_ref(tmp_path_factory):
    from conftest import subprocess_env

    out = tmp_path_factory.mktemp("hf") / "ds2.npz"
    script = os.path.join(os.path.dirname(__file__), "hf_oracle.py")
    r = subprocess.run(
        [sys.executable, script, str(out), json.dumps(DS2_CFG), "deepseek2"],
        timeout=600, capture_output=True, env=subprocess_env(),
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    data = np.load(str(out))
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    return sd, data["toks"], data["logits"], data["greedy"]


@pytest.fixture(scope="module")
def ds2_gguf(ds2_ref, tmp_path_factory):
    from zllm.convert.hf import convert_hf_deepseek2

    sd, *_ = ds2_ref
    path = str(tmp_path_factory.mktemp("m") / "ds2.gguf")
    convert_hf_deepseek2(sd, DS2_CFG, path, gtype=GGMLType.F32)
    return path


def test_ds2_logit_parity(ds2_ref, ds2_gguf):
    import jax
    import jax.numpy as jnp

    from zllm.models.llama import forward
    from zllm.models.loader import Model

    _, toks, want, _ = ds2_ref
    m = Model.load(ds2_gguf, quantized=False, dtype=jnp.float32)
    assert m.cfg.mla is not None
    assert m.cfg.n_kv_heads == 1 and m.cfg.head_dim == 8 + 16  # rope + latent
    assert m.cfg.moe is not None and m.cfg.moe.n_dense_lead == 1

    toks = toks.astype(np.int32)
    positions = np.broadcast_to(np.arange(toks.shape[1], dtype=np.int32), toks.shape)
    fwd = jax.jit(lambda p, t, q: forward(p, m.cfg, t, q, None)[0])
    got = np.asarray(fwd(m.params, jnp.asarray(toks), jnp.asarray(positions)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_ds2_greedy_with_cache(ds2_ref, ds2_gguf):
    """Greedy generation through the MQA latent cache matches HF."""
    import jax
    import jax.numpy as jnp

    from zllm.models.llama import forward
    from zllm.models.loader import Model
    from zllm.runtime.kvcache import KVCache

    _, _, _, greedy = ds2_ref
    m = Model.load(ds2_gguf, quantized=False, dtype=jnp.float32)
    cfg = m.cfg
    prompt = [5, 17, 42, 7]

    kv = KVCache.create(cfg.n_layers, 1, 64, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    step = jax.jit(lambda p, t, q, kv: forward(p, cfg, t, q, kv, logits_for="last"))
    toks = jnp.asarray(np.asarray(prompt, np.int32)[None])
    pos = jnp.asarray(np.arange(len(prompt), dtype=np.int32)[None])
    logits, kv = step(m.params, toks, pos, kv)
    out = [int(np.asarray(logits)[0, -1].argmax())]
    p = len(prompt)
    for _ in range(5):
        logits, kv = step(
            m.params, jnp.asarray([[out[-1]]], jnp.int32), jnp.asarray([[p]], jnp.int32), kv
        )
        out.append(int(np.asarray(logits)[0, -1].argmax()))
        p += 1
    assert out == list(greedy[: len(out)]), (out, list(greedy))


DS3_CFG = dict(
    vocab_size=256,
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=4,
    q_lora_rank=32,
    kv_lora_rank=16,
    qk_rope_head_dim=8,
    qk_nope_head_dim=16,
    v_head_dim=16,
    intermediate_size=128,
    moe_intermediate_size=64,
    n_routed_experts=8,
    num_experts_per_tok=2,
    n_shared_experts=1,
    n_group=4,
    topk_group=2,
    first_k_dense_replace=1,
    moe_layer_freq=1,
    routed_scaling_factor=1.5,
    scoring_func="sigmoid",
    norm_topk_prob=True,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    max_position_embeddings=256,
    attention_bias=False,
    tie_word_embeddings=False,
)


def test_deepseek3_group_routed_moe(tmp_path):
    """DeepSeek-V3: sigmoid gating + e_score_correction bias + group-
    limited routing (reference llama-graph.cpp:1075-1100)."""
    import jax
    import jax.numpy as jnp

    from conftest import subprocess_env
    from zllm.convert.hf import convert_hf_deepseek2
    from zllm.models.llama import forward
    from zllm.models.loader import Model

    out = tmp_path / "ds3.npz"
    script = os.path.join(os.path.dirname(__file__), "hf_oracle.py")
    r = subprocess.run(
        [sys.executable, script, str(out), json.dumps(DS3_CFG), "deepseek3"],
        timeout=600, capture_output=True, env=subprocess_env(),
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    data = np.load(str(out))
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}

    path = str(tmp_path / "ds3.gguf")
    convert_hf_deepseek2(sd, DS3_CFG, path, gtype=GGMLType.F32)
    m = Model.load(path, quantized=False, dtype=jnp.float32)
    assert m.cfg.moe.n_expert_groups == 4 and m.cfg.moe.n_group_used == 2
    assert m.cfg.moe.gate_func == "sigmoid"

    toks = data["toks"].astype(np.int32)
    positions = np.broadcast_to(np.arange(toks.shape[1], dtype=np.int32), toks.shape)
    fwd = jax.jit(lambda p, t, q: forward(p, m.cfg, t, q, None)[0])
    got = np.asarray(fwd(m.params, jnp.asarray(toks), jnp.asarray(positions)))
    np.testing.assert_allclose(got, data["logits"], rtol=3e-4, atol=3e-4)
