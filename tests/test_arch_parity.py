"""Per-architecture HF logit parity: qwen2 (neox rope + qkv bias) and
gemma2 (sandwich norms, softcaps, geglu, sliding-window alternation,
tied embedding, query_pre_attn_scalar)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from zllm.gguf.constants import GGMLType

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARCH_CFGS = {
    "qwen2": dict(
        vocab_size=151,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    ),
    "gemma2": dict(
        vocab_size=163,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0,
        query_pre_attn_scalar=16,
        sliding_window=32,
    ),
    "qwen3": dict(
        vocab_size=157,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=32,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    ),
    "phi3": dict(
        vocab_size=149,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    ),
    "mixtral": dict(
        vocab_size=131,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        num_local_experts=4,
        num_experts_per_tok=2,
        tie_word_embeddings=False,
    ),
    "gemma3": dict(
        vocab_size=167,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=7,  # layers 0-4 + 6 sliding, layer 5 full
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        rope_theta=1000000.0,
        rope_local_base_freq=10000.0,
        query_pre_attn_scalar=16,
        sliding_window=32,
        sliding_window_pattern=6,
        attn_logit_softcapping=None,
        final_logit_softcapping=None,
        tie_word_embeddings=False,
    ),
    "olmo2": dict(
        vocab_size=151,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    ),
    "granite": dict(
        vocab_size=149,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        embedding_multiplier=6.0,
        residual_multiplier=0.22,
        attention_multiplier=0.0078125,
        logits_scaling=8.0,
        tie_word_embeddings=False,
    ),
    "qwen2moe": dict(
        vocab_size=151,
        hidden_size=64,
        intermediate_size=96,
        moe_intermediate_size=48,
        shared_expert_intermediate_size=80,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        num_experts=4,
        num_experts_per_tok=2,
        norm_topk_prob=False,
        decoder_sparse_step=1,
        mlp_only_layers=[],
        tie_word_embeddings=False,
    ),
    "qwen3moe": dict(
        vocab_size=157,
        hidden_size=64,
        intermediate_size=96,
        moe_intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=32,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        num_experts=4,
        num_experts_per_tok=2,
        norm_topk_prob=True,
        decoder_sparse_step=1,
        mlp_only_layers=[],
        tie_word_embeddings=False,
    ),
    "gpt-oss": dict(
        vocab_size=131,
        hidden_size=64,
        intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        num_local_experts=4,
        num_experts_per_tok=2,
        sliding_window=8,
        rope_scaling=None,
        tie_word_embeddings=False,
    ),
    "stablelm": dict(
        vocab_size=151,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        layer_norm_eps=1e-5,
        rope_theta=10000.0,
        partial_rotary_factor=0.25,
        use_qkv_bias=True,
        use_parallel_residual=False,
        tie_word_embeddings=False,
    ),
    "gptneox": dict(
        vocab_size=151,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=128,
        layer_norm_eps=1e-5,
        rotary_pct=0.25,
        rotary_emb_base=10000.0,
        use_parallel_residual=True,
        tie_word_embeddings=False,
    ),
    "starcoder2": dict(
        vocab_size=151,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        norm_epsilon=1e-5,
        rope_theta=10000.0,
        use_bias=True,
        sliding_window=None,
        tie_word_embeddings=False,
    ),
    "command-r": dict(
        vocab_size=151,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        layer_norm_eps=1e-5,
        rope_theta=10000.0,
        logit_scale=0.0625,
        use_qk_norm=False,
        tie_word_embeddings=True,
    ),
    "gpt2": dict(
        vocab_size=151,
        n_positions=128,
        n_embd=64,
        n_layer=2,
        n_head=4,
        layer_norm_epsilon=1e-5,
        tie_word_embeddings=False,
    ),
    "falcon": dict(
        vocab_size=151,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_kv_heads=2,
        new_decoder_architecture=True,
        parallel_attn=True,
        layer_norm_epsilon=1e-5,
        rope_theta=10000.0,
        bias=False,
        alibi=False,
        tie_word_embeddings=False,
    ),
    "nemotron": dict(
        vocab_size=151,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        norm_eps=1e-5,
        rope_theta=10000.0,
        partial_rotary_factor=0.5,
        tie_word_embeddings=False,
    ),
    "olmo": dict(
        vocab_size=151,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        layer_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    ),
    "glm4": dict(
        vocab_size=151,
        pad_token_id=0,
        eos_token_id=2,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        partial_rotary_factor=0.5,
        attention_bias=True,
        tie_word_embeddings=False,
    ),
    "smollm3": dict(
        vocab_size=151,
        pad_token_id=0,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        no_rope_layers=[1, 1, 1, 0],
        no_rope_layer_interval=4,
        tie_word_embeddings=False,
    ),
    "mpt": dict(
        vocab_size=151,
        d_model=64,
        n_heads=4,
        n_layers=2,
        expansion_ratio=2,
        max_seq_len=128,
        layer_norm_epsilon=1e-5,
        attn_config=dict(alibi=True, alibi_bias_max=8),
        tie_word_embeddings=False,
    ),
    "seed-oss": dict(
        vocab_size=151,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        attention_bias=True,
        tie_word_embeddings=False,
    ),
    "olmo3": dict(
        vocab_size=151,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        sliding_window=8,
        tie_word_embeddings=False,
    ),
    "phi2": dict(
        vocab_size=151,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=128,
        layer_norm_eps=1e-5,
        rope_theta=10000.0,
        partial_rotary_factor=0.5,
        tie_word_embeddings=False,
    ),
}


def _oracle(arch, tmpdir):
    from conftest import subprocess_env

    out = os.path.join(tmpdir, f"{arch}.npz")
    script = os.path.join(REPO, "tests", "hf_oracle.py")
    r = subprocess.run(
        [sys.executable, script, out, json.dumps(ARCH_CFGS[arch]), arch],
        timeout=300, capture_output=True, text=True, env=subprocess_env(),
    )
    if r.returncode != 0:
        pytest.skip(f"HF oracle unavailable for {arch}: {r.stderr[-500:]}")
    data = np.load(out)
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    return sd, data["toks"], data["logits"], data["greedy"]


@pytest.mark.parametrize("arch", [
    "qwen2", "gemma2", "mixtral", "qwen3", "phi3", "gemma3",
    "olmo2", "granite", "qwen2moe", "qwen3moe", "gpt-oss",
    "stablelm", "gptneox", "starcoder2", "command-r", "gpt2", "falcon",
    "nemotron", "olmo", "glm4", "smollm3", "mpt", "seed-oss", "olmo3", "phi2",
])
def test_arch_logit_parity(arch, tmp_path):
    import jax
    import jax.numpy as jnp

    from zllm.convert import convert_hf_llama
    from zllm.models.llama import forward
    from zllm.models.loader import Model

    sd, toks, want, _ = _oracle(arch, str(tmp_path))
    path = str(tmp_path / f"{arch}.gguf")
    if arch in ("gptneox", "gpt2", "falcon", "mpt", "phi2"):
        from zllm.convert import hf as _hf

        getattr(_hf, f"convert_hf_{arch}")(sd, ARCH_CFGS[arch], path, gtype=GGMLType.F32)
    else:
        gguf_arch = "llama" if arch == "mixtral" else arch  # mixtral = llama + experts
        convert_hf_llama(sd, ARCH_CFGS[arch], path, arch=gguf_arch, gtype=GGMLType.F32)

    m = Model.load(path, quantized=False, dtype=jnp.float32)
    toks = toks.astype(np.int32)
    positions = np.broadcast_to(np.arange(toks.shape[1], dtype=np.int32), toks.shape)
    fwd = jax.jit(lambda p, t, q: forward(p, m.cfg, t, q, None)[0])
    got = np.asarray(fwd(m.params, jnp.asarray(toks), jnp.asarray(positions)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)
