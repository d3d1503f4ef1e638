"""LoRA adapter tests: runtime delta equals merged-weight forward
(pattern: reference tools/export-lora semantics + adapter hot-swap)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def base(tmp_path_factory):
    import jax.numpy as jnp

    from zllm.gguf.constants import GGMLType
    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf

    path = str(tmp_path_factory.mktemp("m") / "base.gguf")
    make_llama_gguf(path, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=128, vocab_size=128, gtype=GGMLType.F32)
    return Model.load(path, quantized=False, dtype=jnp.float32)


def _fake_peft_sd(rng, n_layers, n_embd, q_dim, rank):
    sd = {}
    for il in range(n_layers):
        p = f"base_model.model.model.layers.{il}.self_attn.q_proj"
        sd[p + ".lora_A.weight"] = rng.standard_normal((rank, n_embd)).astype(np.float32) * 0.1
        sd[p + ".lora_B.weight"] = rng.standard_normal((q_dim, rank)).astype(np.float32) * 0.1
        p = f"base_model.model.model.layers.{il}.mlp.down_proj"
        sd[p + ".lora_A.weight"] = rng.standard_normal((rank, 128)).astype(np.float32) * 0.1
        sd[p + ".lora_B.weight"] = rng.standard_normal((n_embd, rank)).astype(np.float32) * 0.1
    return sd


def test_lora_apply_matches_merged(base, tmp_path):
    import jax
    import jax.numpy as jnp

    from zllm.models.adapter import clear_lora, convert_peft_lora, load_lora
    from zllm.models.llama import forward

    m = base
    rng = np.random.default_rng(0)
    rank, alpha = 4, 8.0
    sd = _fake_peft_sd(rng, 2, 64, 64, rank)
    path = str(tmp_path / "adapter.gguf")
    convert_peft_lora(sd, {"lora_alpha": alpha, "r": rank, "_n_head": 4, "_n_kv_head": 2}, path)

    toks = jnp.asarray(rng.integers(0, 128, (1, 6)).astype(np.int32))
    pos = jnp.asarray(np.arange(6, dtype=np.int32)[None])
    fwd = jax.jit(lambda p, t, q: forward(p, m.cfg, t, q, None)[0])
    base_logits = np.asarray(fwd(m.params, toks, pos))

    n = load_lora(m, path, scale=1.0)
    assert n == 4  # 2 layers x 2 targets
    lora_logits = np.asarray(fwd(m.params, toks, pos))
    assert np.abs(lora_logits - base_logits).max() > 1e-4  # adapter changes output

    # manually merge the deltas into dense weights -> must match runtime path
    import copy

    merged = jax.tree_util.tree_map(lambda x: x, m.params)
    merged = {
        "tok_emb": m.params["tok_emb"], "out_norm": m.params["out_norm"],
        "output": m.params["output"],
        "layers": [dict(l) for l in m.params["layers"]],
    }
    eff = alpha / rank
    for layer in merged["layers"]:
        for key in ("wq", "ffn_down"):
            a, b, s = layer.pop(key + ".lora")
            layer[key] = layer[key] + s * (a @ b)
    merged_logits = np.asarray(fwd(merged, toks, pos))
    np.testing.assert_allclose(lora_logits, merged_logits, rtol=1e-5, atol=1e-5)

    clear_lora(m)
    back = np.asarray(fwd(m.params, toks, pos))
    np.testing.assert_allclose(back, base_logits)


def test_lora_qk_matches_original_basis_oracle(tmp_path, monkeypatch):
    """Runtime q/k LoRA under the default load-time neox permute must match
    an oracle computed ENTIRELY in the original (GGUF norm-rope) basis:
    merge the adapter delta into wq with ZLLM_ROPE_NEOX=0, forward, and
    compare logits.  Guards the basis-crossing contract between
    loader.rope_to_neox and adapter.load_lora (the round-3 regression)."""
    import jax
    import jax.numpy as jnp

    from zllm.gguf.constants import GGMLType
    from zllm.models.adapter import convert_peft_lora, load_lora
    from zllm.models.llama import forward
    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf

    src = str(tmp_path / "m.gguf")
    make_llama_gguf(src, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=128, vocab_size=128, gtype=GGMLType.F32)
    rng = np.random.default_rng(7)
    rank, alpha = 4, 8.0
    sd = {}
    for il in range(2):
        for proj, nout in (("self_attn.q_proj", 64), ("self_attn.k_proj", 32)):
            p = f"base_model.model.model.layers.{il}.{proj}"
            sd[p + ".lora_A.weight"] = rng.standard_normal((rank, 64)).astype(np.float32) * 0.1
            sd[p + ".lora_B.weight"] = rng.standard_normal((nout, rank)).astype(np.float32) * 0.1
    apath = str(tmp_path / "a.gguf")
    convert_peft_lora(sd, {"lora_alpha": alpha, "r": rank, "_n_head": 4, "_n_kv_head": 2}, apath)

    toks = jnp.asarray(rng.integers(0, 128, (1, 6)).astype(np.int32))
    pos = jnp.asarray(np.arange(6, dtype=np.int32)[None])

    # oracle: merge in the original basis, no permute anywhere
    monkeypatch.setenv("ZLLM_ROPE_NEOX", "0")
    m0 = Model.load(src, quantized=False, dtype=jnp.float32, fuse=False)
    assert not m0.cfg.neox_permuted
    load_lora(m0, apath, scale=1.0)
    for layer in m0.params["layers"]:
        for key in ("wq", "wk"):
            a, b, s = layer.pop(key + ".lora")
            layer[key] = layer[key] + s * (a @ b)
    want = np.asarray(forward(m0.params, m0.cfg, toks, pos, None)[0])

    # runtime path: default neox permute + load_lora basis crossing
    monkeypatch.setenv("ZLLM_ROPE_NEOX", "1")
    m1 = Model.load(src, quantized=False, dtype=jnp.float32, fuse=False)
    assert m1.cfg.neox_permuted
    load_lora(m1, apath, scale=1.0)
    got = np.asarray(forward(m1.params, m1.cfg, toks, pos, None)[0])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_lora_scale_zero_is_noop(base, tmp_path):
    import jax
    import jax.numpy as jnp

    from zllm.models.adapter import clear_lora, convert_peft_lora, load_lora
    from zllm.models.llama import forward

    m = base
    rng = np.random.default_rng(1)
    sd = _fake_peft_sd(rng, 2, 64, 64, 4)
    path = str(tmp_path / "a0.gguf")
    convert_peft_lora(sd, {"lora_alpha": 8, "r": 4, "_n_head": 4}, path)

    toks = jnp.asarray(rng.integers(0, 128, (1, 4)).astype(np.int32))
    pos = jnp.asarray(np.arange(4, dtype=np.int32)[None])
    fwd = jax.jit(lambda p, t, q: forward(p, m.cfg, t, q, None)[0])
    base_logits = np.asarray(fwd(m.params, toks, pos))
    load_lora(m, path, scale=0.0)
    np.testing.assert_allclose(np.asarray(fwd(m.params, toks, pos)), base_logits)
    clear_lora(m)
