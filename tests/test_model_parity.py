"""Model forward correctness:

1. HF-parity: a tiny random LlamaForCausalLM (torch, in a subprocess — see
   hf_oracle.py) converted to GGUF must produce matching logits in our JAX
   forward (pattern: reference examples/model-conversion logits check).
2. Quantized-vs-dense consistency on the same GGUF.
3. Incremental KV-cache decode == full-sequence forward.
4. Greedy generation matches HF greedy.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from zllm.gguf.constants import GGMLType

TINY_CFG = dict(
    vocab_size=199,
    hidden_size=64,
    intermediate_size=96,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=256,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    tie_word_embeddings=False,
)


@pytest.fixture(scope="session")
def hf_ref(tmp_path_factory):
    """State dict + reference outputs from the torch subprocess oracle."""
    from conftest import subprocess_env

    out = tmp_path_factory.mktemp("hf") / "ref.npz"
    script = os.path.join(os.path.dirname(__file__), "hf_oracle.py")
    subprocess.run(
        [sys.executable, script, str(out), json.dumps(TINY_CFG)],
        check=True, timeout=300, capture_output=True, env=subprocess_env(),
    )
    data = np.load(str(out))
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    return sd, data["toks"], data["logits"], data["greedy"]


@pytest.fixture(scope="session")
def tiny_gguf(hf_ref, tmp_path_factory):
    from zllm.convert import convert_hf_llama

    sd, *_ = hf_ref
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    convert_hf_llama(sd, TINY_CFG, path, gtype=GGMLType.F32)
    return path


def test_hf_logit_parity(hf_ref, tiny_gguf):
    import jax
    import jax.numpy as jnp

    from zllm.models.llama import forward
    from zllm.models.loader import Model

    _, toks, want, _ = hf_ref
    m = Model.load(tiny_gguf, quantized=False, dtype=jnp.float32)
    assert m.cfg.n_layers == 3 and m.cfg.n_heads == 4 and m.cfg.n_kv_heads == 2

    toks = toks.astype(np.int32)
    positions = np.broadcast_to(np.arange(toks.shape[1], dtype=np.int32), toks.shape)
    fwd = jax.jit(lambda p, t, q: forward(p, m.cfg, t, q, None)[0])
    got = np.asarray(fwd(m.params, jnp.asarray(toks), jnp.asarray(positions)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_quantized_matches_dense_dequant(hf_ref, tmp_path):
    """The quantized execution path must agree with dense execution over the
    *dequantized* weights (same rounding), to fp32 tolerance."""
    import jax
    import jax.numpy as jnp

    from zllm.convert import convert_hf_llama
    from zllm.models.llama import forward
    from zllm.models.loader import Model

    sd, *_ = hf_ref
    path = str(tmp_path / "q.gguf")
    convert_hf_llama(sd, TINY_CFG, path, gtype=GGMLType.Q8_0)

    mq = Model.load(path, quantized=True, dtype=jnp.float32)
    md = Model.load(path, quantized=False, dtype=jnp.float32)
    from zllm.quant.repack import QTensor

    l0 = mq.params["layers"][0]
    assert isinstance(l0.get("wqkv", l0.get("wq")), QTensor)

    rng = np.random.default_rng(5)
    toks = rng.integers(0, TINY_CFG["vocab_size"], size=(1, 8)).astype(np.int32)
    pos = np.arange(8, dtype=np.int32)[None, :]
    fwd_q = jax.jit(lambda p, t, q: forward(p, mq.cfg, t, q, None)[0])
    fwd_d = jax.jit(lambda p, t, q: forward(p, md.cfg, t, q, None)[0])
    lq = np.asarray(fwd_q(mq.params, jnp.asarray(toks), jnp.asarray(pos)))
    ld = np.asarray(fwd_d(md.params, jnp.asarray(toks), jnp.asarray(pos)))
    np.testing.assert_allclose(lq, ld, rtol=1e-4, atol=1e-5)


def test_kv_cache_decode_matches_full(tiny_gguf):
    import jax
    import jax.numpy as jnp

    from zllm.models.llama import forward
    from zllm.models.loader import Model
    from zllm.runtime.kvcache import KVCache

    m = Model.load(tiny_gguf, quantized=False, dtype=jnp.float32)
    rng = np.random.default_rng(9)
    n = 10
    toks = rng.integers(0, TINY_CFG["vocab_size"], size=(1, n)).astype(np.int32)
    pos = np.arange(n, dtype=np.int32)[None, :]

    fwd = jax.jit(lambda p, t, q: forward(p, m.cfg, t, q, None)[0])
    full = np.asarray(fwd(m.params, jnp.asarray(toks), jnp.asarray(pos)))

    step_fn = jax.jit(lambda p, t, q, kv: forward(p, m.cfg, t, q, kv))
    kv = KVCache.create(m.cfg.n_layers, 1, 16, m.cfg.n_kv_heads, m.cfg.head_dim, jnp.float32)
    outs = []
    for i in range(n):
        lg, kv = step_fn(m.params, jnp.asarray(toks[:, i : i + 1]), jnp.asarray(pos[:, i : i + 1]), kv)
        outs.append(np.asarray(lg)[0, 0])
    step = np.stack(outs)[None]
    np.testing.assert_allclose(step, full, rtol=2e-4, atol=1e-5)


def test_generator_greedy(hf_ref, tiny_gguf):
    import jax.numpy as jnp

    from zllm.models.loader import Model
    from zllm.runtime.generate import Generator

    _, _, _, hf_greedy = hf_ref
    m = Model.load(tiny_gguf, quantized=False, dtype=jnp.float32)
    gen = Generator(m, max_len=64, prefill_chunk=8)
    res = gen.generate([5, 17, 42, 7], max_new=6)
    assert res.tokens == hf_greedy.tolist()
