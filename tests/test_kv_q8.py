"""Quantized (Q8) KV cache: decode continuation must closely match the
bf16-cache path (reference: type_k/type_v quantized KV option)."""

import numpy as np
import pytest


def test_q8_kv_matches_dense(tmp_path):
    import jax
    import jax.numpy as jnp

    from zllm.gguf.constants import GGMLType
    from zllm.models.llama import forward
    from zllm.models.loader import Model
    from zllm.runtime.kvcache import KVCache, KVCacheQ8
    from zllm.testing import make_llama_gguf

    path = str(tmp_path / "m.gguf")
    make_llama_gguf(path, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=128, vocab_size=64, gtype=GGMLType.F32)
    m = Model.load(path, quantized=False, dtype=jnp.float32)
    cfg = m.cfg
    rng = np.random.default_rng(0)
    toks = rng.integers(0, 64, (1, 10)).astype(np.int32)
    pos = np.arange(10, dtype=np.int32)[None]

    step = jax.jit(lambda p, t, q, c: forward(p, cfg, t, q, c))

    kv_f = KVCache.create(cfg.n_layers, 1, 32, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    kv_q = KVCacheQ8.create(cfg.n_layers, 1, 32, cfg.n_kv_heads, cfg.head_dim)

    lf, kv_f = step(m.params, jnp.asarray(toks), jnp.asarray(pos), kv_f)
    lq, kv_q = step(m.params, jnp.asarray(toks), jnp.asarray(pos), kv_q)

    a, b = np.asarray(lf), np.asarray(lq)
    nmse = np.mean((a - b) ** 2) / (np.mean(a**2) + 1e-12)
    assert nmse < 1e-4, nmse
    # greedy continuation stays identical for a few steps
    ta = int(np.argmax(a[0, -1])); tb = int(np.argmax(b[0, -1]))
    assert ta == tb
    for i in range(4):
        lf, kv_f = step(m.params, jnp.asarray([[ta]], jnp.int32), jnp.asarray([[10 + i]], jnp.int32), kv_f)
        lq, kv_q = step(m.params, jnp.asarray([[tb]], jnp.int32), jnp.asarray([[10 + i]], jnp.int32), kv_q)
        ta = int(np.argmax(np.asarray(lf)[0, -1]))
        tb = int(np.argmax(np.asarray(lq)[0, -1]))
        assert ta == tb


def test_q8_kv_memory_halves():
    import jax.numpy as jnp

    from zllm.runtime.kvcache import KVCache, KVCacheQ8

    kf = KVCache.create(2, 1, 128, 4, 64, jnp.bfloat16)
    kq = KVCacheQ8.create(2, 1, 128, 4, 64)
    bytes_f = sum(x.nbytes for x in kf.k + kf.v)
    bytes_q = sum(x.nbytes for x in kq.k + kq.v + kq.ks + kq.vs)
    assert bytes_q < bytes_f * 0.6
