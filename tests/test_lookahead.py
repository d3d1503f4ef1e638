"""Lookahead decoding (reference examples/lookahead): output must be
bit-identical to plain greedy decoding, with measured n-gram acceptance
on a repetitive prompt."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    import jax.numpy as jnp

    from zllm.gguf.constants import GGMLType
    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf

    path = str(tmp_path_factory.mktemp("m") / "la.gguf")
    make_llama_gguf(path, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=128, vocab_size=128, gtype=GGMLType.F32)
    return Model.load(path, quantized=False, dtype=jnp.float32)


def _greedy(model, prompt, n_new):
    import jax
    import jax.numpy as jnp

    from zllm.models.llama import forward
    from zllm.runtime.kvcache import KVCache

    cfg = model.cfg
    kv = KVCache.create(cfg.n_layers, 1, 256, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    fwd = jax.jit(lambda p, t, q, c: forward(p, cfg, t, q, c, logits_for="last"))
    logits, kv = fwd(model.params, jnp.asarray([prompt], jnp.int32),
                     jnp.asarray(np.arange(len(prompt), dtype=np.int32)[None]), kv)
    out = [int(np.asarray(logits)[0, -1].argmax())]
    for i in range(n_new - 1):
        logits, kv = fwd(model.params, jnp.asarray([[out[-1]]], jnp.int32),
                         jnp.asarray([[len(prompt) + i]], jnp.int32), kv)
        out.append(int(np.asarray(logits)[0, -1].argmax()))
    return out


def test_lookahead_matches_greedy(model):
    from tools.lookahead import lookahead_generate

    rng = np.random.default_rng(0)
    prompt = rng.integers(1, 120, size=9).tolist()
    n_new = 24
    want = _greedy(model, prompt, n_new)
    got, stats = lookahead_generate(model, prompt, n_new, w=4, n=3, g=4,
                                    max_len=256)
    assert got == want, (got, want)
    assert stats["steps"] >= 1 and stats["tokens_per_step"] >= 1.0


def test_lookahead_accepts_on_repetition(model):
    """A synthetic greedy loop emits repeating token cycles — the pool
    must eventually hit and accept gram continuations (>0 accepted)."""
    from tools.lookahead import lookahead_generate

    rng = np.random.default_rng(1)
    prompt = rng.integers(1, 120, size=5).tolist()
    n_new = 48
    want = _greedy(model, prompt, n_new)
    got, stats = lookahead_generate(model, prompt, n_new, w=6, n=3, g=6,
                                    max_len=256)
    assert got == want
    # random tiny models greedily fall into short cycles, so the trajectory
    # pool should land at least one accepted gram over 48 tokens
    assert stats["accepted_from_grams"] >= 1, stats
