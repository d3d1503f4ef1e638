"""Speculative decoding must reproduce plain greedy decoding exactly
(pattern: reference examples/lookup + common/speculative.cpp invariants)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    import jax.numpy as jnp

    from zllm.gguf.constants import GGMLType
    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf

    d = tmp_path_factory.mktemp("m")
    tgt = str(d / "target.gguf")
    make_llama_gguf(tgt, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=128, vocab_size=64, gtype=GGMLType.F32, seed=0)
    drf = str(d / "draft.gguf")
    make_llama_gguf(drf, n_layers=1, n_embd=32, n_heads=2, n_kv_heads=2,
                    n_ff=64, vocab_size=64, gtype=GGMLType.F32, seed=1)
    return (Model.load(tgt, quantized=False, dtype=jnp.float32),
            Model.load(drf, quantized=False, dtype=jnp.float32))


def _plain_greedy(model, prompt, n):
    import jax.numpy as jnp

    from zllm.runtime.generate import Generator

    gen = Generator(model, max_len=256, prefill_chunk=8, kv_dtype=jnp.float32)
    return gen.generate(prompt, max_new=n).tokens


def test_ngram_propose():
    from zllm.runtime.speculative import ngram_propose

    toks = [1, 2, 3, 9, 9, 1, 2, 3]
    assert ngram_propose(toks, n_draft=2)[:2] == [9, 9]
    assert ngram_propose([1, 2, 3, 4], n_draft=4) == []


@pytest.mark.parametrize("use_draft", [False, True])
def test_speculative_matches_greedy(models, use_draft):
    from zllm.runtime.speculative import SpeculativeDecoder

    target, draft = models
    prompt = [5, 9, 5, 9, 5, 9, 13]
    want = _plain_greedy(target, prompt, 16)

    spec = SpeculativeDecoder(target, draft if use_draft else None, n_draft=4, max_len=256)
    got = spec.generate(prompt, max_new=16)
    assert got == want
    if use_draft:
        assert spec.n_drafted > 0
