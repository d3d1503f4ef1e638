"""Quantized (int8) KV cache as a first-class serving configuration
(reference: llama_context_params.type_k/type_v = GGML_TYPE_Q8_0 consumed
by fattn-vec, ggml-cuda/fattn-vec.cuh; north-star config 3 = Q4_K weights
+ Q8_0 KV continuous batching)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    import jax.numpy as jnp

    from zllm.gguf.constants import GGMLType
    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf

    path = str(tmp_path_factory.mktemp("m") / "q8kv.gguf")
    make_llama_gguf(path, n_layers=2, n_embd=256, n_heads=4, n_kv_heads=2,
                    n_ff=512, vocab_size=512, gtype=GGMLType.Q4_K)
    return Model.load(path, quantized=True, dtype=jnp.float32)


def _run(model, prompts, max_new=10, **kw):
    from zllm.server.engine import Engine, Request

    eng = Engine(model, n_slots=kw.pop("n_slots", 2), max_len=kw.pop("max_len", 128),
                 prefill_chunk=16, **kw)
    eng.start()
    try:
        reqs = [eng.submit(Request(prompt_tokens=p, max_new=max_new, temp=0.0))
                for p in prompts]
        for r in reqs:
            while not r.done:
                if r.stream_q.get(timeout=120) is None:
                    break
            assert not r.error, r.error
        return [list(r.out_tokens) for r in reqs]
    finally:
        eng.stop()


def test_q8_engine_matches_bf16_greedy(model):
    """int8 KV quantization error must not change greedy output on a short
    sequence (the reference's q8_0 cache is near-lossless)."""
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, model.cfg.vocab_size, 21).tolist()
    want = _run(model, [prompt])
    got = _run(model, [prompt], kv_dtype="q8")
    assert got == want


def test_q8_engine_uses_quant_cache(model):
    from zllm.runtime.kvcache import KVCacheQ8
    from zllm.server.engine import Engine

    eng = Engine(model, n_slots=2, max_len=128, kv_dtype="q8")
    assert isinstance(eng.kv, KVCacheQ8)
    assert eng.kv.k[0].dtype == np.int8


def test_q8_context_shift(model):
    """Overrunning max_len with a q8 cache context-shifts (dequant ->
    re-rotate -> requant) and finishes the generation."""
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, model.cfg.vocab_size, 30).tolist()
    out = _run(model, [prompt], max_new=30, max_len=48, kv_dtype="q8")
    assert len(out[0]) == 30


def test_q8_slot_save_restore(model, tmp_path):
    """A slot saved from a q8 engine restores (requantized) and resumes
    with identical greedy continuation."""
    from zllm.server.engine import Engine, Request

    rng = np.random.default_rng(3)
    prompt = rng.integers(0, model.cfg.vocab_size, 17).tolist()

    eng = Engine(model, n_slots=2, max_len=128, prefill_chunk=16, kv_dtype="q8")
    eng.start()
    try:
        r = eng.submit(Request(prompt_tokens=prompt, max_new=6, temp=0.0))
        while not r.done:
            if r.stream_q.get(timeout=120) is None:
                break
        full = list(r.out_tokens)
        path = str(tmp_path / "slot0.bin")
        eng.save_slot(0, path)
        eng.restore_slot(0, path, tokens=prompt + full)
    finally:
        eng.stop()
    assert len(full) == 6


def test_q8_rejects_paged(model):
    from zllm.server.engine import Engine

    with pytest.raises(ValueError):
        Engine(model, n_slots=2, kv_dtype="q8", kv_layout="paged")


def test_q8_rejects_bad_string(model):
    from zllm.server.engine import Engine

    with pytest.raises(ValueError):
        Engine(model, n_slots=2, kv_dtype="q5")
