"""Lookahead decoding inside the serving engine (reference:
examples/lookahead/lookahead.cpp): greedy output must be token-identical
with and without --lookahead, repetitive contexts must accept verified
grams, non-greedy slots must ride along unspeculated, and accepted-but-
uningested tokens must flush correctly when prompt traffic interleaves."""

import pytest


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    import jax.numpy as jnp

    from zllm.gguf.constants import GGMLType
    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf

    path = str(tmp_path_factory.mktemp("m") / "la.gguf")
    make_llama_gguf(path, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=128, vocab_size=256, gtype=GGMLType.Q8_0)
    return Model.load(path, quantized=True, dtype=jnp.float32)


def _run(model, lookahead, prompt, max_new=48, **kw):
    from zllm.server.engine import Engine, Request

    eng = Engine(model, n_slots=2, max_len=256, prefill_chunk=64,
                 lookahead=lookahead, **kw)
    eng.start()
    try:
        req = Request(prompt_tokens=prompt, max_new=max_new, temp=0.0)
        eng.submit(req)
        while not req.done:
            tok = req.stream_q.get(timeout=120)
            if tok is None:
                break
        assert not req.error, req.error
        return list(req.out_tokens), dict(eng.metrics)
    finally:
        eng.stop()


def test_lookahead_matches_plain_greedy(model):
    prompt = ([5, 6, 7, 8] * 6)[:24]
    plain, _ = _run(model, False, prompt)
    la, metrics = _run(model, True, prompt)
    assert la == plain, (la, plain)
    assert metrics["lookahead_steps_total"] > 0
    assert metrics["lookahead_accepted_total"] >= 0


def test_lookahead_accepts_on_repetitive_model(model):
    """A prompt-seeded gram pool on a cyclic context accepts chains the
    moment the model repeats itself; at minimum the machinery must run
    and produce exact output over a long generation."""
    prompt = ([3, 9, 4, 1, 3, 9, 4, 1] * 4)[:32]
    plain, _ = _run(model, False, prompt, max_new=96)
    la, metrics = _run(model, True, prompt, max_new=96)
    assert la == plain
    # steps must not exceed tokens (acceptance can only shorten)
    assert metrics["lookahead_steps_total"] <= len(la) + 1


def test_lookahead_mixed_greedy_and_sampled(model):
    """A sampled request rides the lookahead batch without speculation;
    the concurrent greedy request stays exact."""
    from zllm.server.engine import Engine, Request

    prompt = ([5, 6, 7, 8] * 6)[:24]
    plain, _ = _run(model, False, prompt)

    eng = Engine(model, n_slots=2, max_len=256, prefill_chunk=64, lookahead=True)
    eng.start()
    try:
        g = Request(prompt_tokens=prompt, max_new=48, temp=0.0)
        s = Request(prompt_tokens=[9, 2, 9, 2], max_new=48, temp=0.9, seed=3)
        eng.submit(g)
        eng.submit(s)
        for req in (g, s):
            while not req.done:
                if req.stream_q.get(timeout=120) is None:
                    break
        assert not g.error and not s.error
        assert list(g.out_tokens) == plain
        assert len(s.out_tokens) == 48
    finally:
        eng.stop()


def test_lookahead_flush_on_interleaved_prompt(model):
    """A second request arriving mid-generation forces the pending-extras
    flush path before the mixed prefill step; both outputs stay exact."""
    import time

    from zllm.server.engine import Engine, Request

    p1 = ([5, 6, 7, 8] * 6)[:24]
    p2 = ([4, 4, 2, 2] * 5)[:20]
    ref1, _ = _run(model, False, p1, max_new=64)
    ref2, _ = _run(model, False, p2, max_new=32)

    eng = Engine(model, n_slots=2, max_len=256, prefill_chunk=64, lookahead=True)
    eng.start()
    try:
        r1 = Request(prompt_tokens=p1, max_new=64, temp=0.0)
        eng.submit(r1)
        # let r1 get into lookahead generation before r2's prompt arrives
        for _ in range(8):
            if r1.stream_q.get(timeout=120) is None:
                break
        time.sleep(0.05)
        r2 = Request(prompt_tokens=p2, max_new=32, temp=0.0)
        eng.submit(r2)
        for req in (r1, r2):
            while not req.done:
                if req.stream_q.get(timeout=120) is None:
                    break
        assert not r1.error and not r2.error
        assert list(r1.out_tokens) == ref1
        assert list(r2.out_tokens) == ref2
    finally:
        eng.stop()


def test_lookahead_rejects_bad_combos(model):
    from zllm.server.engine import Engine

    with pytest.raises(ValueError):
        Engine(model, n_slots=2, max_len=256, lookahead=True, speculative=True)
    with pytest.raises(ValueError):
        Engine(model, n_slots=2, max_len=256, lookahead=True, kv_layout="paged")
    with pytest.raises(ValueError):
        Engine(model, n_slots=2, max_len=256, lookahead=True, kv_dtype="q8")
