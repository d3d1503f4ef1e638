"""Concurrent prefill: chunks from ALL PROMPT slots pack into one step
(reference packs every PROCESSING_PROMPT slot's chunk into one batch,
tools/server/server-context.cpp:2114-2514) — a burst of N arrivals must
not multiply TTFT/prefill steps by N."""

import numpy as np
import pytest


def _make(tmp_path_factory, **kw):
    import jax.numpy as jnp

    from zllm.gguf.constants import GGMLType
    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf

    path = str(tmp_path_factory.mktemp("m") / "cp.gguf")
    make_llama_gguf(path, gtype=GGMLType.Q4_K, **kw)
    return Model.load(path, quantized=True, dtype=jnp.float32)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return _make(tmp_path_factory, n_layers=2, n_embd=256, n_heads=4,
                 n_kv_heads=2, n_ff=512, vocab_size=512)


def _serve(model, prompts, max_new=4, prefill_chunk=16, n_slots=4, **kw):
    from zllm.server.engine import Engine, Request

    eng = Engine(model, n_slots=n_slots, max_len=256, prefill_chunk=prefill_chunk,
                 prefix_reuse=False, **kw)
    eng.start()
    try:
        reqs = [eng.submit(Request(prompt_tokens=p, max_new=max_new, temp=0.0))
                for p in prompts]
        for r in reqs:
            while not r.done:
                if r.stream_q.get(timeout=120) is None:
                    break
            assert not r.error, r.error
        return [list(r.out_tokens) for r in reqs], dict(eng.metrics)
    finally:
        eng.stop()


def test_burst_prefills_concurrently(model):
    """4 simultaneous 32-token prompts with chunk=16 must prefill in ~2
    steps (the single-prompt count), not ~8 (serial)."""
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, model.cfg.vocab_size, 32).tolist() for _ in range(4)]

    _, m1 = _serve(model, prompts[:1])
    single_steps = m1["prefill_steps_total"]
    assert single_steps == 2, m1

    outs, m4 = _serve(model, prompts)
    # slack of +1 for a request admitted one step late by the submit race
    assert m4["prefill_steps_total"] <= single_steps + 1, m4
    assert all(len(o) == 4 for o in outs)


def test_burst_output_matches_serial(model):
    """Packed prefill must not change any request's greedy output."""
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, model.cfg.vocab_size, 20 + 7 * i).tolist()
               for i in range(3)]
    want = [_serve(model, [p], max_new=6)[0][0] for p in prompts]
    got, _ = _serve(model, prompts, max_new=6)
    assert got == want


def test_burst_mixed_with_decode(model):
    """Prompt slots packing must not perturb a generating slot riding in
    column 0 of the same step."""
    rng = np.random.default_rng(2)
    gen_p = rng.integers(0, model.cfg.vocab_size, 8).tolist()
    burst = [rng.integers(0, model.cfg.vocab_size, 32).tolist() for _ in range(2)]

    from zllm.server.engine import Engine, Request

    want = _serve(model, [gen_p], max_new=12)[0][0]

    eng = Engine(model, n_slots=4, max_len=256, prefill_chunk=16, prefix_reuse=False)
    eng.start()
    try:
        r0 = eng.submit(Request(prompt_tokens=gen_p, max_new=12, temp=0.0))
        # let r0 reach GENERATING, then burst two prompts
        while not r0.out_tokens:
            r0.stream_q.get(timeout=120)
        rs = [eng.submit(Request(prompt_tokens=p, max_new=4, temp=0.0)) for p in burst]
        for r in [r0, *rs]:
            while not r.done:
                if r.stream_q.get(timeout=120) is None:
                    break
            assert not r.error, r.error
    finally:
        eng.stop()
    assert list(r0.out_tokens) == want
