"""Grammar applied INSIDE the batched sampler chain + batched mirostat-v2
(reference: src/llama-sampling.cpp chain-with-grammar ordering and
llama_sampler_init_mirostat_v2; common/sampling.cpp sample-then-resample)."""

from types import SimpleNamespace

import numpy as np
import pytest


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    import jax.numpy as jnp

    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf

    path = str(tmp_path_factory.mktemp("m") / "gch.gguf")
    make_llama_gguf(path, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=128, vocab_size=512, with_tokenizer=True)
    return Model.load(path, dtype=jnp.float32)


def _gen(model, max_new=32, **req_kw):
    from zllm.grammar import parse_gbnf
    from zllm.grammar.gbnf import GrammarSampler
    from zllm.server.engine import Engine, Request

    eng = Engine(model, n_slots=2, max_len=128, prefill_chunk=16)
    eng.start()
    try:
        g = GrammarSampler(parse_gbnf('root ::= [a-z]+\n'), model.tokenizer)
        r = eng.submit(Request(prompt_tokens=[1, 100, 101], max_new=max_new,
                               grammar=g, **req_kw))
        while not r.done:
            if r.stream_q.get(timeout=120) is None:
                break
        assert not r.error, r.error
        return list(r.out_tokens)
    finally:
        eng.stop()


def _is_lower(model, tok):
    if tok == model.tokenizer.eos_id:
        return True
    piece = model.tokenizer.decode([tok], skip_special=False)
    return len(piece) == 1 and "a" <= piece <= "z"


def test_grammar_respected_stochastic(model):
    """Every emitted token satisfies the grammar even under full-chain
    stochastic sampling (resample path)."""
    out = _gen(model, temp=1.3, top_k=0, top_p=1.0, min_p=0.0, seed=3)
    assert out, "no tokens"
    assert all(_is_lower(model, t) for t in out), out


def test_typical_p_shapes_constrained_distribution(model):
    """typical_p must flow through to grammar-constrained requests (the old
    host-side fallback silently dropped every sampler but temperature)."""
    base = _gen(model, temp=1.0, seed=11, typical_p=1.0, min_p=0.0, top_k=0)
    typ = _gen(model, temp=1.0, seed=11, typical_p=0.2, min_p=0.0, top_k=0)
    assert all(_is_lower(model, t) for t in base + typ)
    assert base != typ, "typical_p had no effect on a constrained request"


def test_penalties_shape_constrained_distribution(model):
    """Repetition penalties likewise apply to constrained requests."""
    base = _gen(model, temp=1.0, seed=5, min_p=0.0, top_k=0)
    pen = _gen(model, temp=1.0, seed=5, min_p=0.0, top_k=0,
               repeat_penalty=1.8, presence_penalty=1.0)
    assert base != pen, "penalties had no effect on a constrained request"


def test_greedy_grammar_unchanged_by_keys(model):
    """Greedy (temp=0) constrained decode is deterministic across seeds."""
    a = _gen(model, temp=0.0, seed=1)
    b = _gen(model, temp=0.0, seed=999)
    assert a == b


def _mk_params(n, reqs):
    from zllm.sampling.batched import SlotParams

    sp = SlotParams(n)
    for i, r in enumerate(reqs):
        sp.set_slot(i, r)
    return sp


def _req(**kw):
    base = dict(temp=1.0, top_k=0, top_p=1.0, min_p=0.0, repeat_penalty=1.0)
    base.update(kw)
    return SimpleNamespace(**base)


def test_mirostat_batched_truncates_and_servos():
    """Mirostat-v2 slots mask high-surprise candidates and update mu; plain
    slots are untouched."""
    import jax
    import jax.numpy as jnp

    from zllm.sampling.batched import sample_batch

    n, v, w = 2, 64, 8
    sp = _mk_params(n, [_req(mirostat=2, mirostat_tau=2.0, mirostat_eta=0.3),
                        _req()])
    # one dominant token + a long flat tail of improbable ones
    logits = np.full((n, v), -4.0, np.float32)
    logits[:, 0] = 4.0
    keys = jnp.stack([jax.random.PRNGKey(i) for i in range(n)])
    recent = np.full((n, w), -1, np.int32)
    mu0 = np.array([4.0, 4.0], np.float32)  # 2 * tau
    toks, lg, _, mu1 = sample_batch(
        jnp.asarray(logits), keys, jnp.asarray(recent), jnp.zeros((v,), bool),
        jnp.asarray(mu0), *[jnp.asarray(a) for a in sp.arrays()],
    )
    lg = np.asarray(lg)
    mu1 = np.asarray(mu1)
    # slot 0: tail candidates carry surprise ~8.3 bits > mu=4 -> masked
    assert (lg[0, 1:] < -1e29).all()
    assert lg[0, 0] > -1e29
    # slot 1 (no mirostat): nothing masked
    assert (lg[1] > -1e29).all()
    # mu servos toward tau on the active slot only: sampled token is the
    # only survivor (surprise ~0), so mu decreases by eta*(0 - tau)... i.e.
    # mu1 = 4.0 - 0.3*(s - 2.0) with s ~ 0 -> ~4.6
    assert mu1[1] == mu0[1]
    assert abs(mu1[0] - (4.0 - 0.3 * (0.0 - 2.0))) < 0.05


def test_mirostat_disables_truncation_stack():
    """set_slot with mirostat>0 shadows top-k/p/etc. (reference mirostat
    chain is penalties -> temp -> mirostat)."""
    sp = _mk_params(1, [_req(mirostat=2, top_k=5, top_p=0.5, min_p=0.2,
                             typical_p=0.5, top_n_sigma=2.0, xtc_probability=0.5)])
    assert sp.top_k[0] == 0
    assert sp.top_p[0] == 1.0
    assert sp.min_p[0] == 0.0
    assert sp.typical_p[0] == 1.0
    assert sp.top_n_sigma[0] == 0.0
    assert sp.xtc_probability[0] == 0.0


def test_mirostat_engine_smoke(model):
    """End-to-end: a mirostat request completes and emits max_new tokens."""
    from zllm.server.engine import Engine, Request

    eng = Engine(model, n_slots=2, max_len=128, prefill_chunk=16)
    eng.start()
    try:
        r = eng.submit(Request(prompt_tokens=[1, 100, 101], max_new=12,
                               temp=1.0, mirostat=2, seed=4,
                               stop_tokens=frozenset()))
        while not r.done:
            if r.stream_q.get(timeout=120) is None:
                break
        assert not r.error, r.error
        assert len(r.out_tokens) == 12
    finally:
        eng.stop()
