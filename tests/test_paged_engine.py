"""Continuous-batching engine over the paged KV cache.

Same greedy-output contract as the contiguous engine, plus cross-slot
prefix-page sharing (the paged form of the reference server's prompt
cache, tools/server/server-context.cpp:105-121)."""

import time

import numpy as np
import pytest

from zllm.gguf.constants import GGMLType


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    import jax.numpy as jnp

    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf

    p = str(tmp_path_factory.mktemp("m") / "m.gguf")
    make_llama_gguf(p, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=128, vocab_size=128, gtype=GGMLType.F32)
    return Model.load(p, quantized=False, dtype=jnp.float32)


def _run(model, prompts, n_new, **kw):
    from zllm.server.engine import Engine, Request

    eng = Engine(model, n_slots=2, max_len=256, prefill_chunk=16, **kw)
    eng.start()
    try:
        reqs = [eng.submit(Request(prompt_tokens=p, max_new=n_new, temp=0.0)) for p in prompts]
        deadline = time.time() + 120
        while not all(r.done for r in reqs):
            assert time.time() < deadline, "engine timed out"
            time.sleep(0.02)
        assert all(r.error == "" for r in reqs), [r.error for r in reqs]
        return reqs
    finally:
        eng.stop()


def test_paged_engine_matches_contiguous(model):
    r = np.random.default_rng(0)
    prompts = [
        list(r.integers(1, 100, size=37)),
        list(r.integers(1, 100, size=5)),
        list(r.integers(1, 100, size=21)),
    ]
    want = [q.out_tokens for q in _run(model, prompts, 8)]
    got = [q.out_tokens for q in _run(model, prompts, 8, kv_layout="paged")]
    assert got == want


def test_paged_prefix_sharing(model):
    """A re-sent long prefix skips prefill via shared pages even though
    the original request ran in a different slot."""
    from zllm.server.engine import Engine, Request

    r = np.random.default_rng(1)
    prefix = list(r.integers(1, 100, size=160))  # >= 1 full page (128)
    eng = Engine(model, n_slots=2, max_len=256, prefill_chunk=16, kv_layout="paged")
    eng.start()
    try:
        q1 = eng.submit(Request(prompt_tokens=prefix + [7], max_new=4, temp=0.0))
        deadline = time.time() + 120
        while not q1.done:
            assert time.time() < deadline
            time.sleep(0.02)
        # second request with the same prefix: lands in the OTHER slot,
        # shares the full prefix pages
        q2 = eng.submit(Request(prompt_tokens=prefix + [9], max_new=4, temp=0.0))
        while not q2.done:
            assert time.time() < deadline
            time.sleep(0.02)
        assert q2.n_prompt_reused >= 128, q2.n_prompt_reused
        # the shared-prefix result must equal a cold run of the same prompt
        eng2 = Engine(model, n_slots=2, max_len=256, prefill_chunk=16,
                      kv_layout="paged", prefix_reuse=False)
        eng2.start()
        try:
            q3 = eng2.submit(Request(prompt_tokens=prefix + [9], max_new=4, temp=0.0))
            while not q3.done:
                assert time.time() < deadline
                time.sleep(0.02)
            assert q2.out_tokens == q3.out_tokens
        finally:
            eng2.stop()
    finally:
        eng.stop()


def test_paged_slot_save_restore(model, tmp_path):
    """/slots save-restore works through the page tables."""
    from zllm.server.engine import Engine, Request

    r = np.random.default_rng(2)
    prompt = list(r.integers(1, 100, size=40))
    eng = Engine(model, n_slots=2, max_len=256, prefill_chunk=16, kv_layout="paged")
    eng.start()
    try:
        q = eng.submit(Request(prompt_tokens=prompt, max_new=4, temp=0.0))
        deadline = time.time() + 120
        while not q.done:
            assert time.time() < deadline
            time.sleep(0.02)
        info = eng.save_slot(0, str(tmp_path / "s.bin"))
        assert info["n_past"] > 0
        eng.erase_slot(0)
        out = eng.restore_slot(0, str(tmp_path / "s.bin"), tokens=prompt + q.out_tokens)
        assert out["n_past"] == info["n_past"]
    finally:
        eng.stop()


def test_paged_context_shift_matches_contiguous(model):
    """A paged slot overrunning max_len context-shifts by gather -> slide +
    K re-rotation -> scatter through the page table, producing the same
    greedy continuation as the contiguous engine's shift (reference: server
    context-shift on the cell-indexed cache, server-context.cpp:1981-2010)."""
    from zllm.server.engine import Engine, Request

    r = np.random.default_rng(5)
    prompt = list(r.integers(1, 100, size=90))

    def run(layout):
        eng = Engine(model, n_slots=2, max_len=128, prefill_chunk=16,
                     kv_layout=layout, prefix_reuse=False)
        eng.start()
        try:
            req = eng.submit(Request(prompt_tokens=prompt, max_new=80, temp=0.0))
            deadline = time.time() + 120
            while not req.done:
                assert time.time() < deadline, "engine timed out"
                time.sleep(0.02)
            assert req.error == "", req.error
            return list(req.out_tokens), eng.metrics["context_shifts_total"]
        finally:
            eng.stop()

    want, shifts_c = run("contiguous")
    got, shifts_p = run("paged")
    assert shifts_p >= 1, "paged run never shifted"
    assert shifts_p == shifts_c
    assert got == want


def test_paged_shift_refuses_shared_pages(model):
    """A slot whose prefix pages are shared must finish by length instead
    of corrupting the sharing slot's cache."""
    from zllm.runtime.paged import PageAllocator

    alloc = PageAllocator(n_slots=2, max_len=256, page_size=128)
    alloc.assign_slot(0, None, 0)
    alloc.assign_slot(1, 0, 1)  # slot 1 shares slot 0's first page
    assert not alloc.exclusively_owned(0)
    assert not alloc.exclusively_owned(1)
    alloc.release_slot(1)
    alloc.assign_slot(1, None, 0)
    assert alloc.exclusively_owned(0)
    assert alloc.exclusively_owned(1)


def test_paged_cow_unshare(model):
    """Copy-on-write unshare: the slot gets private pages holding the same
    contents; the source slot's mapping and refcounts are restored."""
    import jax.numpy as jnp

    from zllm.runtime.paged import PageAllocator, PagedKVCache

    ps = 128
    alloc = PageAllocator(n_slots=2, max_len=256, page_size=ps)
    alloc.assign_slot(0, None, 0)
    alloc.assign_slot(1, 0, 2)  # slot 1 shares BOTH of slot 0's pages
    kv = PagedKVCache.create(1, 2, 256, 2, 64, jnp.float32, page_size=ps,
                             n_pages=alloc.n_pages).with_table(alloc.table)
    r = np.random.default_rng(0)
    kv = PagedKVCache(
        k=(jnp.asarray(r.standard_normal(kv.k[0].shape), jnp.float32),),
        v=(jnp.asarray(r.standard_normal(kv.v[0].shape), jnp.float32),),
        table=kv.table, page_size=ps, horizon=256,
    )
    before = np.asarray(kv.k[0]).copy()
    shared = [int(alloc.table[1, j]) for j in range(2)]

    copies = alloc.unshare_slot(1)
    assert len(copies) == 2
    kv = kv.copy_pages(copies).with_table(alloc.table)
    now = [int(alloc.table[1, j]) for j in range(2)]
    assert set(now).isdisjoint(shared)
    assert alloc.exclusively_owned(0) and alloc.exclusively_owned(1)
    after = np.asarray(kv.k[0])
    for (src, dst) in copies:
        np.testing.assert_array_equal(
            after[:, dst * ps:(dst + 1) * ps], before[:, src * ps:(src + 1) * ps])


def test_paged_shift_cow_survives_sharing(model):
    """A generating slot whose prefix pages are shared must context-shift
    via copy-on-write unsharing and KEEP generating (round 3 killed it with
    finish_reason=length), without corrupting the sharing slot."""
    from zllm.server.engine import Engine, Request

    r = np.random.default_rng(7)
    # long shared prefix (>= 1 full page at ps=128) + distinct tails
    shared = list(r.integers(1, 100, size=70))
    pa = shared + list(r.integers(1, 100, size=8))
    pb = shared + list(r.integers(100, 200, size=8))

    def run(layout):
        eng = Engine(model, n_slots=2, max_len=128, prefill_chunk=16,
                     kv_layout=layout, prefix_reuse=(layout == "paged"))
        eng.start()
        try:
            ra = eng.submit(Request(prompt_tokens=pa, max_new=70, temp=0.0))
            deadline = time.time() + 120
            while not ra.done:
                assert time.time() < deadline, "engine timed out"
                time.sleep(0.02)
            assert ra.error == "", ra.error
            # second request shares the prefix pages of slot 0's prompt,
            # then overruns the window -> must CoW-unshare and shift
            rb = eng.submit(Request(prompt_tokens=pb, max_new=70, temp=0.0))
            while not rb.done:
                assert time.time() < deadline, "engine timed out"
                time.sleep(0.02)
            assert rb.error == "", rb.error
            cow = eng.metrics["pages_cow_unshared_total"]
            return list(ra.out_tokens), list(rb.out_tokens), cow
        finally:
            eng.stop()

    want_a, want_b, _ = run("contiguous")
    got_a, got_b, cow = run("paged")
    assert len(got_b) == 70, f"shared-prefix slot died early ({len(got_b)} tokens)"
    assert got_a == want_a
    assert got_b == want_b
