"""Pipeline-parallel serving: the continuous-batching engine running the
GPipe layer-split step over a "pp" mesh must produce the same greedy
tokens as the single-device engine (reference capability: serving with
LLAMA_SPLIT_MODE_LAYER — the reference's DEFAULT multi-device mode,
include/llama.h:193-196 + ggml-backend.cpp:712-718 microbatch overlap).
Runs on the 8-virtual-CPU-device mesh from conftest."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    import jax.numpy as jnp

    from zllm.gguf.constants import GGMLType
    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf

    path = str(tmp_path_factory.mktemp("m") / "pp_engine.gguf")
    make_llama_gguf(path, n_layers=4, n_embd=128, n_heads=4, n_kv_heads=2,
                    n_ff=256, vocab_size=512, gtype=GGMLType.Q8_0)
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


def test_pp_engine_matches_single(model):
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, model.cfg.vocab_size, 21).tolist()
    want = _run(model, [prompt])
    got = _run(model, [prompt], pp=2)
    assert got == want


def test_pp_engine_concurrent(model):
    """Two concurrent requests ride different microbatches of the
    pipeline; both must match single-device greedy output."""
    rng = np.random.default_rng(1)
    p1 = rng.integers(0, model.cfg.vocab_size, 17).tolist()
    p2 = rng.integers(0, model.cfg.vocab_size, 5).tolist()
    want = _run(model, [p1, p2])
    got = _run(model, [p1, p2], pp=2)
    assert got == want


def test_pp4_engine_matches_single(model):
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, model.cfg.vocab_size, 9).tolist()
    want = _run(model, [prompt], n_slots=4)
    got = _run(model, [prompt], n_slots=4, pp=4)
    assert got == want


def test_pp_engine_stages_sharded(model):
    """PP weights must actually live stage-sharded on the mesh."""
    import jax

    from zllm.server.engine import Engine

    eng = Engine(model, n_slots=2, max_len=128, pp=2)
    shared, stages = eng._p
    leaves = jax.tree_util.tree_leaves(stages)
    sharded = [l for l in leaves if hasattr(l, "sharding")
               and not l.sharding.is_fully_replicated]
    assert sharded, "no stage leaf is sharded over the pp axis"


def test_pp_engine_rejections(model):
    """Unsupported combinations must be rejected explicitly, not be
    silently wrong."""
    from zllm.server.engine import Engine

    with pytest.raises(ValueError, match="paged|contiguous"):
        Engine(model, n_slots=2, max_len=128, pp=2, kv_layout="paged")
    with pytest.raises(ValueError, match="q8"):
        Engine(model, n_slots=2, max_len=128, pp=2, kv_dtype="q8")
    with pytest.raises(ValueError, match="speculative"):
        Engine(model, n_slots=2, max_len=128, pp=2, speculative=True)
    with pytest.raises(ValueError, match="tp|dp"):
        Engine(model, n_slots=2, max_len=128, pp=2, tp=2)
    with pytest.raises(ValueError, match="divide"):
        Engine(model, n_slots=3, max_len=128, pp=2)
