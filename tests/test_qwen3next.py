"""qwen3next (gated DeltaNet hybrid): HF logit parity lives in
test_arch_parity; here the state-carry paths — incremental decode through
(KVCache, deltanet states) must match the full-sequence forward, and the
continuous-batching engine must reproduce lone greedy decodes (reference:
src/models/qwen3next.cpp + llama_memory_hybrid)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from zllm.gguf.constants import GGMLType

CFG = dict(
    vocab_size=151, hidden_size=64, intermediate_size=96,
    num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
    head_dim=16, linear_num_value_heads=4, linear_num_key_heads=2,
    linear_key_head_dim=16, linear_value_head_dim=16,
    linear_conv_kernel_dim=4, num_experts=4, num_experts_per_tok=2,
    moe_intermediate_size=48, shared_expert_intermediate_size=48,
    decoder_sparse_step=1, partial_rotary_factor=0.25, rope_theta=10000.0,
    max_position_embeddings=128, rms_norm_eps=1e-6, tie_word_embeddings=False,
)


@pytest.fixture(scope="module")
def q3n_gguf(tmp_path_factory):
    from conftest import subprocess_env

    from zllm.convert.hf import convert_hf_qwen3next

    tmp = tmp_path_factory.mktemp("q3n")
    out = tmp / "ref.npz"
    script = os.path.join(os.path.dirname(__file__), "hf_oracle.py")
    r = subprocess.run(
        [sys.executable, script, str(out), json.dumps(CFG), "qwen3next"],
        timeout=600, capture_output=True, env=subprocess_env(),
    )
    if r.returncode != 0:
        pytest.skip(f"HF oracle unavailable: {r.stderr.decode()[-300:]}")
    data = np.load(str(out))
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    path = str(tmp / "q3n.gguf")
    convert_hf_qwen3next(sd, CFG, path, gtype=GGMLType.F32)
    return path


def test_qwen3next_incremental_decode(q3n_gguf):
    """T=1 stepping through the deltanet recurrence + KV cache must match
    the full-sequence forward's last-token logits."""
    import jax.numpy as jnp

    from zllm.models.hybrid import hybrid_forward, make_hybrid_state
    from zllm.models.loader import Model
    from zllm.runtime.kvcache import KVCache

    m = Model.load(q3n_gguf, quantized=False, dtype=jnp.float32)
    cfg = m.cfg
    assert cfg.is_hybrid and cfg.attn_layers == (False, False, False, True)
    rng = np.random.default_rng(2)
    seq = rng.integers(1, 150, size=9).tolist()

    full, _, _ = hybrid_forward(
        m.params, cfg, jnp.asarray([seq], jnp.int32),
        jnp.arange(len(seq), dtype=jnp.int32)[None], None, None, logits_for="last")

    kv = KVCache.create(cfg.n_attn_layers, 1, 32, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    state = make_hybrid_state(cfg, 1)
    for i, tok in enumerate(seq):
        step, kv, state = hybrid_forward(
            m.params, cfg, jnp.asarray([[tok]], jnp.int32),
            jnp.asarray([[i]], jnp.int32), kv, state, logits_for="last")
    np.testing.assert_allclose(
        np.asarray(step)[0, -1], np.asarray(full)[0, -1], rtol=2e-4, atol=2e-4)


def test_qwen3next_engine_serving(q3n_gguf):
    """Concurrent slots through the hybrid engine == lone greedy decode."""
    import time

    import jax.numpy as jnp

    from test_jamba import _hybrid_oracle
    from zllm.models.loader import Model
    from zllm.server.engine import Engine, Request

    model = Model.load(q3n_gguf, quantized=False, dtype=jnp.float32)
    prompts = [
        list(np.random.default_rng(0).integers(1, 150, size=17)),
        list(np.random.default_rng(1).integers(1, 150, size=3)),
    ]
    n_new = 6
    eng = Engine(model, n_slots=2, max_len=128, prefill_chunk=8,
                 kv_dtype=jnp.float32)
    assert eng.hybrid and not eng.recurrent
    eng.start()
    try:
        reqs = [eng.submit(Request(prompt_tokens=p, max_new=n_new, temp=0.0))
                for p in prompts]
        deadline = time.time() + 180
        while not all(r.done for r in reqs):
            assert time.time() < deadline, "engine timed out"
            time.sleep(0.02)
        assert all(r.error == "" for r in reqs), [r.error for r in reqs]
    finally:
        eng.stop()
    for p, r in zip(prompts, reqs):
        want = _hybrid_oracle(model, p, n_new)
        assert list(r.out_tokens) == want, (r.out_tokens, want)


def test_qwen3next_engine_tp_mesh(q3n_gguf):
    """Hybrid stacks under a tp mesh (round-4 rejected them): the
    attention layers' KV shards heads over tp, the deltanet state
    replicates, and greedy serving matches the single-device engine."""
    import time

    import jax.numpy as jnp

    from zllm.models.loader import Model
    from zllm.server.engine import Engine, Request

    model = Model.load(q3n_gguf, quantized=False, dtype=jnp.float32)
    prompts = [
        list(np.random.default_rng(2).integers(1, 150, size=11)),
        list(np.random.default_rng(3).integers(1, 150, size=4)),
    ]

    def run(**kw):
        eng = Engine(model, n_slots=2, max_len=128, prefill_chunk=8,
                     kv_dtype=jnp.float32, **kw)
        assert eng.hybrid
        eng.start()
        try:
            reqs = [eng.submit(Request(prompt_tokens=p, max_new=6, temp=0.0))
                    for p in prompts]
            deadline = time.time() + 180
            while not all(r.done for r in reqs):
                assert time.time() < deadline, "engine timed out"
                time.sleep(0.02)
            assert all(r.error == "" for r in reqs), [r.error for r in reqs]
            return [list(r.out_tokens) for r in reqs]
        finally:
            eng.stop()

    assert run(tp=2) == run()
