"""gemma3n serving: the AltUp forward with shared-KV tail layers must
serve correctly through the continuous-batching engine (logit parity
lives in test_arch_parity)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from zllm.gguf.constants import GGMLType


@pytest.fixture(scope="module")
def g3n_gguf(tmp_path_factory):
    from conftest import subprocess_env

    from test_arch_parity import ARCH_CFGS
    from zllm.convert.hf import convert_hf_gemma3n

    tmp = tmp_path_factory.mktemp("g3n")
    out = tmp / "ref.npz"
    script = os.path.join(os.path.dirname(__file__), "hf_oracle.py")
    r = subprocess.run(
        [sys.executable, script, str(out), json.dumps(ARCH_CFGS["gemma3n"]), "gemma3n"],
        timeout=600, capture_output=True, env=subprocess_env(),
    )
    if r.returncode != 0:
        pytest.skip(f"HF oracle unavailable: {r.stderr.decode()[-300:]}")
    data = np.load(str(out))
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    path = str(tmp / "g3n.gguf")
    convert_hf_gemma3n(sd, ARCH_CFGS["gemma3n"], path, gtype=GGMLType.F32)
    return path


def test_gemma3n_incremental_decode(g3n_gguf):
    """T=1 stepping through the shared-KV cache must match the full
    forward (validates that shared layers read live source-layer rows)."""
    import jax.numpy as jnp

    from zllm.models.llama import forward
    from zllm.models.loader import Model
    from zllm.runtime.kvcache import KVCache

    m = Model.load(g3n_gguf, quantized=False, dtype=jnp.float32)
    cfg = m.cfg
    assert cfg.altup is not None and cfg.altup.n_kv_shared == 4
    rng = np.random.default_rng(4)
    seq = rng.integers(1, 150, size=7).tolist()

    full, _ = forward(m.params, cfg, jnp.asarray([seq], jnp.int32),
                      jnp.arange(len(seq), dtype=jnp.int32)[None], None,
                      logits_for="last")

    kv = KVCache.create(cfg.n_layers, 1, 32, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    for i, tok in enumerate(seq):
        step, kv = forward(m.params, cfg, jnp.asarray([[tok]], jnp.int32),
                           jnp.asarray([[i]], jnp.int32), kv, logits_for="last")
    np.testing.assert_allclose(
        np.asarray(step)[0, -1], np.asarray(full)[0, -1], rtol=3e-4, atol=3e-4)


def test_gemma3n_engine_serving(g3n_gguf):
    """Concurrent engine slots == lone greedy decode."""
    import time

    import jax
    import jax.numpy as jnp

    from zllm.models.llama import forward
    from zllm.models.loader import Model
    from zllm.server.engine import Engine, Request

    m = Model.load(g3n_gguf, quantized=False, dtype=jnp.float32)

    def oracle(prompt, n_new):
        fwd = jax.jit(lambda p, t, q, c: forward(p, m.cfg, t, q, c, logits_for="last"))
        from zllm.runtime.kvcache import KVCache

        kv = KVCache.create(m.cfg.n_layers, 1, 64, m.cfg.n_kv_heads, m.cfg.head_dim, jnp.float32)
        logits, kv = fwd(m.params, jnp.asarray([prompt], jnp.int32),
                         jnp.arange(len(prompt), dtype=jnp.int32)[None], kv)
        out = [int(np.asarray(logits)[0, -1].argmax())]
        for i in range(n_new - 1):
            logits, kv = fwd(m.params, jnp.asarray([[out[-1]]], jnp.int32),
                             jnp.asarray([[len(prompt) + i]], jnp.int32), kv)
            out.append(int(np.asarray(logits)[0, -1].argmax()))
        return out

    prompts = [
        list(np.random.default_rng(0).integers(1, 150, size=13)),
        list(np.random.default_rng(1).integers(1, 150, size=4)),
    ]
    n_new = 5
    eng = Engine(m, n_slots=2, max_len=64, prefill_chunk=8, kv_dtype=jnp.float32)
    assert not eng.paged and eng.context_shift is False
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
        assert list(r.out_tokens) == oracle(p, n_new), r.out_tokens
