"""Tool-level tests: quantize CLI round-trip and perplexity sanity
(pattern: reference tools/quantize + tools/perplexity smoke runs in ci/run.sh)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def f32_model(tmp_path_factory):
    from zllm.gguf.constants import GGMLType
    from zllm.testing import make_llama_gguf

    path = str(tmp_path_factory.mktemp("m") / "f32.gguf")
    make_llama_gguf(path, n_layers=2, n_embd=256, n_heads=4, n_kv_heads=2,
                    n_ff=512, vocab_size=512, gtype=GGMLType.F32)
    return path


def test_quantize_tool(f32_model, tmp_path):
    from conftest import subprocess_env

    out = str(tmp_path / "q4.gguf")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "quantize.py"), f32_model, out, "Q4_K_M"],
        capture_output=True, text=True, timeout=300, env=subprocess_env(),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.getsize(out) < os.path.getsize(f32_model) * 0.45

    from zllm.gguf import GGMLType, read_gguf

    f = read_gguf(out)
    assert f.tensors["blk.0.ffn_gate.weight"].gtype == GGMLType.Q4_K
    assert f.tensors["blk.0.attn_v.weight"].gtype == GGMLType.Q6_K  # M bump
    assert f.tensors["blk.0.attn_norm.weight"].gtype == GGMLType.F32
    # quantized model still loads and runs
    import jax
    import jax.numpy as jnp

    from zllm.models.llama import forward
    from zllm.models.loader import Model

    m = Model.load(out, quantized=True, dtype=jnp.float32)
    toks = jnp.asarray(np.arange(6, dtype=np.int32)[None])
    pos = jnp.asarray(np.arange(6, dtype=np.int32)[None])
    lg = jax.jit(lambda p, t, q: forward(p, m.cfg, t, q, None)[0])(m.params, toks, pos)
    assert np.isfinite(np.asarray(lg)).all()
    f.close()


def test_perplexity_fn(f32_model):
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from perplexity import perplexity

    from zllm.models.loader import Model

    m = Model.load(f32_model, quantized=False, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, m.cfg.vocab_size, 4 * 64).tolist()
    ppl, err, n = perplexity(m, ids, n_ctx=64, batch=2, progress=False)
    # random model on random tokens: ppl should be near vocab size
    assert 50 < ppl < 5000
    assert n == 4 * (64 // 2 - 1)
