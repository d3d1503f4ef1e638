"""Training harness: loss must drop when overfitting a repeated pattern
(pattern: reference tests/test-opt.cpp + examples/training)."""

import os

import numpy as np
import pytest


def test_finetune_loss_decreases(tmp_path):
    import jax.numpy as jnp

    from zllm.gguf.constants import GGMLType
    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf
    from zllm.training import Trainer

    path = str(tmp_path / "t.gguf")
    make_llama_gguf(path, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=128, vocab_size=64, gtype=GGMLType.F32)
    m = Model.load(path, quantized=False, dtype=jnp.float32)

    stream = ([7, 3, 11, 5] * 200)[:513]
    tr = Trainer(m, lr=5e-3)
    losses = tr.fit(stream, seq_len=32, batch=2, epochs=6)
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])


def test_quantized_leaves_frozen(tmp_path):
    import jax.numpy as jnp
    import numpy as np

    from zllm.gguf.constants import GGMLType
    from zllm.models.loader import Model
    from zllm.quant.repack import QTensor
    from zllm.testing import make_llama_gguf
    from zllm.training import Trainer

    path = str(tmp_path / "q.gguf")
    make_llama_gguf(path, n_layers=1, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=128, vocab_size=64, gtype=GGMLType.Q8_0)
    m = Model.load(path, quantized=True, dtype=jnp.float32)
    l0 = m.params["layers"][0]
    gate_key = "ffn_gateup" if "ffn_gateup" in l0 else "ffn_gate"
    before = np.asarray(l0[gate_key].planes["qs"]).copy()

    tr = Trainer(m, lr=1e-2)
    toks = np.random.default_rng(0).integers(0, 64, (2, 16)).astype(np.int32)
    tr.train_step(toks, toks)
    after = np.asarray(m.params["layers"][0][gate_key].planes["qs"])
    np.testing.assert_array_equal(before, after)  # quantized weights frozen


def test_save_params_roundtrip_identity(tmp_path):
    """save_params_gguf with untouched params reproduces identical logits
    (model-saver leg of the finetune loop)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zllm.models.llama import forward
    from zllm.models.loader import Model, save_params_gguf
    from zllm.testing import make_llama_gguf

    src = str(tmp_path / "src.gguf")
    from zllm.gguf.constants import GGMLType

    make_llama_gguf(src, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=96, vocab_size=128, gtype=GGMLType.F32)
    m = Model.load(src, quantized=False, dtype=jnp.float32, fuse=False, npack=False)
    out = str(tmp_path / "out.gguf")
    save_params_gguf(src, m.params, out)
    m2 = Model.load(out, quantized=False, dtype=jnp.float32)

    toks = jnp.asarray(np.random.default_rng(0).integers(0, 128, (1, 8)).astype(np.int32))
    pos = jnp.broadcast_to(jnp.arange(8), (1, 8))
    a = forward(m.params, m.cfg, toks, pos, None)[0]
    # reload the source fused (default) as the reference
    mref = Model.load(src, quantized=False, dtype=jnp.float32)
    b = forward(m2.params, m2.cfg, toks, pos, None)[0]
    r = forward(mref.params, mref.cfg, toks, pos, None)[0]
    np.testing.assert_allclose(np.asarray(b), np.asarray(r), rtol=1e-6, atol=1e-6)


def test_finetune_tool_end_to_end(tmp_path):
    """Full-weight finetune CLI: loss decreases and the saved GGUF scores
    the training stream better than the original (ggml-opt parity run)."""
    import subprocess
    import sys as _sys

    import jax.numpy as jnp
    import numpy as np

    from conftest import subprocess_env
    from zllm.gguf.constants import GGMLType
    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf
    from zllm.training import cross_entropy

    src = str(tmp_path / "m.gguf")
    make_llama_gguf(src, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=96, vocab_size=128, gtype=GGMLType.F32)
    rng = np.random.default_rng(0)
    ids = (list(rng.integers(0, 128, 64)) * 8)  # repetitive -> learnable
    tok_file = str(tmp_path / "ids.txt")
    with open(tok_file, "w") as fh:
        fh.write(" ".join(map(str, ids)))
    out = str(tmp_path / "tuned.gguf")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [_sys.executable, os.path.join(repo, "tools", "finetune.py"), src,
         "--tokens", tok_file, "--out", out, "--lr", "5e-3", "--epochs", "2",
         "--seq-len", "32", "--batch", "2"],
        capture_output=True, text=True, timeout=600, env=subprocess_env())
    assert r.returncode == 0, r.stderr[-800:]
    assert os.path.exists(out)

    toks = np.asarray(ids[:33], np.int32)
    x, y = toks[None, :-1], toks[None, 1:]
    m0 = Model.load(src, quantized=False, dtype=jnp.float32)
    m1 = Model.load(out, quantized=False, dtype=jnp.float32)
    l0 = float(cross_entropy(m0.params, m0.cfg, jnp.asarray(x), jnp.asarray(y)))
    l1 = float(cross_entropy(m1.params, m1.cfg, jnp.asarray(x), jnp.asarray(y)))
    assert l1 < l0, (l0, l1)
