"""Training harness: loss must drop when overfitting a repeated pattern
(pattern: reference tests/test-opt.cpp + examples/training)."""

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
