"""imatrix collection + imatrix-weighted quantization end to end
(pattern: reference tools/imatrix + quantize --imatrix flow)."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_collect_and_use(tmp_path):
    import jax.numpy as jnp

    from imatrix import collect_imatrix, read_imatrix, write_imatrix

    from zllm.gguf.constants import GGMLType
    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf

    path = str(tmp_path / "m.gguf")
    make_llama_gguf(path, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=128, vocab_size=64, gtype=GGMLType.F32)
    m = Model.load(path, quantized=False, dtype=jnp.float32)

    ids = np.random.default_rng(0).integers(0, 64, 3 * 64).tolist()
    sums, counts = collect_imatrix(m, ids, n_ctx=64, batch=2, progress=False)
    # one entry per matmul family per layer
    assert "blk.0.attn_q.weight" in sums
    assert "blk.1.ffn_down.weight" in sums
    assert sums["blk.0.ffn_gate.weight"].shape == (64,)
    assert all(np.all(s >= 0) for s in sums.values())

    out = str(tmp_path / "im.gguf")
    write_imatrix(out, path, sums, counts)
    back = read_imatrix(out)
    assert set(back) == set(sums)
    np.testing.assert_allclose(back["blk.0.attn_q.weight"],
                               sums["blk.0.attn_q.weight"] / counts["blk.0.attn_q.weight"],
                               rtol=1e-6)
