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


def test_weighted_encoders_reduce_weighted_error():
    """Every imatrix-steered encoder must beat (or match) the plain
    encoder on weighted MSE and round-trip through the decoder
    (reference: quantize_<type> quant_weights paths, ggml-quants.c)."""
    import numpy as np

    from zllm.gguf.constants import GGMLType
    from zllm.quant import blocks as qb

    r = np.random.default_rng(0)
    for gt in qb._WEIGHTED_ENCODERS:
        blk, _ = qb.GGML_BLOCK_SIZES[gt]
        x = (r.standard_normal((64, blk)) * (1 + 5 * r.random((64, blk)))).astype(np.float32)
        w = (0.05 + r.random((64, blk)) ** 2 * 10).astype(np.float32)

        plain = qb.dequantize(qb.quantize(x, gt), gt)
        steered = qb.dequantize(qb.quantize(x, gt, weights=w), gt)
        e_plain = float((w * (plain - x) ** 2).sum())
        e_steer = float((w * (steered - x) ** 2).sum())
        assert e_steer <= e_plain * 1.001, (gt.name, e_steer, e_plain)
        # and it's genuinely steering (different rounding) for skewed w
        assert e_steer < e_plain, gt.name
