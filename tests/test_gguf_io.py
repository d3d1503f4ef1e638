"""GGUF container tests: writer->reader round-trip, cross-check against
gguf-py reader, and parsing the reference's committed vocab-only models
(pattern: reference tests/test-gguf.cpp)."""

import os

import numpy as np
import pytest

from zllm.gguf import GGMLType, GGUFWriter, read_gguf
from zllm.quant import blocks as qb

REF_MODELS = "/root/reference/models"


def test_roundtrip(tmp_path):
    path = str(tmp_path / "t.gguf")
    w = GGUFWriter(path)
    w.add("general.architecture", "llama")
    w.add("general.name", "test model")
    w.add("llama.block_count", 2)
    w.add("llama.rope.freq_base", 10000.0)
    w.add("test.flag", True)
    w.add("test.neg", -7, vtype=None)
    w.add("test.arr_i", np.arange(5, dtype=np.int32))
    w.add("test.arr_f", np.linspace(0, 1, 4, dtype=np.float32))
    w.add("test.arr_s", ["a", "bb", "ccc"])

    x0 = np.arange(12, dtype=np.float32).reshape(3, 4)
    w.add_tensor("tiny.weight", x0)
    x1 = np.random.default_rng(0).standard_normal((8, 64)).astype(np.float32)
    raw1 = qb.quantize(x1, GGMLType.Q4_0)
    w.add_tensor("quant.weight", raw1, logical_shape=(8, 64), gtype=GGMLType.Q4_0)
    w.write()

    f = read_gguf(path)
    assert f.version == 3
    assert f.architecture == "llama"
    assert f.kv("llama.block_count") == 2
    assert f.kv("test.flag") is True
    assert f.kv("test.neg") == -7
    np.testing.assert_array_equal(f.kv("test.arr_i"), np.arange(5))
    assert list(f.kv("test.arr_s")) == ["a", "bb", "ccc"]

    assert f.tensors["tiny.weight"].shape == (3, 4)
    np.testing.assert_array_equal(f.tensor_f32("tiny.weight"), x0)

    meta = f.tensors["quant.weight"]
    assert meta.gtype == GGMLType.Q4_0
    assert meta.shape == (8, 64)
    np.testing.assert_array_equal(f.tensor_f32("quant.weight"), qb.dequantize(raw1, GGMLType.Q4_0))
    f.close()


def test_read_by_oracle(tmp_path, oracle_gguf):
    """Files we write must parse identically in the reference's gguf-py."""
    path = str(tmp_path / "o.gguf")
    w = GGUFWriter(path)
    w.add("general.architecture", "llama")
    w.add("llama.embedding_length", 64)
    x = np.random.default_rng(1).standard_normal((4, 64)).astype(np.float32)
    w.add_tensor("w", x)
    w.add_tensor("wq", qb.quantize(x, GGMLType.Q8_0), logical_shape=(4, 64), gtype=GGMLType.Q8_0)
    w.write()

    r = oracle_gguf.GGUFReader(path)
    kv = {k: v for k, v in r.fields.items()}
    assert "llama.embedding_length" in kv
    t = {t.name: t for t in r.tensors}
    assert t["w"].tensor_type == oracle_gguf.GGMLQuantizationType.F32
    np.testing.assert_array_equal(np.array(t["w"].data).reshape(4, 64), x)
    assert t["wq"].tensor_type == oracle_gguf.GGMLQuantizationType.Q8_0


@pytest.mark.skipif(not os.path.isdir(REF_MODELS), reason="reference models not available")
def test_read_reference_vocab_gguf():
    f = read_gguf(os.path.join(REF_MODELS, "ggml-vocab-llama-spm.gguf"))
    assert f.architecture == "llama"
    toks = f.kv("tokenizer.ggml.tokens")
    assert len(toks) == 32000
    assert toks[1] == "<s>"
    scores = f.kv("tokenizer.ggml.scores")
    assert len(scores) == 32000
    f.close()

    f2 = read_gguf(os.path.join(REF_MODELS, "ggml-vocab-gpt-2.gguf"))
    assert f2.kv("tokenizer.ggml.model") == "gpt2"
    assert len(f2.kv("tokenizer.ggml.merges")) > 1000
    f2.close()
