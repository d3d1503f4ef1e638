"""From-disk HF -> GGUF conversion (reference: convert_hf_to_gguf.py).

Builds a real on-disk HF checkpoint (safetensors written by the
safetensors lib — independent of our reader — plus a hand-serialized
sentencepiece proto and tokenizer configs) and checks the converted GGUF
against the in-memory converter byte-for-byte, and that the tokenizer
KVs load into a working Tokenizer.
"""

import json
import struct

import numpy as np
import pytest

from zllm.gguf.constants import GGMLType

CFG = dict(
    architectures=["LlamaForCausalLM"],
    model_type="llama",
    hidden_size=64,
    intermediate_size=128,
    num_attention_heads=4,
    num_key_value_heads=2,
    num_hidden_layers=2,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    max_position_embeddings=2048,
    vocab_size=32,
)


def _state_dict():
    r = np.random.default_rng(7)
    c, ff, v = CFG["hidden_size"], CFG["intermediate_size"], CFG["vocab_size"]
    kvd = CFG["num_key_value_heads"] * (c // CFG["num_attention_heads"])
    sd = {"model.embed_tokens.weight": r.standard_normal((v, c)).astype(np.float32)}
    for i in range(CFG["num_hidden_layers"]):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = r.standard_normal(c).astype(np.float32)
        sd[p + "self_attn.q_proj.weight"] = r.standard_normal((c, c)).astype(np.float32)
        sd[p + "self_attn.k_proj.weight"] = r.standard_normal((kvd, c)).astype(np.float32)
        sd[p + "self_attn.v_proj.weight"] = r.standard_normal((kvd, c)).astype(np.float32)
        sd[p + "self_attn.o_proj.weight"] = r.standard_normal((c, c)).astype(np.float32)
        sd[p + "post_attention_layernorm.weight"] = r.standard_normal(c).astype(np.float32)
        sd[p + "mlp.gate_proj.weight"] = r.standard_normal((ff, c)).astype(np.float32)
        sd[p + "mlp.up_proj.weight"] = r.standard_normal((ff, c)).astype(np.float32)
        sd[p + "mlp.down_proj.weight"] = r.standard_normal((c, ff)).astype(np.float32)
    sd["model.norm.weight"] = r.standard_normal(c).astype(np.float32)
    sd["lm_head.weight"] = r.standard_normal((v, c)).astype(np.float32)
    return sd


def _pb_varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        out += bytes([b | (0x80 if v else 0)])
        if not v:
            return out


def _spm_piece(piece: str, score: float, ptype: int) -> bytes:
    body = b"\x0a" + _pb_varint(len(piece.encode())) + piece.encode()
    body += b"\x15" + struct.pack("<f", score)  # field 2, fixed32
    body += b"\x18" + _pb_varint(ptype)  # field 3, varint
    return b"\x0a" + _pb_varint(len(body)) + body  # ModelProto field 1


def _write_spm(path, tokens, scores, types):
    with open(path, "wb") as fh:
        for t, s, ty in zip(tokens, scores, types):
            fh.write(_spm_piece(t, s, ty))


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    from safetensors.numpy import save_file

    d = tmp_path_factory.mktemp("hf_llama")
    sd = _state_dict()
    # two shards + index to exercise the sharded path
    names = sorted(sd)
    half = len(names) // 2
    save_file({k: sd[k] for k in names[:half]}, str(d / "model-00001-of-00002.safetensors"))
    save_file({k: sd[k] for k in names[half:]}, str(d / "model-00002-of-00002.safetensors"))
    index = {
        "weight_map": {
            **{k: "model-00001-of-00002.safetensors" for k in names[:half]},
            **{k: "model-00002-of-00002.safetensors" for k in names[half:]},
        }
    }
    (d / "model.safetensors.index.json").write_text(json.dumps(index))
    (d / "config.json").write_text(json.dumps(CFG))

    # SPM vocab: specials + byte fallbacks + a merge chain for "▁hi"
    tokens = ["<unk>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(26)] + [
        "▁", "h", "i", "!", "▁h", "▁hi",
    ]
    types = [2, 3, 3] + [6] * 26 + [1] * 6
    scores = [0.0] * 29 + [-10.0, -10.0, -10.0, -10.0, -2.0, -1.0]
    _write_spm(str(d / "tokenizer.model"), tokens, scores, types)
    (d / "tokenizer_config.json").write_text(json.dumps({
        "bos_token": "<s>", "eos_token": "</s>", "unk_token": "<unk>",
        "add_bos_token": True, "chat_template": "{{ messages }}",
    }))
    return str(d), sd


def test_lazy_state_dict(hf_dir):
    from zllm.convert.from_disk import LazyStateDict

    d, sd = hf_dir
    lazy = LazyStateDict.from_dir(d)
    assert set(lazy) == set(sd)
    for k in ("model.embed_tokens.weight", "model.layers.1.mlp.down_proj.weight"):
        np.testing.assert_array_equal(lazy[k], sd[k])
    lazy.close()


def test_spm_parse_roundtrip(hf_dir):
    from zllm.convert.from_disk import parse_sentencepiece

    d, _ = hf_dir
    tokens, scores, types = parse_sentencepiece(d + "/tokenizer.model")
    assert tokens[:3] == ["<unk>", "<s>", "</s>"]
    assert tokens[-2:] == ["▁h", "▁hi"]
    assert types[:3] == [2, 3, 3] and types[3] == 6
    assert scores[-1] == -1.0


def test_convert_dir_matches_in_memory(hf_dir, tmp_path):
    from zllm.convert.from_disk import convert_hf_dir
    from zllm.convert.hf import convert_hf_llama
    from zllm.gguf.reader import read_gguf

    d, sd = hf_dir
    p1 = str(tmp_path / "disk.gguf")
    p2 = str(tmp_path / "mem.gguf")
    convert_hf_dir(d, p1, gtype=GGMLType.F32)
    convert_hf_llama(sd, CFG, p2, gtype=GGMLType.F32)

    f1, f2 = read_gguf(p1), read_gguf(p2)
    assert set(f1.tensors) == set(f2.tensors)
    for name in f1.tensors:
        np.testing.assert_array_equal(f1.tensor_f32(name), f2.tensor_f32(name), err_msg=name)
    # tokenizer KVs present only in the from-disk GGUF
    assert f1.kv("tokenizer.ggml.model") == "llama"
    assert f1.kv("tokenizer.ggml.bos_token_id") == 1
    assert f1.kv("tokenizer.chat_template") == "{{ messages }}"
    f1.close(); f2.close()


def test_converted_model_tokenizes_and_runs(hf_dir, tmp_path):
    import jax.numpy as jnp

    from zllm.convert.from_disk import convert_hf_dir
    from zllm.models.loader import Model
    from zllm.runtime.generate import Generator

    d, _ = hf_dir
    p = str(tmp_path / "m.gguf")
    convert_hf_dir(d, p, gtype=GGMLType.F32)
    m = Model.load(p, quantized=False, dtype=jnp.float32)
    assert m.tokenizer is not None
    ids = m.tokenizer.encode("hi!", add_special=True)
    assert ids[0] == 1  # BOS from add_bos_token
    assert m.tokenizer.decode(ids[1:]) == "hi!"
    assert m.chat_template == "{{ messages }}"
    gen = Generator(m, max_len=64, prefill_chunk=32)
    res = gen.generate(ids, max_new=4)
    assert len(res.tokens) == 4


def test_tokenizer_json_bpe(tmp_path):
    """BPE tokenizer.json path (gpt2-style byte-level)."""
    from zllm.convert.from_disk import parse_tokenizer_json, tokenizer_kv_from_dir

    tj = {
        "model": {
            "type": "BPE",
            "vocab": {"a": 0, "b": 1, "ab": 2, "<|end|>": 3},
            "merges": ["a b"],
        },
        "added_tokens": [{"id": 3, "content": "<|end|>", "special": True}],
    }
    (tmp_path / "tokenizer.json").write_text(json.dumps(tj))
    (tmp_path / "tokenizer_config.json").write_text(json.dumps({"eos_token": "<|end|>"}))
    tokens, types, merges = parse_tokenizer_json(str(tmp_path / "tokenizer.json"))
    assert tokens == ["a", "b", "ab", "<|end|>"]
    assert types == [1, 1, 1, 3]
    assert merges == ["a b"]
    kv = tokenizer_kv_from_dir(str(tmp_path), "llama", "llama")
    assert kv["tokenizer.ggml.model"] == "gpt2"
    assert kv["tokenizer.ggml.eos_token_id"] == 3
