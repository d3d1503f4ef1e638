"""Tokenizer tests against the reference's committed vocab GGUFs and their
golden .inp/.out vectors (pattern: reference tests/test-tokenizer-0.cpp)."""

import os

import pytest

from zllm.gguf import read_gguf
from zllm.tokenizer import Tokenizer

REF_MODELS = "/root/reference/models"
SEP = "__ggml_vocab_test__"

GOLDEN = [
    "ggml-vocab-bert-bge",  # WPM
    "ggml-vocab-llama-spm",
    "ggml-vocab-phi-3",
    "ggml-vocab-gpt-2",
    "ggml-vocab-mpt",
    "ggml-vocab-falcon",
    "ggml-vocab-starcoder",
    "ggml-vocab-refact",
    "ggml-vocab-deepseek-llm",
    "ggml-vocab-deepseek-coder",
]


def _load_cases(stem: str):
    with open(os.path.join(REF_MODELS, stem + ".gguf.inp"), encoding="utf-8") as fh:
        inputs = fh.read().split(SEP + "\n")
    with open(os.path.join(REF_MODELS, stem + ".gguf.out"), encoding="utf-8") as fh:
        outputs = fh.read().splitlines()
    inputs = [s.removesuffix("\n") for s in inputs]
    if inputs and inputs[-1] == "":
        inputs = inputs[:-1]
    expected = [[int(t) for t in line.split()] for line in outputs]
    assert len(inputs) == len(expected), f"{stem}: {len(inputs)} inputs vs {len(expected)} outputs"
    return list(zip(inputs, expected))


@pytest.mark.skipif(not os.path.isdir(REF_MODELS), reason="reference models not available")
@pytest.mark.parametrize("stem", GOLDEN)
def test_golden_vectors(stem):
    f = read_gguf(os.path.join(REF_MODELS, stem + ".gguf"))
    tok = Tokenizer.from_gguf(f)
    failures = []
    for text, want in _load_cases(stem):
        got = tok.encode(text, add_special=False, parse_special=False)
        if got != want:
            failures.append((text, want, got))
    assert not failures, f"{stem}: {len(failures)} mismatches; first: {failures[0]!r}"


@pytest.mark.skipif(not os.path.isdir(REF_MODELS), reason="reference models not available")
def test_spm_roundtrip_and_specials():
    f = read_gguf(os.path.join(REF_MODELS, "ggml-vocab-llama-spm.gguf"))
    tok = Tokenizer.from_gguf(f)
    ids = tok.encode("Hello, world!", add_special=True)
    assert ids[0] == tok.bos_id
    assert tok.decode(ids) == "Hello, world!"
    # parse_special picks up control tokens from raw text
    ids2 = tok.encode("<s>hi</s>", parse_special=True)
    assert ids2[0] == tok.bos_id and ids2[-1] == tok.eos_id


@pytest.mark.skipif(not os.path.isdir(REF_MODELS), reason="reference models not available")
@pytest.mark.parametrize("stem", ["ggml-vocab-llama-spm", "ggml-vocab-gpt-2"])
def test_incremental_decoder_matches_full_decode(stem):
    """Streamed pieces concatenate to the non-streamed decode, including
    multi-byte UTF-8 split across tokens and SPM space prefixes."""
    from zllm.tokenizer import IncrementalDecoder

    f = read_gguf(os.path.join(REF_MODELS, stem + ".gguf"))
    tok = Tokenizer.from_gguf(f)
    for text in ["Hello world, how are you?", "日本語のテキスト🚀 emoji", "  leading spaces", "a\nb\tc"]:
        ids = tok.encode(text, add_special=False)
        inc = IncrementalDecoder(tok)
        streamed = "".join([inc.push(t) for t in ids]) + inc.flush()
        assert streamed == tok.decode(ids), (stem, text)


@pytest.mark.skipif(not os.path.isdir(REF_MODELS), reason="reference models not available")
def test_incremental_decoder_buffers_utf8_tail():
    """A multi-byte char whose bytes arrive over several byte-level tokens
    must not stream as U+FFFD replacement chars."""
    from zllm.tokenizer import IncrementalDecoder

    f = read_gguf(os.path.join(REF_MODELS, "ggml-vocab-gpt-2.gguf"))
    tok = Tokenizer.from_gguf(f)
    ids = tok.encode("🚀", add_special=False)
    assert len(ids) > 1  # the emoji spans several byte-level BPE tokens
    inc = IncrementalDecoder(tok)
    pieces = [inc.push(t) for t in ids]
    assert "�" not in "".join(pieces)
    assert "".join(pieces) + inc.flush() == "🚀"


def test_ugm_viterbi():
    """UGM picks the max-score segmentation, not greedy longest match
    (reference llm_tokenizer_ugm, src/llama-vocab.cpp:853-940)."""
    from zllm.tokenizer import Tokenizer
    from zllm.tokenizer.vocab import TokenType, Vocab

    # "▁ab" + "c" scores -1 + -4 = -5; "▁a" + "bc" scores -3 + -1 = -4 (wins)
    tokens = ["<unk>", "▁ab", "c", "▁a", "bc", "▁", "a", "b", "x"]
    scores = [0.0, -1.0, -4.0, -3.0, -1.0, -2.0, -5.0, -5.0, -5.0]
    types = [int(TokenType.UNKNOWN)] + [int(TokenType.NORMAL)] * 8
    v = Vocab(model="t5", pre="default", tokens=tokens, scores=scores, types=types,
              unk_id=0, add_bos=False, add_eos=True, eos_id=-1, add_space_prefix=True)
    tok = Tokenizer(v)
    assert tok.encode("abc") == [3, 4]  # ▁a bc
    # unknown codepoints collapse to one merged UNK
    assert tok.encode("abzzc") == [1, 0, 2]  # ▁ab <unk><unk->merged> c


def test_ugm_user_defined_wins():
    """User-defined tokens score 0 and beat normal pieces."""
    from zllm.tokenizer import Tokenizer
    from zllm.tokenizer.vocab import TokenType, Vocab

    tokens = ["<unk>", "▁he", "llo", "▁hello", "▁", "h", "e", "l", "o"]
    scores = [0.0, -1.0, -1.0, -9.0, -2.0, -3.0, -3.0, -3.0, -3.0]
    types = [int(TokenType.UNKNOWN), int(TokenType.NORMAL), int(TokenType.NORMAL),
             int(TokenType.USER_DEFINED)] + [int(TokenType.NORMAL)] * 5
    v = Vocab(model="t5", pre="default", tokens=tokens, scores=scores, types=types,
              unk_id=0, add_space_prefix=True)
    tok = Tokenizer(v)
    # ▁hello (user-defined, 0.0) beats ▁he+llo (-2.0)... but user-defined
    # tokens are also partitioned out of raw text pre-tokenization, so
    # encode sees it either way
    assert tok.encode("hello") == [3]


def test_wpm_decode_roundtrip():
    import os

    from zllm.gguf import read_gguf
    from zllm.tokenizer import Tokenizer

    p = os.path.join(REF_MODELS, "ggml-vocab-bert-bge.gguf")
    if not os.path.exists(p):
        import pytest
        pytest.skip("no reference models")
    tok = Tokenizer.from_gguf(read_gguf(p))
    ids = tok.encode("hello world", add_special=False)
    assert tok.decode(ids) == "hello world"


def test_rwkv_trie_tokenizer():
    """RWKV byte-trie greedy longest match + escaped byte tokens
    (reference llm_tokenizer_rwkv, llama-vocab.cpp:1190)."""
    from zllm.tokenizer import Tokenizer
    from zllm.tokenizer.rwkv import unescape_rwkv_token
    from zllm.tokenizer.vocab import TokenType, Vocab

    assert unescape_rwkv_token("\\n") == b"\n"
    assert unescape_rwkv_token("\\x41B") == b"AB"
    assert unescape_rwkv_token("a\\\\b") == b"a\\b"

    tokens = ["<unk>", "hello", "hell", "he", " world", "wor", "l", "d", "o", " ", "\\n"]
    types = [int(TokenType.UNKNOWN)] + [int(TokenType.NORMAL)] * 10
    v = Vocab(model="rwkv", pre="default", tokens=tokens, scores=[0.0] * 11,
              types=types, unk_id=0, add_bos=False, add_space_prefix=False)
    tok = Tokenizer(v)
    # greedy longest: "hello world" -> hello, " world"
    assert tok.encode("hello world") == [1, 4]
    # falls back through shorter prefixes: "helld" -> hell, d
    assert tok.encode("helld") == [2, 7]
    # unmatched byte -> unk, advance one
    assert tok.encode("hz") == [0, 0] or tok.encode("hz")[0] == 0
    # escaped newline token matches a real newline byte
    assert tok.encode("\n") == [10]
    # decode round-trips bytes
    assert tok.decode(tok.encode("hello world")) == "hello world"


def test_plamo2_viterbi_tokenizer():
    """PLaMo2 suffix-DP tokenizer (reference llm_tokenizer_plamo2,
    llama-vocab.cpp:1242-1507): score-optimal segmentation with UTF-8
    byte fallback, ties to the longer piece."""
    from zllm.tokenizer import Tokenizer
    from zllm.tokenizer.vocab import TokenType, Vocab

    words = ["<unk>", "<s>", "</s>"]
    byte_toks = [f"<0x{b:02X}>" for b in range(256)]
    # scores: "hello"=-1, "hell"=-0.5, "he"=-0.2, "llo"=-0.1, "o"=-4
    vocab_words = [("hello", -1.0), ("hell", -0.5), ("he", -0.2),
                   ("llo", -0.1), ("o", -4.0), (" world", -0.3)]
    tokens = words + byte_toks + [w for w, _ in vocab_words]
    scores = [0.0] * (3 + 256) + [s for _, s in vocab_words]
    types = ([int(TokenType.UNKNOWN)] + [int(TokenType.CONTROL)] * 2
             + [int(TokenType.BYTE)] * 256 + [int(TokenType.NORMAL)] * len(vocab_words))
    v = Vocab(model="plamo2", pre="default", tokens=tokens, scores=scores,
              types=types, bos_id=1, eos_id=2, unk_id=0, add_bos=False,
              add_space_prefix=False)
    tok = Tokenizer(v)
    base = 3 + 256
    hello, hell, he, llo, o, world = range(base, base + 6)

    # "hello": whole-word -1.0 beats he+llo (-0.3) and hell+o (-4.5)?
    # DP minimizes -(sum scores): hello -> 1.0; he+llo -> 0.3 (better!)
    assert tok.encode("hello") == [he, llo]
    assert tok.encode("hello world") == [he, llo, world]
    # unknown chars fall back to UTF-8 byte tokens
    ids = tok.encode("héllo")
    assert ids[0] == he or ids[0] == 3 + ord("h")
    assert tok.decode(ids) == "héllo"
    # multi-byte fallback round-trips
    assert tok.decode(tok.encode("日本")) == "日本"
    # BOM is skipped
    assert tok.encode("﻿hello") == tok.encode("hello")
