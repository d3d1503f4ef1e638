"""Tokenizers: SPM (llama), byte-level BPE (gpt2) with special-token
partitioning — the engine-facing facade is `Tokenizer`."""

from __future__ import annotations

from ..gguf.reader import GGUFFile
from .bpe import BpeTokenizer
from .spm import SpmTokenizer
from .vocab import TokenType, Vocab


class Tokenizer:
    """Facade with llama.h-shaped semantics: encode(text, add_special,
    parse_special) -> ids; decode(ids) -> text.  Special tokens are
    partitioned out of the raw text before the inner tokenizer runs
    (reference behavior: src/llama-vocab.cpp tokenizer_st_partition)."""

    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        if vocab.model == "llama":
            self.inner = SpmTokenizer(vocab)
        elif vocab.model == "gpt2":
            self.inner = BpeTokenizer(vocab)
        else:
            raise NotImplementedError(f"tokenizer model {vocab.model!r} not supported yet")
        self._specials = vocab.special_tokens()

    @classmethod
    def from_gguf(cls, f: GGUFFile) -> "Tokenizer":
        return cls(Vocab.from_gguf(f))

    # ------------------------------------------------------------------
    def _partition(self, text: str, parse_special: bool):
        """Split text into (is_token, payload) fragments on special tokens."""
        frags: list[tuple[bool, object]] = [(False, text)]
        for st, tid in self._specials:
            if not parse_special and self.vocab.types[tid] in (TokenType.CONTROL, TokenType.UNKNOWN):
                continue
            nxt: list[tuple[bool, object]] = []
            for is_tok, payload in frags:
                if is_tok:
                    nxt.append((is_tok, payload))
                    continue
                s: str = payload  # type: ignore[assignment]
                while True:
                    idx = s.find(st)
                    if idx < 0:
                        if s:
                            nxt.append((False, s))
                        break
                    if idx > 0:
                        nxt.append((False, s[:idx]))
                    nxt.append((True, tid))
                    s = s[idx + len(st) :]
            frags = nxt
        return frags

    def encode(self, text: str, add_special: bool = False, parse_special: bool = False) -> list[int]:
        v = self.vocab
        out: list[int] = []
        if add_special and v.add_bos and v.bos_id >= 0:
            out.append(v.bos_id)
        for is_tok, payload in self._partition(text, parse_special):
            if is_tok:
                out.append(payload)  # type: ignore[arg-type]
            else:
                out.extend(self.inner.encode(payload))  # type: ignore[arg-type]
        if add_special and v.add_eos and v.eos_id >= 0:
            out.append(v.eos_id)
        return out

    def decode(self, ids, skip_special: bool = True) -> str:
        parts: list[bytes] = []
        for tid in ids:
            tid = int(tid)
            if skip_special and self.vocab.types[tid] == TokenType.CONTROL:
                continue
            parts.append(self.inner.decode_piece(tid))
        text = b"".join(parts).decode("utf-8", errors="replace")
        if self.vocab.model == "llama" and self.vocab.add_space_prefix and text.startswith(" "):
            text = text[1:]
        return text

    @property
    def bos_id(self) -> int:
        return self.vocab.bos_id

    @property
    def eos_id(self) -> int:
        return self.vocab.eos_id
