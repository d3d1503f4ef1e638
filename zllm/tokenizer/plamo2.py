"""PLaMo2 tokenizer (the "plamo2" GGUF tokenizer model).

Behavioral equivalent of the reference's suffix-automaton tokenizer
(reference: src/llama-vocab.cpp llm_tokenizer_plamo2, :1242-1507): a
right-to-left Viterbi DP that minimizes the negated sum of piece scores,
falling back to UTF-8 byte tokens at UNKNOWN cost per codepoint.  The
reference walks a flattened Aho-Corasick-style suffix table; the
candidate set it enumerates at position i is exactly "every vocab token
matching text[i:]", so a hash-map piece lookup bounded by the longest
token yields identical output (same integer-scaled scores, same
longest-first tie-breaking).
"""

from __future__ import annotations

from .vocab import TokenType, Vocab

UNKNOWN_SCORE = -10_000_000  # reference UNKNOWN_SCORE (byte-fallback cost)


class Plamo2Tokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        self.scores: dict[str, int] = {}
        self.ids: dict[str, int] = {}
        self.max_len = 1
        for tid, text in enumerate(vocab.tokens):
            if vocab.types[tid] == TokenType.BYTE:
                continue
            # integer-scaled scores exactly like the reference table
            self.scores[text] = int(round(vocab.scores[tid] * 1e4))
            self.ids[text] = tid
            self.max_len = max(self.max_len, len(text))

    def encode(self, text: str) -> list[int]:
        v = self.vocab
        if text.startswith("﻿"):  # BOM skip, like the reference
            text = text[1:]
        if not text:
            return []
        n = len(text)
        INF = 1 << 60
        best = [INF] * (n + 1)
        best[n] = 0
        tok_len = [1] * (n + 1)
        tok_id = [-1] * (n + 1)
        INVALID = -20_000_000  # reference INVALID_SCORE: such pieces unusable
        for i in range(n - 1, -1, -1):
            # vocab pieces, longest first, then the byte fallback — the
            # reference's table order, so strict '<' ties break identically
            for ln in range(min(self.max_len, n - i), 0, -1):
                piece = text[i : i + ln]
                sc = self.scores.get(piece)
                if sc is None or sc <= INVALID:
                    continue
                s = best[i + ln] - sc
                if s < best[i]:
                    best[i] = s
                    tok_len[i] = ln
                    tok_id[i] = self.ids[piece]
            s_fb = best[i + 1] - UNKNOWN_SCORE
            if s_fb < best[i]:
                best[i] = s_fb
                tok_len[i] = 1
                tok_id[i] = -1

        out: list[int] = []
        pos = 0
        while pos < n:
            if tok_id[pos] >= 0:
                out.append(tok_id[pos])
            else:
                for b in text[pos].encode("utf-8"):
                    bid = v.byte_tokens.get(b)
                    out.append(bid if bid is not None else v.unk_id)
            pos += tok_len[pos]
        return out

    def decode_piece(self, tid: int) -> bytes:
        v = self.vocab
        t = v.tokens[tid]
        if v.types[tid] == TokenType.BYTE:
            return bytes([int(t[3:5], 16)])
        if v.types[tid] == TokenType.CONTROL:
            return b""
        return t.encode("utf-8")
