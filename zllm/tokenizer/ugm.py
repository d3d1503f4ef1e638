"""UGM (unigram language model) tokenizer — T5 family.

Reference: llm_tokenizer_ugm, src/llama-vocab.cpp:786-1050 — the
SentencePiece optimized-Viterbi algorithm: walk the normalized input one
codepoint at a time, extend all trie matches, keep the best-scoring
tokenization per end offset, fall back to a penalized UNK per codepoint,
then backtrack (merging consecutive UNKs).  User-defined tokens score 0
(log-prob domain) to win over normal pieces.

Normalization implements the flag-driven path (space escaping to U+2581,
space prefix, extra-whitespace merging); the precompiled_charsmap XCDA
prefix-replacement table is not applied (rarely present beyond identity
mappings in modern T5 GGUFs — noted per llama-vocab.cpp:788-808).
"""

from __future__ import annotations

from .vocab import TokenType, Vocab

_ESC = "▁"
_UNK_PENALTY = 10.0


class UgmTokenizer:
    def __init__(self, vocab: Vocab, *, escape_whitespaces: bool = True,
                 remove_extra_whitespaces: bool = True):
        self.vocab = vocab
        self.escape = escape_whitespaces
        self.merge_ws = remove_extra_whitespaces
        # char-trie over normal/user-defined/unused token texts
        self.trie: dict = {}
        min_score = float("inf")
        for tid, (text, tt) in enumerate(zip(vocab.tokens, vocab.types)):
            if tt == TokenType.NORMAL:
                min_score = min(min_score, vocab.scores[tid])
            if tt in (TokenType.NORMAL, TokenType.USER_DEFINED, TokenType.UNUSED):
                node = self.trie
                for ch in text:
                    node = node.setdefault(ch, {})
                node[None] = tid
        self.unk_score = (min_score if min_score != float("inf") else 0.0) - _UNK_PENALTY

    def _normalize(self, text: str) -> str:
        space = _ESC if self.escape else " "
        out: list[str] = []
        prepended = False
        in_word = False
        for ch in text:
            if ch != " ":
                if not in_word:
                    in_word = True
                    if (self.vocab.add_space_prefix and not prepended) or self.merge_ws:
                        out.append(space)
                        prepended = True
                out.append(ch)
            else:
                in_word = False
                if not self.merge_ws:
                    out.append(space)
        return "".join(out)

    def encode(self, text: str) -> list[int]:
        v = self.vocab
        s = self._normalize(text)
        n = len(s)
        if n == 0:
            return []
        # best[i] = (score, token_id, start) for the best tokenization of s[:i]
        NEG = float("-inf")
        best: list[tuple[float, int, int]] = [(NEG, v.unk_id, 0)] * (n + 1)
        best[0] = (0.0, v.unk_id, 0)
        for i in range(n):
            sc0 = best[i][0]
            if sc0 == NEG:
                continue
            node = self.trie
            j = i
            matched_one = False
            while j < n:
                node = node.get(s[j])
                if node is None:
                    break
                j += 1
                tid = node.get(None)
                if tid is not None:
                    if j - i == 1:
                        matched_one = True
                    score = 0.0 if v.types[tid] == TokenType.USER_DEFINED else v.scores[tid]
                    cand = sc0 + score
                    if cand > best[j][0]:
                        best[j] = (cand, tid, i)
            if not matched_one:
                cand = sc0 + self.unk_score
                if cand > best[i + 1][0]:
                    best[i + 1] = (cand, v.unk_id, i)
        # backtrack, merging consecutive UNKs (reference :955-966)
        out: list[int] = []
        i = n
        prev_unk = False
        while i > 0:
            _, tid, start = best[i]
            is_unk = tid == v.unk_id
            if not (is_unk and prev_unk):
                out.append(tid)
            prev_unk = is_unk
            i = start
        out.reverse()
        return out

    def decode_piece(self, tid: int) -> bytes:
        return self.vocab.tokens[tid].replace(_ESC, " ").encode("utf-8")
