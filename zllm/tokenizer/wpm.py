"""WordPiece tokenizer (BERT family).

Reference: llm_tokenizer_wpm, src/llama-vocab.cpp:670-780 — NFD
normalization, lowercasing, punctuation/CJK isolation, then greedy
longest-match over each word with the U+2581 phantom-space prefix (GGUF
bert vocabs store word-initial pieces with the SPM-style prefix, not
"##").  A word with any unmatched position collapses to a single UNK.
"""

from __future__ import annotations

import unicodedata

from .vocab import Vocab

_ESC = "▁"  # escaped space (lower one eighth block)

_CJK = (
    (0x04E00, 0x09FFF), (0x03400, 0x04DBF), (0x20000, 0x2A6DF),
    (0x2A700, 0x2B73F), (0x2B740, 0x2B81F), (0x2B920, 0x2CEAF),
    (0x0F900, 0x0FAFF), (0x2F800, 0x2FA1F),
)


def _is_cjk(cp: int) -> bool:
    return any(lo <= cp <= hi for lo, hi in _CJK)


class WpmTokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        self.max_len = max((len(t) for t in vocab.tokens), default=1)

    # -- normalization + word split (llama-vocab.cpp:723-760) -----------
    def _preprocess(self, text: str) -> list[str]:
        words: list[str] = [""]
        for ch in unicodedata.normalize("NFD", text):
            cp = ord(ch)
            if ch.isspace():
                if words[-1]:
                    words.append("")
                continue
            cat = unicodedata.category(ch)
            # Mn: NFD combining marks are stripped (BERT strip_accents;
            # the golden bert-bge vectors require it)
            if cp == 0 or cp == 0xFFFD or cat in ("Cc", "Cf", "Mn"):
                continue
            s = ch.lower()
            if cat.startswith("P") or (cp < 0x7F and cat.startswith("S")) or _is_cjk(cp):
                if words[-1]:
                    words.append("")
                words[-1] = s
                words.append("")
            else:
                words[-1] += s
        if words and not words[-1]:
            words.pop()
        return words

    def encode(self, text: str) -> list[int]:
        t2i = self.vocab.token_to_id
        out: list[int] = []
        for word in self._preprocess(text):
            if not word:
                continue
            w = _ESC + word
            n = len(w)
            toks: list[int] = []
            i = 0
            matched = True
            while i < n:
                tid = None
                for j in range(min(n, i + self.max_len + 1), i, -1):
                    tid = t2i.get(w[i:j])
                    if tid is not None:
                        i = j
                        break
                if tid is None:
                    matched = False
                    break
                toks.append(tid)
            out.extend(toks if matched and toks else [self.vocab.unk_id])
        return out

    def decode_piece(self, tid: int) -> bytes:
        return self.vocab.tokens[tid].replace(_ESC, " ").encode("utf-8")
