"""RWKV world tokenizer — byte-trie greedy longest match.

Reference: llm_tokenizer_rwkv, src/llama-vocab.cpp:1190-1236 (+ the
token unescape at :1136): vocab entries are escaped byte strings
(\\t \\n \\r \\xHH \\\\); tokenization walks a byte trie taking the
longest match at every position, emitting UNK for unmatched bytes.
"""

from __future__ import annotations

from .vocab import Vocab


def unescape_rwkv_token(escaped: str) -> bytes:
    out = bytearray()
    escaping = False
    hex_remaining = 0
    hex_acc = 0
    for c in escaped:
        if hex_remaining:
            v = (ord(c) - ord("a") + 10) if c >= "a" else (ord(c) - ord("0"))
            hex_acc = (hex_acc << 4) + v
            hex_remaining -= 1
            if hex_remaining == 0:
                out.append(hex_acc & 0xFF)
                hex_acc = 0
            continue
        if escaping:
            if c == "t":
                out.append(9)
            elif c == "n":
                out.append(10)
            elif c == "r":
                out.append(13)
            elif c == "x":
                hex_remaining = 2
            else:
                out.append(ord(c) & 0xFF)
            escaping = False
            continue
        if c == "\\":
            escaping = True
        else:
            out.extend(c.encode("utf-8"))
    return bytes(out)


class RwkvTokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        self.trie: dict = {}
        self.pieces: list[bytes] = []
        for tid, text in enumerate(vocab.tokens):
            raw = unescape_rwkv_token(text)
            self.pieces.append(raw)
            if not raw:
                continue
            node = self.trie
            for b in raw:
                node = node.setdefault(b, {})
            node[None] = tid

    def encode(self, text: str) -> list[int]:
        data = text.encode("utf-8")
        out: list[int] = []
        pos = 0
        n = len(data)
        while pos < n:
            node = self.trie.get(data[pos])
            if node is None:
                out.append(self.vocab.unk_id if self.vocab.unk_id >= 0 else 0)
                pos += 1
                continue
            best_id, best_end = None, pos + 1
            i = pos + 1
            while True:
                tid = node.get(None)
                if tid is not None:
                    best_id, best_end = tid, i
                if i >= n:
                    break
                node = node.get(data[i])
                if node is None:
                    break
                i += 1
            if best_id is None:  # prefix existed but no complete token
                out.append(self.vocab.unk_id if self.vocab.unk_id >= 0 else 0)
                pos += 1
            else:
                out.append(best_id)
                pos = best_end
        return out

    def decode_piece(self, tid: int) -> bytes:
        return self.pieces[tid]
