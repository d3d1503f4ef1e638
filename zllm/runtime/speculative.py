"""Speculative decoding.

Two schemes from the reference, rebuilt on the slot==position KV cache
(partial acceptance needs no cache rollback — rejected positions are
simply overwritten on the next write-before-attend step):

* prompt-lookup (n-gram) speculation — reference examples/lookup +
  common/ngram-cache.cpp: propose the continuation of the longest
  recent n-gram match in the context.
* draft-model speculation — reference common/speculative.cpp: a small
  model drafts k tokens greedily, the target verifies them in one
  batched forward.
"""

from __future__ import annotations

import functools

import numpy as np


def ngram_propose(tokens: list[int], n_draft: int = 8, max_ngram: int = 4, min_ngram: int = 2) -> list[int]:
    """Longest-suffix n-gram match: if the last n tokens appeared earlier,
    propose what followed them."""
    toks = tokens
    for n in range(max_ngram, min_ngram - 1, -1):
        if len(toks) < n + 1:
            continue
        tail = toks[-n:]
        # scan right-to-left, excluding the match with itself
        for i in range(len(toks) - n - 1, -1, -1):
            if toks[i : i + n] == tail:
                cont = toks[i + n : i + n + n_draft]
                if cont:
                    return cont
    return []


class SpeculativeDecoder:
    """Greedy speculative decoding for a single sequence.

    target/draft are Model bundles; draft=None selects prompt-lookup."""

    def __init__(self, target, draft=None, n_draft: int = 8, max_len: int = 2048):
        import jax
        import jax.numpy as jnp

        from ..models.llama import forward
        from .kvcache import KVCache

        self.jnp = jnp
        self.target = target
        self.draft = draft
        self.n_draft = n_draft
        cfg = target.cfg
        self.kv = KVCache.create(cfg.n_layers, 1, max_len, cfg.n_kv_heads, cfg.head_dim, jnp.bfloat16)
        if draft is not None:
            dcfg = draft.cfg
            self.dkv = KVCache.create(dcfg.n_layers, 1, max_len, dcfg.n_kv_heads, dcfg.head_dim, jnp.bfloat16)

        @functools.partial(jax.jit, static_argnames=("cfg_id",), donate_argnums=(3,))
        def _step(params, toks, pos, kv, cfg_id=0):
            c = target.cfg if cfg_id == 0 else draft.cfg
            logits, kv = forward(params, c, toks, pos, kv, logits_for="all")
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), kv

        self._step = _step
        self.n_accepted = 0
        self.n_drafted = 0
        self.draft_seen = 0  # history positions correctly fed to the draft

    def _drafts(self, history: list[int]) -> list[int]:
        if self.draft is None:
            return ngram_propose(history, self.n_draft)
        jnp = self.jnp
        # catch the draft model up on tokens it mispredicted or never saw
        # (variable-length block; a production path would bucket-pad it)
        catchup = history[self.draft_seen :]
        positions = jnp.asarray([list(range(self.draft_seen, len(history)))], jnp.int32)
        nxt, self.dkv = self._step(
            self.draft.params, jnp.asarray([catchup], jnp.int32), positions, self.dkv, cfg_id=1
        )
        self.draft_seen = len(history)
        out = [int(nxt[0, -1])]
        p = len(history)
        while len(out) < self.n_draft:
            nxt, self.dkv = self._step(
                self.draft.params, jnp.asarray([[out[-1]]], jnp.int32),
                jnp.asarray([[p]], jnp.int32), self.dkv, cfg_id=1,
            )
            out.append(int(nxt[0, -1]))
            p += 1
        # drafted positions hold the draft's own kv; the next round's
        # catch-up overwrites any of them that verification rejected
        return out

    def generate(self, prompt: list[int], max_new: int = 64, eos_id: int = -1) -> list[int]:
        """Greedy generation; output is identical to plain greedy decode."""
        jnp = self.jnp
        # prefill (target + draft)
        pos0 = len(prompt)
        toks = jnp.asarray([prompt], jnp.int32)
        pos = jnp.asarray([list(range(pos0))], jnp.int32)
        nxt, self.kv = self._step(self.target.params, toks, pos, self.kv, cfg_id=0)

        history = list(prompt)
        out = [int(nxt[0, -1])]
        history.append(out[0])
        p = pos0  # next write position for token out[-1]

        while len(out) < max_new and out[-1] != eos_id:
            drafts = self._drafts(history)
            self.n_drafted += len(drafts)
            block = [out[-1]] + drafts
            positions = jnp.asarray([list(range(p, p + len(block)))], jnp.int32)
            preds, self.kv = self._step(
                self.target.params, jnp.asarray([block], jnp.int32), positions, self.kv, cfg_id=0
            )
            preds = np.asarray(preds)[0]  # predictions after each block position
            accepted = 0
            for i, d in enumerate(drafts):
                if int(preds[i]) == d:
                    accepted += 1
                else:
                    break
            self.n_accepted += accepted
            new_tokens = drafts[:accepted] + [int(preds[accepted])]
            for t in new_tokens:
                out.append(t)
                history.append(t)
                if len(out) >= max_new or t == eos_id:
                    break
            p += accepted + 1
        return out[:max_new]
