"""Decode loop: chunked prefill + jitted single-token steps.

The minimal analogue of llama_decode (src/llama-context.cpp:1459) for
one or more equal-role sequences; the continuous-batching engine builds
on the same step functions.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import forward
from .kvcache import KVCache


@dataclass
class GenerateResult:
    tokens: list[int]
    text: str = ""
    n_prefill: int = 0
    t_prefill: float = 0.0
    t_decode: float = 0.0


class Generator:
    """Owns jitted prefill/decode step functions for one model."""

    def __init__(self, model, max_len: int = 2048, batch: int = 1, prefill_chunk: int = 256, kv_dtype=jnp.bfloat16):
        self.model = model
        self.max_len = max_len
        self.batch = batch
        self.prefill_chunk = prefill_chunk
        cfg = model.cfg
        self.kv = KVCache.create(cfg.n_layers, batch, max_len, cfg.n_kv_heads, cfg.head_dim, kv_dtype)

        # params are jit arguments (not closure constants): constants are
        # embedded into the HLO and shipped to the compiler per compile
        @functools.partial(jax.jit, static_argnames=("logits_for",), donate_argnums=(3,))
        def _step_fn(params, tokens, positions, kv, logits_for="last"):
            return forward(params, cfg, tokens, positions, kv, logits_for=logits_for)

        self._step = lambda tokens, positions, kv, logits_for="last": _step_fn(
            model.params, tokens, positions, kv, logits_for=logits_for
        )

    def reset(self):
        cfg = self.model.cfg
        self.kv = KVCache.create(
            cfg.n_layers, self.batch, self.max_len, cfg.n_kv_heads, cfg.head_dim, self.kv.k[0].dtype
        )

    def prefill(self, prompt_tokens: list[int], start: int = 0) -> jax.Array:
        """Feed the prompt in fixed-size chunks; returns last-token logits.
        `start` skips tokens whose KV is already cached (prompt-cache
        reuse; reference: session-file prefix skip in tools/completion)."""
        import time

        toks = np.asarray(prompt_tokens, dtype=np.int32)
        n = len(toks)
        logits = None
        t0 = time.perf_counter()
        pos = start
        while pos < n:
            chunk = min(self.prefill_chunk, n - pos)
            # pad to the chunk size to keep a single compiled shape
            padded = np.zeros((self.batch, self.prefill_chunk), dtype=np.int32)
            padded[0, :chunk] = toks[pos : pos + chunk]
            positions = np.full((self.batch, self.prefill_chunk), self.max_len - 1, dtype=np.int32)
            positions[0] = np.arange(pos, pos + self.prefill_chunk)
            # overshoot positions clamp to the last valid slot; their writes
            # land beyond the causal horizon of real queries
            positions = np.clip(positions, 0, self.max_len - 1)
            lg, self.kv = self._step(jnp.asarray(padded), jnp.asarray(positions), self.kv, logits_for="all")
            logits = lg[0, chunk - 1]
            pos += chunk
        logits.block_until_ready()
        self.t_prefill = time.perf_counter() - t0
        return logits

    def prefill_embeds(self, embeds) -> jax.Array:
        """Prefill from a precomputed [1, T, n_embd] embedding sequence
        (multimodal chunks; reference: llama_batch.embd eval through
        mtmd-helper).  Chunked like token prefill; returns last logits."""
        import time

        emb = np.asarray(embeds, dtype=np.float32)
        if emb.ndim == 2:
            emb = emb[None]
        n = emb.shape[1]
        cfg = self.model.cfg
        if not hasattr(self, "_estep"):
            @functools.partial(jax.jit, donate_argnums=(3,))
            def _estep_fn(params, embeds, positions, kv):
                dummy = jnp.zeros(embeds.shape[:2], jnp.int32)
                return forward(params, cfg, dummy, positions, kv,
                               logits_for="all", embeds=embeds)

            self._estep = _estep_fn
        logits = None
        t0 = time.perf_counter()
        pos = 0
        while pos < n:
            chunk = min(self.prefill_chunk, n - pos)
            padded = np.zeros((self.batch, self.prefill_chunk, emb.shape[2]), np.float32)
            padded[0, :chunk] = emb[0, pos : pos + chunk]
            positions = np.full((self.batch, self.prefill_chunk), self.max_len - 1, np.int32)
            positions[0] = np.arange(pos, pos + self.prefill_chunk)
            positions = np.clip(positions, 0, self.max_len - 1)
            lg, self.kv = self._estep(
                self.model.params, jnp.asarray(padded), jnp.asarray(positions), self.kv)
            logits = lg[0, chunk - 1]
            pos += chunk
        logits.block_until_ready()
        self.t_prefill = time.perf_counter() - t0
        self._cur_pos = n
        return logits

    def decode_steps(self, first_token: int, n_steps: int, sampler=None) -> list[int]:
        """Greedy (or sampler-driven) decode; returns generated tokens."""
        out = [int(first_token)]
        pos = self._cur_pos
        for _ in range(n_steps):
            tok = np.full((self.batch, 1), out[-1], dtype=np.int32)
            positions = np.full((self.batch, 1), pos, dtype=np.int32)
            logits, self.kv = self._step(jnp.asarray(tok), jnp.asarray(positions), self.kv, logits_for="last")
            row = logits[0, -1]
            if sampler is None:
                nxt = int(jnp.argmax(row))
            else:
                nxt = int(sampler(row))
            out.append(nxt)
            pos += 1
        return out

    def decode_scan(self, first_token: int, n_steps: int) -> list[int]:
        """On-device greedy decode: lax.scan over jitted steps with the KV
        cache as carry.  One dispatch generates n_steps tokens — the
        per-step host round-trip (~1ms on tunneled hosts) disappears.
        Requires batch rows to advance in lockstep (the bench / CLI shape);
        the CB engine keeps per-step host control instead.  The KV update's
        scalar dynamic_update_slice path aliases the carry in-place, so the
        cache is NOT copied per iteration."""
        cfg = self.model.cfg

        if not hasattr(self, "_scan_fn"):
            @functools.partial(jax.jit, static_argnames=("n",), donate_argnums=(3,))
            def _scan_fn(params, tok, pos, kv, n):
                def body(carry, _):
                    tok, pos, kv = carry
                    logits, kv = forward(params, cfg, tok, pos, kv, logits_for="last")
                    nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
                    return (nxt, pos + 1, kv), nxt[:, 0]

                (tok, pos, kv), toks = jax.lax.scan(body, (tok, pos, kv), length=n)
                return tok, pos, kv, toks

            self._scan_fn = _scan_fn

        tok = jnp.full((self.batch, 1), first_token, jnp.int32)
        pos = jnp.full((self.batch, 1), self._cur_pos, jnp.int32)
        tok, pos, self.kv, toks = self._scan_fn(self.model.params, tok, pos, self.kv, n_steps)
        self._cur_pos += n_steps
        return [int(first_token)] + np.asarray(toks[:, 0]).tolist()

    def generate(self, prompt_tokens: list[int], max_new: int = 32, sampler=None,
                 eos_id: int = -1, start: int = 0,
                 stop_strings: tuple = ()) -> GenerateResult:
        import time

        logits = self.prefill(prompt_tokens, start=start)
        self._cur_pos = len(prompt_tokens)
        first = int(jnp.argmax(logits)) if sampler is None else int(sampler(logits))
        t0 = time.perf_counter()
        toks = [first]
        pos = self._cur_pos
        inc = None
        text_acc = ""
        if stop_strings and self.model.tokenizer is not None:
            from ..tokenizer import IncrementalDecoder

            inc = IncrementalDecoder(self.model.tokenizer)
            text_acc += inc.push(first)
        stop_at = -1
        for _ in range(max_new - 1):
            if toks[-1] == eos_id:
                break
            if inc is not None:
                hit = min((i for i in (text_acc.find(s) for s in stop_strings) if i >= 0),
                          default=-1)
                if hit >= 0:
                    stop_at = hit
                    break
            tok = np.full((self.batch, 1), toks[-1], dtype=np.int32)
            positions = np.full((self.batch, 1), pos, dtype=np.int32)
            lg, self.kv = self._step(jnp.asarray(tok), jnp.asarray(positions), self.kv, logits_for="last")
            row = lg[0, -1]
            toks.append(int(jnp.argmax(row)) if sampler is None else int(sampler(row)))
            pos += 1
            if inc is not None:
                text_acc += inc.push(toks[-1])
        t_decode = time.perf_counter() - t0
        self._cur_pos = len(prompt_tokens) + len(toks) - 1
        if stop_at >= 0:
            text = text_acc[:stop_at]
        else:
            text = self.model.tokenizer.decode(toks) if self.model.tokenizer else ""
        return GenerateResult(
            tokens=toks, text=text, n_prefill=len(prompt_tokens) - start,
            t_prefill=getattr(self, "t_prefill", 0.0), t_decode=t_decode,
        )
