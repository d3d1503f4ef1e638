"""Continuous-batching inference engine.

The TPU-native counterpart of the reference server's slot machinery
(reference: tools/server/server-context.cpp — server_slot states :34-46,
update_slots batching loop :1947; tools/server/server-queue.cpp task
queues): a fixed pool of slots shares one KV cache and one jitted decode
step with static shapes (no recompiles at runtime); an engine thread
interleaves chunked prefill with whole-batch decode steps and streams
tokens back through per-request queues.

Static-shape strategy: decode always runs [n_slots, 1]; prefill runs one
slot's chunk at [n_slots, chunk] where inactive rows write to a trash KV
slot (position = max_len, one past the attendable horizon).
"""

from __future__ import annotations

import queue
import threading
import time
import uuid
from dataclasses import dataclass, field
from enum import Enum

import numpy as np


class SlotState(Enum):
    IDLE = 0
    PROMPT = 1  # prefilling
    GENERATING = 2


@dataclass
class Request:
    prompt_tokens: list[int]
    max_new: int = 128
    grammar: object = None  # GrammarSampler (constrained decoding)
    temp: float = 0.8
    top_k: int = 40
    top_p: float = 0.95
    min_p: float = 0.05
    repeat_penalty: float = 1.0
    seed: int = -1
    stop_tokens: frozenset = frozenset()
    stop_strings: tuple = ()
    stream_q: "queue.Queue" = field(default_factory=queue.Queue)
    rid: str = field(default_factory=lambda: uuid.uuid4().hex[:12])
    # results
    done: bool = False
    out_tokens: list[int] = field(default_factory=list)
    finish_reason: str = ""
    t_submit: float = field(default_factory=time.time)
    t_first_token: float = 0.0
    t_done: float = 0.0


@dataclass
class _Slot:
    idx: int
    state: SlotState = SlotState.IDLE
    req: Request | None = None
    pos: int = 0  # next absolute position
    prompt_left: list[int] = field(default_factory=list)
    last_token: int = 0
    rng: np.random.Generator | None = None
    generated: int = 0


class Engine:
    def __init__(self, model, n_slots: int = 4, max_len: int = 2048, prefill_chunk: int = 128, kv_dtype=None):
        import functools

        import jax
        import jax.numpy as jnp

        from ..models.llama import forward
        from ..runtime.kvcache import KVCache

        self.model = model
        self.n_slots = n_slots
        self.max_len = max_len
        self.prefill_chunk = prefill_chunk
        cfg = model.cfg
        kv_dtype = kv_dtype or jnp.bfloat16
        # trash region [max_len, max_len + prefill_chunk) past the
        # attendable horizon: inactive rows during a chunked prefill write
        # their dummy K/V at position max_len, and because the dynamic-
        # update-slice start clamps to S - T = max_len, a [T]-token trash
        # write stays entirely inside the region — it can never overwrite a
        # live slot of a stalled GENERATING row (attendable slots are
        # strictly < max_len)
        self.kv = KVCache.create(
            cfg.n_layers, n_slots, max_len + prefill_chunk, cfg.n_kv_heads, cfg.head_dim, kv_dtype
        )

        @functools.partial(jax.jit, static_argnames=("logits_for",), donate_argnums=(3,))
        def _step(params, tokens, positions, kv, logits_for="last"):
            return forward(params, cfg, tokens, positions, kv, logits_for=logits_for)

        self._step = _step
        self._jnp = jnp
        self._jax = jax

        self.slots = [_Slot(idx=i) for i in range(n_slots)]
        self.pending: "queue.Queue[Request]" = queue.Queue()
        self._stop = False
        self._wake = threading.Event()
        self.metrics = {
            "requests_total": 0,
            "tokens_generated_total": 0,
            "tokens_prefilled_total": 0,
            "decode_steps_total": 0,
        }
        self.thread = threading.Thread(target=self._loop, daemon=True, name="zllm-engine")

    # -- public API ---------------------------------------------------------
    def start(self):
        self.thread.start()

    def stop(self):
        self._stop = True
        self._wake.set()
        self.thread.join(timeout=30)

    def submit(self, req: Request) -> Request:
        if len(req.prompt_tokens) >= self.max_len:
            raise ValueError(f"prompt ({len(req.prompt_tokens)}) exceeds context ({self.max_len})")
        self.metrics["requests_total"] += 1
        self.pending.put(req)
        self._wake.set()
        return req

    # -- engine loop --------------------------------------------------------
    def _free_slot(self) -> _Slot | None:
        for s in self.slots:
            if s.state == SlotState.IDLE:
                return s
        return None

    def _admit(self):
        while True:
            slot = self._free_slot()
            if slot is None:
                return
            try:
                req = self.pending.get_nowait()
            except queue.Empty:
                return
            slot.req = req
            slot.state = SlotState.PROMPT
            slot.pos = 0
            slot.prompt_left = list(req.prompt_tokens)
            slot.generated = 0
            slot.rng = np.random.default_rng(req.seed if req.seed >= 0 else None)

    def _finish(self, slot: _Slot, reason: str):
        req = slot.req
        req.finish_reason = reason
        req.done = True
        req.t_done = time.time()
        req.stream_q.put(None)  # sentinel
        slot.state = SlotState.IDLE
        slot.req = None

    def _loop(self):
        jnp = self._jnp
        while not self._stop:
            self._admit()
            prompt_slots = [s for s in self.slots if s.state == SlotState.PROMPT]
            gen_slots = [s for s in self.slots if s.state == SlotState.GENERATING]

            if not prompt_slots and not gen_slots:
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue

            if prompt_slots:
                self._prefill_chunk(prompt_slots[0])
                continue

            self._decode_step(gen_slots)

    def _prefill_chunk(self, slot: _Slot):
        jnp = self._jnp
        chunk = min(self.prefill_chunk, len(slot.prompt_left))
        toks = np.zeros((self.n_slots, self.prefill_chunk), dtype=np.int32)
        pos = np.full((self.n_slots, self.prefill_chunk), self.max_len, dtype=np.int32)  # trash
        toks[slot.idx, :chunk] = slot.prompt_left[:chunk]
        pos[slot.idx, :chunk] = np.arange(slot.pos, slot.pos + chunk)

        logits, self.kv = self._step(
            self.model.params, jnp.asarray(toks), jnp.asarray(pos), self.kv, logits_for="all"
        )
        slot.pos += chunk
        slot.prompt_left = slot.prompt_left[chunk:]
        self.metrics["tokens_prefilled_total"] += chunk

        if not slot.prompt_left:
            row = np.asarray(logits[slot.idx, chunk - 1])
            self._emit_token(slot, row)
            slot.state = SlotState.GENERATING

    def _decode_step(self, gen_slots):
        jnp = self._jnp
        toks = np.zeros((self.n_slots, 1), dtype=np.int32)
        pos = np.full((self.n_slots, 1), self.max_len, dtype=np.int32)  # trash for idle rows
        for s in gen_slots:
            toks[s.idx, 0] = s.last_token
            pos[s.idx, 0] = s.pos

        logits, self.kv = self._step(
            self.model.params, jnp.asarray(toks), jnp.asarray(pos), self.kv, logits_for="last"
        )
        rows = np.asarray(logits[:, -1])
        self.metrics["decode_steps_total"] += 1
        for s in list(gen_slots):
            s.pos += 1
            self._emit_token(s, rows[s.idx])

    # -- sampling & emission (host-side, like the reference's CPU sampler) --
    def _sample(self, slot: _Slot, logits: np.ndarray) -> int:
        req = slot.req
        lg = logits.astype(np.float64)
        if req.grammar is not None:
            # constrain to grammar-legal tokens: check the likeliest
            # candidates first, widen to the full vocab only if none pass
            # (reference: llama_sampler_init_grammar applies to candidates)
            order = np.argsort(-lg)
            allowed = req.grammar.allowed(order[:128])
            if not allowed:
                allowed = req.grammar.allowed(order[128:])
            mask = np.full(lg.shape, -np.inf)
            mask[allowed] = 0.0
            lg = lg + mask
        if req.repeat_penalty != 1.0 and req.out_tokens:
            recent = np.asarray(req.out_tokens[-64:])
            pos_mask = lg[recent] > 0
            lg[recent[pos_mask]] /= req.repeat_penalty
            lg[recent[~pos_mask]] *= req.repeat_penalty
        if req.temp <= 0:
            return int(lg.argmax())
        if req.top_k > 0:
            kth = np.partition(lg, -req.top_k)[-req.top_k]
            lg[lg < kth] = -np.inf
        lg = lg / req.temp
        p = np.exp(lg - lg.max())
        p /= p.sum()
        if req.top_p < 1.0:
            order = np.argsort(-p)
            cum = np.cumsum(p[order])
            cut = np.searchsorted(cum, req.top_p) + 1
            mask = np.ones_like(p, bool)
            mask[order[:cut]] = False
            p[mask] = 0
            p /= p.sum()
        if req.min_p > 0:
            p[p < req.min_p * p.max()] = 0
            p /= p.sum()
        return int(slot.rng.choice(len(p), p=p))

    def _emit_token(self, slot: _Slot, logits_row: np.ndarray):
        req = slot.req
        tok = self._sample(slot, logits_row)
        if req.grammar is not None:
            req.grammar.accept_token(tok)
        slot.last_token = tok
        slot.generated += 1
        req.out_tokens.append(tok)
        if req.t_first_token == 0.0:
            req.t_first_token = time.time()
        self.metrics["tokens_generated_total"] += 1
        req.stream_q.put(tok)

        if tok in req.stop_tokens:
            self._finish(slot, "stop")
        elif slot.generated >= req.max_new:
            self._finish(slot, "length")
        elif slot.pos + 1 >= self.max_len:
            self._finish(slot, "length")
