"""Continuous-batching inference engine.

The TPU-native counterpart of the reference server's slot machinery
(reference: tools/server/server-context.cpp — server_slot states :34-46,
update_slots batching loop :1947-2514; tools/server/server-queue.cpp task
queues): a fixed pool of slots shares one KV cache and jitted step
functions with static shapes (no recompiles at runtime).

Design points mirrored from the reference's update_slots:
  * prompt chunks and generating slots share ONE batch — a decode token
    rides along in column 0 of a prefill step, so a long prompt never
    starves concurrent generations (:2078-2514)
  * prompt-prefix reuse: a new request admitted to the slot whose cached
    tokens share the longest common prefix skips prefill of that prefix
    (prompt cache, server-context.cpp:105-121)
  * context shift: a generating slot that hits the context limit drops
    the oldest half of its window (keeping n_keep) and re-rotates K
    in-place rather than failing the request (:1981-2010)
  * sampling runs as one jitted on-device chain across all slots with
    per-slot parameters (src/llama-sampling.cpp chain semantics); grammar
    masking stays host-side like the reference's CPU sampler
  * the engine loop survives step errors: in-flight requests get a typed
    error finish, the loop continues (abort-callback analogue,
    include/llama.h:357-360)

Static-shape strategy: decode runs [n_slots, 1]; mixed prefill+decode
runs [n_slots, chunk].  Inactive rows write to a trash KV region past the
attendable horizon (cache length = max_len + chunk).
"""

from __future__ import annotations

import queue
import threading
import time
import uuid
from dataclasses import dataclass, field
from enum import Enum

import numpy as np

PENALTY_WINDOW = 64
NEG_INF = -1e30  # matches zllm.sampling.batched.NEG_INF


class Histogram:
    """Prometheus-style cumulative histogram (reference: server /metrics
    surface; the reference exposes counters — histograms are the natural
    superset for latency SLOs)."""

    def __init__(self, buckets=(0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)):
        self.buckets = tuple(buckets)
        self.counts = [0] * (len(self.buckets) + 1)  # +Inf
        self.total = 0.0
        self.n = 0

    def observe(self, v: float):
        self.total += v
        self.n += 1
        for i, b in enumerate(self.buckets):
            if v <= b:
                self.counts[i] += 1
                return
        self.counts[-1] += 1

    def prometheus(self, name: str) -> str:
        out, cum = [], 0
        for b, c in zip(self.buckets, self.counts):
            cum += c
            out.append(f'{name}_bucket{{le="{b}"}} {cum}')
        out.append(f'{name}_bucket{{le="+Inf"}} {self.n}')
        out.append(f"{name}_sum {self.total}")
        out.append(f"{name}_count {self.n}")
        return "\n".join(out)


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
    typical_p: float = 1.0
    top_n_sigma: float = 0.0
    xtc_probability: float = 0.0
    xtc_threshold: float = 0.1
    repeat_penalty: float = 1.0
    freq_penalty: float = 0.0
    presence_penalty: float = 0.0
    dry_multiplier: float = 0.0
    dry_base: float = 1.75
    dry_allowed_length: int = 2
    dynatemp_range: float = 0.0
    dynatemp_exponent: float = 1.0
    mirostat: int = 0  # 0 off, 2 = mirostat-v2 (v1 maps to v2)
    mirostat_tau: float = 5.0
    mirostat_eta: float = 0.1
    seed: int = -1
    n_keep: int = 0  # tokens preserved by context shift
    # multimodal: [(start_offset, [n, n_embd] image embeddings), ...];
    # prompt_tokens carry placeholder ids over those spans (reference:
    # mtmd chunks eval'd as embd batches, tools/mtmd/mtmd-helper.cpp)
    media: list = field(default_factory=list)
    stop_tokens: frozenset = frozenset()
    stop_strings: tuple = ()
    stream_q: "queue.Queue" = field(default_factory=queue.Queue)
    rid: str = field(default_factory=lambda: uuid.uuid4().hex[:12])
    # results
    done: bool = False
    out_tokens: list[int] = field(default_factory=list)
    finish_reason: str = ""
    error: str = ""
    n_prompt_reused: int = 0
    stop_trim_chars: int = -1  # char offset of the matched stop string in the text
    _text: str = ""  # decoded-so-far (stop-string scanning only)
    _stopdec: object = None  # IncrementalDecoder for _text
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
    generated: int = 0
    # tokens whose K/V currently live in this slot's cache rows [0, pos)
    cache_tokens: list[int] = field(default_factory=list)
    # media prompts poison prefix matching (placeholder ids stand in for
    # image spans), so their cache is never offered for reuse
    no_reuse: bool = False


def _common_prefix(a: list[int], b: list[int]) -> int:
    n = min(len(a), len(b))
    i = 0
    while i < n and a[i] == b[i]:
        i += 1
    return i


class Engine:
    def __init__(self, model, n_slots: int = 4, max_len: int = 2048, prefill_chunk: int = 128,
                 kv_dtype=None, prefix_reuse: bool = True, context_shift="auto",
                 speculative: bool = False, n_draft: int = 6, kv_layout: str = "auto",
                 draft_model=None, tp: int = 1, dp: int = 1, pp: int = 1, mesh=None,
                 coordinated: bool = False, lookahead: bool = False, la_w: int = 4,
                 la_n: int = 3, la_g: int = 4):
        import functools

        import jax
        import jax.numpy as jnp

        from ..models.llama import forward
        from ..runtime.kvcache import KVCache
        from ..sampling.batched import SlotParams

        self.model = model
        if getattr(model.cfg, "is_diffusion", False):
            raise ValueError(
                "diffusion LMs (dream/llada) have no KV cache; generate with "
                "tools/diffusion.py")
        self.n_slots = n_slots
        self.max_len = max_len
        self.prefill_chunk = prefill_chunk
        self.recurrent = model.cfg.is_recurrent
        self.hybrid = model.cfg.is_hybrid
        # "auto" kv layout: the paged pool decodes at parity with the
        # contiguous stripe since the fused page-insert+attend kernel
        # (round 4 A/B: 828 vs 827 tok/s) and adds cross-slot prefix-page
        # sharing, so it is the default wherever it is supported; features
        # that require the contiguous stripe (mesh/pp serving, q8 KV,
        # SWA ring, speculation, coordination) fall back automatically.
        if kv_layout == "auto":
            # tp shards the paged pools on their head axis (parallel.tp
            # kv_spec), so pure-tp meshes keep the paged default and its
            # prefix-page sharing; dp>1 needs the batch-striped contiguous
            # stripe (page pools hold every slot's pages)
            kv_layout = "paged" if (
                not self.recurrent and not self.hybrid
                and mesh is None and (dp or 1) <= 1 and (pp or 1) <= 1
                and not isinstance(kv_dtype, str)
                and model.cfg.sliding_window == 0
                and model.cfg.kv_heads_layers is None
                and model.cfg.mla is None  # latent-suffix V view needs the stripe
                and not speculative and draft_model is None and not coordinated
                and not lookahead
            ) else "contiguous"
        self.paged = kv_layout == "paged" and not self.recurrent and not self.hybrid
        if self.paged and model.cfg.mla is not None:
            raise ValueError("MLA models read V as a latent-suffix view of the "
                             "contiguous K stripe; use kv_layout='contiguous'")
        # multi-device serving: shard weights/KV over a (dp, tp) mesh and run
        # the jitted shard_map step inside the same slot loop (the TPU-native
        # counterpart of the reference's LLAMA_SPLIT_MODE_LAYER/ROW serving,
        # include/llama.h:193-196 + ggml-backend.cpp sched pipelining)
        self.mesh = mesh
        # pipeline-parallel serving: layer-split stages over a "pp" mesh
        # axis, GPipe microbatch rotation inside one jitted shard_map step
        # (the reference's DEFAULT multi-device mode — LLAMA_SPLIT_MODE_LAYER,
        # include/llama.h:193-196 + ggml-backend.cpp:712-718 microbatch
        # overlap).  Slots map 1:1 to pipeline KV rows, so the slot loop,
        # sampling, and prefix reuse run unchanged; context shift, state
        # save, speculation, and q8/paged layouts are rejected explicitly.
        self.pp = int(pp or 1)
        if self.pp > 1:
            if mesh is not None or (tp or 1) * (dp or 1) > 1:
                raise ValueError("pp serving does not compose with --tp/--dp yet")
            if self.recurrent or self.hybrid:
                raise ValueError("pp serving supports standard attention models only")
            if self.paged:
                raise ValueError("pp serving requires the contiguous KV layout")
            if isinstance(kv_dtype, str):
                raise ValueError("pp serving does not support the q8 KV cache")
            if speculative or draft_model is not None:
                raise ValueError("pp serving does not support speculative decoding")
            if coordinated:
                raise ValueError("pp serving does not compose with coordinated mode")
            if n_slots % self.pp != 0:
                raise ValueError(f"n_slots ({n_slots}) must divide by pp ({self.pp})")
            context_shift = False
        if mesh is None and (tp or 1) * (dp or 1) > 1:
            from ..parallel import make_mesh

            self.mesh = make_mesh(jax.devices()[: tp * dp], dp=dp, tp=tp)
        if self.mesh is not None:
            n_dp = int(np.prod([self.mesh.shape[a] for a in self.mesh.axis_names
                                if a != "tp"]))
            if self.paged and n_dp > 1:
                # page pools hold every slot's pages; only the head axis
                # (tp) can shard them — batch striping needs the
                # contiguous layout
                raise ValueError("paged KV shards over tp only; use "
                                 "kv_layout='contiguous' with dp")
            if n_slots % max(n_dp, 1) != 0:
                raise ValueError(f"n_slots ({n_slots}) must divide by dp ({n_dp})")
        if self.recurrent or self.hybrid:
            # recurrent memory is not prefix-addressable and (for the
            # mamba layers) cannot context-shift; spec-verify would need
            # state rollback
            prefix_reuse = False
            speculative = False
            context_shift = False
        self.prefix_reuse = prefix_reuse
        # n-gram (prompt-lookup) speculation inside the batched decode step
        # (reference: server speculative decoding, server-context.cpp:651-786
        # + examples/lookup); drafts ride as extra batch columns and the
        # verify IS the decode forward — greedy slots only, so accepted
        # output is bit-identical to plain decode
        # draft-model speculation (reference: common/speculative.cpp + the
        # per-slot draft contexts in server-context.cpp:651-786): a small
        # model drafts the block instead of the n-gram lookup; verification
        # is the same batched target forward, so accepted output stays
        # bit-identical to plain greedy decode
        self.draft = draft_model
        if draft_model is not None and not (self.recurrent or self.hybrid):
            speculative = True
        # lookahead decoding in the serving loop (reference:
        # examples/lookahead/lookahead.cpp LADE): greedy slots carry a
        # Jacobi window + verification n-grams as extra batch columns with
        # an explicit block mask; acceptance is greedy-exact.  Requires the
        # contiguous slot==position cache (speculative columns store K/V in
        # the prefill-chunk headroom past the committed region).
        self.lookahead = lookahead and not (self.recurrent or self.hybrid)
        if self.lookahead:
            if speculative or draft_model is not None:
                raise ValueError("--lookahead and speculative decoding are exclusive")
            if self.mesh is not None or self.pp > 1 or coordinated:
                raise ValueError("lookahead serving is single-device only")
            if kv_layout == "paged":
                raise ValueError("lookahead requires the contiguous KV layout")
            if isinstance(kv_dtype, str):
                raise ValueError("lookahead does not support the q8 KV cache")
            if model.cfg.sliding_window != 0 or model.cfg.kv_heads_layers is not None:
                raise ValueError("lookahead supports uniform standard attention only")
        self.la_n, self.la_w, self.la_g = int(la_n), int(la_w), int(la_g)
        if self.lookahead and (self.la_n < 2 or self.la_w < 1 or self.la_g < 1):
            raise ValueError("lookahead needs la_n >= 2, la_w >= 1, la_g >= 1")
        # spec-slot region must fit the prefill-chunk headroom past max_len
        if self.lookahead:
            t_spec = self.la_n + (self.la_w + self.la_g) * (self.la_n - 1)
            if t_spec > prefill_chunk:
                raise ValueError(
                    f"lookahead geometry needs {t_spec} spec slots > prefill_chunk "
                    f"({prefill_chunk}) cache headroom")
        self._la: dict[int, dict] = {}  # per-slot Jacobi window / gram pool
        self._la_fn = None
        self.speculative = speculative
        self.n_draft = min(n_draft, prefill_chunk - 1)
        cfg = model.cfg
        # kv_dtype: a jnp dtype, or the string "q8"/"q8_0" for the int8
        # quantized cache (reference: llama_context_params.type_k/type_v,
        # include/llama.h cache-type flags; north-star config 3 = Q4_K
        # weights + Q8_0 KV continuous batching)
        self.kv_quant = isinstance(kv_dtype, str)
        if self.kv_quant:
            if kv_dtype.lower() not in ("q8", "q8_0"):
                raise ValueError(f"unsupported kv_dtype {kv_dtype!r} (use 'q8' or a jnp dtype)")
            kv_dtype = None
        kv_dtype = kv_dtype or jnp.bfloat16
        # trash region [max_len, max_len + prefill_chunk) past the
        # attendable horizon: inactive rows during a chunked prefill write
        # their dummy K/V at position max_len, and because the dynamic-
        # update-slice start clamps to S - T = max_len, a [T]-token trash
        # write stays entirely inside the region — it can never overwrite a
        # live slot of a stalled GENERATING row (attendable slots are
        # strictly < max_len)
        self.context_shift = context_shift if context_shift != "auto" else True
        if getattr(cfg, "altup", None) is not None:
            # gemma3n: shared-KV tail layers read earlier layers' full
            # cache rows — the SWA ring and the re-rotating shift would
            # desync them, so the contiguous cache + length-finish is used
            self.context_shift = False
        if self.kv_quant and (self.hybrid or self.recurrent or kv_layout == "paged"
                              or cfg.sliding_window > 0):
            raise ValueError("kv_dtype='q8' requires a standard-attention model "
                             "with the contiguous KV layout")
        if self.pp > 1:
            from ..parallel.pp import (
                make_pp_mesh, pp_forward_fn, pp_kv_create, pp_put, stage_params,
            )

            self.context_shift = False
            self.pp_mesh = make_pp_mesh(jax.devices()[: self.pp], pp=self.pp)
            n_micro = self.pp  # one microbatch in flight per stage
            shared, stages = stage_params(model.params, self.pp)
            shared, stages = pp_put(shared, stages, self.pp_mesh)
            self._p = (shared, stages)
            # KV rows = slots (+ the per-microbatch trash rows pp_kv_create
            # appends); S carries the engine's past-horizon trash region
            self.kv = pp_kv_create(cfg, self.pp_mesh, n_micro, n_slots,
                                   max_len + prefill_chunk, kv_dtype)
            _pp_all = pp_forward_fn(cfg, self.pp_mesh, n_micro,
                                    with_kv=True, logits_for="all")
            _pp_last = pp_forward_fn(cfg, self.pp_mesh, n_micro,
                                     with_kv=True, logits_for="last")

            def _ppstep(params, tokens, positions, kv, logits_for="last"):
                sh, stg = params
                logits, kvk, kvv = (
                    _pp_all if logits_for == "all" else _pp_last
                )(sh, stg, tokens, positions, *kv)
                return logits, (kvk, kvv)

            self._step = _ppstep
        elif self.hybrid:
            # jamba: KV cache over the attention-layer subset + per-slot
            # recurrent state for the mamba layers (reference:
            # llama_memory_hybrid, src/llama-memory-hybrid.cpp)
            from ..models.hybrid import hybrid_forward, make_hybrid_state

            self.context_shift = False
            self.kv = KVCache.create(
                cfg.n_attn_layers, n_slots, max_len + prefill_chunk,
                cfg.n_kv_heads, cfg.head_dim, kv_dtype,
            )
            self.rstate = make_hybrid_state(cfg, n_slots)

            @functools.partial(jax.jit, donate_argnums=(4, 5))
            def _hstep(params, tokens, positions, lengths, kv, state):
                return hybrid_forward(params, cfg, tokens, positions, kv, state,
                                      lengths=lengths, logits_for="all")

            self._step = _hstep
        elif self.recurrent:
            # per-slot recurrent memory instead of a KV cache (reference:
            # llama_memory_recurrent, src/llama-memory-recurrent.cpp);
            # mixed prefill+decode batching stays safe because the forward
            # freezes each row's state after `lengths` valid tokens
            from ..models.recurrent import make_state, recurrent_forward

            self.context_shift = False
            self.kv = make_state(cfg, n_slots)

            @functools.partial(jax.jit, donate_argnums=(3,))
            def _rstep(params, tokens, lengths, state):
                return recurrent_forward(params, cfg, tokens, state, lengths=lengths, logits_for="all")

            self._step = _rstep
        elif kv_layout == "paged":
            # shared page pool + per-slot page tables (reference:
            # cell-indexed unified cache, src/llama-kv-cache.h:182-200);
            # full prefix pages are shared ACROSS slots read-only, so a
            # common prefix is neither stored nor prefilled twice
            from ..runtime.paged import PageAllocator, PagedKVCache

            page_size = 128
            max_len = ((max_len + page_size - 1) // page_size) * page_size
            self.max_len = max_len
            self.alloc = PageAllocator(n_slots, max_len, page_size)
            for i in range(n_slots):
                self.alloc.assign_slot(i, None, 0)
            self.kv = PagedKVCache.create(
                cfg.n_layers, n_slots, max_len, cfg.n_kv_heads, cfg.head_dim,
                kv_dtype, page_size=page_size,
            ).with_table(self.alloc.table)
            # context shift works through the page table (gather -> slide +
            # re-rotate K -> scatter into the same pages); _shift_slot
            # additionally requires the pages to be exclusively owned
        elif cfg.sliding_window > 0 and cfg.altup is None and context_shift in ("auto", False):
            # pruned ring cache for SWA layers (reference: iswa dual cache)
            # — old context drops out of the ring natively, so the K-
            # re-rotating context shift is neither needed nor supported
            from ..runtime.kvcache import KVCacheSWA

            self.kv = KVCacheSWA.create_swa(cfg, n_slots, max_len, prefill_chunk, kv_dtype)
            self.context_shift = False
        elif self.kv_quant:
            from ..runtime.kvcache import KVCacheQ8

            self.kv = KVCacheQ8.create(
                cfg.n_layers, n_slots, max_len + prefill_chunk, cfg.n_kv_heads, cfg.head_dim
            )
        elif cfg.kv_heads_layers is not None:
            # deci/nemotron-nas: per-layer GQA widths (0 = linear/dummy)
            self.kv = KVCache.create_varied(
                n_slots, max_len + prefill_chunk, list(cfg.kv_heads_layers),
                cfg.head_dim, kv_dtype,
            )
        else:
            self.kv = KVCache.create(
                cfg.n_layers, n_slots, max_len + prefill_chunk, cfg.n_kv_heads, cfg.head_dim, kv_dtype
            )

        if self.pp == 1:
            self._p = model.params
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as _P

            from ..parallel import kv_spec, shard_params, sharded_forward_fn

            self._p, leaf_specs, plan = shard_params(model.params, self.mesh, cfg)
            self.plan = plan
            if self.recurrent or self.hybrid:
                # recurrent/hybrid under the mesh: state tensors are all
                # batch-leading, so they shard over the data axes; hybrid
                # attention layers' KV shards heads over tp like any
                # standard model (the recurrent layers' weights replicate
                # unless the plan shards them by key).  This lifts the
                # round-4 standard-attention-only gate.
                from ..parallel.tp import _batch_axes

                baxes = _batch_axes(self.mesh)
                bspec = _P(baxes)
                state_sh = NamedSharding(self.mesh, bspec)
                ep = "tp" if plan.moe else None
                if self.recurrent:
                    from ..models.recurrent import recurrent_forward as _rfwd

                    self._kv_sharding = state_sh
                    self.kv = jax.device_put(self.kv, state_sh)

                    def _rfn(params, tokens, lengths, state):
                        return _rfwd(params, cfg, tokens, state,
                                     lengths=lengths, logits_for="all")

                    mapped = jax.shard_map(
                        _rfn, mesh=self.mesh,
                        in_specs=(leaf_specs, _P(baxes, None), bspec, bspec),
                        out_specs=(_P(baxes, None, None), bspec),
                        check_vma=False)
                    self._step = jax.jit(mapped, donate_argnums=(3,))
                else:
                    from ..models.hybrid import hybrid_forward as _hfwd

                    kspec = kv_spec(plan, self.mesh)
                    self._kv_sharding = NamedSharding(self.mesh, kspec)
                    self.kv = jax.device_put(self.kv, self._kv_sharding)
                    self._rstate_sharding = state_sh
                    self.rstate = jax.device_put(self.rstate, state_sh)

                    def _hfn(params, tokens, positions, lengths, kv, state):
                        return _hfwd(params, cfg, tokens, positions, kv, state,
                                     lengths=lengths, logits_for="all",
                                     ep_axis=ep)

                    mapped = jax.shard_map(
                        _hfn, mesh=self.mesh,
                        in_specs=(leaf_specs, _P(baxes, None), _P(baxes, None),
                                  bspec, kspec, bspec),
                        out_specs=(_P(baxes, None, None), kspec, bspec),
                        check_vma=False)
                    self._step = jax.jit(mapped, donate_argnums=(4, 5))
            else:
                kspec = kv_spec(plan, self.mesh, self.kv)
                if isinstance(kspec, _P):
                    self._kv_sharding = NamedSharding(self.mesh, kspec)
                else:  # paged: per-leaf spec pytree (pools on tp, table replicated)
                    self._kv_sharding = jax.tree_util.tree_map(
                        lambda s: NamedSharding(self.mesh, s), kspec,
                        is_leaf=lambda x: isinstance(x, _P))
                self.kv = jax.device_put(self.kv, self._kv_sharding)
                # coordinated multi-host serving: rank 0 samples every row
                # but only addresses its local shards -> gather logits in-map
                _s_all = sharded_forward_fn(cfg, self.mesh, leaf_specs, plan,
                                            with_kv=True, logits_for="all",
                                            replicate_logits=coordinated,
                                            with_stats=plan.moe, kv_tree=self.kv)
                _s_last = sharded_forward_fn(cfg, self.mesh, leaf_specs, plan,
                                             with_kv=True, logits_for="last",
                                             replicate_logits=coordinated,
                                             with_stats=plan.moe, kv_tree=self.kv)
                if plan.moe:
                    # EP capacity-drop counter accumulates ON DEVICE (a host
                    # fetch per step would add a tunnel roundtrip); /metrics
                    # reads it lazily via metrics_view()
                    self._ep_dropped = jnp.zeros((), jnp.int32)

                def _step(params, tokens, positions, kv, logits_for="last"):
                    out = (_s_all if logits_for == "all" else _s_last)(
                        params, tokens, positions, kv
                    )
                    if len(out) == 3:
                        logits, kv, dropped = out
                        self._ep_dropped = self._ep_dropped + dropped
                        return logits, kv
                    return out

                self._step = _step
        elif self.pp == 1 and not self.recurrent and not self.hybrid:
            @functools.partial(jax.jit, static_argnames=("logits_for",), donate_argnums=(3,))
            def _step(params, tokens, positions, kv, logits_for="last"):
                return forward(params, cfg, tokens, positions, kv, logits_for=logits_for)

            self._step = _step

        self._dp = self.draft.params if self.draft is not None else None
        self._step_mm = None  # lazy media-aware mixed step (mtmd serving)
        if self.draft is not None and self.speculative:
            dcfg = self.draft.cfg
            self.dkv = KVCache.create(
                dcfg.n_layers, n_slots, max_len + prefill_chunk,
                dcfg.n_kv_heads, dcfg.head_dim, kv_dtype,
            )
            self._draft_seen = [0] * n_slots

            if self.mesh is not None:
                from jax.sharding import NamedSharding

                from ..parallel import kv_spec, shard_params, sharded_forward_fn

                self._dp, dspecs, dplan = shard_params(self.draft.params, self.mesh, dcfg)
                self.dkv = jax.device_put(
                    self.dkv, NamedSharding(self.mesh, kv_spec(dplan, self.mesh))
                )
                _d_all = sharded_forward_fn(dcfg, self.mesh, dspecs, dplan,
                                            with_kv=True, logits_for="all")

                @jax.jit
                def _dpick(logits):
                    return jnp.argmax(logits, axis=-1).astype(jnp.int32)

                def _dstep(params, tokens, positions, kv):
                    logits, kv = _d_all(params, tokens, positions, kv)
                    return _dpick(logits), kv
            else:
                @functools.partial(jax.jit, donate_argnums=(3,))
                def _dstep(params, tokens, positions, kv):
                    logits, kv = forward(params, dcfg, tokens, positions, kv, logits_for="all")
                    return jnp.argmax(logits, axis=-1).astype(jnp.int32), kv

            self._dstep = _dstep

        # multi-host CB schedule coordination (SURVEY hard part #4): rank 0
        # broadcasts (op, kind, tokens, positions) before every device step
        # so every process of a dcn mesh replays the identical ubatch
        self.coordinator = None
        if coordinated:
            if self.recurrent or self.hybrid or self.paged or speculative:
                raise ValueError(
                    "coordinated serving supports the standard contiguous-KV "
                    "attention path only")
            # context shift / slot restore mutate device KV outside the
            # broadcast step stream and would desync follower caches
            self.context_shift = False
            from ..parallel.coordinator import StepCoordinator

            self.coordinator = StepCoordinator(n_slots, prefill_chunk)

        # device-side per-row logit pick + batched sampler chain
        from ..sampling import batched as _batched

        @jax.jit
        def _pick(logits, cols):
            return jnp.take_along_axis(logits, cols[:, None, None], axis=1)[:, 0]

        self._pick = _pick
        self._sample_batch = _batched.sample_batch
        self._params = SlotParams(n_slots)
        self._br_mask = jnp.asarray(
            _batched.breaker_mask(model.tokenizer, cfg.vocab_size)
        )
        self._keys = jnp.stack([jax.random.PRNGKey(i) for i in range(n_slots)])
        self._recent = np.full((n_slots, PENALTY_WINDOW), -1, np.int32)
        self._mu = np.full((n_slots,), 10.0, np.float32)  # mirostat-v2 state
        self._jnp = jnp
        self._jax = jax

        self.slots = [_Slot(idx=i) for i in range(n_slots)]
        self.pending: "queue.Queue[Request]" = queue.Queue()
        self._control: "queue.Queue" = queue.Queue()  # callables run on the engine thread
        self._stop = False
        self._wake = threading.Event()
        self.metrics = {
            "requests_total": 0,
            "tokens_generated_total": 0,
            "tokens_prefilled_total": 0,
            "tokens_prefix_reused_total": 0,
            "decode_steps_total": 0,
            "prefill_steps_total": 0,
            "context_shifts_total": 0,
            "pages_cow_unshared_total": 0,
            "engine_errors_total": 0,
            "spec_drafted_total": 0,
            "spec_accepted_total": 0,
            "lookahead_steps_total": 0,
            "lookahead_accepted_total": 0,
        }
        self.hist_ttft = Histogram()  # time to first token (s)
        self.hist_per_token = Histogram((0.001, 0.0025, 0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0))
        self.hist_request = Histogram()
        self.thread = threading.Thread(target=self._loop, daemon=True, name="zllm-engine")

    # -- public API ---------------------------------------------------------
    def start(self):
        self.thread.start()

    def stop(self):
        self._stop = True
        self._wake.set()
        self.thread.join(timeout=30)

    def submit(self, req: Request) -> Request:
        if not self.recurrent and len(req.prompt_tokens) >= self.max_len:
            raise ValueError(f"prompt ({len(req.prompt_tokens)}) exceeds context ({self.max_len})")
        if req.media and (self.mesh is not None or self.pp > 1
                          or self.recurrent or self.hybrid):
            raise ValueError("multimodal requests are supported on the "
                             "single-device dense engine only")
        self.metrics["requests_total"] += 1
        self.pending.put(req)
        self._wake.set()
        return req

    def run_in_loop(self, fn):
        """Execute fn() on the engine thread between steps; returns result
        (the mechanism behind /slots save-restore — cache mutations must
        not race the step)."""
        if not self.thread.is_alive():
            return fn()
        done = threading.Event()
        box = {}

        def wrapper():
            try:
                box["result"] = fn()
            except Exception as e:  # noqa: BLE001
                box["error"] = e
            done.set()

        self._control.put(wrapper)
        self._wake.set()
        if not done.wait(timeout=120):
            raise TimeoutError("engine control task timed out")
        if "error" in box:
            raise box["error"]
        return box.get("result")

    def metrics_view(self) -> dict:
        """Counters incl. lazily-fetched device accumulators (EP drops)."""
        m = dict(self.metrics)
        if getattr(self, "_ep_dropped", None) is not None:
            m["ep_dropped_total"] = int(self._ep_dropped)
        return m

    def slot_info(self) -> list[dict]:
        return [
            {
                "id": s.idx,
                "state": s.state.name.lower(),
                "n_past": s.pos,
                "n_cached": len(s.cache_tokens),
                "request": s.req.rid if s.req else None,
                "generated": s.generated,
            }
            for s in self.slots
        ]

    def save_slot(self, idx: int, path: str):
        from ..runtime import state as st

        if self.recurrent or self.hybrid:
            raise ValueError("slot save/restore is not supported for recurrent models")
        if self.pp > 1:
            raise ValueError("slot save/restore is not supported under pp serving")

        def do():
            s = self.slots[idx]
            st.seq_save_file(path, self.model, self.kv, idx, s.pos)
            return {"id": idx, "n_past": s.pos, "filename": path}

        return self.run_in_loop(do)

    def restore_slot(self, idx: int, path: str, tokens: list[int] | None = None):
        from ..runtime import state as st

        if self.recurrent or self.hybrid:
            raise ValueError("slot save/restore is not supported for recurrent models")
        if self.pp > 1:
            raise ValueError("slot save/restore is not supported under pp serving")

        def do():
            s = self.slots[idx]
            if s.state != SlotState.IDLE:
                raise ValueError(f"slot {idx} is busy")
            self.kv, n_past = st.seq_load_file(path, self.model, self.kv, idx)
            s.pos = n_past
            s.cache_tokens = list(tokens or [])[:n_past]
            return {"id": idx, "n_past": n_past}

        return self.run_in_loop(do)

    def erase_slot(self, idx: int):
        def do():
            s = self.slots[idx]
            if s.state != SlotState.IDLE:
                raise ValueError(f"slot {idx} is busy")
            s.pos = 0
            s.cache_tokens = []
            return {"id": idx}

        return self.run_in_loop(do)

    # -- engine loop --------------------------------------------------------
    def _admit(self):
        while True:
            idle = [s for s in self.slots if s.state == SlotState.IDLE]
            if not idle:
                return
            try:
                req = self.pending.get_nowait()
            except queue.Empty:
                return
            # choose the idle slot with the longest reusable prefix
            # (reference: slot selection by prompt similarity)
            best, best_n = idle[0], 0
            if self.prefix_reuse and not req.media:
                for s in idle:
                    if s.no_reuse:
                        continue
                    ncp = _common_prefix(s.cache_tokens, req.prompt_tokens)
                    if ncp > best_n:
                        best, best_n = s, ncp
            src_slot = best
            if self.paged and self.prefix_reuse and not req.media:
                # paged cache: full prefix pages can be shared from ANY
                # slot (even a busy one — full pages are immutable), so
                # search all of them, not just the idle pool
                for s in self.slots:
                    if s.no_reuse:
                        continue
                    ncp = _common_prefix(s.cache_tokens, req.prompt_tokens)
                    if ncp > best_n:
                        src_slot, best_n = s, ncp
                        if s.state == SlotState.IDLE:
                            best = s
            # keep >= 1 token to prefill so the step yields next-token logits
            n_reuse = min(best_n, len(req.prompt_tokens) - 1)
            from ..runtime.kvcache import KVCacheSWA

            if isinstance(self.kv, KVCacheSWA):
                # ring writes must stay chunk-aligned (no mid-run wrap)
                n_reuse -= n_reuse % self.prefill_chunk
            if self.paged:
                # only FULL pages are shareable/retainable
                n_reuse -= n_reuse % self.alloc.ps
            if n_reuse < 16:  # not worth the bookkeeping below this
                n_reuse = 0
            slot = best
            if self.paged:
                if n_reuse > 0 and src_slot is not slot:
                    self.alloc.assign_slot(slot.idx, src_slot.idx, n_reuse // self.alloc.ps)
                    self.kv = self.kv.with_table(self.alloc.table)
                elif n_reuse == 0:
                    # fresh mapping (drops any retained pages of this slot)
                    self.alloc.assign_slot(slot.idx, None, 0)
                    self.kv = self.kv.with_table(self.alloc.table)
                # n_reuse > 0 and src is the slot itself: keep its mapping
            if self.recurrent:
                # fresh recurrent memory for the new sequence (reference:
                # llama_memory_seq_rm on the recurrent cache)
                from ..models.recurrent import reset_rows

                self.kv = reset_rows(self.kv, [slot.idx])
                if self.mesh is not None:  # pin back for the donated step
                    self.kv = self._jax.device_put(self.kv, self._kv_sharding)
            elif self.hybrid:
                from ..models.recurrent import reset_rows

                self.rstate = reset_rows(self.rstate, [slot.idx])
                if self.mesh is not None:
                    self.rstate = self._jax.device_put(
                        self.rstate, self._rstate_sharding)
            if self.draft is not None and self.speculative:
                self._draft_seen[slot.idx] = 0  # full catch-up on first spec
            self._la.pop(slot.idx, None)  # fresh Jacobi window per request
            slot.req = req
            slot.state = SlotState.PROMPT
            slot.pos = n_reuse
            slot.cache_tokens = req.prompt_tokens[:n_reuse]
            slot.prompt_left = list(req.prompt_tokens[n_reuse:])
            slot.generated = 0
            slot.no_reuse = bool(req.media)
            req.n_prompt_reused = n_reuse
            self.metrics["tokens_prefix_reused_total"] += n_reuse
            # per-slot sampling params + RNG key + penalty window
            self._params.set_slot(slot.idx, req)
            self._mu[slot.idx] = 2.0 * getattr(req, "mirostat_tau", 5.0)
            seed = req.seed if req.seed >= 0 else int(time.time_ns() & 0x7FFFFFFF) + slot.idx
            self._keys = self._keys.at[slot.idx].set(self._jax.random.PRNGKey(seed))
            hist = req.prompt_tokens[-PENALTY_WINDOW:]
            self._recent[slot.idx] = -1
            if hist:
                self._recent[slot.idx, -len(hist):] = hist

    def _finish(self, slot: _Slot, reason: str, error: str = ""):
        req = slot.req
        req.finish_reason = reason
        req.error = error
        req.done = True
        req.t_done = time.time()
        if req.t_first_token:
            self.hist_ttft.observe(req.t_first_token - req.t_submit)
            if len(req.out_tokens) > 1:
                self.hist_per_token.observe(
                    (req.t_done - req.t_first_token) / (len(req.out_tokens) - 1)
                )
        self.hist_request.observe(req.t_done - req.t_submit)
        req.stream_q.put(None)  # sentinel
        slot.state = SlotState.IDLE
        slot.req = None

    def _loop(self):
        while not self._stop:
            try:
                self._step_once()
            except Exception as e:  # noqa: BLE001
                # decode failure must not kill the engine thread: error out
                # in-flight requests, keep serving (reference rolls back the
                # failed ubatch and returns a typed error)
                self.metrics["engine_errors_total"] += 1
                msg = f"{type(e).__name__}: {e}"
                for s in self.slots:
                    if s.req is not None:
                        s.cache_tokens = []
                        s.pos = 0
                        self._finish(s, "error", msg)
        if self.coordinator is not None and self.coordinator.is_leader:
            self.coordinator.publish_stop()  # release follower processes

    def run_follower(self):
        """Follower-process loop for coordinated multi-host serving: replay
        every schedule rank 0 broadcasts through the SAME jitted sharded
        step, keeping this process's KV/mesh shards in lockstep.  Blocks
        until the leader publishes OP_STOP.  The follower has no HTTP
        front-end, no slot machine, and never samples — logits are computed
        (they are a by-product of the sharded step) and dropped."""
        from ..parallel.coordinator import KIND_DECODE, OP_STOP

        assert self.coordinator is not None and not self.coordinator.is_leader
        jnp = self._jnp
        while True:
            op, kind, toks, pos = self.coordinator.recv()
            if op == OP_STOP:
                return
            lf = "last" if kind == KIND_DECODE else "all"
            _, self.kv = self._step(
                self._p, jnp.asarray(toks), jnp.asarray(pos), self.kv, logits_for=lf
            )

    def _step_once(self):
        # control tasks (slot save/restore) run between steps
        while True:
            try:
                self._control.get_nowait()()
            except queue.Empty:
                break
        self._admit()
        prompt_slots = [s for s in self.slots if s.state == SlotState.PROMPT]
        gen_slots = [s for s in self.slots if s.state == SlotState.GENERATING]

        if not prompt_slots and not gen_slots:
            self._wake.wait(timeout=0.05)
            self._wake.clear()
            return

        if self.lookahead and self._la:
            # accepted-but-uningested lookahead tokens must enter the cache
            # before any step that isn't lookahead-shaped (prompt mixing,
            # context shift) reads or moves the committed region
            pend = [s for s in gen_slots if self._la.get(s.idx, {}).get("extra")]
            if pend and (prompt_slots or any(
                    s.pos + len(self._la[s.idx]["extra"]) + 1 >= self.max_len
                    for s in pend)):
                self._flush_la_extras(pend)

        if not self.recurrent:
            for s in gen_slots:
                if s.pos + 1 >= self.max_len:
                    self._shift_slot(s)

        if self.recurrent:
            self._recurrent_step(prompt_slots or None, gen_slots)
        elif self.hybrid:
            self._hybrid_step(prompt_slots or None, gen_slots)
        elif prompt_slots:
            self._mixed_step(prompt_slots, gen_slots)
        elif self.speculative and any(self._can_spec(s) for s in gen_slots):
            self._spec_decode_step(gen_slots)
        elif self.lookahead and any(
                self._can_la(s) or self._la.get(s.idx, {}).get("extra")
                for s in gen_slots):
            self._lookahead_step(gen_slots)
        else:
            self._decode_step(gen_slots)

    def _shift_slot(self, slot: _Slot):
        """Discard the oldest half of the slot's window, keep n_keep."""
        if not self.context_shift:
            self._finish(slot, "length")
            return
        if self.paged and not self.alloc.exclusively_owned(slot.idx):
            # shared prefix pages would be rewritten in place by the shift:
            # copy-on-write unshare them first (fresh private pages + device
            # page copies) so long-running slots that once shared a prefix
            # keep generating instead of dying at the window edge
            try:
                copies = self.alloc.unshare_slot(slot.idx)
            except IndexError:
                self._finish(slot, "length")  # page pool exhausted
                return
            self.kv = self.kv.copy_pages(copies).with_table(self.alloc.table)
            self.metrics["pages_cow_unshared_total"] += len(copies)
        from ..runtime.kvcache import shift_context_row

        n_keep = slot.req.n_keep if slot.req else 0
        n_discard = max((self.max_len - n_keep) // 2, 1)
        self.kv = shift_context_row(
            self.kv, self.model.cfg.rope, slot.idx, n_keep, n_discard, horizon=self.max_len
        )
        if self.mesh is not None:
            # the eager shift runs under sharding propagation; pin the result
            # back to the canonical KV sharding so the donated step sees it
            self.kv = self._jax.device_put(self.kv, self._kv_sharding)
        slot.pos -= n_discard
        slot.cache_tokens = slot.cache_tokens[:n_keep] + slot.cache_tokens[n_keep + n_discard :]
        self.metrics["context_shifts_total"] += 1

    def _mixed_step(self, prompt_slots, gen_slots):
        """One [n_slots, chunk] step: every PROMPT slot's next chunk rides
        in its own row, plus one decode token for every generating slot
        (column 0).  The step always computes the dense [n_slots, chunk]
        grid, so packing all prompt slots is free — N simultaneous arrivals
        prefill concurrently instead of serially (reference packs chunks
        from all PROCESSING_PROMPT slots into one batch,
        tools/server/server-context.cpp:2114-2514)."""
        jnp = self._jnp
        toks = np.zeros((self.n_slots, self.prefill_chunk), dtype=np.int32)
        pos = np.full((self.n_slots, self.prefill_chunk), self.max_len, dtype=np.int32)  # trash
        chunks = {}
        for ps in prompt_slots:
            chunk_real = min(self.prefill_chunk, len(ps.prompt_left))
            chunks[ps.idx] = chunk_real
            toks[ps.idx, :chunk_real] = ps.prompt_left[:chunk_real]
            pos[ps.idx, :chunk_real] = np.arange(ps.pos, ps.pos + chunk_real)
        for s in gen_slots:
            toks[s.idx, 0] = s.last_token
            pos[s.idx, 0] = s.pos

        # multimodal: fill image-embedding rows for any prompt chunk that
        # overlaps a media span (reference: mtmd-helper evals image chunks
        # as embd batches between text batches; here they ride the same
        # dense grid via a row mask)
        emb_grid = None
        for ps in prompt_slots:
            req = ps.req
            if req is None or not req.media:
                continue
            done = len(req.prompt_tokens) - len(ps.prompt_left)
            chunk_real = chunks[ps.idx]
            for start, emb in req.media:
                lo = max(start, done)
                hi = min(start + len(emb), done + chunk_real)
                if lo >= hi:
                    continue
                if emb_grid is None:
                    n_embd = int(self.model.cfg.n_embd)
                    emb_grid = np.zeros(
                        (self.n_slots, self.prefill_chunk, n_embd), np.float32)
                    emask = np.zeros((self.n_slots, self.prefill_chunk), bool)
                emb_grid[ps.idx, lo - done : hi - done] = emb[lo - start : hi - start]
                emask[ps.idx, lo - done : hi - done] = True

        if self.coordinator is not None:
            from ..parallel.coordinator import KIND_MIXED

            self.coordinator.publish(KIND_MIXED, toks, pos)
        if emb_grid is not None:
            if self._step_mm is None:
                import functools

                import jax

                from ..models.llama import forward

                cfg = self.model.cfg

                @functools.partial(jax.jit, donate_argnums=(5,))
                def _step_mm(params, tokens, embeds, emask, positions, kv):
                    return forward(params, cfg, tokens, positions, kv,
                                   logits_for="all", embeds=embeds,
                                   embeds_mask=emask)

                self._step_mm = _step_mm
            logits, self.kv = self._step_mm(
                self._p, jnp.asarray(toks), jnp.asarray(emb_grid),
                jnp.asarray(emask), jnp.asarray(pos), self.kv,
            )
        else:
            logits, self.kv = self._step(
                self._p, jnp.asarray(toks), jnp.asarray(pos), self.kv, logits_for="all"
            )
        self.metrics["prefill_steps_total"] += 1
        cols = np.zeros((self.n_slots,), np.int32)
        sample_rows = []
        for ps in prompt_slots:
            chunk_real = chunks[ps.idx]
            ps.cache_tokens.extend(ps.prompt_left[:chunk_real])
            ps.pos += chunk_real
            ps.prompt_left = ps.prompt_left[chunk_real:]
            self.metrics["tokens_prefilled_total"] += chunk_real
            if not ps.prompt_left:
                cols[ps.idx] = chunk_real - 1
                sample_rows.append(ps)
                ps.state = SlotState.GENERATING
        for s in gen_slots:
            s.cache_tokens.append(s.last_token)
            s.pos += 1

        sample_rows.extend(gen_slots)
        if sample_rows:
            self._sample_and_emit(logits, cols, sample_rows)

    def _recurrent_step(self, prompt_slots, gen_slots):
        """One step for recurrent-memory models.  Decode-only: [n_slots, 1]
        with per-row lengths in {0, 1}.  With prefilling slots: [n_slots,
        chunk] where EVERY prompt row carries its next prompt chunk (per-row
        lengths truncate shorter chunks) and generating rows ride in column
        0 (their lengths = 1 freeze state after the decode token — the
        forward's masked scans make padded columns state-neutral)."""
        jnp = self._jnp
        prompt_slots = prompt_slots or []
        chunks = {ps.idx: min(self.prefill_chunk, len(ps.prompt_left)) for ps in prompt_slots}
        t = max(chunks.values()) if chunks else 1
        toks = np.zeros((self.n_slots, t), dtype=np.int32)
        lens = np.zeros((self.n_slots,), dtype=np.int32)
        for ps in prompt_slots:
            c = chunks[ps.idx]
            toks[ps.idx, :c] = ps.prompt_left[:c]
            lens[ps.idx] = c
        for s in gen_slots:
            toks[s.idx, 0] = s.last_token
            lens[s.idx] = 1

        logits, self.kv = self._step(
            self._p, jnp.asarray(toks), jnp.asarray(lens), self.kv
        )
        sample_rows = []
        cols = np.zeros((self.n_slots,), np.int32)
        for ps in prompt_slots:
            c = chunks[ps.idx]
            ps.cache_tokens.extend(ps.prompt_left[:c])
            ps.pos += c
            ps.prompt_left = ps.prompt_left[c:]
            self.metrics["tokens_prefilled_total"] += c
            if not ps.prompt_left:
                cols[ps.idx] = c - 1
                sample_rows.append(ps)
                ps.state = SlotState.GENERATING
        if not prompt_slots:
            self.metrics["decode_steps_total"] += 1
        else:
            self.metrics["prefill_steps_total"] += 1
        for s in gen_slots:
            s.cache_tokens.append(s.last_token)
            s.pos += 1
        sample_rows.extend(gen_slots)
        if sample_rows:
            self._sample_and_emit(logits, cols, sample_rows)

    def _hybrid_step(self, prompt_slots, gen_slots):
        """One step for hybrid (jamba) models: the KV positions drive the
        attention layers (trash rows write past the horizon like
        _mixed_step) while per-row `lengths` freeze the mamba state of
        padded rows like _recurrent_step.  All prompt slots pack into one
        step like _mixed_step."""
        jnp = self._jnp
        prompt_slots = prompt_slots or []
        chunks = {ps.idx: min(self.prefill_chunk, len(ps.prompt_left)) for ps in prompt_slots}
        t = max(chunks.values()) if chunks else 1
        toks = np.zeros((self.n_slots, t), dtype=np.int32)
        pos = np.full((self.n_slots, t), self.max_len, dtype=np.int32)  # trash
        lens = np.zeros((self.n_slots,), dtype=np.int32)
        for ps in prompt_slots:
            c = chunks[ps.idx]
            toks[ps.idx, :c] = ps.prompt_left[:c]
            pos[ps.idx, :c] = np.arange(ps.pos, ps.pos + c)
            lens[ps.idx] = c
        for s in gen_slots:
            toks[s.idx, 0] = s.last_token
            pos[s.idx, 0] = s.pos
            lens[s.idx] = 1

        logits, self.kv, self.rstate = self._step(
            self._p, jnp.asarray(toks), jnp.asarray(pos),
            jnp.asarray(lens), self.kv, self.rstate,
        )
        sample_rows = []
        cols = np.zeros((self.n_slots,), np.int32)
        for ps in prompt_slots:
            c = chunks[ps.idx]
            ps.cache_tokens.extend(ps.prompt_left[:c])
            ps.pos += c
            ps.prompt_left = ps.prompt_left[c:]
            self.metrics["tokens_prefilled_total"] += c
            if not ps.prompt_left:
                cols[ps.idx] = c - 1
                sample_rows.append(ps)
                ps.state = SlotState.GENERATING
        if not prompt_slots:
            self.metrics["decode_steps_total"] += 1
        else:
            self.metrics["prefill_steps_total"] += 1
        for s in gen_slots:
            s.cache_tokens.append(s.last_token)
            s.pos += 1
        sample_rows.extend(gen_slots)
        if sample_rows:
            self._sample_and_emit(logits, cols, sample_rows)

    def _can_spec(self, slot: _Slot) -> bool:
        """Speculation keeps output exact only for greedy, grammar-free
        slots with headroom before the context limit."""
        req = slot.req
        return (
            req is not None and req.temp <= 0 and req.grammar is None
            and slot.pos + 2 + self.n_draft < self.max_len
        )

    def _draft_propose_all(self, slots) -> dict[int, list[int]]:
        """Greedy draft-model proposals for every speculating slot.

        Catch-up: each slot's tokens the draft hasn't consumed yet run
        through the draft forward in fixed-width chunks (one compile),
        keeping its KV row in sync (reference: common_speculative_gen_draft
        re-feeds the accepted prefix).  Proposal: one [n_slots, 1] draft
        step per drafted token, all speculating slots chained together.
        Rejected drafts' K/V get overwritten by the next catch-up
        (write-before-attend, slot==position cache)."""
        jnp = self._jnp
        out: dict[int, list[int]] = {}
        if not slots:
            return out
        width = self.prefill_chunk
        first: dict[int, int] = {}
        # catch-up rounds: ALL lagging slots advance one chunk per forward
        # (the reference drafts per slot inside the shared batch; a serial
        # per-slot loop would cost S full-width forwards for S slots)
        hists = {s.idx: s.cache_tokens + [s.last_token] for s in slots}
        seen = {s.idx: self._draft_seen[s.idx] for s in slots}
        while any(seen[s.idx] < len(hists[s.idx]) for s in slots):
            toks = np.zeros((self.n_slots, width), dtype=np.int32)
            pos = np.full((self.n_slots, width), self.max_len, dtype=np.int32)
            ns = {}
            for s in slots:
                hist, sn = hists[s.idx], seen[s.idx]
                n = min(width, len(hist) - sn)
                if n <= 0:
                    continue
                ns[s.idx] = n
                toks[s.idx, :n] = hist[sn : sn + n]
                pos[s.idx, :n] = np.arange(sn, sn + n)
            preds, self.dkv = self._dstep(
                self._dp, jnp.asarray(toks), jnp.asarray(pos), self.dkv
            )
            preds_np = None
            for s in slots:
                n = ns.get(s.idx, 0)
                if n and seen[s.idx] + n == len(hists[s.idx]):
                    if preds_np is None:
                        preds_np = np.asarray(preds)
                    first[s.idx] = int(preds_np[s.idx, n - 1])
                seen[s.idx] = seen[s.idx] + n
        for s in slots:
            self._draft_seen[s.idx] = len(hists[s.idx])
            out[s.idx] = [first[s.idx]]
        # chain the remaining drafts for all slots in lock-step
        for _ in range(self.n_draft - 1):
            toks = np.zeros((self.n_slots, 1), dtype=np.int32)
            pos = np.full((self.n_slots, 1), self.max_len, dtype=np.int32)
            for s in slots:
                toks[s.idx, 0] = out[s.idx][-1]
                pos[s.idx, 0] = self._draft_seen[s.idx] + len(out[s.idx]) - 1
            preds, self.dkv = self._dstep(
                self._dp, jnp.asarray(toks), jnp.asarray(pos), self.dkv
            )
            preds = np.asarray(preds)
            for s in slots:
                out[s.idx].append(int(preds[s.idx, 0]))
        return out

    def _spec_decode_step(self, gen_slots):
        """[n_slots, 1 + n_draft] decode: column 0 is the normal decode
        token; speculating slots carry n-gram drafts in columns 1.. whose
        logits verify them in the same forward.  Rejected draft positions
        hold junk K/V at positions > pos, which the slot==position cache
        overwrites before they ever become attendable."""
        from ..runtime.speculative import ngram_propose

        jnp = self._jnp
        t = self.n_draft + 1
        toks = np.zeros((self.n_slots, t), dtype=np.int32)
        pos = np.full((self.n_slots, t), self.max_len, dtype=np.int32)  # trash
        drafts: dict[int, list[int]] = {}
        proposals = (
            self._draft_propose_all([s for s in gen_slots if self._can_spec(s)])
            if self.draft is not None
            else None
        )
        for s in gen_slots:
            toks[s.idx, 0] = s.last_token
            pos[s.idx, 0] = s.pos
            if self._can_spec(s):
                cap = min(self.n_draft, self.max_len - s.pos - 2)
                if proposals is not None:
                    d = proposals.get(s.idx, [])[:cap]
                else:
                    d = ngram_propose(s.cache_tokens + [s.last_token], cap)[:cap]
                if d:
                    toks[s.idx, 1 : 1 + len(d)] = d
                    pos[s.idx, 1 : 1 + len(d)] = np.arange(s.pos + 1, s.pos + 1 + len(d))
                    drafts[s.idx] = d
                    self.metrics["spec_drafted_total"] += len(d)

        logits, self.kv = self._step(
            self._p, jnp.asarray(toks), jnp.asarray(pos), self.kv, logits_for="all"
        )
        self.metrics["decode_steps_total"] += 1
        for s in gen_slots:
            s.cache_tokens.append(s.last_token)
            s.pos += 1

        spec_slots = [s for s in gen_slots if s.idx in drafts]
        plain = [s for s in gen_slots if s.idx not in drafts]
        if spec_slots:
            rows = np.asarray(logits[np.asarray([s.idx for s in spec_slots])])  # [ns, t, V]
            for s, row in zip(spec_slots, rows):
                d = drafts[s.idx]
                preds = row[: 1 + len(d)].argmax(axis=-1).astype(np.int32)
                accepted = 0
                for i, di in enumerate(d):
                    if int(preds[i]) == di:
                        accepted += 1
                    else:
                        break
                self.metrics["spec_accepted_total"] += accepted
                # accepted drafts' K/V are already in the cache
                for i in range(accepted):
                    s.cache_tokens.append(d[i])
                    s.pos += 1
                    self._emit_token(s, d[i])
                    if s.state == SlotState.IDLE:
                        break
                else:
                    self._emit_token(s, int(preds[accepted]))
        if plain:
            self._sample_and_emit(logits, np.zeros((self.n_slots,), np.int32), plain)

    # -- lookahead decoding (reference: examples/lookahead/lookahead.cpp) --
    def _can_la(self, slot: _Slot) -> bool:
        """Lookahead keeps output exact only for greedy, grammar-free slots;
        the Jacobi window + verification grams need t speculative cache
        slots of headroom past the committed region."""
        req = slot.req
        if req is None or req.temp > 0 or req.grammar is not None:
            return False
        t = self.la_n + (self.la_w + self.la_g) * (self.la_n - 1)
        return (slot.pos + t <= self.kv.max_len
                and slot.pos + self.la_n + 1 < self.max_len)

    def _la_init(self, slot: _Slot) -> dict:
        """Fresh per-slot Jacobi state: random window levels (the fixed-point
        iteration converges regardless of init) + a gram pool seeded from the
        prompt (subsumes prompt-lookup n-gram speculation)."""
        lvls = self.la_n - 1
        seed = (slot.req.seed if slot.req and slot.req.seed >= 0 else 0) ^ (slot.idx + 1)
        rng = np.random.default_rng(seed & 0x7FFFFFFF)
        window = rng.integers(1, self.model.cfg.vocab_size,
                              size=(lvls, self.la_w)).astype(np.int64)
        pool: dict[int, list] = {}
        hist = slot.cache_tokens + [slot.last_token]
        for i in range(max(0, len(hist) - lvls)):
            gram = tuple(hist[i + 1 : i + 1 + lvls])
            if len(gram) == lvls:
                lst = pool.setdefault(hist[i], [])
                if gram not in lst:
                    lst.insert(0, gram)
                    del lst[self.la_g :]
        la = {"window": window, "pool": pool, "extra": []}
        self._la[slot.idx] = la
        return la

    def _flush_la_extras(self, slots):
        """Ingest accepted-but-unstored lookahead tokens (they were verified
        against speculative cache slots, never committed ones) via one plain
        causal forward so the committed region is complete."""
        jnp = self._jnp
        width = self.la_n - 1  # fixed width -> one compile
        toks = np.zeros((self.n_slots, width), dtype=np.int32)
        pos = np.full((self.n_slots, width), self.max_len, dtype=np.int32)  # trash
        ext = {}
        for s in slots:
            v = list(self._la[s.idx]["extra"])
            ext[s.idx] = v
            toks[s.idx, : len(v)] = v
            pos[s.idx, : len(v)] = np.arange(s.pos, s.pos + len(v))
        _, self.kv = self._step(
            self._p, jnp.asarray(toks), jnp.asarray(pos), self.kv, logits_for="last"
        )
        for s in slots:
            v = ext[s.idx]
            s.cache_tokens.extend(v)
            s.pos += len(v)
            self._la[s.idx]["extra"] = []

    def _lookahead_step(self, gen_slots):
        """One [n_slots, N + (W+G)*(N-1)] forward per step: each greedy slot
        carries its pending tokens (committed to real cache slots), W Jacobi
        window columns per level, and G verification n-grams, all separated
        by an explicit block mask; speculative columns store K/V in the
        prefill-chunk headroom past max_len and are overwritten next step.
        Acceptance (the longest gram chain matching the greedy argmax) is
        bit-identical to plain greedy decode.  Non-greedy slots ride along
        in their pending columns and sample normally."""
        jnp = self._jnp
        n, w, g = self.la_n, self.la_w, self.la_g
        lvls = n - 1
        t = n + (w + g) * lvls
        S = self.kv.max_len
        ns = self.n_slots
        toks = np.zeros((ns, t), dtype=np.int32)
        pos = np.full((ns, t), S - 1, dtype=np.int32)  # trash for idle rows
        slots_arr = np.full((ns, t), S - 1, dtype=np.int32)
        mask = np.zeros((ns, t, S), dtype=bool)

        if self._la_fn is None:
            import functools

            import jax

            from ..models.llama import forward as _fwd

            cfg = self.model.cfg

            @functools.partial(jax.jit, donate_argnums=(3,))
            def _la_fn(params, toks, pos, kv, slots, mask):
                return _fwd(params, cfg, toks, pos, kv, mask=mask,
                            kv_positions=slots, logits_for="all")

            self._la_fn = _la_fn

        la_slots = []
        meta: dict[int, tuple] = {}
        col_w0 = n
        col_v0 = n + lvls * w
        for s in gen_slots:
            la = self._la.get(s.idx)
            spec = self._can_la(s)
            if spec and la is None:
                la = self._la_init(s)
            extra = la["extra"] if la else []
            pending = list(extra) + [s.last_token]
            m = len(pending)
            p0 = s.pos
            base = p0 + m
            for j in range(n):
                if j < m:
                    toks[s.idx, j] = pending[j]
                    pos[s.idx, j] = slots_arr[s.idx, j] = p0 + j
                    mask[s.idx, j, : p0 + j + 1] = True
                else:  # pad column: parks K/V in a spec slot, attends itself
                    pos[s.idx, j] = slots_arr[s.idx, j] = base + (j - m)
                    mask[s.idx, j, base + (j - m)] = True
            if not spec:
                meta[s.idx] = (m, pending, [], 0)
                continue
            la_slots.append(s)
            spec0 = base + (n - m)
            window = la["window"]
            for j in range(lvls):
                for i in range(w):
                    c = col_w0 + j * w + i
                    toks[s.idx, c] = window[j, i]
                    pos[s.idx, c] = base + i + j
                    slots_arr[s.idx, c] = spec0 + (c - n)
                    mask[s.idx, c, :base] = True
                    for j2 in range(j):  # own column at lower levels
                        mask[s.idx, c, spec0 + (col_w0 + j2 * w + i) - n] = True
                    mask[s.idx, c, spec0 + (c - n)] = True
            cands = list(la["pool"].get(pending[-1], []))[:g]
            meta[s.idx] = (m, pending, cands, spec0)
            for gi in range(g):
                gram = cands[gi] if gi < len(cands) else (0,) * lvls
                for tt in range(lvls):
                    c = col_v0 + gi * lvls + tt
                    toks[s.idx, c] = gram[tt]
                    pos[s.idx, c] = base + tt
                    slots_arr[s.idx, c] = spec0 + (c - n)
                    mask[s.idx, c, :base] = True
                    for t2 in range(tt):  # own gram's earlier tokens
                        mask[s.idx, c, spec0 + (col_v0 + gi * lvls + t2) - n] = True
                    mask[s.idx, c, spec0 + (c - n)] = True
        empty = ~mask.any(-1)  # NaN guard: untouched rows attend one junk slot
        mask[empty, S - 1] = True

        logits, self.kv = self._la_fn(
            self._p, jnp.asarray(toks), jnp.asarray(pos), self.kv,
            jnp.asarray(slots_arr), jnp.asarray(mask),
        )
        self.metrics["decode_steps_total"] += 1
        self.metrics["lookahead_steps_total"] += 1

        for s in gen_slots:  # pending K/V is in the cache now
            m, pending = meta[s.idx][0], meta[s.idx][1]
            s.cache_tokens.extend(pending)
            s.pos += m
            if self._la.get(s.idx):
                self._la[s.idx]["extra"] = []

        la_set = {s.idx for s in la_slots}
        plain = [s for s in gen_slots if s.idx not in la_set]
        if la_slots:
            rows_np = np.asarray(logits[np.asarray([s.idx for s in la_slots])])
            for s, row in zip(la_slots, rows_np):
                m, pending, cands, spec0 = meta[s.idx]
                arg = row.argmax(axis=-1)
                la = self._la[s.idx]
                x_next = int(arg[m - 1])
                accepted = [x_next]
                best, best_out = 0, []
                for gi in range(len(cands)):
                    gram = cands[gi]
                    cur, outs, cnt = x_next, [], 0
                    for tt in range(lvls):
                        if gram[tt] != cur:
                            break
                        cur = int(arg[col_v0 + gi * lvls + tt])
                        outs.append(cur)
                        cnt += 1
                    if cnt > best:
                        best, best_out = cnt, outs
                accepted += best_out
                self.metrics["lookahead_accepted_total"] += best
                # harvest trajectory grams + Jacobi shift
                window = la["window"]
                new_last = arg[col_w0 + (lvls - 1) * w : col_w0 + lvls * w]
                for i in range(w):
                    gram2 = tuple(int(window[j, i]) for j in range(1, lvls)) + (
                        int(new_last[i]),)
                    lst = la["pool"].setdefault(int(window[0, i]), [])
                    if gram2 not in lst:
                        lst.insert(0, gram2)
                        del lst[g:]
                window[:-1] = window[1:]
                window[-1] = new_last
                emitted = []
                for tok in accepted:
                    self._emit_token(s, tok)
                    emitted.append(tok)
                    if s.state == SlotState.IDLE:
                        break
                if s.state != SlotState.IDLE:
                    la["extra"] = emitted[:-1]
        if plain:
            cols = np.zeros((self.n_slots,), np.int32)
            for s in plain:
                cols[s.idx] = meta[s.idx][0] - 1
            self._sample_and_emit(logits, cols, plain)

    def _decode_step(self, gen_slots):
        jnp = self._jnp
        toks = np.zeros((self.n_slots, 1), dtype=np.int32)
        pos = np.full((self.n_slots, 1), self.max_len, dtype=np.int32)  # trash for idle rows
        for s in gen_slots:
            toks[s.idx, 0] = s.last_token
            pos[s.idx, 0] = s.pos

        if self.coordinator is not None:
            from ..parallel.coordinator import KIND_DECODE

            self.coordinator.publish(KIND_DECODE, toks, pos)
        logits, self.kv = self._step(
            self._p, jnp.asarray(toks), jnp.asarray(pos), self.kv, logits_for="last"
        )
        self.metrics["decode_steps_total"] += 1
        for s in gen_slots:
            s.cache_tokens.append(s.last_token)
            s.pos += 1
        self._sample_and_emit(logits, np.zeros((self.n_slots,), np.int32), gen_slots)

    # -- sampling & emission ------------------------------------------------
    def _sample_and_emit(self, logits, cols, slots):
        """Batched chain sampling with grammar applied INSIDE the chain
        (reference chain-with-grammar ordering, src/llama-sampling.cpp +
        the common/sampling.cpp sample-then-resample optimization): sample
        once unconstrained; if a grammar slot drew a disallowed token, fold
        the grammar mask into that slot's raw logits and rerun the full
        chain — so typical_p/penalties/etc. shape constrained requests too."""
        jnp = self._jnp
        if self.coordinator is not None and self.coordinator.n_processes > 1:
            # logits are replicated (see sharded_forward_fn) but committed
            # to the global mesh: fetch the local copy and pick on host so
            # the leader-only sampler runs on its own devices
            lg = np.asarray(logits)
            picked = jnp.asarray(
                np.take_along_axis(lg, np.asarray(cols)[:, None, None], axis=1)[:, 0]
            )
        else:
            picked = self._pick(logits, jnp.asarray(cols))  # [n_slots, V] on device
        args = [jnp.asarray(a) for a in self._params.arrays()]
        toks, chain_logits, keys1, mu1 = self._sample_batch(
            picked, self._keys, jnp.asarray(self._recent), self._br_mask,
            jnp.asarray(self._mu), *args,
        )
        toks_host = np.asarray(toks)
        picked_host = None
        reject = []  # grammar slots whose first draw is disallowed
        for s in slots:
            req = s.req
            if req.grammar is not None:
                tok = int(toks_host[s.idx])
                if not req.grammar.allowed([tok]):
                    reject.append(s)
        if not reject:
            self._keys = keys1
            self._mu = np.array(mu1)  # copy: np.asarray of a jax array is read-only
            for s in slots:
                self._emit_token(s, int(toks_host[s.idx]))
            return

        picked_host = np.asarray(picked)
        masked = picked_host.copy()
        for s in reject:
            masked[s.idx] += self._grammar_mask_row(s.req, picked_host[s.idx])
        toks2, _, keys2, mu2 = self._sample_batch(
            jnp.asarray(masked), keys1, jnp.asarray(self._recent), self._br_mask,
            jnp.asarray(self._mu), *args,
        )
        toks2_host = np.asarray(toks2)
        # merge: resampled rows advance their key/mu twice, others once
        rej = np.zeros((self.n_slots,), bool)
        for s in reject:
            rej[s.idx] = True
        self._keys = jnp.where(jnp.asarray(rej)[:, None], keys2, keys1)
        self._mu = np.where(rej, np.asarray(mu2), np.asarray(mu1))
        for s in slots:
            tok = int(toks2_host[s.idx]) if rej[s.idx] else int(toks_host[s.idx])
            self._emit_token(s, tok)

    def _grammar_mask_row(self, req, logits_row: np.ndarray) -> np.ndarray:
        """[V] additive mask (0 allowed / -inf disallowed) from the grammar
        PDA, scanning candidates in descending-logit stages so the automaton
        (host-side, like the reference's) runs over the few thousand tokens
        that carry probability mass before falling through to the tail."""
        order = np.argsort(-logits_row)
        v = logits_row.shape[0]
        allowed: list[int] = []
        for a, b in ((0, 512), (512, 4096), (4096, v)):
            if a >= v:
                break
            allowed.extend(req.grammar.allowed(order[a:b]))
            if len(allowed) >= 16:
                break
        mask = np.full((v,), NEG_INF, np.float32)
        if allowed:
            mask[allowed] = 0.0
        else:  # dead-end: surface as a stop (EOS) rather than crash
            mask[self.model.tokenizer.eos_id if self.model.tokenizer else 0] = 0.0
        return mask

    def _check_stop_strings(self, req: Request) -> bool:
        """Scan the decoded text for any stop string (reference: server
        stop-word matching on the running generated string); records the
        match offset so the HTTP layer trims the stop text from output."""
        if self.model.tokenizer is None:
            return False
        if req._stopdec is None:
            from ..tokenizer import IncrementalDecoder

            req._stopdec = IncrementalDecoder(self.model.tokenizer)
        req._text += req._stopdec.push(req.out_tokens[-1])
        for ss in req.stop_strings:
            i = req._text.find(ss)
            if i >= 0:
                req.stop_trim_chars = i
                return True
        return False

    def _emit_token(self, slot: _Slot, tok: int):
        req = slot.req
        if req.grammar is not None:
            req.grammar.accept_token(tok)
        slot.last_token = tok
        slot.generated += 1
        req.out_tokens.append(tok)
        self._recent[slot.idx] = np.roll(self._recent[slot.idx], -1)
        self._recent[slot.idx, -1] = tok
        if req.t_first_token == 0.0:
            req.t_first_token = time.time()
        self.metrics["tokens_generated_total"] += 1
        req.stream_q.put(tok)

        if tok in req.stop_tokens:
            self._finish(slot, "stop")
        elif req.stop_strings and self._check_stop_strings(req):
            self._finish(slot, "stop")
        elif slot.generated >= req.max_new:
            self._finish(slot, "length")
        elif not self.recurrent and slot.pos + 1 >= self.max_len and not self.context_shift:
            self._finish(slot, "length")
