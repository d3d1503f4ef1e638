"""Model hyper-parameters resolved from GGUF metadata.

The analogue of the reference's llama_hparams + llm_load_hparams
(src/llama-model.cpp:636+), as a frozen dataclass consumed by the
functional forward passes.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from ..gguf.reader import GGUFFile
from ..ops.layers import RopeParams

_ROPE_SCALING_NAMES = {0: "none", 1: "linear", 2: "yarn", 3: "longrope"}


@dataclass(frozen=True)
class MoeConfig:
    n_experts: int
    n_experts_used: int
    n_ff_exp: int
    n_shared_experts: int = 0
    gate_func: str = "softmax"  # softmax | sigmoid | softmax_weight (gpt-oss)
    norm_topk_prob: bool = True
    scale: float = 1.0  # routed-expert weight scale (deepseek2)
    n_dense_lead: int = 0  # leading dense (non-MoE) layers (deepseek2)
    # deepseek3 group-limited routing (reference: llama-graph.cpp:1075-1100)
    n_expert_groups: int = 1
    n_group_used: int = 1
    # grok: tanh soft-cap on the router logits (f_router_logit_softcapping)
    router_softcap: float = 0.0
    # grovemoe adjugate chunk experts (reference src/models/grovemoe.cpp:
    # each group of `group_experts` routed experts shares one chunk expert
    # that runs on the main MoE's output, scaled by `group_scale`)
    group_experts: int = 0
    group_scale: float = 0.0
    n_ff_chexp: int = 0


@dataclass(frozen=True)
class SsmConfig:
    """Mamba selective-state-space dims (reference llama_hparams ssm_*).
    Mamba2 (SSD) is flagged by n_group > 0: dt_rank holds the head count
    (reference mamba2 convention) and states are per-head."""

    d_conv: int
    d_inner: int
    d_state: int
    dt_rank: int
    n_group: int = 0  # 0 = mamba1; >0 = mamba2 B/C group count

    @property
    def is_mamba2(self) -> bool:
        return self.n_group > 0

    @property
    def n_head(self) -> int:
        return self.dt_rank

    @property
    def head_dim(self) -> int:
        return self.d_inner // self.dt_rank


@dataclass(frozen=True)
class WkvConfig:
    """RWKV time-mix dims (reference llama_hparams wkv_head_size /
    time_mix_extra_dim / time_decay_extra_dim / rescale_every_n_layers,
    src/llama-model.cpp:1968-1977)."""

    head_size: int
    time_mix_extra_dim: int
    time_decay_extra_dim: int
    rescale_every: int = 0
    token_shift_count: int = 2


@dataclass(frozen=True)
class AltUpConfig:
    """gemma3n AltUp/MatFormer hparams (reference: hparams.n_altup /
    i_altup_act / n_embd_altup / n_layer_kv_from_start,
    src/llama-model.cpp LLM_ARCH_GEMMA3N)."""

    n_altup: int
    active_idx: int
    per_layer_dim: int
    n_kv_shared: int
    sparsity: tuple  # per-layer gaussian-topk std multipliers (<=0: off)


@dataclass(frozen=True)
class MlaConfig:
    """Multi-head latent attention dims (deepseek2).  With the absorption
    optimization the KV cache is MQA over [rope | latent] vectors:
    cfg.n_kv_heads == 1 and cfg.head_dim == qk_rope_dim + kv_lora_rank."""

    kv_lora_rank: int
    q_lora_rank: int  # 0 = lite variant (dense wq)
    qk_nope_dim: int
    qk_rope_dim: int
    v_head_dim: int


@dataclass(frozen=True)
class ModelConfig:
    arch: str
    n_layers: int
    n_embd: int
    n_heads: int
    n_kv_heads: int
    head_dim: int
    n_ff: int
    vocab_size: int
    ctx_len: int = 4096
    norm_eps: float = 1e-5
    norm_kind: str = "rms"  # rms | layer
    rope: RopeParams = field(default_factory=lambda: RopeParams(dim=0))
    # SWA layers' rope (gemma3: local layers run base 10k, full layers 1M
    # — reference get_rope_freq_base, src/llama-model.cpp:683-685)
    rope_swa: RopeParams | None = None
    moe: MoeConfig | None = None
    tie_embedding: bool = False
    attn_logit_softcap: float = 0.0
    final_logit_softcap: float = 0.0
    logit_scale: float = 1.0
    sliding_window: int = 0
    swa_pattern: int = 1  # every n-th layer is full-attention (gemma-style); 1 = all full
    qkv_bias: bool = False
    attn_sinks: bool = False
    post_norms: bool = False  # gemma-style post-attn/post-ffn norms
    act: str = "silu"
    attn_scale: float = 0.0  # 0 -> 1/sqrt(head_dim); gemma2 query_pre_attn_scalar
    emb_scale: float = 1.0  # granite embedding_multiplier (gemma applies sqrt(n_embd) by arch)
    residual_scale: float = 1.0  # granite residual_multiplier
    tp_axis: str | None = None  # mesh axis name when running inside shard_map
    pooling: str = "none"  # none | mean | cls | last | rank (llama.h pooling types)
    # multi-head latent attention (deepseek2; reference src/models/deepseek2.cpp)
    mla: "MlaConfig | None" = None
    # recurrent state space (mamba; reference src/models/mamba.cpp)
    ssm: "SsmConfig | None" = None
    # rwkv time-mix (reference src/models/rwkv6*.cpp)
    wkv: "WkvConfig | None" = None
    # hybrid (jamba): per-layer attention flag; False = recurrent layer
    # (reference: hparams.recurrent_layer_arr from per-layer head_count_kv,
    # src/llama-model.cpp:1494-1506)
    attn_layers: tuple | None = None
    use_rope: bool = True  # jamba attention layers carry no rope
    # "separate" (gptneox ln1/ln2) | "shared" (command-r one norm) | "none"
    parallel_residual: str = "none"
    # every nope_step-th layer skips rope (smollm3 NoPE; reference
    # hparams.n_no_rope_layer_step); 0 = rope everywhere
    nope_step: int = 0
    # ALiBi (mpt): max bias over the head range; 0 = no alibi
    # (reference: hparams.f_max_alibi_bias)
    alibi_bias_max: float = 0.0
    # lfm2 short-conv kernel length (reference: %s.shortconv.l_cache);
    # 0 = arch has no shortconv layers
    shortconv_l: int = 0
    # falcon-h1: every layer runs attention AND mamba2 in parallel
    # (reference src/models/falcon-h1.cpp)
    parallel_hybrid: bool = False
    # t5 encoder-decoder: relative position buckets + decoder start token
    # (reference: %s.attention.relative_buckets_count, %s.decoder_start_token_id)
    rel_buckets: int = 0
    rel_max_dist: int = 128
    dec_start_token: int = -1
    # dbrx: clamp the fused qkv projection output to [-clamp, clamp]
    # (reference: hparams.f_clamp_kqv, src/models/dbrx.cpp ggml_clamp)
    clamp_kqv: float = 0.0
    # hunyuan: per-head q/k RMS norms apply AFTER rope, not before
    # (reference src/models/hunyuan-moe.cpp: rope_ext then build_norm)
    qk_norm_post_rope: bool = False
    # chameleon: per-head q/k norms are LAYERNORM with bias (LLM_NORM in
    # src/models/chameleon.cpp) instead of RMS
    qk_norm_layer: bool = False
    # chameleon swin_norm: block norms apply AFTER attention/FFN instead
    # of before (reference hparams.swin_norm, chameleon.cpp:17-20,72-95)
    swin_norm: bool = False
    # apertus xIELU activation: per-layer (alpha_n, alpha_p, beta, eps)
    # EFFECTIVE values (softplus already applied — the GGUF stores the raw
    # HF parameters; see from_gguf)
    xielu: tuple | None = None
    # gemma3n AltUp stack (multi-stream hidden state + per-layer inputs +
    # shared-KV tail layers); None for every other arch
    altup: "AltUpConfig | None" = None
    # deci/nemotron-nas: per-layer kv-head counts (0 = attention replaced
    # by a linear projection or absent; reference hparams.n_head_kv(il))
    kv_heads_layers: tuple | None = None
    # smallthinker routes MoE on the raw layer input (pre-attention)
    router_input: str = "norm"  # "norm" | "raw"
    # grok-2: dense ffn runs parallel with the experts, sum scaled sqrt(.5)
    moe_dense_parallel: bool = False
    # smallthinker: full-attention/NoPE at il % step == 0 (dense FIRST),
    # vs the gemma convention of (il+1) % step == 0
    swa_dense_first: bool = False
    # True when loader.rope_to_neox permuted wq/wk (+ bq/bk/q-k norms) into
    # the half-split rope basis at load time.  Every path that crosses
    # bases — runtime LoRA attach (adapter.load_lora) and the model saver
    # (loader.save_params_gguf) — must consult this and apply/invert the
    # same permutation (reference counterpart: none — the permute is a
    # zllm load-time optimization; basis contract is ours to keep).
    neox_permuted: bool = False

    @property
    def is_recurrent(self) -> bool:
        """Pure recurrent-memory family: state instead of a KV cache."""
        return (self.ssm is not None or self.wkv is not None) and self.attn_layers is None

    @property
    def is_hybrid(self) -> bool:
        """Hybrid memory (jamba/lfm2): KV cache for attention layers +
        recurrent state for the mixer layers (reference
        llama_memory_hybrid)."""
        if self.parallel_hybrid:
            return True
        return self.attn_layers is not None and (
            self.ssm is not None or self.shortconv_l > 0
        )

    @property
    def n_attn_layers(self) -> int:
        if self.parallel_hybrid:
            return self.n_layers
        return sum(self.attn_layers) if self.attn_layers else self.n_layers

    @property
    def n_recurrent_layers(self) -> int:
        if self.parallel_hybrid:
            return self.n_layers
        return self.n_layers - sum(self.attn_layers) if self.attn_layers else self.n_layers

    @property
    def is_encoder_decoder(self) -> bool:
        """T5 family: llama_encode + cross-attention decode."""
        return self.arch in ("t5", "t5encoder")

    @property
    def is_encoder(self) -> bool:
        """Bidirectional encoder family (bert): no causal mask, no KV
        cache, no LM head (reference: hparams.causal_attn == false)."""
        return self.arch in ("bert", "nomic-bert", "jina-bert-v2",
                             "modern-bert", "neo-bert")

    @property
    def is_diffusion(self) -> bool:
        """Diffusion LMs (dream/llada class): standard decoder weights but
        NON-causal attention and no KV cache — generation is iterative
        denoising via tools/diffusion.py (reference:
        examples/diffusion/diffusion-cli.cpp + src/models/dream.cpp
        build_attn_inp_no_cache)."""
        return self.arch in ("dream", "llada", "llada-moe", "rnd1")

    @property
    def q_dim(self) -> int:
        return self.n_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.n_kv_heads * self.head_dim

    def is_swa_layer(self, il: int) -> bool:
        if self.sliding_window <= 0:
            return False
        if self.swa_dense_first:
            return il % self.swa_pattern != 0
        return (il + 1) % self.swa_pattern != 0

    def is_nope_layer(self, il: int) -> bool:
        """Layer skips rope (smollm3/cohere2/llama4 NoPE; reference
        hparams.n_no_rope_layer_step / is_sliding gating)."""
        if not self.nope_step:
            return False
        if self.swa_dense_first:
            return il % self.nope_step == 0
        return (il + 1) % self.nope_step == 0

    @classmethod
    def from_gguf(cls, f: GGUFFile) -> "ModelConfig":
        arch = f.architecture

        def kv(suffix: str, default=None):
            return f.metadata.get(f"{arch}.{suffix}", default)

        heads_raw = kv("attention.head_count", 1)
        if isinstance(heads_raw, (list, tuple)) or getattr(heads_raw, "ndim", 0) == 1:
            # deci/nemotron-nas: per-layer head counts; scalar = the max
            n_heads = max(int(v) for v in heads_raw)
        else:
            n_heads = int(heads_raw or 1)
        n_embd = int(kv("embedding_length"))
        head_dim = int(kv("attention.key_length", n_embd // n_heads) or 1)
        vocab = f.kv("tokenizer.ggml.tokens")
        vocab_size = int(kv("vocab_size", len(vocab) if vocab is not None else 0))

        rope_dim = int(kv("rope.dimension_count", head_dim))
        scaling_raw = kv("rope.scaling.type", "none")
        if isinstance(scaling_raw, (int, float)):
            scaling = _ROPE_SCALING_NAMES.get(int(scaling_raw), "none")
        else:
            scaling = str(scaling_raw)
        scale_factor = float(kv("rope.scaling.factor", 1.0))
        # llama3-style smooth scaling is flagged by the low/high freq factors
        if scaling in ("none", "linear") and kv("rope.scaling.low_freq_factor") is not None:
            scaling = "llama3"
        rope = RopeParams(
            dim=rope_dim,
            base=float(kv("rope.freq_base", 10000.0)),
            style="neox" if arch in _NEOX_ROPE_ARCHES else "norm",
            scaling=scaling if scale_factor != 1.0 or scaling == "llama3" else "none",
            scale_factor=scale_factor,
            orig_ctx=int(kv("rope.scaling.original_context_length", kv("context_length", 4096))),
            low_freq_factor=float(kv("rope.scaling.low_freq_factor", 1.0)),
            high_freq_factor=float(kv("rope.scaling.high_freq_factor", 4.0)),
            attn_factor=float(kv("rope.scaling.attn_factor", 1.0)),
        )

        rope_swa = None
        fb_swa = kv("rope.freq_base_swa")
        if fb_swa is not None and int(kv("attention.sliding_window", 0)) > 0:
            # local-attention layers: plain rope at the SWA base (scaling
            # applies only to the full-attention layers)
            rope_swa = rope._replace(base=float(fb_swa), scaling="none", scale_factor=1.0)

        moe = None
        n_experts = int(kv("expert_count", 0))
        if n_experts > 0:
            moe = MoeConfig(
                n_experts=n_experts,
                n_experts_used=int(kv("expert_used_count", 2)),
                n_ff_exp=int(kv("expert_feed_forward_length", kv("feed_forward_length"))),
                n_shared_experts=int(kv("expert_shared_count", 0)),
                gate_func={1: "softmax", 2: "sigmoid", 3: "softmax_weight"}.get(
                    int(kv("expert_gating_func", 3 if arch == "gpt-oss" else 1)), "softmax"),
                # llama.cpp GGUFs carry this as expert_weights_norm
                norm_topk_prob=bool(kv("expert_weights_norm",
                                       kv("norm_topk_prob",
                                          arch in ("llama", "mixtral", "qwen3moe",
                                                   # qwen3vl-moe.cpp:111
                                                   # norm_w=true
                                                   "qwen3vlmoe",
                                                   "hunyuan-moe", "ernie4_5-moe",
                                                   # reference minimax-m2.cpp
                                                   # hardcodes norm_w=true
                                                   "minimax-m2",
                                                   # build_moe_ffn norm=true
                                                   # (grok.cpp:104,
                                                   # arctic.cpp:105,
                                                   # smallthinker.cpp:94)
                                                   "grok", "arctic",
                                                   # grovemoe.cpp passes
                                                   # norm_w=true to both
                                                   # build_moe_ffn calls
                                                   "grovemoe",
                                                   "smallthinker")))),
                scale=float(kv("expert_weights_scale", 1.0)),
                n_dense_lead=int(kv("leading_dense_block_count", 0)),
                # grok defaults its router soft-cap to 30 for old GGUFs
                # (reference llama-model.cpp:802)
                router_softcap=float(kv("router_logit_softcapping",
                                        30.0 if arch == "grok" else 0.0)),
                n_expert_groups=int(kv("expert_group_count", 1) or 1),
                n_group_used=int(kv("expert_group_used_count", 1) or 1),
                # grovemoe chunk-expert KVs (llama-model.cpp:2326-2332)
                group_experts=int(kv("experts_per_group", 0) or 0),
                group_scale=float(kv("expert_group_scale", 0.0) or 0.0),
                n_ff_chexp=int(kv("expert_chunk_feed_forward_length", 0) or 0),
            )

        # deepseek2 multi-head latent attention: the cache is MQA over
        # [rope | latent]; n_kv_heads/head_dim describe the CACHE dims
        mla = None
        kv_lora = int(kv("attention.kv_lora_rank", 0))
        attn_scale_override = 0.0
        if arch in ("deepseek2", "minicpm3", "plm") and kv_lora > 0:
            mla = MlaConfig(
                kv_lora_rank=kv_lora,
                q_lora_rank=int(kv("attention.q_lora_rank", 0) or 0),
                qk_nope_dim=int(kv("attention.key_length")) - rope_dim,
                qk_rope_dim=rope_dim,
                v_head_dim=int(kv("attention.value_length")),
            )
            # YaRN-aware kq scale (reference deepseek2.cpp:20-30: mscale^2 /
            # sqrt(full qk head dim)); mscale = 1 without rope scaling.
            # minicpm3 uses the plain 1/sqrt(head_k) (minicpm3.cpp:8)
            import math

            head_k = int(kv("attention.key_length"))
            mscale = 1.0
            if arch == "deepseek2" and scale_factor > 1.0 and scaling == "yarn":
                log_mul = float(kv("rope.scaling.yarn_log_multiplier", 0.1))
                mscale = 1.0 + log_mul * math.log(scale_factor)
            attn_scale_override = mscale * mscale / math.sqrt(head_k)

        wkv = None
        whs = int(kv("wkv.head_size", 0) or 0)
        if whs > 0:
            wkv = WkvConfig(
                head_size=whs,
                time_mix_extra_dim=int(kv("time_mix_extra_dim", 32)),
                time_decay_extra_dim=int(kv("time_decay_extra_dim", 64)),
                rescale_every=int(kv("rescale_every_n_layers", 0) or 0),
                token_shift_count=int(kv("token_shift_count", 2)),
            )

        ssm = None
        if kv("ssm.inner_size"):
            ssm = SsmConfig(
                d_conv=int(kv("ssm.conv_kernel", 4)),
                d_inner=int(kv("ssm.inner_size")),
                d_state=int(kv("ssm.state_size", 16)),
                dt_rank=int(kv("ssm.time_step_rank", n_embd // 16)),
                n_group=int(kv("ssm.group_count", 0) or 0),
            )

        logit_scale = float(kv("logit_scale",
                               0.5773502691896257 if arch == "grok" else 1.0))
        if arch in ("granite", "granitemoe") and logit_scale not in (0.0, 1.0):
            # granite DIVIDES logits by the scale (reference granite.cpp:65);
            # cohere-style logit_scale multiplies
            logit_scale = 1.0 / logit_scale

        # per-layer head_count_kv array marks hybrid models: layers with 0
        # kv heads are recurrent (reference src/llama-model.cpp:1494-1506)
        attn_layers = None
        kv_heads_layers = None
        hckv = kv("attention.head_count_kv", n_heads)
        if isinstance(hckv, (list, tuple)) or (
            hasattr(hckv, "ndim") and getattr(hckv, "ndim", 0) == 1
        ):
            vals = [int(v) for v in hckv]
            if arch in ("deci", "openelm"):
                # per-layer GQA widths (deci: 0 = linear/dummy block;
                # openelm: per-layer varied GQA), NOT a hybrid marker
                kv_heads_layers = tuple(vals)
            else:
                attn_layers = tuple(v > 0 for v in vals)
            hckv = max(vals) if any(vals) else 1

        altup = None
        if arch == "gemma3n":
            spars = f.kv("gemma3n.activation_sparsity_scale")
            spars = tuple(float(x) for x in spars) if spars is not None else ()
            # -inf markers (sparsity fraction 0 -> icdf(0)) mean "off"
            spars = tuple(s if s > -1e30 else 0.0 for s in spars)
            altup = AltUpConfig(
                n_altup=int(kv("altup.num_inputs", 4)),
                active_idx=int(kv("altup.active_idx", 0)),
                per_layer_dim=int(kv("embedding_length_per_layer_input", 256)),
                n_kv_shared=int(kv("attention.shared_kv_layers", 0) or 0),
                sparsity=spars,
            )
        if arch == "qwen3next":
            # linear-attention (gated deltanet) layers everywhere except
            # every 4th full-attention layer (reference
            # llama-model.cpp:2393-2396 recurrent_layer_arr)
            attn_layers = tuple((i + 1) % 4 == 0 for i in range(int(kv("block_count"))))

        qpas = kv("attention.query_pre_attn_scalar")
        return cls(
            arch=arch,
            n_layers=int(kv("block_count")),
            n_embd=n_embd,
            n_heads=n_heads,
            n_kv_heads=1 if mla else int(hckv),
            head_dim=(mla.qk_rope_dim + mla.kv_lora_rank) if mla else head_dim,
            n_ff=(max(int(v) for v in _ffl) if isinstance((_ffl := kv(
                "feed_forward_length", 0)), (list, tuple)) or getattr(
                    _ffl, "ndim", 0) == 1 else int(_ffl or 0)),
            vocab_size=vocab_size,
            ctx_len=int(kv("context_length", 4096)),
            norm_eps=float(
                kv("attention.layer_norm_rms_epsilon", kv("attention.layer_norm_epsilon", 1e-5))
            ),
            rope=rope,
            rope_swa=rope_swa,
            moe=moe,
            attn_logit_softcap=float(kv("attn_logit_softcapping",
                                        30.0 if arch == "grok" else 0.0)),
            final_logit_softcap=float(kv("final_logit_softcapping", 0.0)),
            logit_scale=logit_scale,
            emb_scale=float(kv("embedding_scale",
                               # grok-1 embedding_multiplier_scale default
                               # (reference llama-model.cpp:799); afmoe MuP
                               # scales embeddings by sqrt(n_embd)
                               # (reference src/models/afmoe.cpp:10)
                               78.38367176906169 if arch == "grok"
                               else float(n_embd) ** 0.5 if arch == "afmoe"
                               else 1.0)),
            residual_scale=float(kv("residual_scale", 1.0)),
            sliding_window=int(kv("attention.sliding_window", 0)),
            swa_pattern={"gemma2": 2, "gemma3": 6, "gemma3n": 5, "cohere2": 4,
                         "afmoe": 4, "exaone-moe": 4,
                         "gpt-oss": 2, "olmo3": 4, "exaone4": 4,
                         # smallthinker set_swa_pattern(4, dense_first=true)
                         # (reference llama-model.cpp:2306)
                         "smallthinker": 4}.get(
                arch,
                # plamo3/modern-bert: KV-driven period (llama-model.cpp
                # PLAMO3 default 8, MODERN_BERT default 3)
                int(kv("attention.sliding_window_pattern",
                       3 if arch == "modern-bert" else 8) or 8)
                if arch in ("plamo3", "modern-bert")
                and int(kv("attention.sliding_window", 0))
                else 1),
            swa_dense_first=arch == "smallthinker",
            router_input="raw" if arch == "smallthinker" else "norm",
            moe_dense_parallel=arch == "grok",
            qkv_bias=arch in ("qwen2", "qwen2moe"),
            clamp_kqv=float(kv("attention.clamp_kqv", 0.0) or 0.0),
            qk_norm_post_rope=arch in ("hunyuan-moe", "hunyuan-dense"),
            qk_norm_layer=arch == "chameleon",
            swin_norm=bool(kv("swin_norm", False)),
            xielu=_xielu_params(f, int(kv("block_count"))) if arch == "apertus" else None,
            act=(
                "swiglu_oai" if arch == "gpt-oss"
                else "gelu" if arch.startswith("gemma")
                # HF GPTNeoX uses exact (erf) gelu; starcoder2 the tanh one
                else "gelu_exact" if arch in ("gptneox", "falcon", "mpt")
                else "gelu" if arch in ("starcoder2", "gpt2", "phi2", "bloom",
                                        "starcoder")
                else "relu2" if arch in ("nemotron", "arcee", "nemotron-h", "plm")
                else "xielu" if arch == "apertus"
                else "gelu" if arch == "grok"
                else "relu" if arch == "smallthinker"
                else "silu"
            ),
            attn_scale=attn_scale_override
            or ((1.0 / float(qpas) ** 0.5) if qpas else 0.0)
            or float(kv("attention.scale", 0.0))
            # grok folds 1/sqrt(d) into attention.output_scale (reference
            # llama-model.cpp:800, llama-graph.cpp:1546)
            or float(kv("attention.output_scale",
                        0.08838834764831845 if arch == "grok" else 0.0))
            # jais scales scores by 1/d, not 1/sqrt(d) (reference
            # src/models/jais.cpp build_attn 1.0f/float(n_embd_head))
            or (1.0 / head_dim if arch == "jais" else 0.0),
            pooling={0: "none", 1: "mean", 2: "cls", 3: "last", 4: "rank"}.get(
                int(kv("pooling_type", 0)), "none"
            ),
            mla=mla,
            altup=altup,
            kv_heads_layers=kv_heads_layers,
            ssm=ssm,
            wkv=wkv,
            norm_kind=(
                "layer"
                if arch in ("gptneox", "starcoder2", "stablelm", "command-r",
                            "gpt2", "falcon", "nemotron", "olmo", "mpt",
                            "starcoder",
                            "phi2", "cohere2", "bloom", "dbrx", "jais",
                            "orion", "codeshell",
                            # modern-bert: LLM_NORM (bias-free LN) blocks
                            "modern-bert")
                or arch.startswith("rwkv")
                else "rms"
            ),
            attn_layers=attn_layers,
            # jamba attention has no rope; gpt2 uses learned position
            # embeddings; mpt uses ALiBi
            use_rope=arch not in ("jamba", "gpt2", "mpt", "bloom", "jais",
                                  "nemotron-h", "refact", "starcoder"),
            parallel_residual=(
                # plamo: attn and FFN both read the attn_norm output, the
                # layer output is ffn + attn + input (src/models/plamo.cpp)
                "shared" if arch in ("command-r", "phi2", "cohere2", "plamo")
                else "separate" if bool(kv("use_parallel_residual", False))
                else "none"
            ),
            # cohere2/exaone4 apply rope ONLY on sliding layers: the full-
            # attention layer of each window group is NoPE (HF is_sliding
            # gating; reference models/cohere2-iswa.cpp, exaone4.cpp)
            nope_step={"smollm3": 4, "cohere2": 4, "exaone4": 4,
                       "exaone-moe": 4,
                       # afmoe: rope only off the every-4th full-attention
                       # layer (reference llama-model.cpp:2243)
                       "afmoe": 4}.get(
                arch,
                # smallthinker: full-attention layers (il%4==0) are NoPE
                # when SWA is on (reference llama-model.cpp:2299-2314)
                4 if arch == "smallthinker"
                and int(kv("attention.sliding_window", 0)) > 0 else 0),
            alibi_bias_max=float(kv("attention.max_alibi_bias", 0.0) or 0.0),
            shortconv_l=int(kv("shortconv.l_cache", 0) or 0),
            parallel_hybrid=arch == "falcon-h1",
            rel_buckets=int(kv("attention.relative_buckets_count", 0) or 0),
            rel_max_dist=int(kv("attention.relative_max_distance", 128) or 128),
            dec_start_token=int(kv("decoder_start_token_id", -1)
                                if kv("decoder_start_token_id") is not None else -1),
        )

    def with_(self, **kw) -> "ModelConfig":
        return replace(self, **kw)


def _xielu_params(f, n_layers: int) -> tuple:
    """Per-layer xIELU parameters (apertus; reference KVs xielu.alpha_*,
    src/llama-model.cpp:2339-2346).  The GGUF carries the RAW HF
    parameters (reference convert ApertusModel stores .item() of the
    learnable scalars); HF's activation applies softplus —
    alpha_p = softplus(raw_p), alpha_n = beta + softplus(raw_n)
    (transformers activations.XIELU) — so the effective values are
    computed here and the forward uses them directly."""
    import math

    def arr(key, default):
        v = f.kv(key)
        if v is None:
            return [default] * n_layers
        return [float(x) for x in (v if hasattr(v, "__len__") else [v] * n_layers)]

    an = arr("xielu.alpha_n", 0.8)
    ap = arr("xielu.alpha_p", 0.8)
    beta = arr("xielu.beta", 0.5)
    eps = arr("xielu.eps", -1e-6)
    sp = lambda x: math.log1p(math.exp(x))
    return tuple(
        (beta[i] + sp(an[i]), sp(ap[i]), beta[i], eps[i]) for i in range(n_layers)
    )


# arches whose GGUF weights expect half-split (NeoX) rotary embedding;
# llama-family GGUFs are permuted at conversion to use adjacent-pair rope
# (see reference convert_hf_to_gguf.py permute + ggml rope NORM mode)
_NEOX_ROPE_ARCHES = {
    "exaone",
    "grovemoe",
    "plamo",
    "plamo3",
    "modern-bert",
    "bitnet",
    "bailingmoe2",
    "smallthinker",
    "openelm",
    "grok",
    "plamo2",
    "gemma3n",
    "qwen3next",
    "minimax-m2",
    "dbrx",
    "hunyuan-moe",
    "hunyuan-dense",
    "apertus",
    "qwen2",
    "qwen2moe",
    "qwen3",
    "qwen3moe",
    # m-rope text stacks: equal position components reduce ggml_rope_multi
    # to plain neox rope (ggml-cpu/ops.cpp:5565-5630)
    "qwen2vl",
    "qwen3vl",
    "qwen3vlmoe",
    "gemma",
    "gemma2",
    "gemma3",
    "phi2",
    "phi3",
    "stablelm",
    "gptneox",
    "olmo2",
    "gpt-oss",
    "starcoder2",
    "falcon",
    "nemotron",
    "olmo",
    "smollm3",
    "seed-oss",
    "olmo3",
    "phi2",
    "lfm2",
    "bamba",
    "falcon-h1",
    "arcee",
    # ernie4_5 uses adjacent-pair (interleaved) rope natively - NORM style
    "exaone4",
    "exaone-moe",
    "olmoe",
    "glm4moe",
    "dots1",
    "minicpm",
    "baichuan",
    "internlm2",
    "granitemoe",
    "dream",
    "llada-moe",
    "rnd1",
    "orion",
    "pangu-embedded",
    "codeshell",
    "qwen",
    "afmoe",
    "cogvlm",
}
