"""HF -> GGUF converter (llama-family; grows per-arch like the reference's
convert_hf_to_gguf.py ~150 converter classes, of which this is the seed).

Accepts either an in-memory transformers model or a state_dict + config
mapping, applies the llama.cpp Q/K permutation (HF half-split rotary ->
ggml adjacent-pair rotary), and writes GGUF with optional quantization.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.writer import GGUFWriter
from ..quant import blocks as qb


def _permute_qk(w: np.ndarray, n_head: int) -> np.ndarray:
    """llama.cpp conversion permute (reference: convert_hf_to_gguf.py
    LlamaModel.permute): regroup each head's rows from [first-half,
    second-half] rotary layout into interleaved (even, odd) pairs."""
    out_dim = w.shape[0]
    return (
        w.reshape(n_head, 2, out_dim // n_head // 2, *w.shape[1:])
        .swapaxes(1, 2)
        .reshape(w.shape)
    )


def _emit(writer: GGUFWriter, name: str, data: np.ndarray, gtype: GGMLType):
    data = np.ascontiguousarray(data.astype(np.float32))
    blk, _ = qb.GGML_BLOCK_SIZES[gtype]
    if data.ndim >= 1 and data.shape[-1] % blk != 0:
        gtype = GGMLType.F32  # fallback for non-divisible rows
    if gtype == GGMLType.F32:
        writer.add_tensor(name, data)
    else:
        writer.add_tensor(name, qb.quantize(data, gtype), logical_shape=data.shape, gtype=gtype)


def _npy(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


# per-arch conversion quirks (the seed of the reference's ~150 converter
# classes in convert_hf_to_gguf.py)
_ARCH_RULES = {
    # ggml llama uses adjacent-pair rope -> permute Q/K; no biases
    "llama": dict(permute_qk=True, qkv_bias=False, norm_plus_one=False),
    "mistral": dict(permute_qk=True, qkv_bias=False, norm_plus_one=False),
    "mistral3": dict(permute_qk=True, qkv_bias=False, norm_plus_one=False),
    "llama-embed": dict(permute_qk=True, qkv_bias=False, norm_plus_one=False),
    "mixtral": dict(permute_qk=True, qkv_bias=False, norm_plus_one=False),
    # ggml qwen2 keeps HF half-split (neox) rope; attn has biases
    "qwen2": dict(permute_qk=False, qkv_bias=True, norm_plus_one=False),
    # gemma2: neox rope, sandwich norms stored as (w+1) -> ggml stores w+1
    "gemma2": dict(permute_qk=False, qkv_bias=False, norm_plus_one=True),
    # qwen3: neox rope, per-head q/k RMSNorm instead of biases
    "qwen3": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # gemma3: gemma2 sandwich norms + QK-norm + per-layer-type rope base
    "gemma3": dict(permute_qk=False, qkv_bias=False, norm_plus_one=True),
    # phi3: neox rope; HF ships fused qkv_proj / gate_up_proj, kept fused
    # like the reference converter (loader splits by block rows)
    "phi3": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False, fused=True),
    # olmo2: neox rope, full-dim QK norm, post-only norms
    "olmo2": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # granite: llama layout + scalar multipliers in the KVs
    "granite": dict(permute_qk=True, qkv_bias=False, norm_plus_one=False),
    # qwen2moe: qwen2 attention + MoE with sigmoid-gated shared expert
    "qwen2moe": dict(permute_qk=False, qkv_bias=True, norm_plus_one=False),
    # qwen3moe: qwen3 attention (per-head QK norm) + MoE
    "qwen3moe": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # grovemoe: qwen3-style attention (per-head QK norm, neox rope) + MoE
    # with adjugate chunk experts (reference src/models/grovemoe.cpp)
    "grovemoe": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # qwen2vl/qwen3vl(-moe) TEXT stacks: qwen2/qwen3/qwen3moe layouts with
    # m-rope sections (equal text positions -> plain neox rope; reference
    # src/models/qwen2vl.cpp, qwen3vl.cpp, qwen3vl-moe.cpp)
    "qwen2vl": dict(permute_qk=False, qkv_bias=True, norm_plus_one=False),
    "qwen3vl": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    "qwen3vlmoe": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # plamo v1: shared-norm parallel residual, neox rope, GQA via the
    # reference converter's kv-major head shuffle (convert_hf_plamo)
    "plamo": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # gpt-oss: attn biases + sinks, alternating SWA, MoE with biases
    "gpt-oss": dict(permute_qk=False, qkv_bias=True, norm_plus_one=False),
    # stablelm: LayerNorm(+bias), partial rotary, optional attn biases
    "stablelm": dict(permute_qk=False, qkv_bias=True, norm_plus_one=False),
    # starcoder2: LayerNorm(+bias), biases everywhere, non-gated gelu MLP
    "starcoder2": dict(permute_qk=False, qkv_bias=True, norm_plus_one=False),
    # command-r (cohere): shared-norm parallel residual, LayerNorm no bias,
    # logit_scale, tied embeddings
    "command-r": dict(permute_qk=False, qkv_bias=True, norm_plus_one=False),
    # nemotron: LayerNorm1P (weight stored minus one), partial rotary,
    # relu^2 non-gated MLP
    "nemotron": dict(permute_qk=False, qkv_bias=False, norm_plus_one=True),
    # olmo (v1): non-parametric LayerNorm -> emit all-ones norm weights
    "olmo": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False, ones_norms=True),
    # glm4: double sandwich norms, fused gate_up, attn biases, partial rotary
    "glm4": dict(permute_qk=False, qkv_bias=True, norm_plus_one=False),
    # smollm3: llama layout + NoPE every 4th layer (handled by nope_step)
    "smollm3": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # seed-oss: llama layout + attn biases
    "seed-oss": dict(permute_qk=False, qkv_bias=True, norm_plus_one=False),
    # olmo3: olmo2 post-only norms + QK norm + sliding-window pattern
    "olmo3": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # arcee: llama layout + NON-gated relu^2 MLP (generic loop detects the
    # missing gate_proj)
    "arcee": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # ernie 4.5 dense: llama clone, neox rope
    "ernie4_5": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # dream (diffusion): qwen2 weights (attn biases, neox rope), non-causal
    "dream": dict(permute_qk=False, qkv_bias=True, norm_plus_one=False),
    # llada (diffusion): llama weights, undo_permute -> adjacent-pair rope
    "llada": dict(permute_qk=True, qkv_bias=False, norm_plus_one=False),
    # llada-moe (diffusion): qwen3moe-style per-head QK norm + softmax MoE
    "llada-moe": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # rnd1 (diffusion): qwen2moe weights (shared expert), non-causal
    "rnd1": dict(permute_qk=False, qkv_bias=True, norm_plus_one=False),
    # chameleon: llama layout (permuted rope) + per-head q/k LAYERNORM with
    # bias (weights interleaved into the adjacent-pair basis) + swin_norm
    "chameleon": dict(permute_qk=True, qkv_bias=False, norm_plus_one=False),
    # orion: LayerNorm(+bias) norms, neox rope, gated silu FFN
    "orion": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # xverse: llama clone (NORM rope -> permuted)
    "xverse": dict(permute_qk=True, qkv_bias=False, norm_plus_one=False),
    # pangu-embedded: llama + q/k/v/o biases, neox rope
    "pangu-embedded": dict(permute_qk=False, qkv_bias=True, norm_plus_one=False),
    # maincoder: llama clone (NORM rope -> permuted)
    "maincoder": dict(permute_qk=True, qkv_bias=False, norm_plus_one=False),
    # refact: llama layout with NO positional encoding at all
    "refact": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # afmoe: neox rope, per-head QK norm, attention out-gate, sandwich
    # norms, sigmoid MoE with shared expert + dense lead
    "afmoe": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # exaone-moe: exaone4 attention (per-head QK norm, rope on SWA layers
    # only) + deepseek-style MoE with shared expert
    "exaone-moe": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # exaone4: olmo2-style post-only norms + per-head QK norm + hybrid SWA
    # (rope only on sliding layers -> nope_step on the full-attn layers)
    "exaone4": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # cohere2: command-r shared-norm parallel residual + logit_scale +
    # iSWA (rope only on sliding layers); interleaved rope like command-r
    "cohere2": dict(permute_qk=False, qkv_bias=True, norm_plus_one=False),
    # olmoe: full-dim QK norm + 64-expert top-8 MoE
    "olmoe": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # glm4moe: partial rotary + optional per-head QK norm + deepseek-style
    # MoE (sigmoid gate, group routing, shared experts, leading dense)
    "glm4moe": dict(permute_qk=False, qkv_bias=True, norm_plus_one=False),
    # dots1: qwen3 attention (per-head QK norm) + deepseek-v3 MoE
    "dots1": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # minicpm: llama layout + emb/residual/logit scaling knobs
    "minicpm": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # baichuan (7B rope variant): llama layout, fused W_pack qkv
    "baichuan": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # internlm2: llama graph; grouped wqkv unpacked by convert_hf_internlm2
    "internlm2": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # granitemoe: granite scalar multipliers + fused-input_linear MoE with
    # softmax-over-selected gating (our gate_func 3)
    "granitemoe": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # chatglm (GLM-4 lineage, HF GlmForCausalLM): adjacent-pair partial
    # rotary kept unpermuted, qkv biases, fused [gate|up] stored as ffn_up
    # (reference chatglm.cpp LLM_FFN_SWIGLU with no gate tensor)
    "chatglm": dict(permute_qk=False, qkv_bias=True, norm_plus_one=False,
                    gateup_as_up=True),
    # hunyuan: neox rope + per-head q/k norms applied AFTER rope; MoE
    # variant adds softmax-gated experts + ungated shared expert
    "hunyuan-dense": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    "hunyuan-moe": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # apertus: neox rope, per-head q/k norms, non-gated xIELU MLP with
    # per-layer activation scalars hoisted into xielu.* KV arrays
    "apertus": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # ernie 4.5 MoE: llama attention + interleaved dense/MoE layers with
    # shared experts and a deepseek3-style selection-bias router
    "ernie4_5-moe": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # minimax-m2: neox rope over rotary_dim < head_dim, FULL-width q/k RMS
    # norms (olmo2-style), mixtral-layout experts with a sigmoid router +
    # deepseek3-style selection bias (reference src/models/minimax-m2.cpp)
    "minimax-m2": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # exaone 3.x: llama graph, neox rope over rope_pct*head_dim
    # (src/models/exaone.cpp)
    "exaone": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # deepseek v1: llama attention (permuted rope) + softmax MoE with
    # shared experts and leading dense layers (src/models/deepseek.cpp)
    "deepseek": dict(permute_qk=True, qkv_bias=False, norm_plus_one=False),
    # arctic: llama attention + dense ffn AND a parallel residual MoE fed
    # from the raw layer input (src/models/arctic.cpp)
    "arctic": dict(permute_qk=True, qkv_bias=False, norm_plus_one=False),
    # bailingmoe (Ling): fused query_key_value split + llama-permute,
    # deepseek-style softmax MoE + shared experts (src/models/bailingmoe.cpp)
    "bailingmoe": dict(permute_qk=True, qkv_bias=False, norm_plus_one=False),
    # bailingmoe2 (Ling/Ring 2.0): neox partial rope, FULL-width q/k RMS
    # norms, sigmoid router with group routing (src/models/bailingmoe2.cpp)
    "bailingmoe2": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # grok: neox rope, sandwich norms, gelu MoE (+ grok-2 parallel dense
    # ffn), attn/router soft-caps, output scales (src/models/grok.cpp)
    "grok": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
    # smallthinker: MoE routed on the RAW layer input with gated-relu
    # experts; optional 4-dense-first SWA + NoPE (src/models/smallthinker.cpp)
    "smallthinker": dict(permute_qk=False, qkv_bias=False, norm_plus_one=False),
}


def convert_hf_llama(
    state_dict: Mapping[str, Any],
    config: Mapping[str, Any],
    out_path: str,
    *,
    arch: str = "llama",
    gtype: GGMLType = GGMLType.F32,
    vector_gtype: GGMLType = GGMLType.F32,
    tokenizer_kv: Mapping[str, Any] | None = None,
) -> str:
    """state_dict: HF *ForCausalLM tensors (numpy or torch); config: HF
    config dict (hidden_size, num_attention_heads, ...)."""

    npy = _npy
    rules = _ARCH_RULES[arch]

    n_head = int(config["num_attention_heads"])
    n_kv = int(config.get("num_key_value_heads", n_head))
    n_layer = int(config["num_hidden_layers"])
    n_embd = int(config["hidden_size"])
    head_dim = int(config.get("head_dim", n_embd // n_head))

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add("general.name", str(config.get("_name_or_path", "converted")))
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", int(config.get("max_position_embeddings", 4096)))
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", int(config["intermediate_size"]))
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_kv)
    w.add(f"{arch}.attention.key_length", head_dim)
    w.add(f"{arch}.attention.value_length", head_dim)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon",
          float(config.get("rms_norm_eps",
                           config.get("layer_norm_eps",
                                      config.get("norm_epsilon", config.get("norm_eps", 1e-5))))))
    w.add(f"{arch}.rope.freq_base", float(config.get("rope_theta", 10000.0)))
    # stablelm/gptneox partial rotary
    rope_dim = int(head_dim * float(config.get("partial_rotary_factor", 1.0)))
    w.add(f"{arch}.rope.dimension_count", rope_dim)
    if "use_parallel_residual" in config:
        w.add(f"{arch}.use_parallel_residual", bool(config["use_parallel_residual"]))
    if "logit_scale" in config:
        w.add(f"{arch}.logit_scale", float(config["logit_scale"]))
    if "layer_norm_eps" in config:  # LayerNorm archs
        w.add(f"{arch}.attention.layer_norm_epsilon", float(config["layer_norm_eps"]))
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    if "attn_logit_softcapping" in config and config["attn_logit_softcapping"]:
        w.add(f"{arch}.attn_logit_softcapping", float(config["attn_logit_softcapping"]))
    if config.get("router_logit_softcapping"):  # grok
        w.add(f"{arch}.router_logit_softcapping", float(config["router_logit_softcapping"]))
    if "attn_output_multiplier" in config:  # grok attention output scale
        w.add(f"{arch}.attention.output_scale", float(config["attn_output_multiplier"]))
    if "embedding_multiplier_scale" in config:  # grok
        w.add(f"{arch}.embedding_scale", float(config["embedding_multiplier_scale"]))
    if "output_multiplier_scale" in config:  # grok
        w.add(f"{arch}.logit_scale", float(config["output_multiplier_scale"]))
    if "final_logit_softcapping" in config and config["final_logit_softcapping"]:
        w.add(f"{arch}.final_logit_softcapping", float(config["final_logit_softcapping"]))
    if "query_pre_attn_scalar" in config:
        w.add(f"{arch}.attention.query_pre_attn_scalar", float(config["query_pre_attn_scalar"]))
    if "sliding_window" in config and config.get("sliding_window"):
        w.add(f"{arch}.attention.sliding_window", int(config["sliding_window"]))
    if config.get("rope_local_base_freq"):  # gemma3 local-layer rope base
        w.add(f"{arch}.rope.freq_base_swa", float(config["rope_local_base_freq"]))
    if "num_local_experts" in config:  # mixtral/gpt-oss-style MoE
        w.add(f"{arch}.expert_count", int(config["num_local_experts"]))
        w.add(f"{arch}.expert_used_count", int(config.get("num_experts_per_tok", 2)))
        if config.get("scoring_func") == "sigmoid":  # minimax-m2 router
            w.add(f"{arch}.expert_gating_func", 2)
        if arch == "minimax-m2":
            w.add(f"{arch}.expert_feed_forward_length", int(config["intermediate_size"]))
    if "num_experts" in config:  # qwen2moe/qwen3moe naming
        w.add(f"{arch}.expert_count", int(config["num_experts"]))
        w.add(f"{arch}.expert_used_count", int(config.get("num_experts_per_tok", 2)))
    if arch == "grovemoe":
        # chunk-expert KVs; the HF config carries none of these, so the
        # reference converter hardcodes the GroveMoE-Inst modeling values
        # (convert_hf_to_gguf.py GroveMoeModel:9457-9462) — honored here
        # as defaults, overridable via config keys
        w.add(f"{arch}.expert_chunk_feed_forward_length",
              int(config.get("head_dim") or 128))
        w.add(f"{arch}.experts_per_group", int(config.get("n_group_experts", 2)))
        w.add(f"{arch}.expert_group_scale", float(config.get("expert_group_scale", 0.05)))
        w.add(f"{arch}.expert_weights_norm", True)
    if "moe_num_primary_experts" in config:  # smallthinker
        w.add(f"{arch}.expert_count", int(config["moe_num_primary_experts"]))
        w.add(f"{arch}.expert_used_count", int(config["moe_num_active_primary_experts"]))
        w.add(f"{arch}.expert_feed_forward_length", int(config["moe_ffn_hidden_size"]))
        w.add(f"{arch}.expert_gating_func",
              1 if config.get("moe_primary_router_apply_softmax") else 2)
        if config.get("sliding_window_size") and any(
                config.get("sliding_window_layout") or []):
            w.add(f"{arch}.attention.sliding_window", int(config["sliding_window_size"]))
    if "num_shared_experts" in config:  # bailingmoe v1/v2
        w.add(f"{arch}.expert_shared_count", int(config["num_shared_experts"]))
        if "moe_intermediate_size" in config:
            w.add(f"{arch}.expert_shared_feed_forward_length",
                  int(config.get("moe_shared_expert_intermediate_size",
                                 int(config["moe_intermediate_size"])
                                 * int(config["num_shared_experts"]))))
    if config.get("score_function") == "sigmoid" or (
            arch == "bailingmoe2" and config.get("scoring_func") == "sigmoid"):
        w.add(f"{arch}.expert_gating_func", 2)
    if "moe_intermediate_size" in config and not isinstance(
            config["moe_intermediate_size"], (list, tuple)):  # hunyuan: per-layer list
        w.add(f"{arch}.expert_feed_forward_length", int(config["moe_intermediate_size"]))
    if "shared_expert_intermediate_size" in config:
        w.add(f"{arch}.expert_shared_count", 1)
        w.add(f"{arch}.expert_shared_feed_forward_length", int(config["shared_expert_intermediate_size"]))
    if "norm_topk_prob" in config:
        w.add(f"{arch}.norm_topk_prob", bool(config["norm_topk_prob"]))
    # deepseek-v3-style MoE knobs (glm4moe/dots1 HF naming)
    if "n_routed_experts" in config:
        w.add(f"{arch}.expert_count", int(config["n_routed_experts"]))
        w.add(f"{arch}.expert_used_count", int(config.get("num_experts_per_tok", 2)))
    if config.get("n_shared_experts"):
        w.add(f"{arch}.expert_shared_count", int(config["n_shared_experts"]))
        if "moe_intermediate_size" in config:
            w.add(f"{arch}.expert_shared_feed_forward_length",
                  int(config["moe_intermediate_size"]) * int(config["n_shared_experts"]))
    if "n_dense_layers" in config:  # afmoe leading dense layers
        w.add(f"{arch}.leading_dense_block_count", int(config["n_dense_layers"]))
    if "route_norm" in config:  # afmoe routed-weight normalization
        w.add(f"{arch}.expert_weights_norm", bool(config["route_norm"]))
    if "route_scale" in config:
        w.add(f"{arch}.expert_weights_scale", float(config["route_scale"]))
    if arch == "afmoe":
        w.add(f"{arch}.expert_gating_func", 2)  # sigmoid default
    if "first_k_dense_replace" in config:
        w.add(f"{arch}.leading_dense_block_count", int(config["first_k_dense_replace"]))
    if "routed_scaling_factor" in config:
        w.add(f"{arch}.expert_weights_scale", float(config["routed_scaling_factor"]))
    if "n_routed_experts" in config and config.get("scoring_func", "sigmoid") == "sigmoid":
        # deepseek-v3-family routers (glm4moe has no scoring_func field)
        w.add(f"{arch}.expert_gating_func", 2)
    if int(config.get("n_group", 1) or 1) > 1:
        w.add(f"{arch}.expert_group_count", int(config["n_group"]))
        w.add(f"{arch}.expert_group_used_count", int(config.get("topk_group", 1)))
    if arch == "chameleon" and config.get("swin_norm"):
        w.add(f"{arch}.swin_norm", True)
    # minicpm scaling knobs (reference llama-model.cpp minicpm loading)
    if "scale_emb" in config:
        w.add(f"{arch}.embedding_scale", float(config["scale_emb"]))
    if "scale_depth" in config:
        w.add(f"{arch}.residual_scale",
              float(config["scale_depth"]) / float(n_layer) ** 0.5)
    if "dim_model_base" in config:
        w.add(f"{arch}.logit_scale", float(config["dim_model_base"]) / float(n_embd))
    if arch == "gpt-oss":
        w.add(f"{arch}.expert_feed_forward_length", int(config["intermediate_size"]))
        w.add(f"{arch}.expert_gating_func", 3)  # softmax over selected weights
    if arch == "granitemoe":
        w.add(f"{arch}.expert_feed_forward_length", int(config["intermediate_size"]))
        w.add(f"{arch}.expert_gating_func", 3)  # topk logits -> softmax(selected)
        if config.get("shared_intermediate_size"):  # granitemoeshared
            w.add(f"{arch}.expert_shared_count", 1)
            w.add(f"{arch}.expert_shared_feed_forward_length",
                  int(config["shared_intermediate_size"]))
    if arch == "hunyuan-moe":
        topk = config.get("moe_topk", 2)
        w.add(f"{arch}.expert_count", int(config["num_experts"]))
        w.add(f"{arch}.expert_used_count", int(topk[0] if isinstance(topk, list) else topk))
        mi = config.get("moe_intermediate_size", config["intermediate_size"])
        w.add(f"{arch}.expert_feed_forward_length", int(mi[0] if isinstance(mi, list) else mi))
        w.add(f"{arch}.expert_shared_count", 1)
        w.add(f"{arch}.expert_weights_norm", True)
        w.add(f"{arch}.expert_shared_feed_forward_length", int(config["intermediate_size"]))
    if arch == "ernie4_5-moe":
        w.add(f"{arch}.expert_count", int(config["moe_num_experts"]))
        w.add(f"{arch}.expert_used_count", int(config.get("moe_k", 2)))
        w.add(f"{arch}.expert_weights_norm", True)
        w.add(f"{arch}.leading_dense_block_count", int(config.get("moe_layer_start_index", 0)))
        if config.get("moe_num_shared_experts"):
            w.add(f"{arch}.expert_shared_count", int(config["moe_num_shared_experts"]))
            w.add(f"{arch}.expert_shared_feed_forward_length",
                  int(config["moe_intermediate_size"]) * int(config["moe_num_shared_experts"]))
    if arch == "apertus":
        # per-layer xIELU scalars -> KV arrays of the RAW parameters, the
        # reference converter's convention (convert_hf_to_gguf.py
        # ApertusModel; the loader applies the HF softplus transform)
        nl = int(config["num_hidden_layers"])
        for hf_key, kv_key in (("alpha_n", "xielu.alpha_n"), ("alpha_p", "xielu.alpha_p"),
                               ("beta", "xielu.beta"), ("eps", "xielu.eps")):
            vals = [float(_npy(state_dict[f"model.layers.{il}.mlp.act_fn.{hf_key}"]).reshape(-1)[0])
                    for il in range(nl)]
            w.add(kv_key, vals)
    # granite scalar multipliers (reference: llama-model.cpp:2039-2043)
    if "embedding_multiplier" in config:
        w.add(f"{arch}.embedding_scale", float(config["embedding_multiplier"]))
    if "residual_multiplier" in config:
        w.add(f"{arch}.residual_scale", float(config["residual_multiplier"]))
    if "attention_multiplier" in config:
        w.add(f"{arch}.attention.scale", float(config["attention_multiplier"]))
    if "logits_scaling" in config:
        w.add(f"{arch}.logit_scale", float(config["logits_scaling"]))
    rs = config.get("rope_scaling") or {}
    if rs.get("mrope_section"):
        # qwen2vl/qwen3vl m-rope sections [t, h, w(, e)]; text tokens carry
        # equal position components, under which ggml_rope_multi reduces
        # exactly to neox rope (ggml-cpu/ops.cpp:5565-5630 — the theta
        # progression is shared, only the position source varies per
        # sector), so the text stack needs only this KV for parity
        sec = [int(s) for s in rs["mrope_section"]]
        w.add(f"{arch}.rope.dimension_sections", (sec + [0, 0, 0, 0])[:4])
    if rs.get("rope_type") == "yarn":
        w.add(f"{arch}.rope.scaling.type", "yarn")
        w.add(f"{arch}.rope.scaling.factor", float(rs["factor"]))
        w.add(f"{arch}.rope.scaling.original_context_length",
              int(rs.get("original_max_position_embeddings", 4096)))
    if rs.get("rope_type") == "llama3":
        w.add(f"{arch}.rope.scaling.type", "linear")
        w.add(f"{arch}.rope.scaling.factor", float(rs["factor"]))
        w.add(f"{arch}.rope.scaling.low_freq_factor", float(rs["low_freq_factor"]))
        w.add(f"{arch}.rope.scaling.high_freq_factor", float(rs["high_freq_factor"]))
        w.add(f"{arch}.rope.scaling.original_context_length", int(rs["original_max_position_embeddings"]))
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    def norm(t):
        x = npy(t)
        return x + 1.0 if rules["norm_plus_one"] else x

    def perm(x, nh):
        return _permute_qk(x, nh) if rules["permute_qk"] else x

    _emit(w, "token_embd.weight", npy(state_dict["model.embed_tokens.weight"]), gtype)
    for il in range(n_layer):
        p = f"model.layers.{il}."
        o = f"blk.{il}."
        if p + "attention_layernorm.weight" in state_dict:  # apertus naming
            _emit(w, o + "attn_norm.weight", norm(state_dict[p + "attention_layernorm.weight"]), GGMLType.F32)
            _emit(w, o + "ffn_norm.weight", norm(state_dict[p + "feedforward_layernorm.weight"]), GGMLType.F32)
        if p + "pre_attn_norm.weight" in state_dict:  # grok-2 sandwich norms
            _emit(w, o + "attn_norm.weight", norm(state_dict[p + "pre_attn_norm.weight"]), GGMLType.F32)
            _emit(w, o + "attn_post_norm.weight", norm(state_dict[p + "post_attn_norm.weight"]), GGMLType.F32)
            _emit(w, o + "ffn_norm.weight", norm(state_dict[p + "pre_moe_norm.weight"]), GGMLType.F32)
            _emit(w, o + "ffn_post_norm.weight", norm(state_dict[p + "post_moe_norm.weight"]), GGMLType.F32)
        if p + "residual_layernorm.weight" in state_dict:
            # arctic: residual_layernorm -> dense-ffn norm; the HF
            # post_attention_layernorm is the PARALLEL MoE's norm on the
            # raw layer input (reference tensor_mapping.py arch_block_mappings_cfg
            # ARCTIC: FFN_NORM <- residual_layernorm, FFN_NORM_EXP <-
            # post_attention_layernorm); residual_mlp.w1/w3/w2 = gate/up/down
            _emit(w, o + "ffn_norm.weight", norm(state_dict[p + "residual_layernorm.weight"]), GGMLType.F32)
            _emit(w, o + "ffn_norm_exps.weight", norm(state_dict[p + "post_attention_layernorm.weight"]), GGMLType.F32)
            _emit(w, o + "ffn_gate.weight", npy(state_dict[p + "residual_mlp.w1.weight"]), gtype)
            _emit(w, o + "ffn_up.weight", npy(state_dict[p + "residual_mlp.w3.weight"]), gtype)
            _emit(w, o + "ffn_down.weight", npy(state_dict[p + "residual_mlp.w2.weight"]), gtype)
        if p + "input_layernorm.weight" in state_dict:  # olmo2 has none
            _emit(w, o + "attn_norm.weight", norm(state_dict[p + "input_layernorm.weight"]), GGMLType.F32)
        elif rules.get("ones_norms"):  # olmo v1: non-parametric LayerNorm
            _emit(w, o + "attn_norm.weight", np.ones(n_embd, np.float32), GGMLType.F32)
            _emit(w, o + "ffn_norm.weight", np.ones(n_embd, np.float32), GGMLType.F32)
        if p + "input_layernorm.bias" in state_dict:  # LayerNorm archs
            _emit(w, o + "attn_norm.bias", npy(state_dict[p + "input_layernorm.bias"]), GGMLType.F32)
        if p + "post_self_attn_layernorm.weight" in state_dict:  # glm4 sandwich
            _emit(w, o + "attn_post_norm.weight", norm(state_dict[p + "post_self_attn_layernorm.weight"]), GGMLType.F32)
        if p + "post_mlp_layernorm.weight" in state_dict:
            _emit(w, o + "ffn_post_norm.weight", norm(state_dict[p + "post_mlp_layernorm.weight"]), GGMLType.F32)
        if rules.get("fused"):
            _emit(w, o + "attn_qkv.weight", npy(state_dict[p + "self_attn.qkv_proj.weight"]), gtype)
            _emit(w, o + "attn_output.weight", npy(state_dict[p + "self_attn.o_proj.weight"]), gtype)
            _emit(w, o + "ffn_norm.weight", norm(state_dict[p + "post_attention_layernorm.weight"]), GGMLType.F32)
            _emit(w, o + "ffn_up.weight", npy(state_dict[p + "mlp.gate_up_proj.weight"]), gtype)
            _emit(w, o + "ffn_down.weight", npy(state_dict[p + "mlp.down_proj.weight"]), gtype)
            continue
        if p + "self_attn.W_pack.weight" in state_dict:  # baichuan fused qkv
            wp = npy(state_dict[p + "self_attn.W_pack.weight"])
            qd, kvd = n_head * head_dim, n_kv * head_dim
            _emit(w, o + "attn_q.weight", perm(wp[:qd], n_head), gtype)
            _emit(w, o + "attn_k.weight", perm(wp[qd:qd + kvd], n_kv), gtype)
            _emit(w, o + "attn_v.weight", np.ascontiguousarray(wp[qd + kvd:]), gtype)
        else:
            _emit(w, o + "attn_q.weight", perm(npy(state_dict[p + "self_attn.q_proj.weight"]), n_head), gtype)
            _emit(w, o + "attn_k.weight", perm(npy(state_dict[p + "self_attn.k_proj.weight"]), n_kv), gtype)
            _emit(w, o + "attn_v.weight", npy(state_dict[p + "self_attn.v_proj.weight"]), gtype)
        _emit(w, o + "attn_output.weight", npy(state_dict[p + "self_attn.o_proj.weight"]), gtype)
        if rules["qkv_bias"] and p + "self_attn.q_proj.bias" in state_dict:
            _emit(w, o + "attn_q.bias", npy(state_dict[p + "self_attn.q_proj.bias"]), GGMLType.F32)
            _emit(w, o + "attn_k.bias", npy(state_dict[p + "self_attn.k_proj.bias"]), GGMLType.F32)
            _emit(w, o + "attn_v.bias", npy(state_dict[p + "self_attn.v_proj.bias"]), GGMLType.F32)
        if p + "self_attn.o_proj.bias" in state_dict:  # gpt-oss
            _emit(w, o + "attn_output.bias", npy(state_dict[p + "self_attn.o_proj.bias"]), GGMLType.F32)
        if p + "self_attn.sinks" in state_dict:  # gpt-oss attention sinks
            _emit(w, o + "attn_sinks.weight", npy(state_dict[p + "self_attn.sinks"]), GGMLType.F32)
        if p + "self_attn.gate_proj.weight" in state_dict:  # afmoe out-gate
            _emit(w, o + "attn_gate.weight", npy(state_dict[p + "self_attn.gate_proj.weight"]), gtype)
        if arch == "chameleon" and p + "self_attn.q_norm.weight" in state_dict:
            # per-head LayerNorm vectors move into the adjacent-pair rope
            # basis with the same half-split interleave the reference
            # applies (convert_hf_to_gguf.py ChameleonModel._reverse_hf_permute);
            # HF stores [n_heads, head_dim] with identical rows
            def _cham(v):
                v = npy(v)
                if v.ndim == 2:
                    v = v[0]
                half = v.shape[-1] // 2
                out = np.empty_like(v)
                out[0::2] = v[:half]
                out[1::2] = v[half:]
                return out

            for nm, gg in (("q_norm", "attn_q_norm"), ("k_norm", "attn_k_norm")):
                _emit(w, o + f"{gg}.weight", _cham(state_dict[p + f"self_attn.{nm}.weight"]), GGMLType.F32)
                if p + f"self_attn.{nm}.bias" in state_dict:
                    _emit(w, o + f"{gg}.bias", _cham(state_dict[p + f"self_attn.{nm}.bias"]), GGMLType.F32)
        elif p + "self_attn.q_norm.weight" in state_dict:  # qwen3/olmo2/gemma3 QK-norm
            _emit(w, o + "attn_q_norm.weight", norm(state_dict[p + "self_attn.q_norm.weight"]), GGMLType.F32)
            _emit(w, o + "attn_k_norm.weight", norm(state_dict[p + "self_attn.k_norm.weight"]), GGMLType.F32)
        if p + "self_attn.query_layernorm.weight" in state_dict:  # hunyuan QK-norm
            _emit(w, o + "attn_q_norm.weight", norm(state_dict[p + "self_attn.query_layernorm.weight"]), GGMLType.F32)
            _emit(w, o + "attn_k_norm.weight", norm(state_dict[p + "self_attn.key_layernorm.weight"]), GGMLType.F32)
        if p + "pre_mlp_layernorm.weight" in state_dict:  # afmoe sandwich
            _emit(w, o + "attn_post_norm.weight", norm(state_dict[p + "post_attention_layernorm.weight"]), GGMLType.F32)
            _emit(w, o + "ffn_norm.weight", norm(state_dict[p + "pre_mlp_layernorm.weight"]), GGMLType.F32)
            _emit(w, o + "ffn_post_norm.weight", norm(state_dict[p + "post_mlp_layernorm.weight"]), GGMLType.F32)
        elif p + "pre_feedforward_layernorm.weight" in state_dict:  # gemma2 sandwich
            _emit(w, o + "attn_post_norm.weight", norm(state_dict[p + "post_attention_layernorm.weight"]), GGMLType.F32)
            _emit(w, o + "ffn_norm.weight", norm(state_dict[p + "pre_feedforward_layernorm.weight"]), GGMLType.F32)
            _emit(w, o + "ffn_post_norm.weight", norm(state_dict[p + "post_feedforward_layernorm.weight"]), GGMLType.F32)
        elif p + "post_feedforward_layernorm.weight" in state_dict:  # olmo2 post-only
            _emit(w, o + "post_attention_norm.weight", norm(state_dict[p + "post_attention_layernorm.weight"]), GGMLType.F32)
            _emit(w, o + "post_ffw_norm.weight", norm(state_dict[p + "post_feedforward_layernorm.weight"]), GGMLType.F32)
        elif (p + "post_attention_layernorm.weight" in state_dict
              and p + "residual_layernorm.weight" not in state_dict):
            # command-r's shared-norm parallel residual has no ffn norm
            _emit(w, o + "ffn_norm.weight", norm(state_dict[p + "post_attention_layernorm.weight"]), GGMLType.F32)
            if p + "post_attention_layernorm.bias" in state_dict:
                _emit(w, o + "ffn_norm.bias", npy(state_dict[p + "post_attention_layernorm.bias"]), GGMLType.F32)
        if p + "mlp.gate.wg.weight" in state_dict:  # hunyuan-moe router
            _emit(w, o + "ffn_gate_inp.weight", npy(state_dict[p + "mlp.gate.wg.weight"]), GGMLType.F32)
            n_exp = int(config["num_experts"])
            gate = np.stack([npy(state_dict[f"{p}mlp.experts.{e}.gate_proj.weight"]) for e in range(n_exp)])
            up = np.stack([npy(state_dict[f"{p}mlp.experts.{e}.up_proj.weight"]) for e in range(n_exp)])
            down = np.stack([npy(state_dict[f"{p}mlp.experts.{e}.down_proj.weight"]) for e in range(n_exp)])
            _emit(w, o + "ffn_gate_exps.weight", gate, gtype)
            _emit(w, o + "ffn_up_exps.weight", up, gtype)
            _emit(w, o + "ffn_down_exps.weight", down, gtype)
            _emit(w, o + "ffn_gate_shexp.weight", npy(state_dict[p + "mlp.shared_mlp.gate_proj.weight"]), gtype)
            _emit(w, o + "ffn_up_shexp.weight", npy(state_dict[p + "mlp.shared_mlp.up_proj.weight"]), gtype)
            _emit(w, o + "ffn_down_shexp.weight", npy(state_dict[p + "mlp.shared_mlp.down_proj.weight"]), gtype)
        elif p + "mlp.moe_statics.e_score_correction_bias" in state_dict and p + "mlp.gate.weight" in state_dict:
            # ernie 4.5 MoE layer (interleaved with dense layers)
            _emit(w, o + "ffn_gate_inp.weight", npy(state_dict[p + "mlp.gate.weight"]), GGMLType.F32)
            _emit(w, o + "exp_probs_b.bias",
                  npy(state_dict[p + "mlp.moe_statics.e_score_correction_bias"]).reshape(-1), GGMLType.F32)
            n_exp = int(config["moe_num_experts"])
            gate = np.stack([npy(state_dict[f"{p}mlp.experts.{e}.gate_proj.weight"]) for e in range(n_exp)])
            up = np.stack([npy(state_dict[f"{p}mlp.experts.{e}.up_proj.weight"]) for e in range(n_exp)])
            down = np.stack([npy(state_dict[f"{p}mlp.experts.{e}.down_proj.weight"]) for e in range(n_exp)])
            _emit(w, o + "ffn_gate_exps.weight", gate, gtype)
            _emit(w, o + "ffn_up_exps.weight", up, gtype)
            _emit(w, o + "ffn_down_exps.weight", down, gtype)
            if p + "mlp.shared_experts.gate_proj.weight" in state_dict:
                _emit(w, o + "ffn_gate_shexp.weight", npy(state_dict[p + "mlp.shared_experts.gate_proj.weight"]), gtype)
                _emit(w, o + "ffn_up_shexp.weight", npy(state_dict[p + "mlp.shared_experts.up_proj.weight"]), gtype)
                _emit(w, o + "ffn_down_shexp.weight", npy(state_dict[p + "mlp.shared_experts.down_proj.weight"]), gtype)
        elif p + "mlp.router.gate.weight" in state_dict:  # afmoe
            _emit(w, o + "ffn_gate_inp.weight", npy(state_dict[p + "mlp.router.gate.weight"]), GGMLType.F32)
            if p + "mlp.expert_bias" in state_dict:
                _emit(w, o + "exp_probs_b.bias",
                      npy(state_dict[p + "mlp.expert_bias"]).reshape(-1), GGMLType.F32)
            n_exp = int(config["num_experts"])
            for hf, gg in (("gate_proj", "ffn_gate_exps"), ("up_proj", "ffn_up_exps"),
                           ("down_proj", "ffn_down_exps")):
                stk = np.stack([npy(state_dict[f"{p}mlp.experts.{e}.{hf}.weight"])
                                for e in range(n_exp)])
                _emit(w, o + gg + ".weight", stk, gtype)
            for hf, gg in (("gate_proj", "ffn_gate_shexp"), ("up_proj", "ffn_up_shexp"),
                           ("down_proj", "ffn_down_shexp")):
                if f"{p}mlp.shared_experts.{hf}.weight" in state_dict:
                    _emit(w, o + gg + ".weight",
                          npy(state_dict[f"{p}mlp.shared_experts.{hf}.weight"]), gtype)
        elif p + "mlp.router.weight" in state_dict:  # gpt-oss fused experts
            _emit(w, o + "ffn_gate_inp.weight", npy(state_dict[p + "mlp.router.weight"]), GGMLType.F32)
            _emit(w, o + "ffn_gate_inp.bias", npy(state_dict[p + "mlp.router.bias"]), GGMLType.F32)
            gu = npy(state_dict[p + "mlp.experts.gate_up_proj"]).transpose(0, 2, 1)  # [E, 2F, K]
            _emit(w, o + "ffn_gate_exps.weight", np.ascontiguousarray(gu[:, ::2, :]), gtype)
            _emit(w, o + "ffn_up_exps.weight", np.ascontiguousarray(gu[:, 1::2, :]), gtype)
            gub = npy(state_dict[p + "mlp.experts.gate_up_proj_bias"])  # [E, 2F]
            _emit(w, o + "ffn_gate_exps.bias", np.ascontiguousarray(gub[:, ::2]), GGMLType.F32)
            _emit(w, o + "ffn_up_exps.bias", np.ascontiguousarray(gub[:, 1::2]), GGMLType.F32)
            dn = npy(state_dict[p + "mlp.experts.down_proj"]).transpose(0, 2, 1)  # [E, K, F]
            _emit(w, o + "ffn_down_exps.weight", np.ascontiguousarray(dn), gtype)
            _emit(w, o + "ffn_down_exps.bias", npy(state_dict[p + "mlp.experts.down_proj_bias"]), GGMLType.F32)
        elif p + "mlp.gate.weight" in state_dict:  # qwen2moe/qwen3moe/glm4moe/dots1
            _emit(w, o + "ffn_gate_inp.weight", npy(state_dict[p + "mlp.gate.weight"]), GGMLType.F32)
            if p + "mlp.gate.e_score_correction_bias" in state_dict:  # deepseek-v3 family
                _emit(w, o + "exp_probs_b.bias",
                      npy(state_dict[p + "mlp.gate.e_score_correction_bias"]), GGMLType.F32)
            n_exp = int(config.get("num_experts") or config.get("n_routed_experts")
                        or config["num_local_experts"])
            gate = np.stack([npy(state_dict[f"{p}mlp.experts.{e}.gate_proj.weight"]) for e in range(n_exp)])
            up = np.stack([npy(state_dict[f"{p}mlp.experts.{e}.up_proj.weight"]) for e in range(n_exp)])
            down = np.stack([npy(state_dict[f"{p}mlp.experts.{e}.down_proj.weight"]) for e in range(n_exp)])
            _emit(w, o + "ffn_gate_exps.weight", gate, gtype)
            _emit(w, o + "ffn_up_exps.weight", up, gtype)
            _emit(w, o + "ffn_down_exps.weight", down, gtype)
            if p + "mlp.shared_expert.gate_proj.weight" in state_dict:  # qwen2moe
                _emit(w, o + "ffn_gate_shexp.weight", npy(state_dict[p + "mlp.shared_expert.gate_proj.weight"]), gtype)
                _emit(w, o + "ffn_up_shexp.weight", npy(state_dict[p + "mlp.shared_expert.up_proj.weight"]), gtype)
                _emit(w, o + "ffn_down_shexp.weight", npy(state_dict[p + "mlp.shared_expert.down_proj.weight"]), gtype)
                _emit(w, o + "ffn_gate_inp_shexp.weight", npy(state_dict[p + "mlp.shared_expert_gate.weight"]), GGMLType.F32)
            if p + "mlp.shared_experts.gate_proj.weight" in state_dict:  # deepseek-v3 family
                _emit(w, o + "ffn_gate_shexp.weight", npy(state_dict[p + "mlp.shared_experts.gate_proj.weight"]), gtype)
                _emit(w, o + "ffn_up_shexp.weight", npy(state_dict[p + "mlp.shared_experts.up_proj.weight"]), gtype)
                _emit(w, o + "ffn_down_shexp.weight", npy(state_dict[p + "mlp.shared_experts.down_proj.weight"]), gtype)
            if p + "mlp.chunk_experts.0.gate_proj.weight" in state_dict:
                # grovemoe adjugate chunk experts (convert_hf_to_gguf.py
                # GroveMoeModel.modify_tensors chunk_experts merge)
                n_ch = n_exp // int(config.get("n_group_experts", 2))
                for hf_n, gg in (("gate_proj", "ffn_gate_chexps"),
                                 ("up_proj", "ffn_up_chexps"),
                                 ("down_proj", "ffn_down_chexps")):
                    stk = np.stack([npy(state_dict[f"{p}mlp.chunk_experts.{e}.{hf_n}.weight"])
                                    for e in range(n_ch)])
                    _emit(w, o + gg + ".weight", stk, gtype)
        elif p + "block_sparse_moe.router.layer.weight" in state_dict:  # granitemoe
            _emit(w, o + "ffn_gate_inp.weight",
                  npy(state_dict[p + "block_sparse_moe.router.layer.weight"]), GGMLType.F32)
            il_w = npy(state_dict[p + "block_sparse_moe.input_linear.weight"])  # [E, 2F, K]
            f2 = il_w.shape[1] // 2
            _emit(w, o + "ffn_gate_exps.weight", np.ascontiguousarray(il_w[:, :f2]), gtype)
            _emit(w, o + "ffn_up_exps.weight", np.ascontiguousarray(il_w[:, f2:]), gtype)
            _emit(w, o + "ffn_down_exps.weight",
                  npy(state_dict[p + "block_sparse_moe.output_linear.weight"]), gtype)
            if p + "shared_mlp.input_linear.weight" in state_dict:  # granitemoeshared
                sh = npy(state_dict[p + "shared_mlp.input_linear.weight"])  # [2F, K]
                fs = sh.shape[0] // 2
                _emit(w, o + "ffn_gate_shexp.weight", np.ascontiguousarray(sh[:fs]), gtype)
                _emit(w, o + "ffn_up_shexp.weight", np.ascontiguousarray(sh[fs:]), gtype)
                _emit(w, o + "ffn_down_shexp.weight",
                      npy(state_dict[p + "shared_mlp.output_linear.weight"]), gtype)
        elif p + "block_sparse_moe.primary_router.weight" in state_dict:
            # smallthinker: router on the raw layer input; experts named
            # .experts.{e}.{gate,up,down}.weight (convert_hf_to_gguf.py
            # SmallThinkerModel merge)
            _emit(w, o + "ffn_gate_inp.weight",
                  npy(state_dict[p + "block_sparse_moe.primary_router.weight"]), GGMLType.F32)
            n_exp = int(config.get("moe_num_primary_experts", config.get("num_experts", 0)))
            gate = np.stack([npy(state_dict[f"{p}block_sparse_moe.experts.{e}.gate.weight"]) for e in range(n_exp)])
            up = np.stack([npy(state_dict[f"{p}block_sparse_moe.experts.{e}.up.weight"]) for e in range(n_exp)])
            down = np.stack([npy(state_dict[f"{p}block_sparse_moe.experts.{e}.down.weight"]) for e in range(n_exp)])
            _emit(w, o + "ffn_gate_exps.weight", gate, gtype)
            _emit(w, o + "ffn_up_exps.weight", up, gtype)
            _emit(w, o + "ffn_down_exps.weight", down, gtype)
        elif p + "block_sparse_moe.gate.weight" in state_dict:  # mixtral MoE
            _emit(w, o + "ffn_gate_inp.weight", npy(state_dict[p + "block_sparse_moe.gate.weight"]), GGMLType.F32)
            for bk in ("block_sparse_moe.gate.e_score_correction_bias",
                       "block_sparse_moe.e_score_correction_bias"):  # minimax-m2
                if p + bk in state_dict:
                    _emit(w, o + "exp_probs_b.bias",
                          npy(state_dict[p + bk]).reshape(-1), GGMLType.F32)
                    break
            n_exp = int(config["num_local_experts"])
            gate = np.stack([npy(state_dict[f"{p}block_sparse_moe.experts.{e}.w1.weight"]) for e in range(n_exp)])
            down = np.stack([npy(state_dict[f"{p}block_sparse_moe.experts.{e}.w2.weight"]) for e in range(n_exp)])
            up = np.stack([npy(state_dict[f"{p}block_sparse_moe.experts.{e}.w3.weight"]) for e in range(n_exp)])
            _emit(w, o + "ffn_gate_exps.weight", gate, gtype)
            _emit(w, o + "ffn_up_exps.weight", up, gtype)
            _emit(w, o + "ffn_down_exps.weight", down, gtype)
            if p + "mlp.gate_proj.weight" in state_dict:
                # grok-2: dense ffn in parallel with the experts
                _emit(w, o + "ffn_gate.weight", npy(state_dict[p + "mlp.gate_proj.weight"]), gtype)
                _emit(w, o + "ffn_up.weight", npy(state_dict[p + "mlp.up_proj.weight"]), gtype)
                _emit(w, o + "ffn_down.weight", npy(state_dict[p + "mlp.down_proj.weight"]), gtype)
        elif p + "mlp.c_fc.weight" in state_dict:  # starcoder2 non-gated MLP
            _emit(w, o + "ffn_up.weight", npy(state_dict[p + "mlp.c_fc.weight"]), gtype)
            _emit(w, o + "ffn_up.bias", npy(state_dict[p + "mlp.c_fc.bias"]), GGMLType.F32)
            _emit(w, o + "ffn_down.weight", npy(state_dict[p + "mlp.c_proj.weight"]), gtype)
            _emit(w, o + "ffn_down.bias", npy(state_dict[p + "mlp.c_proj.bias"]), GGMLType.F32)
        elif p + "mlp.gate_up_proj.weight" in state_dict and rules.get("gateup_as_up"):
            # chatglm: the fused [gate|up] stays ONE tensor named ffn_up
            # (reference format; the loader remaps it to the gateup kernel)
            _emit(w, o + "ffn_up.weight", npy(state_dict[p + "mlp.gate_up_proj.weight"]), gtype)
            _emit(w, o + "ffn_down.weight", npy(state_dict[p + "mlp.down_proj.weight"]), gtype)
        elif p + "mlp.gate_up_proj.weight" in state_dict:  # glm4 fused gate|up
            gu = npy(state_dict[p + "mlp.gate_up_proj.weight"])
            half = gu.shape[0] // 2
            _emit(w, o + "ffn_gate.weight", np.ascontiguousarray(gu[:half]), gtype)
            _emit(w, o + "ffn_up.weight", np.ascontiguousarray(gu[half:]), gtype)
            _emit(w, o + "ffn_down.weight", npy(state_dict[p + "mlp.down_proj.weight"]), gtype)
        elif (p + "mlp.up_proj.weight" in state_dict
              and p + "mlp.gate_proj.weight" not in state_dict):  # nemotron relu^2 MLP
            _emit(w, o + "ffn_up.weight", npy(state_dict[p + "mlp.up_proj.weight"]), gtype)
            _emit(w, o + "ffn_down.weight", npy(state_dict[p + "mlp.down_proj.weight"]), gtype)
        elif p + "mlp.gate_proj.weight" in state_dict:
            _emit(w, o + "ffn_gate.weight", npy(state_dict[p + "mlp.gate_proj.weight"]), gtype)
            _emit(w, o + "ffn_up.weight", npy(state_dict[p + "mlp.up_proj.weight"]), gtype)
            _emit(w, o + "ffn_down.weight", npy(state_dict[p + "mlp.down_proj.weight"]), gtype)
    if "model.norm.weight" in state_dict:
        _emit(w, "output_norm.weight", norm(state_dict["model.norm.weight"]), GGMLType.F32)
    elif rules.get("ones_norms"):
        _emit(w, "output_norm.weight", np.ones(n_embd, np.float32), GGMLType.F32)
    if "model.norm.bias" in state_dict:
        _emit(w, "output_norm.bias", npy(state_dict["model.norm.bias"]), GGMLType.F32)
    if "lm_head.weight" in state_dict:
        _emit(w, "output.weight", npy(state_dict["lm_head.weight"]), gtype)
    w.write()
    return out_path


def convert_hf_bert(
    state_dict: Mapping[str, Any],
    config: Mapping[str, Any],
    out_path: str,
    *,
    gtype: GGMLType = GGMLType.F32,
    pooling: int = 2,  # LLAMA_POOLING_TYPE_CLS
    tokenizer_kv: Mapping[str, Any] | None = None,
) -> str:
    """HF BertModel / BertForSequenceClassification -> GGUF (reference:
    convert_hf_to_gguf.py BertModel; tensor names src/llama-arch.cpp
    LLM_ARCH_BERT table)."""
    npy = _npy
    arch = "bert"
    n_layer = int(config["num_hidden_layers"])
    n_embd = int(config["hidden_size"])
    n_head = int(config["num_attention_heads"])

    sd = dict(state_dict)
    if any(k.startswith("bert.") for k in sd):  # *ForSequenceClassification
        sd = {k.removeprefix("bert."): v for k, v in sd.items()}

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", int(config.get("max_position_embeddings", 512)))
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", int(config["intermediate_size"]))
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head)
    w.add(f"{arch}.attention.layer_norm_epsilon", float(config.get("layer_norm_eps", 1e-12)))
    w.add(f"{arch}.attention.causal", False)
    w.add(f"{arch}.pooling_type", int(pooling))
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    e = "embeddings."
    _emit(w, "token_embd.weight", npy(sd[e + "word_embeddings.weight"]), gtype)
    _emit(w, "token_types.weight", npy(sd[e + "token_type_embeddings.weight"]), GGMLType.F32)
    _emit(w, "position_embd.weight", npy(sd[e + "position_embeddings.weight"]), GGMLType.F32)
    _emit(w, "token_embd_norm.weight", npy(sd[e + "LayerNorm.weight"]), GGMLType.F32)
    _emit(w, "token_embd_norm.bias", npy(sd[e + "LayerNorm.bias"]), GGMLType.F32)
    for il in range(n_layer):
        p = f"encoder.layer.{il}."
        o = f"blk.{il}."
        _emit(w, o + "attn_q.weight", npy(sd[p + "attention.self.query.weight"]), gtype)
        _emit(w, o + "attn_q.bias", npy(sd[p + "attention.self.query.bias"]), GGMLType.F32)
        _emit(w, o + "attn_k.weight", npy(sd[p + "attention.self.key.weight"]), gtype)
        _emit(w, o + "attn_k.bias", npy(sd[p + "attention.self.key.bias"]), GGMLType.F32)
        _emit(w, o + "attn_v.weight", npy(sd[p + "attention.self.value.weight"]), gtype)
        _emit(w, o + "attn_v.bias", npy(sd[p + "attention.self.value.bias"]), GGMLType.F32)
        _emit(w, o + "attn_output.weight", npy(sd[p + "attention.output.dense.weight"]), gtype)
        _emit(w, o + "attn_output.bias", npy(sd[p + "attention.output.dense.bias"]), GGMLType.F32)
        _emit(w, o + "attn_output_norm.weight", npy(sd[p + "attention.output.LayerNorm.weight"]), GGMLType.F32)
        _emit(w, o + "attn_output_norm.bias", npy(sd[p + "attention.output.LayerNorm.bias"]), GGMLType.F32)
        _emit(w, o + "ffn_up.weight", npy(sd[p + "intermediate.dense.weight"]), gtype)
        _emit(w, o + "ffn_up.bias", npy(sd[p + "intermediate.dense.bias"]), GGMLType.F32)
        _emit(w, o + "ffn_down.weight", npy(sd[p + "output.dense.weight"]), gtype)
        _emit(w, o + "ffn_down.bias", npy(sd[p + "output.dense.bias"]), GGMLType.F32)
        _emit(w, o + "layer_output_norm.weight", npy(sd[p + "output.LayerNorm.weight"]), GGMLType.F32)
        _emit(w, o + "layer_output_norm.bias", npy(sd[p + "output.LayerNorm.bias"]), GGMLType.F32)
    if "pooler.dense.weight" in sd:  # rank pooler (dense + tanh)
        _emit(w, "cls.weight", npy(sd["pooler.dense.weight"]), gtype)
        _emit(w, "cls.bias", npy(sd["pooler.dense.bias"]), GGMLType.F32)
    if "classifier.weight" in state_dict:  # rank output projection
        _emit(w, "cls.output.weight", npy(state_dict["classifier.weight"]), gtype)
        _emit(w, "cls.output.bias", npy(state_dict["classifier.bias"]), GGMLType.F32)
    w.write()
    return out_path


def convert_hf_deepseek2(
    state_dict: Mapping[str, Any],
    config: Mapping[str, Any],
    out_path: str,
    *,
    arch: str = "deepseek2",
    gtype: GGMLType = GGMLType.F32,
    tokenizer_kv: Mapping[str, Any] | None = None,
) -> str:
    """HF DeepseekV2/V3ForCausalLM -> GGUF with the MLA absorption split
    (reference: convert_hf_to_gguf.py DeepseekV2Model.modify_tensors —
    kv_b_proj splits into k_b [transposed] and v_b per head).  Also
    serves minicpm3 (arch="minicpm3": same MLA module names plus the
    minicpm scale_emb/scale_depth/dim_model_base scaling knobs)."""
    npy = _npy
    n_layer = int(config["num_hidden_layers"])
    n_head = int(config["num_attention_heads"])
    dn = int(config["qk_nope_head_dim"])
    dr = int(config["qk_rope_head_dim"])
    dv = int(config["v_head_dim"])
    r = int(config["kv_lora_rank"])
    q_rank = config.get("q_lora_rank") or 0

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", int(config.get("max_position_embeddings", 4096)))
    w.add(f"{arch}.embedding_length", int(config["hidden_size"]))
    w.add(f"{arch}.feed_forward_length", int(config["intermediate_size"]))
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head)
    w.add(f"{arch}.attention.key_length", dn + dr)
    w.add(f"{arch}.attention.value_length", dv)
    w.add(f"{arch}.attention.kv_lora_rank", r)
    if q_rank:
        w.add(f"{arch}.attention.q_lora_rank", int(q_rank))
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", float(config.get("rms_norm_eps", 1e-6)))
    w.add(f"{arch}.rope.dimension_count", dr)
    w.add(f"{arch}.rope.freq_base", float(config.get("rope_theta", 10000.0)))
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    # minicpm3 scaling knobs (reference minicpm3.cpp:5-7 hardcodes; the
    # HF config carries them)
    if "scale_emb" in config:
        w.add(f"{arch}.embedding_scale", float(config["scale_emb"]))
    if "scale_depth" in config:
        w.add(f"{arch}.residual_scale",
              float(config["scale_depth"]) / float(n_layer) ** 0.5)
    if "dim_model_base" in config:
        w.add(f"{arch}.logit_scale",
              float(config["dim_model_base"]) / float(config["hidden_size"]))
    if config.get("n_routed_experts"):
        w.add(f"{arch}.expert_count", int(config["n_routed_experts"]))
        w.add(f"{arch}.expert_used_count", int(config["num_experts_per_tok"]))
        w.add(f"{arch}.expert_feed_forward_length", int(config["moe_intermediate_size"]))
        w.add(f"{arch}.expert_shared_count", int(config.get("n_shared_experts", 0)))
        w.add(f"{arch}.expert_weights_scale", float(config.get("routed_scaling_factor", 1.0)))
        w.add(f"{arch}.expert_gating_func",
              2 if config.get("scoring_func") == "sigmoid" else 1)
        w.add(f"{arch}.leading_dense_block_count", int(config.get("first_k_dense_replace", 0)))
        w.add(f"{arch}.norm_topk_prob", bool(config.get("norm_topk_prob", False)))
        if int(config.get("n_group", 1) or 1) > 1:  # deepseek3 group routing
            w.add(f"{arch}.expert_group_count", int(config["n_group"]))
            w.add(f"{arch}.expert_group_used_count", int(config.get("topk_group", 1)))
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    _emit(w, "token_embd.weight", npy(state_dict["model.embed_tokens.weight"]), gtype)
    for il in range(n_layer):
        p = f"model.layers.{il}."
        o = f"blk.{il}."
        _emit(w, o + "attn_norm.weight", npy(state_dict[p + "input_layernorm.weight"]), GGMLType.F32)
        if q_rank:
            _emit(w, o + "attn_q_a.weight", npy(state_dict[p + "self_attn.q_a_proj.weight"]), gtype)
            _emit(w, o + "attn_q_a_norm.weight", npy(state_dict[p + "self_attn.q_a_layernorm.weight"]), GGMLType.F32)
            _emit(w, o + "attn_q_b.weight", npy(state_dict[p + "self_attn.q_b_proj.weight"]), gtype)
        else:
            _emit(w, o + "attn_q.weight", npy(state_dict[p + "self_attn.q_proj.weight"]), gtype)
        _emit(w, o + "attn_kv_a_mqa.weight", npy(state_dict[p + "self_attn.kv_a_proj_with_mqa.weight"]), gtype)
        _emit(w, o + "attn_kv_a_norm.weight", npy(state_dict[p + "self_attn.kv_a_layernorm.weight"]), GGMLType.F32)
        # MLA split: kv_b [H*(dn+dv), r] -> k_b [H, r, dn], v_b [H, dv, r]
        kv_b = npy(state_dict[p + "self_attn.kv_b_proj.weight"]).reshape(n_head, dn + dv, r)
        k_b = np.ascontiguousarray(kv_b[:, :dn, :].transpose(0, 2, 1))  # [H, r, dn]
        v_b = np.ascontiguousarray(kv_b[:, dn:, :])  # [H, dv, r]
        _emit(w, o + "attn_k_b.weight", k_b, GGMLType.F32)
        _emit(w, o + "attn_v_b.weight", v_b, GGMLType.F32)
        _emit(w, o + "attn_output.weight", npy(state_dict[p + "self_attn.o_proj.weight"]), gtype)
        _emit(w, o + "ffn_norm.weight", npy(state_dict[p + "post_attention_layernorm.weight"]), GGMLType.F32)
        if p + "mlp.gate.weight" in state_dict:  # MoE layer
            _emit(w, o + "ffn_gate_inp.weight", npy(state_dict[p + "mlp.gate.weight"]), GGMLType.F32)
            if p + "mlp.gate.e_score_correction_bias" in state_dict:
                _emit(w, o + "exp_probs_b.bias", npy(state_dict[p + "mlp.gate.e_score_correction_bias"]), GGMLType.F32)
            n_exp = int(config["n_routed_experts"])
            for hf_name, gg in (("gate_proj", "ffn_gate_exps"), ("up_proj", "ffn_up_exps"), ("down_proj", "ffn_down_exps")):
                stk = np.stack([npy(state_dict[f"{p}mlp.experts.{e}.{hf_name}.weight"]) for e in range(n_exp)])
                _emit(w, o + gg + ".weight", stk, gtype)
            for hf_name, gg in (("gate_proj", "ffn_gate_shexp"), ("up_proj", "ffn_up_shexp"), ("down_proj", "ffn_down_shexp")):
                _emit(w, o + gg + ".weight", npy(state_dict[f"{p}mlp.shared_experts.{hf_name}.weight"]), gtype)
        elif p + "mlp.gate_proj.weight" in state_dict:
            _emit(w, o + "ffn_gate.weight", npy(state_dict[p + "mlp.gate_proj.weight"]), gtype)
            _emit(w, o + "ffn_up.weight", npy(state_dict[p + "mlp.up_proj.weight"]), gtype)
            _emit(w, o + "ffn_down.weight", npy(state_dict[p + "mlp.down_proj.weight"]), gtype)
        elif p + "mlp.up_proj.weight" in state_dict:  # plm non-gated relu^2
            _emit(w, o + "ffn_up.weight", npy(state_dict[p + "mlp.up_proj.weight"]), gtype)
            _emit(w, o + "ffn_down.weight", npy(state_dict[p + "mlp.down_proj.weight"]), gtype)
    _emit(w, "output_norm.weight", npy(state_dict["model.norm.weight"]), GGMLType.F32)
    if "lm_head.weight" in state_dict:
        _emit(w, "output.weight", npy(state_dict["lm_head.weight"]), gtype)
    else:  # plm ties the head to the embeddings
        _emit(w, "output.weight", npy(state_dict["model.embed_tokens.weight"]), gtype)
    w.write()
    return out_path


def convert_hf_mamba(
    state_dict: Mapping[str, Any],
    config: Mapping[str, Any],
    out_path: str,
    *,
    gtype: GGMLType = GGMLType.F32,
    tokenizer_kv: Mapping[str, Any] | None = None,
) -> str:
    """HF MambaForCausalLM -> GGUF (reference: convert_hf_to_gguf.py
    MambaModel — A stored as -exp(A_log), conv1d squeezed to 2-D)."""
    npy = _npy
    arch = "mamba"
    n_layer = int(config["num_hidden_layers"])
    n_embd = int(config["hidden_size"])
    d_inner = int(config.get("intermediate_size") or config.get("expand", 2) * n_embd)
    dt_rank = config.get("time_step_rank")
    if dt_rank in (None, "auto"):
        dt_rank = -(-n_embd // 16)

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 1 << 20)  # recurrent: unbounded
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", 0)
    w.add(f"{arch}.attention.head_count", 1)
    w.add(f"{arch}.attention.head_count_kv", 1)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", float(config.get("layer_norm_epsilon", 1e-5)))
    w.add(f"{arch}.ssm.conv_kernel", int(config.get("conv_kernel", 4)))
    w.add(f"{arch}.ssm.inner_size", d_inner)
    w.add(f"{arch}.ssm.state_size", int(config.get("state_size", 16)))
    w.add(f"{arch}.ssm.time_step_rank", int(dt_rank))
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    _emit(w, "token_embd.weight", npy(state_dict["backbone.embeddings.weight"]), gtype)
    for il in range(n_layer):
        p = f"backbone.layers.{il}."
        o = f"blk.{il}."
        _emit(w, o + "attn_norm.weight", npy(state_dict[p + "norm.weight"]), GGMLType.F32)
        _emit(w, o + "ssm_in.weight", npy(state_dict[p + "mixer.in_proj.weight"]), gtype)
        conv = npy(state_dict[p + "mixer.conv1d.weight"])  # [di, 1, dc]
        _emit(w, o + "ssm_conv1d.weight", conv.reshape(conv.shape[0], conv.shape[-1]), GGMLType.F32)
        _emit(w, o + "ssm_conv1d.bias", npy(state_dict[p + "mixer.conv1d.bias"]), GGMLType.F32)
        _emit(w, o + "ssm_x.weight", npy(state_dict[p + "mixer.x_proj.weight"]), gtype)
        _emit(w, o + "ssm_dt.weight", npy(state_dict[p + "mixer.dt_proj.weight"]), gtype)
        _emit(w, o + "ssm_dt.bias", npy(state_dict[p + "mixer.dt_proj.bias"]), GGMLType.F32)
        _emit(w, o + "ssm_a", -np.exp(npy(state_dict[p + "mixer.A_log"])), GGMLType.F32)
        _emit(w, o + "ssm_d", npy(state_dict[p + "mixer.D"]), GGMLType.F32)
        _emit(w, o + "ssm_out.weight", npy(state_dict[p + "mixer.out_proj.weight"]), gtype)
    _emit(w, "output_norm.weight", npy(state_dict["backbone.norm_f.weight"]), GGMLType.F32)
    if "lm_head.weight" in state_dict:
        _emit(w, "output.weight", npy(state_dict["lm_head.weight"]), gtype)
    w.write()
    return out_path


def convert_hf_rwkv6(
    state_dict: Mapping[str, Any],
    config: Mapping[str, Any],
    out_path: str,
    *,
    gtype: GGMLType = GGMLType.F32,
    tokenizer_kv: Mapping[str, Any] | None = None,
) -> str:
    """HF Rwkv6ForCausalLM (v6-Finch HF layout) -> GGUF (reference:
    convert_hf_to_gguf.py Rwkv6Model:6391-6459 — w1/decay_w1/decay_w2
    transposed, w2 permuted, lerps squeezed and fused, output weights
    pre-divided by 2^(il//rescale_every))."""
    npy = _npy
    arch = "rwkv6"
    n_layer = int(config["num_hidden_layers"])
    n_embd = int(config["hidden_size"])
    head_size = int(config.get("head_size", 64))
    rescale = int(config.get("rescale_every", 6))
    n_ff = int(config.get("intermediate_size") or (n_embd * 3.5) // 32 * 32)
    tm_dim = 64 if n_embd == 4096 else 32
    td_dim = 128 if n_embd == 4096 else 64

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 1 << 20)  # recurrent: unbounded
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", 0)
    w.add(f"{arch}.attention.layer_norm_epsilon", float(config.get("layer_norm_epsilon", 1e-5)))
    w.add(f"{arch}.wkv.head_size", head_size)
    w.add(f"{arch}.time_mix_extra_dim", tm_dim)
    w.add(f"{arch}.time_decay_extra_dim", td_dim)
    w.add(f"{arch}.rescale_every_n_layers", rescale)
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    _emit(w, "token_embd.weight", npy(state_dict["rwkv.embeddings.weight"]), gtype)
    _emit(w, "token_embd_norm.weight", npy(state_dict["rwkv.blocks.0.pre_ln.weight"]), GGMLType.F32)
    _emit(w, "token_embd_norm.bias", npy(state_dict["rwkv.blocks.0.pre_ln.bias"]), GGMLType.F32)
    for il in range(n_layer):
        p = f"rwkv.blocks.{il}."
        o = f"blk.{il}."
        _emit(w, o + "attn_norm.weight", npy(state_dict[p + "ln1.weight"]), GGMLType.F32)
        _emit(w, o + "attn_norm.bias", npy(state_dict[p + "ln1.bias"]), GGMLType.F32)
        _emit(w, o + "attn_norm_2.weight", npy(state_dict[p + "ln2.weight"]), GGMLType.F32)
        _emit(w, o + "attn_norm_2.bias", npy(state_dict[p + "ln2.bias"]), GGMLType.F32)

        a = p + "attention."
        _emit(w, o + "time_mix_w1.weight", npy(state_dict[a + "time_maa_w1"]).T, gtype)
        # HF [5, E, C] -> GGUF rows [5, C, E] (reference permute(0, 2, 1))
        _emit(w, o + "time_mix_w2.weight", npy(state_dict[a + "time_maa_w2"]).transpose(0, 2, 1), gtype)
        _emit(w, o + "time_mix_lerp_x.weight", npy(state_dict[a + "time_maa_x"]).reshape(-1), GGMLType.F32)
        fused = np.stack(
            [npy(state_dict[a + f"time_maa_{nm}"]).reshape(-1) for nm in "wkvrg"]
        ).reshape(5, 1, 1, n_embd)
        _emit(w, o + "time_mix_lerp_fused.weight", fused, GGMLType.F32)
        _emit(w, o + "time_mix_first.weight", npy(state_dict[a + "time_faaaa"]), GGMLType.F32)
        _emit(w, o + "time_mix_decay.weight", npy(state_dict[a + "time_decay"]).reshape(-1), GGMLType.F32)
        _emit(w, o + "time_mix_decay_w1.weight", npy(state_dict[a + "time_decay_w1"]).T, gtype)
        _emit(w, o + "time_mix_decay_w2.weight", npy(state_dict[a + "time_decay_w2"]).T, gtype)
        scale = 0.5 ** (il // rescale) if rescale > 0 else 1.0
        for src, dst in (
            ("receptance", "receptance"), ("key", "key"), ("value", "value"), ("gate", "gate"),
        ):
            _emit(w, o + f"time_mix_{dst}.weight", npy(state_dict[a + src + ".weight"]), gtype)
        _emit(w, o + "time_mix_output.weight", npy(state_dict[a + "output.weight"]) * scale, gtype)
        _emit(w, o + "time_mix_ln.weight", npy(state_dict[a + "ln_x.weight"]), GGMLType.F32)
        _emit(w, o + "time_mix_ln.bias", npy(state_dict[a + "ln_x.bias"]), GGMLType.F32)

        ff = p + "feed_forward."
        _emit(w, o + "channel_mix_lerp_k.weight", npy(state_dict[ff + "time_maa_k"]).reshape(-1), GGMLType.F32)
        _emit(w, o + "channel_mix_lerp_r.weight", npy(state_dict[ff + "time_maa_r"]).reshape(-1), GGMLType.F32)
        _emit(w, o + "channel_mix_key.weight", npy(state_dict[ff + "key.weight"]), gtype)
        _emit(w, o + "channel_mix_receptance.weight", npy(state_dict[ff + "receptance.weight"]), gtype)
        _emit(w, o + "channel_mix_value.weight", npy(state_dict[ff + "value.weight"]) * scale, gtype)
    _emit(w, "output_norm.weight", npy(state_dict["rwkv.ln_out.weight"]), GGMLType.F32)
    _emit(w, "output_norm.bias", npy(state_dict["rwkv.ln_out.bias"]), GGMLType.F32)
    _emit(w, "output.weight", npy(state_dict["head.weight"]), gtype)
    w.write()
    return out_path


def convert_hf_jamba(
    state_dict: Mapping[str, Any],
    config: Mapping[str, Any],
    out_path: str,
    *,
    gtype: GGMLType = GGMLType.F32,
    tokenizer_kv: Mapping[str, Any] | None = None,
) -> str:
    """HF JambaForCausalLM -> GGUF (reference: convert_hf_to_gguf.py
    JambaModel — per-layer head_count_kv vector marks attention layers;
    experts stacked to 3-D ffn_*_exps)."""
    npy = _npy
    arch = "jamba"
    n_layer = int(config["num_hidden_layers"])
    n_embd = int(config["hidden_size"])
    d_inner = int(config.get("mamba_expand", 2)) * n_embd
    dt_rank = config.get("mamba_dt_rank")
    if dt_rank in (None, "auto"):
        dt_rank = -(-n_embd // 16)
    n_kv = int(config["num_key_value_heads"])
    attn_off = int(config.get("attn_layer_offset", 4))
    attn_per = int(config.get("attn_layer_period", 8))
    kv_vec = [
        n_kv if il >= attn_off and (il - attn_off) % attn_per == 0 else 0
        for il in range(n_layer)
    ]

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", int(config.get("max_position_embeddings", 1 << 18)))
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", int(config["intermediate_size"]))
    w.add(f"{arch}.attention.head_count", int(config["num_attention_heads"]))
    w.add(f"{arch}.attention.head_count_kv", kv_vec)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", float(config.get("rms_norm_eps", 1e-6)))
    w.add(f"{arch}.ssm.conv_kernel", int(config.get("mamba_d_conv", 4)))
    w.add(f"{arch}.ssm.inner_size", d_inner)
    w.add(f"{arch}.ssm.state_size", int(config.get("mamba_d_state", 16)))
    w.add(f"{arch}.ssm.time_step_rank", int(dt_rank))
    w.add(f"{arch}.expert_count", int(config.get("num_experts", 1)))
    w.add(f"{arch}.expert_used_count", int(config.get("num_experts_per_tok", 1)))
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    _emit(w, "token_embd.weight", npy(state_dict["model.embed_tokens.weight"]), gtype)
    for il in range(n_layer):
        p = f"model.layers.{il}."
        o = f"blk.{il}."
        _emit(w, o + "attn_norm.weight", npy(state_dict[p + "input_layernorm.weight"]), GGMLType.F32)
        if p + "mamba.in_proj.weight" in state_dict:
            _emit(w, o + "ssm_in.weight", npy(state_dict[p + "mamba.in_proj.weight"]), gtype)
            conv = npy(state_dict[p + "mamba.conv1d.weight"])  # [di, 1, dc]
            _emit(w, o + "ssm_conv1d.weight", conv.reshape(conv.shape[0], conv.shape[-1]), GGMLType.F32)
            _emit(w, o + "ssm_conv1d.bias", npy(state_dict[p + "mamba.conv1d.bias"]), GGMLType.F32)
            _emit(w, o + "ssm_x.weight", npy(state_dict[p + "mamba.x_proj.weight"]), gtype)
            _emit(w, o + "ssm_dt.weight", npy(state_dict[p + "mamba.dt_proj.weight"]), gtype)
            _emit(w, o + "ssm_dt.bias", npy(state_dict[p + "mamba.dt_proj.bias"]), GGMLType.F32)
            _emit(w, o + "ssm_a", -np.exp(npy(state_dict[p + "mamba.A_log"])), GGMLType.F32)
            _emit(w, o + "ssm_d", npy(state_dict[p + "mamba.D"]), GGMLType.F32)
            _emit(w, o + "ssm_out.weight", npy(state_dict[p + "mamba.out_proj.weight"]), gtype)
            _emit(w, o + "ssm_dt_norm.weight", npy(state_dict[p + "mamba.dt_layernorm.weight"]), GGMLType.F32)
            _emit(w, o + "ssm_b_norm.weight", npy(state_dict[p + "mamba.b_layernorm.weight"]), GGMLType.F32)
            _emit(w, o + "ssm_c_norm.weight", npy(state_dict[p + "mamba.c_layernorm.weight"]), GGMLType.F32)
        else:
            for hf, gg in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                           ("v_proj", "attn_v"), ("o_proj", "attn_output")):
                _emit(w, o + f"{gg}.weight", npy(state_dict[p + f"self_attn.{hf}.weight"]), gtype)
        _emit(w, o + "ffn_norm.weight", npy(state_dict[p + "pre_ff_layernorm.weight"]), GGMLType.F32)
        if p + "feed_forward.router.weight" in state_dict:
            _emit(w, o + "ffn_gate_inp.weight", npy(state_dict[p + "feed_forward.router.weight"]), gtype)
            n_exp = int(config.get("num_experts", 1))
            for part in ("gate", "up", "down"):
                stack = np.stack([
                    npy(state_dict[p + f"feed_forward.experts.{e}.{part}_proj.weight"])
                    for e in range(n_exp)
                ])
                _emit(w, o + f"ffn_{part}_exps.weight", stack, gtype)
        else:
            _emit(w, o + "ffn_gate.weight", npy(state_dict[p + "feed_forward.gate_proj.weight"]), gtype)
            _emit(w, o + "ffn_up.weight", npy(state_dict[p + "feed_forward.up_proj.weight"]), gtype)
            _emit(w, o + "ffn_down.weight", npy(state_dict[p + "feed_forward.down_proj.weight"]), gtype)
    _emit(w, "output_norm.weight", npy(state_dict["model.final_layernorm.weight"]), GGMLType.F32)
    if "lm_head.weight" in state_dict:
        _emit(w, "output.weight", npy(state_dict["lm_head.weight"]), gtype)
    w.write()
    return out_path


def convert_hf_gptneox(
    state_dict: Mapping[str, Any],
    config: Mapping[str, Any],
    out_path: str,
    *,
    gtype: GGMLType = GGMLType.F32,
    tokenizer_kv: Mapping[str, Any] | None = None,
) -> str:
    """HF GPTNeoXForCausalLM -> GGUF (reference: convert_hf_to_gguf.py
    GPTNeoXModel — the fused query_key_value is stored per-head
    interleaved [h, (q|k|v), d] and is split into separate Q/K/V here)."""
    npy = _npy
    arch = "gptneox"
    n_layer = int(config["num_hidden_layers"])
    n_embd = int(config["hidden_size"])
    n_head = int(config["num_attention_heads"])
    head_dim = n_embd // n_head

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", int(config.get("max_position_embeddings", 2048)))
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", int(config["intermediate_size"]))
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head)
    w.add(f"{arch}.attention.layer_norm_epsilon", float(config.get("layer_norm_eps", 1e-5)))
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", float(config.get("layer_norm_eps", 1e-5)))
    w.add(f"{arch}.rope.freq_base", float(config.get("rope_theta", config.get("rotary_emb_base", 10000.0))))
    w.add(f"{arch}.rope.dimension_count", int(head_dim * float(config.get("rotary_pct", 0.25))))
    w.add(f"{arch}.use_parallel_residual", bool(config.get("use_parallel_residual", True)))
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    def split_qkv(t):
        """[3*hidden, ...] per-head interleaved -> (q, k, v)."""
        x = npy(t)
        x = x.reshape(n_head, 3, head_dim, *x.shape[1:])
        return (x[:, 0].reshape(n_embd, *x.shape[3:]),
                x[:, 1].reshape(n_embd, *x.shape[3:]),
                x[:, 2].reshape(n_embd, *x.shape[3:]))

    _emit(w, "token_embd.weight", npy(state_dict["gpt_neox.embed_in.weight"]), gtype)
    for il in range(n_layer):
        p = f"gpt_neox.layers.{il}."
        o = f"blk.{il}."
        _emit(w, o + "attn_norm.weight", npy(state_dict[p + "input_layernorm.weight"]), GGMLType.F32)
        _emit(w, o + "attn_norm.bias", npy(state_dict[p + "input_layernorm.bias"]), GGMLType.F32)
        _emit(w, o + "ffn_norm.weight", npy(state_dict[p + "post_attention_layernorm.weight"]), GGMLType.F32)
        _emit(w, o + "ffn_norm.bias", npy(state_dict[p + "post_attention_layernorm.bias"]), GGMLType.F32)
        q, k, v = split_qkv(state_dict[p + "attention.query_key_value.weight"])
        qb, kb, vb = split_qkv(state_dict[p + "attention.query_key_value.bias"])
        _emit(w, o + "attn_q.weight", q, gtype)
        _emit(w, o + "attn_k.weight", k, gtype)
        _emit(w, o + "attn_v.weight", v, gtype)
        _emit(w, o + "attn_q.bias", qb, GGMLType.F32)
        _emit(w, o + "attn_k.bias", kb, GGMLType.F32)
        _emit(w, o + "attn_v.bias", vb, GGMLType.F32)
        _emit(w, o + "attn_output.weight", npy(state_dict[p + "attention.dense.weight"]), gtype)
        _emit(w, o + "attn_output.bias", npy(state_dict[p + "attention.dense.bias"]), GGMLType.F32)
        _emit(w, o + "ffn_up.weight", npy(state_dict[p + "mlp.dense_h_to_4h.weight"]), gtype)
        _emit(w, o + "ffn_up.bias", npy(state_dict[p + "mlp.dense_h_to_4h.bias"]), GGMLType.F32)
        _emit(w, o + "ffn_down.weight", npy(state_dict[p + "mlp.dense_4h_to_h.weight"]), gtype)
        _emit(w, o + "ffn_down.bias", npy(state_dict[p + "mlp.dense_4h_to_h.bias"]), GGMLType.F32)
    _emit(w, "output_norm.weight", npy(state_dict["gpt_neox.final_layer_norm.weight"]), GGMLType.F32)
    _emit(w, "output_norm.bias", npy(state_dict["gpt_neox.final_layer_norm.bias"]), GGMLType.F32)
    _emit(w, "output.weight", npy(state_dict["embed_out.weight"]), gtype)
    w.write()
    return out_path


def convert_hf_gemma3n(
    state_dict: Mapping[str, Any],
    config: Mapping[str, Any],
    out_path: str,
    *,
    gtype: GGMLType = GGMLType.F32,
    tokenizer_kv: Mapping[str, Any] | None = None,
) -> str:
    """HF Gemma3nForCausalLM (text) -> GGUF (reference:
    convert_hf_to_gguf.py Gemma3nModel): AltUp stacks, LAuReL, per-layer
    input embeddings, shared-KV tail, activation-sparsity std multipliers
    (icdf of the sparsity fractions), zero-centered norms stored +1."""
    import math

    npy = _npy
    arch = "gemma3n"
    n_layer = int(config["num_hidden_layers"])
    n_embd = int(config["hidden_size"])
    n_head = int(config["num_attention_heads"])
    n_kv = int(config["num_key_value_heads"])
    head_dim = int(config.get("head_dim", 256))
    per = int(config["hidden_size_per_layer_input"])
    n_altup = int(config.get("altup_num_inputs", 4))

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", int(config.get("max_position_embeddings", 4096)))
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", int(config["intermediate_size"]))
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_kv)
    w.add(f"{arch}.attention.key_length", head_dim)
    w.add(f"{arch}.attention.value_length", head_dim)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", float(config.get("rms_norm_eps", 1e-6)))
    w.add(f"{arch}.attention.sliding_window", int(config["sliding_window"]))
    w.add(f"{arch}.rope.freq_base", float(config.get("rope_theta", 1e6)))
    w.add(f"{arch}.rope.freq_base_swa", float(config.get("rope_local_base_freq", 10000.0)))
    w.add(f"{arch}.rope.dimension_count", head_dim)
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    if config.get("final_logit_softcapping"):
        w.add(f"{arch}.final_logit_softcapping", float(config["final_logit_softcapping"]))
    w.add(f"{arch}.altup.active_idx", int(config.get("altup_active_idx", 0)))
    w.add(f"{arch}.altup.num_inputs", n_altup)
    w.add(f"{arch}.embedding_length_per_layer_input", per)
    w.add(f"{arch}.attention.shared_kv_layers", int(config.get("num_kv_shared_layers", 0)))
    # sparsity fractions -> std multipliers (icdf); 0 -> -inf = "off"
    from statistics import NormalDist

    scale = [
        (NormalDist().inv_cdf(s) if 0.0 < s < 1.0 else float("-inf"))
        for s in config.get("activation_sparsity_pattern", [0.0] * n_layer)
    ]
    w.add(f"{arch}.activation_sparsity_scale", scale)
    w.add(f"{arch}.attention.sliding_window_pattern",
          [t == "sliding_attention" for t in config["layer_types"]])
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    def norm1(t):
        return npy(t)  # gemma3n norms are NOT zero-centered (norm_shift=0)

    _emit(w, "token_embd.weight", npy(state_dict["model.embed_tokens.weight"]), gtype)
    _emit(w, "per_layer_token_embd.weight",
          npy(state_dict["model.embed_tokens_per_layer.weight"]), gtype)
    _emit(w, "per_layer_model_proj.weight",
          npy(state_dict["model.per_layer_model_projection.weight"]), gtype)
    _emit(w, "per_layer_proj_norm.weight",
          norm1(state_dict["model.per_layer_projection_norm.weight"]), GGMLType.F32)
    _emit(w, "altup_proj.weight", np.stack(
        [npy(state_dict[f"model.altup_projections.{i}.weight"]) for i in range(n_altup - 1)]
    ), gtype)
    _emit(w, "altup_unembd_proj.weight", np.stack(
        [npy(state_dict[f"model.altup_unembed_projections.{i}.weight"]) for i in range(n_altup - 1)]
    ), gtype)

    for il in range(n_layer):
        p = f"model.layers.{il}."
        o = f"blk.{il}."
        _emit(w, o + "attn_norm.weight", norm1(state_dict[p + "input_layernorm.weight"]), GGMLType.F32)
        _emit(w, o + "post_attention_norm.weight",
              norm1(state_dict[p + "post_attention_layernorm.weight"]), GGMLType.F32)
        _emit(w, o + "ffn_norm.weight",
              norm1(state_dict[p + "pre_feedforward_layernorm.weight"]), GGMLType.F32)
        _emit(w, o + "post_ffw_norm.weight",
              norm1(state_dict[p + "post_feedforward_layernorm.weight"]), GGMLType.F32)
        _emit(w, o + "attn_q.weight", npy(state_dict[p + "self_attn.q_proj.weight"]), gtype)
        _emit(w, o + "attn_k.weight", npy(state_dict[p + "self_attn.k_proj.weight"]), gtype)
        _emit(w, o + "attn_v.weight", npy(state_dict[p + "self_attn.v_proj.weight"]), gtype)
        _emit(w, o + "attn_output.weight", npy(state_dict[p + "self_attn.o_proj.weight"]), gtype)
        _emit(w, o + "attn_q_norm.weight", norm1(state_dict[p + "self_attn.q_norm.weight"]), GGMLType.F32)
        _emit(w, o + "attn_k_norm.weight", norm1(state_dict[p + "self_attn.k_norm.weight"]), GGMLType.F32)
        _emit(w, o + "ffn_gate.weight", npy(state_dict[p + "mlp.gate_proj.weight"]), gtype)
        _emit(w, o + "ffn_up.weight", npy(state_dict[p + "mlp.up_proj.weight"]), gtype)
        _emit(w, o + "ffn_down.weight", npy(state_dict[p + "mlp.down_proj.weight"]), gtype)
        _emit(w, o + "laurel_l.weight", npy(state_dict[p + "laurel.linear_left.weight"]), gtype)
        _emit(w, o + "laurel_r.weight", npy(state_dict[p + "laurel.linear_right.weight"]), gtype)
        _emit(w, o + "laurel_post_norm.weight",
              norm1(state_dict[p + "laurel.post_laurel_norm.weight"]), GGMLType.F32)
        _emit(w, o + "altup_correct_scale.weight",
              npy(state_dict[p + "altup.correct_output_scale"]), GGMLType.F32)
        _emit(w, o + "altup_correct_coef.weight",
              npy(state_dict[p + "altup.correction_coefs.weight"]), gtype)
        _emit(w, o + "altup_predict_coef.weight",
              npy(state_dict[p + "altup.prediction_coefs.weight"]), gtype)
        _emit(w, o + "altup_router.weight",
              npy(state_dict[p + "altup.modality_router.weight"]), gtype)
        _emit(w, o + "altup_router_norm.weight",
              norm1(state_dict[p + "altup.router_norm.weight"]), GGMLType.F32)
        _emit(w, o + "inp_gate.weight", npy(state_dict[p + "per_layer_input_gate.weight"]), gtype)
        _emit(w, o + "proj.weight", npy(state_dict[p + "per_layer_projection.weight"]), gtype)
        _emit(w, o + "post_norm.weight",
              norm1(state_dict[p + "post_per_layer_input_norm.weight"]), GGMLType.F32)
    _emit(w, "output_norm.weight", norm1(state_dict["model.norm.weight"]), GGMLType.F32)
    if "lm_head.weight" in state_dict:
        _emit(w, "output.weight", npy(state_dict["lm_head.weight"]), gtype)
    w.write()
    return out_path


def convert_hf_qwen3next(
    state_dict: Mapping[str, Any],
    config: Mapping[str, Any],
    out_path: str,
    *,
    gtype: GGMLType = GGMLType.F32,
    tokenizer_kv: Mapping[str, Any] | None = None,
) -> str:
    """HF Qwen3NextForCausalLM -> GGUF (reference: convert_hf_to_gguf.py
    Qwen3NextModel): gated-deltanet linear layers + every-4th gated full
    attention + qwen2moe-style MoE.  Conversion contract matched to the
    reference: in_proj_qkvz reordered to [q|k|v] (attn_qkv) + z
    (attn_gate), in_proj_ba passed through RAW (ssm_ba), A_log baked to
    -exp(A_log) (ssm_a), dt_bias -> ssm_dt.bias, conv1d squeezed, and all
    norms EXCEPT linear_attn.norm stored zero-centered +1."""
    npy = _npy
    arch = "qwen3next"
    n_layer = int(config["num_hidden_layers"])
    n_embd = int(config["hidden_size"])
    n_head = int(config["num_attention_heads"])
    n_kv = int(config["num_key_value_heads"])
    head_dim = int(config.get("head_dim", n_embd // n_head))
    hk = int(config["linear_num_key_heads"])
    hv = int(config["linear_num_value_heads"])
    dk = int(config["linear_key_head_dim"])
    dv = int(config["linear_value_head_dim"])
    n_exp = int(config["num_experts"])

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", int(config.get("max_position_embeddings", 4096)))
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", int(config["intermediate_size"]))
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_kv)
    w.add(f"{arch}.attention.key_length", head_dim)
    w.add(f"{arch}.attention.value_length", head_dim)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", float(config.get("rms_norm_eps", 1e-6)))
    w.add(f"{arch}.rope.freq_base", float(config.get("rope_theta", 10000.0)))
    w.add(f"{arch}.rope.dimension_count",
          int(head_dim * float(config.get("partial_rotary_factor", 0.25))))
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    w.add(f"{arch}.expert_count", n_exp)
    w.add(f"{arch}.expert_used_count", int(config.get("num_experts_per_tok", 2)))
    w.add(f"{arch}.expert_feed_forward_length", int(config["moe_intermediate_size"]))
    w.add(f"{arch}.expert_shared_count", 1)
    w.add(f"{arch}.expert_shared_feed_forward_length",
          int(config["shared_expert_intermediate_size"]))
    w.add(f"{arch}.expert_weights_norm", bool(config.get("norm_topk_prob", True)))
    w.add(f"{arch}.ssm.conv_kernel", int(config["linear_conv_kernel_dim"]))
    w.add(f"{arch}.ssm.state_size", dk)
    w.add(f"{arch}.ssm.group_count", hk)
    w.add(f"{arch}.ssm.time_step_rank", hv)
    w.add(f"{arch}.ssm.inner_size", dv * hv)
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    def norm1(t):  # zero-centered norms: store w+1
        return npy(t) + 1.0

    _emit(w, "token_embd.weight", npy(state_dict["model.embed_tokens.weight"]), gtype)
    for il in range(n_layer):
        p = f"model.layers.{il}."
        o = f"blk.{il}."
        _emit(w, o + "attn_norm.weight", norm1(state_dict[p + "input_layernorm.weight"]), GGMLType.F32)
        _emit(w, o + "attn_post_norm.weight",
              norm1(state_dict[p + "post_attention_layernorm.weight"]), GGMLType.F32)
        if p + "linear_attn.in_proj_qkvz.weight" in state_dict:
            # deltanet layer: reorder [q,k,v,z]*head -> [q*|k*|v*] + z
            qkvz = npy(state_dict[p + "linear_attn.in_proj_qkvz.weight"])  # [N, K]
            r = hv // hk
            per = 2 * dk + 2 * r * dv
            blk = qkvz.reshape(hk, per, n_embd)
            q = blk[:, :dk].reshape(hk * dk, n_embd)
            k = blk[:, dk : 2 * dk].reshape(hk * dk, n_embd)
            v = blk[:, 2 * dk : 2 * dk + r * dv].reshape(hv * dv, n_embd)
            z = blk[:, 2 * dk + r * dv :].reshape(hv * dv, n_embd)
            _emit(w, o + "attn_qkv.weight",
                  np.ascontiguousarray(np.concatenate([q, k, v], axis=0)), gtype)
            _emit(w, o + "attn_gate.weight", np.ascontiguousarray(z), gtype)
            _emit(w, o + "ssm_ba.weight",
                  npy(state_dict[p + "linear_attn.in_proj_ba.weight"]), gtype)
            _emit(w, o + "ssm_conv1d.weight",
                  npy(state_dict[p + "linear_attn.conv1d.weight"]).squeeze(1), GGMLType.F32)
            _emit(w, o + "ssm_a", -np.exp(npy(state_dict[p + "linear_attn.A_log"])), GGMLType.F32)
            _emit(w, o + "ssm_dt.bias", npy(state_dict[p + "linear_attn.dt_bias"]), GGMLType.F32)
            _emit(w, o + "ssm_norm.weight",
                  npy(state_dict[p + "linear_attn.norm.weight"]), GGMLType.F32)
            _emit(w, o + "ssm_out.weight",
                  npy(state_dict[p + "linear_attn.out_proj.weight"]), gtype)
        else:  # gated full-attention layer
            _emit(w, o + "attn_q.weight", npy(state_dict[p + "self_attn.q_proj.weight"]), gtype)
            _emit(w, o + "attn_k.weight", npy(state_dict[p + "self_attn.k_proj.weight"]), gtype)
            _emit(w, o + "attn_v.weight", npy(state_dict[p + "self_attn.v_proj.weight"]), gtype)
            _emit(w, o + "attn_output.weight", npy(state_dict[p + "self_attn.o_proj.weight"]), gtype)
            _emit(w, o + "attn_q_norm.weight", norm1(state_dict[p + "self_attn.q_norm.weight"]), GGMLType.F32)
            _emit(w, o + "attn_k_norm.weight", norm1(state_dict[p + "self_attn.k_norm.weight"]), GGMLType.F32)
        _emit(w, o + "ffn_gate_inp.weight", npy(state_dict[p + "mlp.gate.weight"]), GGMLType.F32)
        gate = np.stack([npy(state_dict[f"{p}mlp.experts.{e}.gate_proj.weight"]) for e in range(n_exp)])
        up = np.stack([npy(state_dict[f"{p}mlp.experts.{e}.up_proj.weight"]) for e in range(n_exp)])
        down = np.stack([npy(state_dict[f"{p}mlp.experts.{e}.down_proj.weight"]) for e in range(n_exp)])
        _emit(w, o + "ffn_gate_exps.weight", gate, gtype)
        _emit(w, o + "ffn_up_exps.weight", up, gtype)
        _emit(w, o + "ffn_down_exps.weight", down, gtype)
        _emit(w, o + "ffn_gate_shexp.weight", npy(state_dict[p + "mlp.shared_expert.gate_proj.weight"]), gtype)
        _emit(w, o + "ffn_up_shexp.weight", npy(state_dict[p + "mlp.shared_expert.up_proj.weight"]), gtype)
        _emit(w, o + "ffn_down_shexp.weight", npy(state_dict[p + "mlp.shared_expert.down_proj.weight"]), gtype)
        _emit(w, o + "ffn_gate_inp_shexp.weight",
              npy(state_dict[p + "mlp.shared_expert_gate.weight"]), GGMLType.F32)
    _emit(w, "output_norm.weight", norm1(state_dict["model.norm.weight"]), GGMLType.F32)
    if "lm_head.weight" in state_dict:
        _emit(w, "output.weight", npy(state_dict["lm_head.weight"]), gtype)
    w.write()
    return out_path


def convert_hf_dbrx(
    state_dict: Mapping[str, Any],
    config: Mapping[str, Any],
    out_path: str,
    *,
    gtype: GGMLType = GGMLType.F32,
    tokenizer_kv: Mapping[str, Any] | None = None,
) -> str:
    """HF DbrxForCausalLM -> GGUF (reference: convert_hf_to_gguf.py
    DbrxModel; graph src/models/dbrx.cpp: LayerNorm, fused clamped Wqkv,
    norm_2 as the pre-FFN norm, flattened expert stacks w1/v1/w2)."""
    npy = _npy
    arch = "dbrx"
    attn_cfg = config["attn_config"]
    ffn_cfg = config["ffn_config"]
    n_layer = int(config["n_layers"])
    n_embd = int(config["d_model"])
    n_head = int(config["n_heads"])
    n_kv = int(attn_cfg["kv_n_heads"])
    n_ff = int(ffn_cfg["ffn_hidden_size"])
    n_exp = int(ffn_cfg["moe_num_experts"])

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", int(config.get("max_seq_len", 2048)))
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_kv)
    w.add(f"{arch}.attention.layer_norm_epsilon", 1e-5)
    w.add(f"{arch}.attention.clamp_kqv", float(attn_cfg.get("clip_qkv") or 0.0))
    w.add(f"{arch}.rope.freq_base", float(attn_cfg.get("rope_theta", 10000.0)))
    w.add(f"{arch}.rope.dimension_count", n_embd // n_head)
    w.add(f"{arch}.expert_count", n_exp)
    w.add(f"{arch}.expert_used_count", int(ffn_cfg.get("moe_top_k", 2)))
    w.add(f"{arch}.expert_feed_forward_length", n_ff)
    w.add(f"{arch}.expert_weights_norm", True)  # build_moe_ffn norm=true
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    _emit(w, "token_embd.weight", npy(state_dict["transformer.wte.weight"]), gtype)
    for il in range(n_layer):
        p = f"transformer.blocks.{il}."
        o = f"blk.{il}."
        _emit(w, o + "attn_norm.weight",
              npy(state_dict[p + "norm_attn_norm.norm_1.weight"]), GGMLType.F32)
        _emit(w, o + "attn_qkv.weight",
              npy(state_dict[p + "norm_attn_norm.attn.Wqkv.weight"]), gtype)
        _emit(w, o + "attn_output.weight",
              npy(state_dict[p + "norm_attn_norm.attn.out_proj.weight"]), gtype)
        _emit(w, o + "attn_output_norm.weight",
              npy(state_dict[p + "norm_attn_norm.norm_2.weight"]), GGMLType.F32)
        _emit(w, o + "ffn_gate_inp.weight",
              npy(state_dict[p + "ffn.router.layer.weight"]), GGMLType.F32)
        # flattened [E*F, D] expert stacks -> [E, F, D]; down transposed
        gate = npy(state_dict[p + "ffn.experts.mlp.w1"]).reshape(n_exp, n_ff, n_embd)
        up = npy(state_dict[p + "ffn.experts.mlp.v1"]).reshape(n_exp, n_ff, n_embd)
        down = npy(state_dict[p + "ffn.experts.mlp.w2"]).reshape(n_exp, n_ff, n_embd)
        down = np.ascontiguousarray(down.transpose(0, 2, 1))  # [E, D, F]
        _emit(w, o + "ffn_gate_exps.weight", gate, gtype)
        _emit(w, o + "ffn_up_exps.weight", up, gtype)
        _emit(w, o + "ffn_down_exps.weight", down, gtype)
    _emit(w, "output_norm.weight", npy(state_dict["transformer.norm_f.weight"]), GGMLType.F32)
    _emit(w, "output.weight", npy(state_dict["lm_head.weight"]), gtype)
    w.write()
    return out_path


def convert_hf_gpt2(
    state_dict: Mapping[str, Any],
    config: Mapping[str, Any],
    out_path: str,
    *,
    gtype: GGMLType = GGMLType.F32,
    tokenizer_kv: Mapping[str, Any] | None = None,
) -> str:
    """HF GPT2LMHeadModel -> GGUF (reference: convert_hf_to_gguf.py
    GPT2Model — Conv1D weights are stored transposed vs nn.Linear and the
    fused c_attn splits into contiguous Q|K|V blocks; learned wpe becomes
    position_embd)."""
    npy = _npy
    arch = "gpt2"
    n_layer = int(config.get("n_layer", config.get("num_hidden_layers")))
    n_embd = int(config.get("n_embd", config.get("hidden_size")))
    n_head = int(config.get("n_head", config.get("num_attention_heads")))
    n_ff = int(config.get("n_inner") or 4 * n_embd)

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", int(config.get("n_positions", 1024)))
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head)
    w.add(f"{arch}.attention.layer_norm_epsilon", float(config.get("layer_norm_epsilon", 1e-5)))
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", float(config.get("layer_norm_epsilon", 1e-5)))
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    def lin(t):  # Conv1D [in, out] -> Linear [out, in]
        return np.ascontiguousarray(npy(t).T)

    _emit(w, "token_embd.weight", npy(state_dict["transformer.wte.weight"]), gtype)
    _emit(w, "position_embd.weight", npy(state_dict["transformer.wpe.weight"]), GGMLType.F32)
    for il in range(n_layer):
        p = f"transformer.h.{il}."
        o = f"blk.{il}."
        _emit(w, o + "attn_norm.weight", npy(state_dict[p + "ln_1.weight"]), GGMLType.F32)
        _emit(w, o + "attn_norm.bias", npy(state_dict[p + "ln_1.bias"]), GGMLType.F32)
        qkv = lin(state_dict[p + "attn.c_attn.weight"])  # [3h, h] Q|K|V blocks
        qkv_b = npy(state_dict[p + "attn.c_attn.bias"])
        for i, nm in enumerate(("attn_q", "attn_k", "attn_v")):
            _emit(w, o + f"{nm}.weight", qkv[i * n_embd : (i + 1) * n_embd], gtype)
            _emit(w, o + f"{nm}.bias", qkv_b[i * n_embd : (i + 1) * n_embd], GGMLType.F32)
        _emit(w, o + "attn_output.weight", lin(state_dict[p + "attn.c_proj.weight"]), gtype)
        _emit(w, o + "attn_output.bias", npy(state_dict[p + "attn.c_proj.bias"]), GGMLType.F32)
        _emit(w, o + "ffn_norm.weight", npy(state_dict[p + "ln_2.weight"]), GGMLType.F32)
        _emit(w, o + "ffn_norm.bias", npy(state_dict[p + "ln_2.bias"]), GGMLType.F32)
        _emit(w, o + "ffn_up.weight", lin(state_dict[p + "mlp.c_fc.weight"]), gtype)
        _emit(w, o + "ffn_up.bias", npy(state_dict[p + "mlp.c_fc.bias"]), GGMLType.F32)
        _emit(w, o + "ffn_down.weight", lin(state_dict[p + "mlp.c_proj.weight"]), gtype)
        _emit(w, o + "ffn_down.bias", npy(state_dict[p + "mlp.c_proj.bias"]), GGMLType.F32)
    _emit(w, "output_norm.weight", npy(state_dict["transformer.ln_f.weight"]), GGMLType.F32)
    _emit(w, "output_norm.bias", npy(state_dict["transformer.ln_f.bias"]), GGMLType.F32)
    _emit(w, "output.weight", npy(state_dict["lm_head.weight"]), gtype)
    w.write()
    return out_path


def convert_hf_falcon(
    state_dict: Mapping[str, Any],
    config: Mapping[str, Any],
    out_path: str,
    *,
    gtype: GGMLType = GGMLType.F32,
    tokenizer_kv: Mapping[str, Any] | None = None,
) -> str:
    """HF FalconForCausalLM -> GGUF (reference: convert_hf_to_gguf.py
    FalconModel — the fused query_key_value is grouped per kv head
    [q*g | k | v] and splits here; new decoder arch carries a second
    parallel-branch norm ln_mlp)."""
    npy = _npy
    arch = "falcon"
    n_layer = int(config["num_hidden_layers"])
    n_embd = int(config["hidden_size"])
    n_head = int(config["num_attention_heads"])
    head_dim = n_embd // n_head
    new_arch = bool(config.get("new_decoder_architecture", False))
    if new_arch:
        n_kv = int(config.get("num_kv_heads", n_head))
    else:
        n_kv = 1 if config.get("multi_query", True) else n_head

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", int(config.get("max_position_embeddings", 2048)))
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", int(config.get("ffn_hidden_size") or 4 * n_embd))
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_kv)
    w.add(f"{arch}.attention.layer_norm_epsilon", float(config.get("layer_norm_epsilon", 1e-5)))
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", float(config.get("layer_norm_epsilon", 1e-5)))
    w.add(f"{arch}.rope.freq_base", float(config.get("rope_theta", 10000.0)))
    w.add(f"{arch}.rope.dimension_count", head_dim)
    w.add(f"{arch}.use_parallel_residual", bool(config.get("parallel_attn", True)))
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    def split_qkv(t):
        """[(q*g | k | v) per kv group, h] -> (q, k, v)."""
        x = npy(t)
        g = n_head // n_kv
        x = x.reshape(n_kv, g + 2, head_dim, x.shape[-1])
        q = np.ascontiguousarray(x[:, :g].reshape(n_head * head_dim, -1))
        k = np.ascontiguousarray(x[:, g].reshape(n_kv * head_dim, -1))
        v = np.ascontiguousarray(x[:, g + 1].reshape(n_kv * head_dim, -1))
        return q, k, v

    _emit(w, "token_embd.weight", npy(state_dict["transformer.word_embeddings.weight"]), gtype)
    for il in range(n_layer):
        p = f"transformer.h.{il}."
        o = f"blk.{il}."
        ln_attn = p + ("ln_attn" if new_arch else "input_layernorm")
        _emit(w, o + "attn_norm.weight", npy(state_dict[ln_attn + ".weight"]), GGMLType.F32)
        _emit(w, o + "attn_norm.bias", npy(state_dict[ln_attn + ".bias"]), GGMLType.F32)
        if p + "ln_mlp.weight" in state_dict:
            _emit(w, o + "ffn_norm.weight", npy(state_dict[p + "ln_mlp.weight"]), GGMLType.F32)
            _emit(w, o + "ffn_norm.bias", npy(state_dict[p + "ln_mlp.bias"]), GGMLType.F32)
        q, k, v = split_qkv(state_dict[p + "self_attention.query_key_value.weight"])
        _emit(w, o + "attn_q.weight", q, gtype)
        _emit(w, o + "attn_k.weight", k, gtype)
        _emit(w, o + "attn_v.weight", v, gtype)
        _emit(w, o + "attn_output.weight", npy(state_dict[p + "self_attention.dense.weight"]), gtype)
        _emit(w, o + "ffn_up.weight", npy(state_dict[p + "mlp.dense_h_to_4h.weight"]), gtype)
        _emit(w, o + "ffn_down.weight", npy(state_dict[p + "mlp.dense_4h_to_h.weight"]), gtype)
    _emit(w, "output_norm.weight", npy(state_dict["transformer.ln_f.weight"]), GGMLType.F32)
    _emit(w, "output_norm.bias", npy(state_dict["transformer.ln_f.bias"]), GGMLType.F32)
    _emit(w, "output.weight", npy(state_dict["lm_head.weight"]), gtype)
    w.write()
    return out_path


def convert_hf_mpt(
    state_dict: Mapping[str, Any],
    config: Mapping[str, Any],
    out_path: str,
    *,
    gtype: GGMLType = GGMLType.F32,
    tokenizer_kv: Mapping[str, Any] | None = None,
) -> str:
    """HF MptForCausalLM -> GGUF (reference: convert_hf_to_gguf.py
    MPTModel — fused Wqkv splits into contiguous Q|K|V; ALiBi max bias
    goes to attention.max_alibi_bias; weight-only LayerNorm)."""
    npy = _npy
    arch = "mpt"
    n_layer = int(config.get("n_layers", config.get("num_hidden_layers")))
    n_embd = int(config.get("d_model", config.get("hidden_size")))
    n_head = int(config.get("n_heads", config.get("num_attention_heads")))
    attn_cfg = config.get("attn_config") or {}
    if hasattr(attn_cfg, "to_dict"):
        attn_cfg = attn_cfg.to_dict()
    n_ff = int(config.get("expansion_ratio", 4)) * n_embd

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", int(config.get("max_seq_len", 2048)))
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", int(attn_cfg.get("kv_n_heads", n_head)))
    w.add(f"{arch}.attention.layer_norm_epsilon", float(config.get("layer_norm_epsilon", 1e-5)))
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", float(config.get("layer_norm_epsilon", 1e-5)))
    if attn_cfg.get("alibi", True):
        w.add(f"{arch}.attention.max_alibi_bias", float(attn_cfg.get("alibi_bias_max", 8.0)))
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    kv_heads = int(attn_cfg.get("kv_n_heads", n_head))
    qd = n_embd
    kvd = kv_heads * (n_embd // n_head)

    _emit(w, "token_embd.weight", npy(state_dict["transformer.wte.weight"]), gtype)
    for il in range(n_layer):
        p = f"transformer.blocks.{il}."
        o = f"blk.{il}."
        _emit(w, o + "attn_norm.weight", npy(state_dict[p + "norm_1.weight"]), GGMLType.F32)
        qkv = npy(state_dict[p + "attn.Wqkv.weight"])  # [qd+2*kvd, h] Q|K|V blocks
        _emit(w, o + "attn_q.weight", qkv[:qd], gtype)
        _emit(w, o + "attn_k.weight", qkv[qd : qd + kvd], gtype)
        _emit(w, o + "attn_v.weight", qkv[qd + kvd :], gtype)
        _emit(w, o + "attn_output.weight", npy(state_dict[p + "attn.out_proj.weight"]), gtype)
        _emit(w, o + "ffn_norm.weight", npy(state_dict[p + "norm_2.weight"]), GGMLType.F32)
        _emit(w, o + "ffn_up.weight", npy(state_dict[p + "ffn.up_proj.weight"]), gtype)
        _emit(w, o + "ffn_down.weight", npy(state_dict[p + "ffn.down_proj.weight"]), gtype)
    _emit(w, "output_norm.weight", npy(state_dict["transformer.norm_f.weight"]), GGMLType.F32)
    _emit(w, "output.weight", npy(state_dict["lm_head.weight"]), gtype)
    w.write()
    return out_path


def convert_hf_internlm2(
    state_dict: Mapping[str, Any],
    config: Mapping[str, Any],
    out_path: str,
    *,
    gtype: GGMLType = GGMLType.F32,
    tokenizer_kv: Mapping[str, Any] | None = None,
) -> str:
    """HF InternLM2ForCausalLM -> GGUF (reference: convert_hf_to_gguf.py
    InternLM2Model — the grouped wqkv packing [n_kv, q_per_kv+2, hd, h]
    unpacks to separate Q|K|V; w1/w3/w2 -> gate/up/down).  Graph itself is
    llama; re-emitted through convert_hf_llama after renaming."""
    npy = _npy
    n_head = int(config["num_attention_heads"])
    n_kv = int(config.get("num_key_value_heads", n_head))
    n_embd = int(config["hidden_size"])
    head_dim = int(config.get("head_dim", n_embd // n_head))
    q_per_kv = n_head // n_kv

    sd = {}
    for k, v in state_dict.items():
        if ".attention.wqkv.weight" in k:
            p = k.replace("attention.wqkv.weight", "")
            g = npy(v).reshape(n_kv, q_per_kv + 2, head_dim, n_embd)
            sd[p + "self_attn.q_proj.weight"] = np.ascontiguousarray(
                g[:, :q_per_kv].reshape(n_head * head_dim, n_embd))
            sd[p + "self_attn.k_proj.weight"] = np.ascontiguousarray(
                g[:, q_per_kv].reshape(n_kv * head_dim, n_embd))
            sd[p + "self_attn.v_proj.weight"] = np.ascontiguousarray(
                g[:, q_per_kv + 1].reshape(n_kv * head_dim, n_embd))
        else:
            sd[(k.replace("model.tok_embeddings", "model.embed_tokens")
                .replace("attention.wo", "self_attn.o_proj")
                .replace("attention_norm", "input_layernorm")
                .replace("feed_forward.w1", "mlp.gate_proj")
                .replace("feed_forward.w3", "mlp.up_proj")
                .replace("feed_forward.w2", "mlp.down_proj")
                .replace("ffn_norm", "post_attention_layernorm")
                .replace("output.weight", "lm_head.weight")
                if not k.startswith("model.norm") else k)] = v
    return convert_hf_llama(sd, config, out_path, arch="internlm2", gtype=gtype,
                            tokenizer_kv=tokenizer_kv)


def convert_hf_bloom(
    state_dict: Mapping[str, Any],
    config: Mapping[str, Any],
    out_path: str,
    *,
    gtype: GGMLType = GGMLType.F32,
    tokenizer_kv: Mapping[str, Any] | None = None,
) -> str:
    """HF BloomForCausalLM -> GGUF (reference: convert_hf_to_gguf.py
    BloomModel — per-head-interleaved query_key_value deinterleaves to
    contiguous Q|K|V; ALiBi; embedding LayerNorm -> token_embd_norm)."""
    npy = _npy
    arch = "bloom"
    n_layer = int(config.get("n_layer", config.get("num_hidden_layers")))
    n_embd = int(config.get("n_embed", config.get("hidden_size")))
    n_head = int(config.get("n_head", config.get("num_attention_heads")))
    head_dim = n_embd // n_head

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", int(config.get("seq_length", 2048)))
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", 4 * n_embd)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head)
    w.add(f"{arch}.attention.layer_norm_epsilon", float(config.get("layer_norm_epsilon", 1e-5)))
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", float(config.get("layer_norm_epsilon", 1e-5)))
    w.add(f"{arch}.attention.max_alibi_bias", 8.0)
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    sd = {k.removeprefix("transformer."): v for k, v in state_dict.items()}
    _emit(w, "token_embd.weight", npy(sd["word_embeddings.weight"]), gtype)
    _emit(w, "token_embd_norm.weight", npy(sd["word_embeddings_layernorm.weight"]), GGMLType.F32)
    _emit(w, "token_embd_norm.bias", npy(sd["word_embeddings_layernorm.bias"]), GGMLType.F32)
    for il in range(n_layer):
        p = f"h.{il}."
        o = f"blk.{il}."
        _emit(w, o + "attn_norm.weight", npy(sd[p + "input_layernorm.weight"]), GGMLType.F32)
        _emit(w, o + "attn_norm.bias", npy(sd[p + "input_layernorm.bias"]), GGMLType.F32)
        qkv = npy(sd[p + "self_attention.query_key_value.weight"])
        qkv = qkv.reshape(n_head, 3, head_dim, n_embd)
        qkvb = npy(sd[p + "self_attention.query_key_value.bias"]).reshape(n_head, 3, head_dim)
        for i, nm in enumerate(("q", "k", "v")):
            _emit(w, o + f"attn_{nm}.weight",
                  np.ascontiguousarray(qkv[:, i].reshape(n_embd, n_embd)), gtype)
            _emit(w, o + f"attn_{nm}.bias",
                  np.ascontiguousarray(qkvb[:, i].reshape(n_embd)), GGMLType.F32)
        _emit(w, o + "attn_output.weight", npy(sd[p + "self_attention.dense.weight"]), gtype)
        _emit(w, o + "attn_output.bias", npy(sd[p + "self_attention.dense.bias"]), GGMLType.F32)
        _emit(w, o + "ffn_norm.weight", npy(sd[p + "post_attention_layernorm.weight"]), GGMLType.F32)
        _emit(w, o + "ffn_norm.bias", npy(sd[p + "post_attention_layernorm.bias"]), GGMLType.F32)
        _emit(w, o + "ffn_up.weight", npy(sd[p + "mlp.dense_h_to_4h.weight"]), gtype)
        _emit(w, o + "ffn_up.bias", npy(sd[p + "mlp.dense_h_to_4h.bias"]), GGMLType.F32)
        _emit(w, o + "ffn_down.weight", npy(sd[p + "mlp.dense_4h_to_h.weight"]), gtype)
        _emit(w, o + "ffn_down.bias", npy(sd[p + "mlp.dense_4h_to_h.bias"]), GGMLType.F32)
    _emit(w, "output_norm.weight", npy(sd["ln_f.weight"]), GGMLType.F32)
    _emit(w, "output_norm.bias", npy(sd["ln_f.bias"]), GGMLType.F32)
    _emit(w, "output.weight", npy(state_dict["lm_head.weight"]), gtype)
    w.write()
    return out_path


def convert_hf_phi2(
    state_dict: Mapping[str, Any],
    config: Mapping[str, Any],
    out_path: str,
    *,
    gtype: GGMLType = GGMLType.F32,
    tokenizer_kv: Mapping[str, Any] | None = None,
) -> str:
    """HF PhiForCausalLM (phi-1/1.5/2) -> GGUF (reference:
    convert_hf_to_gguf.py Phi2Model — shared-norm parallel residual,
    partial rotary, biased lm_head)."""
    npy = _npy
    arch = "phi2"
    n_layer = int(config["num_hidden_layers"])
    n_embd = int(config["hidden_size"])
    n_head = int(config["num_attention_heads"])
    head_dim = n_embd // n_head

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", int(config.get("max_position_embeddings", 2048)))
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", int(config["intermediate_size"]))
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", int(config.get("num_key_value_heads", n_head)))
    w.add(f"{arch}.attention.layer_norm_epsilon", float(config.get("layer_norm_eps", 1e-5)))
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", float(config.get("layer_norm_eps", 1e-5)))
    w.add(f"{arch}.rope.freq_base", float(config.get("rope_theta", 10000.0)))
    w.add(f"{arch}.rope.dimension_count",
          int(head_dim * float(config.get("partial_rotary_factor", 0.5))))
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    _emit(w, "token_embd.weight", npy(state_dict["model.embed_tokens.weight"]), gtype)
    for il in range(n_layer):
        p = f"model.layers.{il}."
        o = f"blk.{il}."
        _emit(w, o + "attn_norm.weight", npy(state_dict[p + "input_layernorm.weight"]), GGMLType.F32)
        _emit(w, o + "attn_norm.bias", npy(state_dict[p + "input_layernorm.bias"]), GGMLType.F32)
        for hf, gg in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                       ("v_proj", "attn_v"), ("dense", "attn_output")):
            _emit(w, o + f"{gg}.weight", npy(state_dict[p + f"self_attn.{hf}.weight"]), gtype)
            _emit(w, o + f"{gg}.bias", npy(state_dict[p + f"self_attn.{hf}.bias"]), GGMLType.F32)
        _emit(w, o + "ffn_up.weight", npy(state_dict[p + "mlp.fc1.weight"]), gtype)
        _emit(w, o + "ffn_up.bias", npy(state_dict[p + "mlp.fc1.bias"]), GGMLType.F32)
        _emit(w, o + "ffn_down.weight", npy(state_dict[p + "mlp.fc2.weight"]), gtype)
        _emit(w, o + "ffn_down.bias", npy(state_dict[p + "mlp.fc2.bias"]), GGMLType.F32)
    _emit(w, "output_norm.weight", npy(state_dict["model.final_layernorm.weight"]), GGMLType.F32)
    _emit(w, "output_norm.bias", npy(state_dict["model.final_layernorm.bias"]), GGMLType.F32)
    _emit(w, "output.weight", npy(state_dict["lm_head.weight"]), gtype)
    _emit(w, "output.bias", npy(state_dict["lm_head.bias"]), GGMLType.F32)
    w.write()
    return out_path


def convert_hf_lfm2(
    state_dict: Mapping[str, Any],
    config: Mapping[str, Any],
    out_path: str,
    *,
    gtype: GGMLType = GGMLType.F32,
    tokenizer_kv: Mapping[str, Any] | None = None,
) -> str:
    """HF Lfm2ForCausalLM -> GGUF (reference: convert_hf_to_gguf.py
    LFM2Model — per-layer head_count_kv vector marks attention layers,
    conv layers carry shortconv tensors; embedding_norm ships under the
    token_embd_norm name like the reference)."""
    npy = _npy
    arch = "lfm2"
    n_layer = int(config["num_hidden_layers"])
    n_embd = int(config["hidden_size"])
    n_head = int(config["num_attention_heads"])
    n_kv = int(config.get("num_key_value_heads", n_head))
    layer_types = config.get("layer_types") or ["full_attention"] * n_layer
    kv_vec = [n_kv if lt == "full_attention" else 0 for lt in layer_types]

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", int(config.get("max_position_embeddings", 4096)))
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", int(config["intermediate_size"]))
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", kv_vec)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", float(config.get("norm_eps", 1e-5)))
    w.add(f"{arch}.rope.freq_base", float(config.get("rope_theta", 1000000.0)))
    w.add(f"{arch}.shortconv.l_cache", int(config.get("conv_L_cache", 3)))
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    _emit(w, "token_embd.weight", npy(state_dict["model.embed_tokens.weight"]), gtype)
    for il in range(n_layer):
        p = f"model.layers.{il}."
        o = f"blk.{il}."
        _emit(w, o + "attn_norm.weight", npy(state_dict[p + "operator_norm.weight"]), GGMLType.F32)
        if p + "conv.in_proj.weight" in state_dict:
            conv = npy(state_dict[p + "conv.conv.weight"])  # [d, 1, L]
            _emit(w, o + "shortconv.conv.weight", conv.reshape(conv.shape[0], conv.shape[-1]), GGMLType.F32)
            _emit(w, o + "shortconv.in_proj.weight", npy(state_dict[p + "conv.in_proj.weight"]), gtype)
            _emit(w, o + "shortconv.out_proj.weight", npy(state_dict[p + "conv.out_proj.weight"]), gtype)
        else:
            for hf, gg in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                           ("v_proj", "attn_v"), ("out_proj", "attn_output")):
                _emit(w, o + f"{gg}.weight", npy(state_dict[p + f"self_attn.{hf}.weight"]), gtype)
            _emit(w, o + "attn_q_norm.weight", npy(state_dict[p + "self_attn.q_layernorm.weight"]), GGMLType.F32)
            _emit(w, o + "attn_k_norm.weight", npy(state_dict[p + "self_attn.k_layernorm.weight"]), GGMLType.F32)
        _emit(w, o + "ffn_norm.weight", npy(state_dict[p + "ffn_norm.weight"]), GGMLType.F32)
        _emit(w, o + "ffn_gate.weight", npy(state_dict[p + "feed_forward.w1.weight"]), gtype)
        _emit(w, o + "ffn_down.weight", npy(state_dict[p + "feed_forward.w2.weight"]), gtype)
        _emit(w, o + "ffn_up.weight", npy(state_dict[p + "feed_forward.w3.weight"]), gtype)
    _emit(w, "token_embd_norm.weight", npy(state_dict["model.embedding_norm.weight"]), GGMLType.F32)
    if "lm_head.weight" in state_dict:
        _emit(w, "output.weight", npy(state_dict["lm_head.weight"]), gtype)
    w.write()
    return out_path


def convert_hf_t5(
    state_dict: Mapping[str, Any],
    config: Mapping[str, Any],
    out_path: str,
    *,
    gtype: GGMLType = GGMLType.F32,
    tokenizer_kv: Mapping[str, Any] | None = None,
) -> str:
    """HF T5ForConditionalGeneration -> GGUF (reference:
    convert_hf_to_gguf.py T5Model; tensor names LLM_TENSOR_ENC_*/DEC_*,
    src/llama-arch.cpp:409-435)."""
    npy = _npy
    arch = "t5"
    d_model = int(config["d_model"])
    n_enc = int(config.get("num_layers", 6))
    n_dec = int(config.get("num_decoder_layers", n_enc))
    n_head = int(config["num_heads"])
    d_kv = int(config.get("d_kv", d_model // n_head))

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_enc)
    w.add(f"{arch}.decoder_block_count", n_dec)
    w.add(f"{arch}.context_length", 512)
    w.add(f"{arch}.embedding_length", d_model)
    w.add(f"{arch}.feed_forward_length", int(config["d_ff"]))
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head)
    w.add(f"{arch}.attention.key_length", d_kv)
    w.add(f"{arch}.attention.value_length", d_kv)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", float(config.get("layer_norm_epsilon", 1e-6)))
    w.add(f"{arch}.attention.relative_buckets_count",
          int(config.get("relative_attention_num_buckets", 32)))
    w.add(f"{arch}.attention.relative_max_distance",
          int(config.get("relative_attention_max_distance", 128)))
    w.add(f"{arch}.decoder_start_token_id", int(config.get("decoder_start_token_id", 0)))
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    if config.get("tie_word_embeddings", True):
        w.add(f"{arch}.logit_scale", float(d_model) ** -0.5)
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    _emit(w, "token_embd.weight", npy(state_dict["shared.weight"]), gtype)

    def ffn(src, dst):
        if src + ".wi_0.weight" in state_dict:  # v1.1 gated gelu
            _emit(w, dst + "ffn_gate.weight", npy(state_dict[src + ".wi_0.weight"]), gtype)
            _emit(w, dst + "ffn_up.weight", npy(state_dict[src + ".wi_1.weight"]), gtype)
        else:  # v1.0 relu
            _emit(w, dst + "ffn_up.weight", npy(state_dict[src + ".wi.weight"]), gtype)
        _emit(w, dst + "ffn_down.weight", npy(state_dict[src + ".wo.weight"]), gtype)

    for il in range(n_enc):
        p = f"encoder.block.{il}."
        o = f"enc.blk.{il}."
        _emit(w, o + "attn_norm.weight", npy(state_dict[p + "layer.0.layer_norm.weight"]), GGMLType.F32)
        for hf in "qkvo":
            _emit(w, o + f"attn_{hf}.weight", npy(state_dict[p + f"layer.0.SelfAttention.{hf}.weight"]), gtype)
        if il == 0:
            _emit(w, o + "attn_rel_b.weight",
                  npy(state_dict[p + "layer.0.SelfAttention.relative_attention_bias.weight"]), GGMLType.F32)
        _emit(w, o + "ffn_norm.weight", npy(state_dict[p + "layer.1.layer_norm.weight"]), GGMLType.F32)
        ffn(p + "layer.1.DenseReluDense", o)
    _emit(w, "enc.output_norm.weight", npy(state_dict["encoder.final_layer_norm.weight"]), GGMLType.F32)

    for il in range(n_dec):
        p = f"decoder.block.{il}."
        o = f"dec.blk.{il}."
        _emit(w, o + "attn_norm.weight", npy(state_dict[p + "layer.0.layer_norm.weight"]), GGMLType.F32)
        for hf in "qkvo":
            _emit(w, o + f"attn_{hf}.weight", npy(state_dict[p + f"layer.0.SelfAttention.{hf}.weight"]), gtype)
        if il == 0:
            _emit(w, o + "attn_rel_b.weight",
                  npy(state_dict[p + "layer.0.SelfAttention.relative_attention_bias.weight"]), GGMLType.F32)
        _emit(w, o + "cross_attn_norm.weight", npy(state_dict[p + "layer.1.layer_norm.weight"]), GGMLType.F32)
        for hf in "qkvo":
            _emit(w, o + f"cross_attn_{hf}.weight", npy(state_dict[p + f"layer.1.EncDecAttention.{hf}.weight"]), gtype)
        _emit(w, o + "ffn_norm.weight", npy(state_dict[p + "layer.2.layer_norm.weight"]), GGMLType.F32)
        ffn(p + "layer.2.DenseReluDense", o)
    _emit(w, "dec.output_norm.weight", npy(state_dict["decoder.final_layer_norm.weight"]), GGMLType.F32)
    if "lm_head.weight" in state_dict:
        _emit(w, "output.weight", npy(state_dict["lm_head.weight"]), gtype)
    w.write()
    return out_path


def convert_hf_mamba2(
    state_dict: Mapping[str, Any],
    config: Mapping[str, Any],
    out_path: str,
    *,
    gtype: GGMLType = GGMLType.F32,
    tokenizer_kv: Mapping[str, Any] | None = None,
) -> str:
    """HF Mamba2ForCausalLM -> GGUF (reference: convert_hf_to_gguf.py
    Mamba2Model — time_step_rank carries the head count, group_count the
    B/C groups; A stored as -exp(A_log))."""
    npy = _npy
    arch = "mamba2"
    n_layer = int(config["num_hidden_layers"])
    n_embd = int(config["hidden_size"])
    d_inner = int(config.get("intermediate_size")
                  or int(config.get("expand", 2)) * n_embd)
    n_head = int(config["num_heads"])

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 1 << 20)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", 0)
    w.add(f"{arch}.attention.head_count", 1)
    w.add(f"{arch}.attention.head_count_kv", 1)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", float(config.get("layer_norm_epsilon", 1e-5)))
    w.add(f"{arch}.ssm.conv_kernel", int(config.get("conv_kernel", 4)))
    w.add(f"{arch}.ssm.inner_size", d_inner)
    w.add(f"{arch}.ssm.state_size", int(config.get("state_size", 128)))
    w.add(f"{arch}.ssm.time_step_rank", n_head)
    w.add(f"{arch}.ssm.group_count", int(config.get("n_groups", 1)))
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    _emit(w, "token_embd.weight", npy(state_dict["backbone.embeddings.weight"]), gtype)
    for il in range(n_layer):
        p = f"backbone.layers.{il}."
        o = f"blk.{il}."
        _emit(w, o + "attn_norm.weight", npy(state_dict[p + "norm.weight"]), GGMLType.F32)
        _emit(w, o + "ssm_in.weight", npy(state_dict[p + "mixer.in_proj.weight"]), gtype)
        conv = npy(state_dict[p + "mixer.conv1d.weight"])  # [w_dim, 1, dc]
        _emit(w, o + "ssm_conv1d.weight", conv.reshape(conv.shape[0], conv.shape[-1]), GGMLType.F32)
        if p + "mixer.conv1d.bias" in state_dict:
            _emit(w, o + "ssm_conv1d.bias", npy(state_dict[p + "mixer.conv1d.bias"]), GGMLType.F32)
        _emit(w, o + "ssm_dt.bias", npy(state_dict[p + "mixer.dt_bias"]), GGMLType.F32)
        _emit(w, o + "ssm_a", -np.exp(npy(state_dict[p + "mixer.A_log"])), GGMLType.F32)
        _emit(w, o + "ssm_d", npy(state_dict[p + "mixer.D"]), GGMLType.F32)
        _emit(w, o + "ssm_norm.weight", npy(state_dict[p + "mixer.norm.weight"]), GGMLType.F32)
        _emit(w, o + "ssm_out.weight", npy(state_dict[p + "mixer.out_proj.weight"]), gtype)
    _emit(w, "output_norm.weight", npy(state_dict["backbone.norm_f.weight"]), GGMLType.F32)
    if "lm_head.weight" in state_dict:
        _emit(w, "output.weight", npy(state_dict["lm_head.weight"]), gtype)
    w.write()
    return out_path


def convert_hf_bamba(
    state_dict: Mapping[str, Any],
    config: Mapping[str, Any],
    out_path: str,
    *,
    gtype: GGMLType = GGMLType.F32,
    tokenizer_kv: Mapping[str, Any] | None = None,
) -> str:
    """HF BambaForCausalLM -> GGUF (reference: convert_hf_to_gguf.py
    BambaModel — jamba-style per-layer head_count_kv vector with a
    mamba2 mixer on the recurrent layers)."""
    npy = _npy
    arch = "bamba"
    n_layer = int(config["num_hidden_layers"])
    n_embd = int(config["hidden_size"])
    n_head = int(config["num_attention_heads"])
    n_kv = int(config.get("num_key_value_heads", n_head))
    head_dim = int(config.get("attention_head_dim") or n_embd // n_head)
    d_inner = int(config.get("mamba_expand", 2)) * n_embd
    attn_idx = set(config.get("attn_layer_indices") or [])
    kv_vec = [n_kv if il in attn_idx else 0 for il in range(n_layer)]

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", int(config.get("max_position_embeddings", 4096)))
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", int(config["intermediate_size"]))
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", kv_vec)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", float(config.get("rms_norm_eps", 1e-5)))
    w.add(f"{arch}.rope.freq_base", float(config.get("rope_theta", 10000.0)))
    w.add(f"{arch}.rope.dimension_count",
          int(head_dim * float(config.get("partial_rotary_factor", 0.5))))
    w.add(f"{arch}.ssm.conv_kernel", int(config.get("mamba_d_conv", 4)))
    w.add(f"{arch}.ssm.inner_size", d_inner)
    w.add(f"{arch}.ssm.state_size", int(config.get("mamba_d_state", 128)))
    w.add(f"{arch}.ssm.time_step_rank", int(config["mamba_n_heads"]))
    w.add(f"{arch}.ssm.group_count", int(config.get("mamba_n_groups", 1)))
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    _emit(w, "token_embd.weight", npy(state_dict["model.embed_tokens.weight"]), gtype)
    for il in range(n_layer):
        p = f"model.layers.{il}."
        o = f"blk.{il}."
        _emit(w, o + "attn_norm.weight", npy(state_dict[p + "input_layernorm.weight"]), GGMLType.F32)
        if p + "mamba.in_proj.weight" in state_dict:
            _emit(w, o + "ssm_in.weight", npy(state_dict[p + "mamba.in_proj.weight"]), gtype)
            conv = npy(state_dict[p + "mamba.conv1d.weight"])
            _emit(w, o + "ssm_conv1d.weight", conv.reshape(conv.shape[0], conv.shape[-1]), GGMLType.F32)
            if p + "mamba.conv1d.bias" in state_dict:
                _emit(w, o + "ssm_conv1d.bias", npy(state_dict[p + "mamba.conv1d.bias"]), GGMLType.F32)
            _emit(w, o + "ssm_dt.bias", npy(state_dict[p + "mamba.dt_bias"]), GGMLType.F32)
            _emit(w, o + "ssm_a", -np.exp(npy(state_dict[p + "mamba.A_log"])), GGMLType.F32)
            _emit(w, o + "ssm_d", npy(state_dict[p + "mamba.D"]), GGMLType.F32)
            _emit(w, o + "ssm_norm.weight", npy(state_dict[p + "mamba.norm.weight"]), GGMLType.F32)
            _emit(w, o + "ssm_out.weight", npy(state_dict[p + "mamba.out_proj.weight"]), gtype)
        else:
            for hf, gg in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                           ("v_proj", "attn_v"), ("o_proj", "attn_output")):
                _emit(w, o + f"{gg}.weight", npy(state_dict[p + f"self_attn.{hf}.weight"]), gtype)
        _emit(w, o + "ffn_norm.weight", npy(state_dict[p + "pre_ff_layernorm.weight"]), GGMLType.F32)
        _emit(w, o + "ffn_gate.weight", npy(state_dict[p + "feed_forward.gate_proj.weight"]), gtype)
        _emit(w, o + "ffn_up.weight", npy(state_dict[p + "feed_forward.up_proj.weight"]), gtype)
        _emit(w, o + "ffn_down.weight", npy(state_dict[p + "feed_forward.down_proj.weight"]), gtype)
    _emit(w, "output_norm.weight", npy(state_dict["model.final_layernorm.weight"]), GGMLType.F32)
    if "lm_head.weight" in state_dict:
        _emit(w, "output.weight", npy(state_dict["lm_head.weight"]), gtype)
    w.write()
    return out_path


def convert_hf_falcon_h1(
    state_dict: Mapping[str, Any],
    config: Mapping[str, Any],
    out_path: str,
    *,
    gtype: GGMLType = GGMLType.F32,
    tokenizer_kv: Mapping[str, Any] | None = None,
) -> str:
    """HF FalconH1ForCausalLM -> GGUF (reference: convert_hf_to_gguf.py
    FalconH1Model — every layer carries attention AND a mamba2 mixer; the
    model's scalar multipliers fold into the weights at conversion)."""
    npy = _npy
    arch = "falcon-h1"
    n_layer = int(config["num_hidden_layers"])
    n_embd = int(config["hidden_size"])
    n_head = int(config["num_attention_heads"])
    n_kv = int(config.get("num_key_value_heads", n_head))
    head_dim = int(config.get("head_dim") or n_embd // n_head)
    d_ssm = int(config.get("mamba_d_ssm") or int(config.get("mamba_expand", 2)) * n_embd)
    gts = int(config.get("mamba_n_groups", 1)) * int(config.get("mamba_d_state", 128))

    mlp_m = config.get("mlp_multipliers") or [1.0, 1.0]
    ssm_m = config.get("ssm_multipliers") or [1.0] * 5
    key_m = float(config.get("key_multiplier", 1.0))
    att_in = float(config.get("attention_in_multiplier", 1.0))
    att_out = float(config.get("attention_out_multiplier", 1.0))
    ssm_in_m = float(config.get("ssm_in_multiplier", 1.0))
    ssm_out_m = float(config.get("ssm_out_multiplier", 1.0))

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", int(config.get("max_position_embeddings", 4096)))
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", int(config["intermediate_size"]))
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_kv)
    w.add(f"{arch}.attention.key_length", head_dim)
    w.add(f"{arch}.attention.value_length", head_dim)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", float(config.get("rms_norm_eps", 1e-5)))
    w.add(f"{arch}.rope.freq_base", float(config.get("rope_theta", 100000.0)))
    w.add(f"{arch}.rope.dimension_count", head_dim)
    w.add(f"{arch}.ssm.conv_kernel", int(config.get("mamba_d_conv", 4)))
    w.add(f"{arch}.ssm.inner_size", d_ssm)
    w.add(f"{arch}.ssm.state_size", int(config.get("mamba_d_state", 128)))
    w.add(f"{arch}.ssm.time_step_rank", int(config["mamba_n_heads"]))
    w.add(f"{arch}.ssm.group_count", int(config.get("mamba_n_groups", 1)))
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    emb_m = float(config.get("embedding_multiplier", 1.0))
    _emit(w, "token_embd.weight", npy(state_dict["model.embed_tokens.weight"]) * emb_m, gtype)
    for il in range(n_layer):
        p = f"model.layers.{il}."
        o = f"blk.{il}."
        _emit(w, o + "attn_norm.weight", npy(state_dict[p + "input_layernorm.weight"]), GGMLType.F32)
        _emit(w, o + "attn_q.weight", npy(state_dict[p + "self_attn.q_proj.weight"]) * att_in, gtype)
        _emit(w, o + "attn_k.weight", npy(state_dict[p + "self_attn.k_proj.weight"]) * att_in * key_m, gtype)
        _emit(w, o + "attn_v.weight", npy(state_dict[p + "self_attn.v_proj.weight"]) * att_in, gtype)
        _emit(w, o + "attn_output.weight", npy(state_dict[p + "self_attn.o_proj.weight"]) * att_out, gtype)
        inp = npy(state_dict[p + "mamba.in_proj.weight"]) * ssm_in_m
        inp[:d_ssm] *= ssm_m[0]
        inp[d_ssm : 2 * d_ssm] *= ssm_m[1]
        inp[2 * d_ssm : 2 * d_ssm + gts] *= ssm_m[2]
        inp[2 * d_ssm + gts : 2 * d_ssm + 2 * gts] *= ssm_m[3]
        inp[2 * d_ssm + 2 * gts :] *= ssm_m[4]
        _emit(w, o + "ssm_in.weight", inp, gtype)
        conv = npy(state_dict[p + "mamba.conv1d.weight"])
        _emit(w, o + "ssm_conv1d.weight", conv.reshape(conv.shape[0], conv.shape[-1]), GGMLType.F32)
        if p + "mamba.conv1d.bias" in state_dict:
            _emit(w, o + "ssm_conv1d.bias", npy(state_dict[p + "mamba.conv1d.bias"]), GGMLType.F32)
        _emit(w, o + "ssm_dt.bias", npy(state_dict[p + "mamba.dt_bias"]), GGMLType.F32)
        _emit(w, o + "ssm_a", -np.exp(npy(state_dict[p + "mamba.A_log"])), GGMLType.F32)
        _emit(w, o + "ssm_d", npy(state_dict[p + "mamba.D"]), GGMLType.F32)
        if p + "mamba.norm.weight" in state_dict:
            _emit(w, o + "ssm_norm.weight", npy(state_dict[p + "mamba.norm.weight"]), GGMLType.F32)
        _emit(w, o + "ssm_out.weight", npy(state_dict[p + "mamba.out_proj.weight"]) * ssm_out_m, gtype)
        _emit(w, o + "ffn_norm.weight", npy(state_dict[p + "pre_ff_layernorm.weight"]), GGMLType.F32)
        _emit(w, o + "ffn_gate.weight", npy(state_dict[p + "feed_forward.gate_proj.weight"]) * mlp_m[0], gtype)
        _emit(w, o + "ffn_up.weight", npy(state_dict[p + "feed_forward.up_proj.weight"]), gtype)
        _emit(w, o + "ffn_down.weight", npy(state_dict[p + "feed_forward.down_proj.weight"]) * mlp_m[1], gtype)
    _emit(w, "output_norm.weight", npy(state_dict["model.final_layernorm.weight"]), GGMLType.F32)
    lm_m = float(config.get("lm_head_multiplier", 1.0))
    if "lm_head.weight" in state_dict:
        _emit(w, "output.weight", npy(state_dict["lm_head.weight"]) * lm_m, gtype)
    w.write()
    return out_path


def convert_hf_exaone(state_dict, config, out_path, *, gtype=GGMLType.F32,
                      tokenizer_kv=None):
    """EXAONE-3.x (no offline HF class): transformer.h naming remapped to
    the llama layout, neox rope over rope_pct*head_dim (reference
    convert_hf_to_gguf.py ExaoneModel; src/models/exaone.cpp is a plain
    llama graph)."""
    sd = {}
    for k, v in state_dict.items():
        k = k.replace("transformer.wte.weight", "model.embed_tokens.weight")
        k = k.replace("transformer.ln_f.", "model.norm.")
        k = (k.replace("transformer.h.", "model.layers.")
             .replace(".ln_1.", ".input_layernorm.")
             .replace(".ln_2.", ".post_attention_layernorm.")
             .replace(".attn.attention.out_proj.", ".self_attn.o_proj.")
             .replace(".attn.attention.", ".self_attn.")
             .replace(".mlp.c_fc_0.", ".mlp.gate_proj.")
             .replace(".mlp.c_fc_1.", ".mlp.up_proj.")
             .replace(".mlp.c_proj.", ".mlp.down_proj."))
        sd[k] = v
    cfg = dict(config)
    cfg.setdefault("partial_rotary_factor",
                   float(config.get("rope_pct", 1.0)))
    return convert_hf_llama(sd, cfg, out_path, arch="exaone", gtype=gtype,
                            tokenizer_kv=tokenizer_kv)


def convert_hf_bailingmoe(state_dict, config, out_path, *, arch="bailingmoe",
                          gtype=GGMLType.F32, tokenizer_kv=None):
    """bailingmoe (Ling) v1/v2: fused attention.query_key_value split into
    q/k/v (v1 additionally llama-permuted by the rules table),
    attention.dense -> o_proj, query/key_layernorm -> full-width q/k norms
    (reference convert_hf_to_gguf.py BailingMoeModel/BailingMoeV2Model)."""
    n_head = int(config["num_attention_heads"])
    n_kv = int(config.get("num_key_value_heads", n_head))
    n_embd = int(config["hidden_size"])
    head_dim = int(config.get("head_dim", n_embd // n_head))
    nextn = int(config.get("num_nextn_predict_layers", 0))
    n_layer = int(config["num_hidden_layers"]) - (0 if arch == "bailingmoe" else 0)
    sd = {}
    for k, v in state_dict.items():
        if nextn and any(f"model.layers.{il}." in k
                         for il in range(n_layer, n_layer + nextn)):
            continue  # nextn MTP layers are not part of the decode graph
        k = k.replace("model.word_embeddings.weight", "model.embed_tokens.weight")
        if ".attention.query_key_value." in k:
            qkv = _npy(v)
            qd, kvd = n_head * head_dim, n_kv * head_dim
            base = k.split(".attention.query_key_value.")[0]
            sd[base + ".self_attn.q_proj.weight"] = qkv[:qd]
            sd[base + ".self_attn.k_proj.weight"] = qkv[qd:qd + kvd]
            sd[base + ".self_attn.v_proj.weight"] = qkv[qd + kvd:]
            continue
        k = (k.replace(".attention.dense.", ".self_attn.o_proj.")
             .replace(".attention.query_layernorm.", ".self_attn.q_norm.")
             .replace(".attention.key_layernorm.", ".self_attn.k_norm."))
        sd[k] = v
    return convert_hf_llama(sd, config, out_path, arch=arch, gtype=gtype,
                            tokenizer_kv=tokenizer_kv)


def convert_hf_jais(state_dict, config, out_path, *, gtype=GGMLType.F32,
                    tokenizer_kv=None):
    """jais: gpt2-family Conv1D layout (weights transposed), ALiBi instead
    of rope, SwiGLU ffn with biases, muP scales baked into the embedding
    and output weights (reference convert_hf_to_gguf.py JaisModel;
    src/models/jais.cpp)."""
    npy = _npy
    arch = "jais"
    n_embd = int(config["n_embd"])
    n_head = int(config["n_head"])
    n_layer = int(config["n_layer"])
    emb_scale = float(config.get("mup_embeddings_scale",
                                 config.get("embeddings_scale", 1.0)))
    width_scale = float(config.get("mup_output_alpha", 1.0)) * float(
        config.get("mup_width_scale", 1.0)) if "mup_output_alpha" in config \
        else float(config.get("width_scale", 1.0))

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", int(config.get("n_positions", 2048)))
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", int(config["n_inner"]))
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head)
    w.add(f"{arch}.attention.layer_norm_epsilon",
          float(config.get("layer_norm_epsilon", 1e-5)))
    w.add(f"{arch}.attention.max_alibi_bias", 8.0)
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    def lin(t):  # Conv1D [in, out] -> Linear [out, in]
        return np.ascontiguousarray(npy(t).T)

    _emit(w, "token_embd.weight",
          npy(state_dict["transformer.wte.weight"]) * emb_scale, gtype)
    for il in range(n_layer):
        p = f"transformer.h.{il}."
        o = f"blk.{il}."
        _emit(w, o + "attn_norm.weight", npy(state_dict[p + "ln_1.weight"]), GGMLType.F32)
        _emit(w, o + "attn_norm.bias", npy(state_dict[p + "ln_1.bias"]), GGMLType.F32)
        ca = lin(state_dict[p + "attn.c_attn.weight"])  # [3E, K]
        cb = npy(state_dict[p + "attn.c_attn.bias"])
        _emit(w, o + "attn_q.weight", np.ascontiguousarray(ca[:n_embd]), gtype)
        _emit(w, o + "attn_k.weight", np.ascontiguousarray(ca[n_embd:2 * n_embd]), gtype)
        _emit(w, o + "attn_v.weight", np.ascontiguousarray(ca[2 * n_embd:]), gtype)
        _emit(w, o + "attn_q.bias", np.ascontiguousarray(cb[:n_embd]), GGMLType.F32)
        _emit(w, o + "attn_k.bias", np.ascontiguousarray(cb[n_embd:2 * n_embd]), GGMLType.F32)
        _emit(w, o + "attn_v.bias", np.ascontiguousarray(cb[2 * n_embd:]), GGMLType.F32)
        _emit(w, o + "attn_output.weight", lin(state_dict[p + "attn.c_proj.weight"]), gtype)
        _emit(w, o + "attn_output.bias", npy(state_dict[p + "attn.c_proj.bias"]), GGMLType.F32)
        _emit(w, o + "ffn_norm.weight", npy(state_dict[p + "ln_2.weight"]), GGMLType.F32)
        _emit(w, o + "ffn_norm.bias", npy(state_dict[p + "ln_2.bias"]), GGMLType.F32)
        _emit(w, o + "ffn_gate.weight", lin(state_dict[p + "mlp.c_fc2.weight"]), gtype)
        _emit(w, o + "ffn_gate.bias", npy(state_dict[p + "mlp.c_fc2.bias"]), GGMLType.F32)
        _emit(w, o + "ffn_up.weight", lin(state_dict[p + "mlp.c_fc.weight"]), gtype)
        _emit(w, o + "ffn_up.bias", npy(state_dict[p + "mlp.c_fc.bias"]), GGMLType.F32)
        _emit(w, o + "ffn_down.weight", lin(state_dict[p + "mlp.c_proj.weight"]), gtype)
        _emit(w, o + "ffn_down.bias", npy(state_dict[p + "mlp.c_proj.bias"]), GGMLType.F32)
    _emit(w, "output_norm.weight", npy(state_dict["transformer.ln_f.weight"]), GGMLType.F32)
    _emit(w, "output_norm.bias", npy(state_dict["transformer.ln_f.bias"]), GGMLType.F32)
    out = npy(state_dict.get("lm_head.weight",
                             state_dict["transformer.wte.weight"]))
    _emit(w, "output.weight", out * width_scale, gtype)
    w.write()
    return out_path


def convert_hf_openelm(state_dict, config, out_path, *, gtype=GGMLType.F32,
                       tokenizer_kv=None):
    """apple OpenELM: per-layer query/kv head counts AND per-layer FFN
    widths (ffn_multipliers), fused qkv split here, fused proj_1 split
    into gate|up, per-head q/k RMS norms, tied embeddings (reference
    convert_hf_to_gguf.py OpenELMModel; src/models/openelm.cpp)."""
    npy = _npy
    arch = "openelm"
    n_layer = int(config["num_transformer_layers"])
    n_embd = int(config["model_dim"])
    head_dim = int(config["head_dim"])
    nq = [int(v) for v in config["num_query_heads"]]
    nkv = [int(v) for v in config["num_kv_heads"]]

    def _divisible(v, divisor):
        out = max(divisor, int(v + divisor / 2) // divisor * divisor)
        if out < 0.9 * v:
            out += divisor
        return out

    div = int(config.get("ffn_dim_divisor", 256))
    ffn = [_divisible(m * n_embd, div) for m in config["ffn_multipliers"]]
    rot_pct = float(config.get("rope_percentage", 1.0) or 1.0)

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", int(config.get("max_context_length", 2048)))
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", ffn)
    w.add(f"{arch}.attention.head_count", nq)
    w.add(f"{arch}.attention.head_count_kv", nkv)
    w.add(f"{arch}.attention.key_length", head_dim)
    w.add(f"{arch}.attention.value_length", head_dim)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add(f"{arch}.rope.freq_base", float(config.get("rope_freq_constant", 10000.0)))
    w.add(f"{arch}.rope.dimension_count", int(rot_pct * head_dim))
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    _emit(w, "token_embd.weight", npy(state_dict["transformer.token_embeddings.weight"]), gtype)
    _emit(w, "output_norm.weight", npy(state_dict["transformer.norm.weight"]), GGMLType.F32)
    for il in range(n_layer):
        p = f"transformer.layers.{il}."
        o = f"blk.{il}."
        _emit(w, o + "attn_norm.weight", npy(state_dict[p + "attn_norm.weight"]), GGMLType.F32)
        _emit(w, o + "ffn_norm.weight", npy(state_dict[p + "ffn_norm.weight"]), GGMLType.F32)
        qkv = npy(state_dict[p + "attn.qkv_proj.weight"])  # [(nq+2nkv)*hd, H]
        qd, kd = nq[il] * head_dim, nkv[il] * head_dim
        _emit(w, o + "attn_q.weight", qkv[:qd], gtype)
        _emit(w, o + "attn_k.weight", qkv[qd : qd + kd], gtype)
        _emit(w, o + "attn_v.weight", qkv[qd + kd : qd + 2 * kd], gtype)
        _emit(w, o + "attn_q_norm.weight", npy(state_dict[p + "attn.q_norm.weight"]), GGMLType.F32)
        _emit(w, o + "attn_k_norm.weight", npy(state_dict[p + "attn.k_norm.weight"]), GGMLType.F32)
        _emit(w, o + "attn_output.weight", npy(state_dict[p + "attn.out_proj.weight"]), gtype)
        p1 = npy(state_dict[p + "ffn.proj_1.weight"])  # [2*ffn_il, H] = gate|up
        _emit(w, o + "ffn_gate.weight", p1[: ffn[il]], gtype)
        _emit(w, o + "ffn_up.weight", p1[ffn[il] :], gtype)
        _emit(w, o + "ffn_down.weight", npy(state_dict[p + "ffn.proj_2.weight"]), gtype)
    w.write()
    return out_path


def convert_hf_bitnet(state_dict, config, out_path, *, gtype=GGMLType.F32,
                      tokenizer_kv=None):
    """BitnetForCausalLM -> GGUF arch `bitnet`.  The seven matmul weights
    per block are ternary fake-quantized exactly like the reference
    converter (convert_hf_to_gguf.py BitnetModel.weight_quant: round to
    {-1,0,1} of w/mean|w|, then rescale); inner_attn_ln / mlp.ffn_layernorm
    become attn_sub_norm / ffn_sub_norm (src/models/bitnet.cpp applies them
    before wo / ffn_down).  lm_head is tied to the token embedding
    (bitnet.cpp:154 uses tok_embd directly)."""
    npy = _npy
    n_layer = int(config["num_hidden_layers"])
    n_embd = int(config["hidden_size"])
    n_head = int(config["num_attention_heads"])
    n_kv = int(config.get("num_key_value_heads", n_head))

    def tq(x):
        x = npy(x).astype(np.float32)
        scale = max(np.abs(x).mean(), 1e-5)
        return np.round(x / scale).clip(-1, 1) * scale

    w = GGUFWriter(out_path)
    w.add("general.architecture", "bitnet")
    w.add("bitnet.block_count", n_layer)
    w.add("bitnet.context_length", int(config.get("max_position_embeddings", 2048)))
    w.add("bitnet.embedding_length", n_embd)
    w.add("bitnet.feed_forward_length", int(config["intermediate_size"]))
    w.add("bitnet.attention.head_count", n_head)
    w.add("bitnet.attention.head_count_kv", n_kv)
    w.add("bitnet.attention.key_length", n_embd // n_head)
    w.add("bitnet.attention.value_length", n_embd // n_head)
    w.add("bitnet.attention.layer_norm_rms_epsilon", float(config.get("rms_norm_eps", 1e-5)))
    w.add("bitnet.rope.freq_base", float(config.get("rope_theta", 10000.0)))
    w.add("bitnet.rope.dimension_count", n_embd // n_head)
    w.add("bitnet.vocab_size", int(config["vocab_size"]))
    if tokenizer_kv:
        for k, v in tokenizer_kv.items():
            w.add(k, v)
    _emit(w, "token_embd.weight", npy(state_dict["model.embed_tokens.weight"]), gtype)
    _emit(w, "output_norm.weight", npy(state_dict["model.norm.weight"]), GGMLType.F32)
    for il in range(n_layer):
        p = f"model.layers.{il}."
        o = f"blk.{il}."
        _emit(w, o + "attn_norm.weight", npy(state_dict[p + "input_layernorm.weight"]), GGMLType.F32)
        _emit(w, o + "attn_q.weight", tq(state_dict[p + "self_attn.q_proj.weight"]), gtype)
        _emit(w, o + "attn_k.weight", tq(state_dict[p + "self_attn.k_proj.weight"]), gtype)
        _emit(w, o + "attn_v.weight", tq(state_dict[p + "self_attn.v_proj.weight"]), gtype)
        _emit(w, o + "attn_sub_norm.weight", npy(state_dict[p + "self_attn.inner_attn_ln.weight"]), GGMLType.F32)
        _emit(w, o + "attn_output.weight", tq(state_dict[p + "self_attn.o_proj.weight"]), gtype)
        _emit(w, o + "ffn_norm.weight", npy(state_dict[p + "post_attention_layernorm.weight"]), GGMLType.F32)
        _emit(w, o + "ffn_gate.weight", tq(state_dict[p + "mlp.gate_proj.weight"]), gtype)
        _emit(w, o + "ffn_up.weight", tq(state_dict[p + "mlp.up_proj.weight"]), gtype)
        _emit(w, o + "ffn_sub_norm.weight", npy(state_dict[p + "mlp.ffn_layernorm.weight"]), GGMLType.F32)
        _emit(w, o + "ffn_down.weight", tq(state_dict[p + "mlp.down_proj.weight"]), gtype)
    w.write()
    return out_path


def convert_hf_modern_bert(state_dict, config, out_path, *, gtype=GGMLType.F32,
                           tokenizer_kv=None, pooling=0):
    """ModernBertModel -> GGUF arch `modern-bert` (encoder; reference
    src/models/modern-bert.cpp + convert_hf_to_gguf.py ModernBertModel).
    Pre-norm bias-free LN blocks with fused Wqkv and fused-GEGLU Wi;
    layer 0 ships no attn_norm; symmetric local attention windows with
    a separate local rope base, every global_attn_every_n_layers-th
    layer global.  `pooling`: llama.h LLAMA_POOLING_TYPE_* int."""
    npy = _npy

    def g(k, *alts, default=None):
        for kk in (k, *alts):
            if kk in config:
                return config[kk]
        return default

    sd = {k[6:] if k.startswith("model.") else k: v for k, v in state_dict.items()}
    n_layer = int(config["num_hidden_layers"])
    n_embd = int(config["hidden_size"])
    n_head = int(config["num_attention_heads"])
    hd = n_embd // n_head
    w = GGUFWriter(out_path)
    w.add("general.architecture", "modern-bert")
    w.add("modern-bert.block_count", n_layer)
    w.add("modern-bert.context_length", int(g("max_position_embeddings", default=8192)))
    w.add("modern-bert.embedding_length", n_embd)
    w.add("modern-bert.feed_forward_length", int(config["intermediate_size"]))
    w.add("modern-bert.attention.head_count", n_head)
    w.add("modern-bert.attention.head_count_kv",
          int(g("num_key_value_heads", default=n_head)))
    w.add("modern-bert.attention.key_length", hd)
    w.add("modern-bert.attention.value_length", hd)
    w.add("modern-bert.attention.layer_norm_epsilon",
          float(g("norm_eps", "layer_norm_eps", default=1e-5)))
    w.add("modern-bert.rope.freq_base",
          float(g("global_rope_theta", "rope_theta", default=10000.0)))
    w.add("modern-bert.rope.dimension_count", hd)
    w.add("modern-bert.vocab_size", int(config["vocab_size"]))
    sw = int(g("local_attention", "sliding_window", default=0) or 0)
    if sw:
        w.add("modern-bert.attention.sliding_window", sw)
        w.add("modern-bert.attention.sliding_window_pattern",
              int(g("global_attn_every_n_layers", default=3)))
        if g("local_rope_theta") is not None:
            w.add("modern-bert.rope.freq_base_swa", float(config["local_rope_theta"]))
    if pooling:
        w.add("modern-bert.pooling_type", int(pooling))
    for k, v in (tokenizer_kv or {}).items():
        w.add(k, v)
    _emit(w, "token_embd.weight", npy(sd["embeddings.tok_embeddings.weight"]), gtype)
    _emit(w, "token_embd_norm.weight", npy(sd["embeddings.norm.weight"]), GGMLType.F32)
    _emit(w, "output_norm.weight", npy(sd["final_norm.weight"]), GGMLType.F32)
    for il in range(n_layer):
        p = f"layers.{il}."
        o = f"blk.{il}."
        if p + "attn_norm.weight" in sd:  # absent on layer 0
            _emit(w, o + "attn_norm.weight", npy(sd[p + "attn_norm.weight"]), GGMLType.F32)
        _emit(w, o + "attn_qkv.weight", npy(sd[p + "attn.Wqkv.weight"]), gtype)
        _emit(w, o + "attn_output.weight", npy(sd[p + "attn.Wo.weight"]), gtype)
        _emit(w, o + "ffn_norm.weight", npy(sd[p + "mlp_norm.weight"]), GGMLType.F32)
        _emit(w, o + "ffn_up.weight", npy(sd[p + "mlp.Wi.weight"]), gtype)
        _emit(w, o + "ffn_down.weight", npy(sd[p + "mlp.Wo.weight"]), gtype)
    w.write()
    return out_path


def convert_hf_neo_bert(state_dict, config, out_path, *, gtype=GGMLType.F32,
                        tokenizer_kv=None):
    """NeoBERT -> GGUF arch `neo-bert` (encoder; reference
    src/models/neo-bert.cpp + convert_hf_to_gguf.py NeoBert).  RMS
    pre-norm blocks with fused qkv and fused-SwiGLU ffn.w12, NO embedding
    norm, NORM-style rope, CLS pooling, final norm stored as
    enc.output_norm."""
    npy = _npy
    sd = {k[6:] if k.startswith("model.") else k: v for k, v in state_dict.items()}
    n_layer = int(config["num_hidden_layers"])
    n_embd = int(config["hidden_size"])
    n_head = int(config["num_attention_heads"])
    w12 = npy(sd["transformer_encoder.0.ffn.w12.weight"])
    w = GGUFWriter(out_path)
    w.add("general.architecture", "neo-bert")
    w.add("neo-bert.block_count", n_layer)
    w.add("neo-bert.context_length", int(config.get("max_position_embeddings", 4096)))
    w.add("neo-bert.embedding_length", n_embd)
    # NeoBERT's effective ffn width is 2/3 of HF intermediate_size
    # (convert_hf_to_gguf.py:5686); derived here from the fused w12 rows
    w.add("neo-bert.feed_forward_length", int(w12.shape[0] // 2))
    w.add("neo-bert.attention.head_count", n_head)
    w.add("neo-bert.attention.head_count_kv",
          int(config.get("num_key_value_heads", n_head)))
    w.add("neo-bert.attention.key_length", n_embd // n_head)
    w.add("neo-bert.attention.value_length", n_embd // n_head)
    w.add("neo-bert.attention.layer_norm_rms_epsilon",
          float(config.get("norm_eps", 1e-6)))
    w.add("neo-bert.rope.freq_base", float(config.get("rope_theta", 10000.0)))
    w.add("neo-bert.rope.dimension_count", n_embd // n_head)
    w.add("neo-bert.vocab_size", int(config["vocab_size"]))
    w.add("neo-bert.pooling_type", 2)  # CLS
    for k, v in (tokenizer_kv or {}).items():
        w.add(k, v)
    _emit(w, "token_embd.weight", npy(sd["encoder.weight"]), gtype)
    _emit(w, "enc.output_norm.weight", npy(sd["layer_norm.weight"]), GGMLType.F32)
    for il in range(n_layer):
        p = f"transformer_encoder.{il}."
        o = f"blk.{il}."
        _emit(w, o + "attn_norm.weight", npy(sd[p + "attention_norm.weight"]), GGMLType.F32)
        _emit(w, o + "attn_qkv.weight", npy(sd[p + "qkv.weight"]), gtype)
        _emit(w, o + "attn_output.weight", npy(sd[p + "wo.weight"]), gtype)
        _emit(w, o + "ffn_norm.weight", npy(sd[p + "ffn_norm.weight"]), GGMLType.F32)
        _emit(w, o + "ffn_up.weight", npy(sd[p + "ffn.w12.weight"]), gtype)
        _emit(w, o + "ffn_down.weight", npy(sd[p + "ffn.w3.weight"]), gtype)
    w.write()
    return out_path


def convert_hf_plamo3(state_dict, config, out_path, *, gtype=GGMLType.F32,
                      tokenizer_kv=None):
    """Plamo3ForCausalLM -> GGUF arch `plamo3`.  Gemma2-style sandwich
    norms with the reference converter's baked offsets (pre norms +1,
    post_mixer +1/5, post_mlp +1/5^1.5, q/k norms +1 —
    convert_hf_to_gguf.py Plamo3Model.modify_tensors), fused qkv_proj and
    gate_up_proj kept fused (graph: src/models/plamo3.cpp), periodic
    sliding-window with per-layer rope base on local layers."""
    npy = _npy
    n_layer = int(config["num_hidden_layers"])
    n_embd = int(config["hidden_size"])
    n_head = int(config["num_attention_heads"])
    n_kv = int(config.get("num_key_value_heads", n_head))
    hd = int(config.get("head_dim",
                        config.get("hidden_size_per_head", n_embd // n_head)))

    w = GGUFWriter(out_path)
    w.add("general.architecture", "plamo3")
    w.add("plamo3.block_count", n_layer)
    w.add("plamo3.context_length", int(config.get("max_position_embeddings", 4096)))
    w.add("plamo3.embedding_length", n_embd)
    w.add("plamo3.feed_forward_length", int(config["intermediate_size"]))
    w.add("plamo3.attention.head_count", n_head)
    w.add("plamo3.attention.head_count_kv", n_kv)
    w.add("plamo3.attention.key_length", hd)
    w.add("plamo3.attention.value_length", hd)
    w.add("plamo3.attention.layer_norm_rms_epsilon", float(config.get("rms_norm_eps", 1e-5)))
    w.add("plamo3.rope.freq_base", float(config.get("rope_theta", 10000.0)))
    w.add("plamo3.rope.dimension_count", hd)
    w.add("plamo3.vocab_size", int(config["vocab_size"]))
    sw = int(config.get("window_size", config.get("sliding_window", 0)) or 0)
    if sw:
        w.add("plamo3.attention.sliding_window", sw)
        w.add("plamo3.attention.sliding_window_pattern",
              int(config.get("sliding_window_pattern", 8)))
        for k in ("local_rope_theta", "rope_local_theta", "rope_theta_local",
                  "swa_rope_theta", "rope_local_base_freq"):
            if config.get(k):
                w.add("plamo3.rope.freq_base_swa", float(config[k]))
                break
    for k, v in (tokenizer_kv or {}).items():
        w.add(k, v)
    _emit(w, "token_embd.weight", npy(state_dict["model.embed_tokens.weight"]), gtype)
    _emit(w, "output_norm.weight", npy(state_dict["model.norm.weight"]) + 1.0, GGMLType.F32)
    out_w = state_dict.get("lm_head.weight", state_dict["model.embed_tokens.weight"])
    _emit(w, "output.weight", npy(out_w), gtype)
    for il in range(n_layer):
        p = f"model.layers.layers.{il}."
        o = f"blk.{il}."
        _emit(w, o + "attn_norm.weight", npy(state_dict[p + "pre_mixer_norm.weight"]) + 1.0, GGMLType.F32)
        _emit(w, o + "attn_qkv.weight", npy(state_dict[p + "mixer.qkv_proj.weight"]), gtype)
        _emit(w, o + "attn_q_norm.weight", npy(state_dict[p + "mixer.q_norm.weight"]) + 1.0, GGMLType.F32)
        _emit(w, o + "attn_k_norm.weight", npy(state_dict[p + "mixer.k_norm.weight"]) + 1.0, GGMLType.F32)
        _emit(w, o + "attn_output.weight", npy(state_dict[p + "mixer.o_proj.weight"]), gtype)
        _emit(w, o + "attn_post_norm.weight", npy(state_dict[p + "post_mixer_norm.weight"]) + 1.0 / 5, GGMLType.F32)
        _emit(w, o + "ffn_norm.weight", npy(state_dict[p + "pre_mlp_norm.weight"]) + 1.0, GGMLType.F32)
        _emit(w, o + "ffn_up.weight", npy(state_dict[p + "mlp.gate_up_proj.weight"]), gtype)
        _emit(w, o + "ffn_down.weight", npy(state_dict[p + "mlp.down_proj.weight"]), gtype)
        _emit(w, o + "ffn_post_norm.weight", npy(state_dict[p + "post_mlp_norm.weight"]) + 1.0 / 5**1.5, GGMLType.F32)
    w.write()
    return out_path


def convert_hf_plamo(state_dict, config, out_path, *, gtype=GGMLType.F32,
                     tokenizer_kv=None):
    """PlamoForCausalLM (plamo v1) -> GGUF arch `plamo`.  HF nests blocks
    under model.layers.layers.{i} with ONE shared pre-norm (`norm`); q and
    o are stored group-major over GQA heads and must be shuffled kv-major
    for the reference's broadcast convention (convert_hf_to_gguf.py
    PlamoModel.shuffle_attn_{q,output}_weight, generalized from the 13B
    hardcode; head h then reads kv head h // n_rep).  The 13B config's
    num_key_value_heads is wrong upstream — the reference pins 5
    (convert_hf_to_gguf.py:4901); mirrored for hidden_size 5120."""
    npy = _npy
    n_head = int(config["num_attention_heads"])
    n_embd = int(config["hidden_size"])
    n_kv = int(config.get("num_key_value_heads", n_head))
    if n_embd == 5120:
        n_kv = 5
    hd = n_embd // n_head
    grp = n_head // n_kv
    sd = {}
    for k, v in state_dict.items():
        nk = k.replace("model.layers.layers.", "model.layers.")
        v = npy(v)
        if nk.endswith(".norm.weight") and ".layers." in nk:
            nk = nk.replace(".norm.weight", ".input_layernorm.weight")
        elif nk.endswith("self_attn.q_proj.weight"):
            v = v.reshape(grp, n_kv, hd, n_embd).transpose(1, 0, 2, 3)
            v = np.ascontiguousarray(v.reshape(n_embd, n_embd))
        elif nk.endswith("self_attn.o_proj.weight"):
            v = v.reshape(n_embd, grp, n_kv, hd).transpose(0, 2, 1, 3)
            v = np.ascontiguousarray(v.reshape(n_embd, n_embd))
        sd[nk] = v
    cfg = dict(config)
    cfg["num_key_value_heads"] = n_kv
    cfg.setdefault("max_position_embeddings", 4096)
    return convert_hf_llama(sd, cfg, out_path, arch="plamo", gtype=gtype,
                            tokenizer_kv=tokenizer_kv)


def convert_hf_rwkv7(state_dict, config, out_path, *, arch="rwkv7",
                     gtype=GGMLType.F32, tokenizer_kv=None):
    """RWKV7 "Goose" (fla-hub / BlinkDL HF layout, names normalized like
    the reference's Rwkv7Model.modify_tensors) and arwkv7
    (RwkvHybridForCausalLM: rwkv7 time mix + RMS norms + SwiGLU FFN,
    token_shift_count 1).  Low-rank pairs (w1/w2, a1/a2, v1/v2, g1/g2)
    arrive in apply order (x @ m1 @ m2) and are stored transposed in the
    HF-Linear [out, in] convention like every other 2-D weight."""
    npy = _npy
    n_layer = int(config["num_hidden_layers"])
    n_embd = int(config["hidden_size"])
    head_size = int(config.get("head_size", config.get("head_dim", 64)))
    n_ff = int(config.get("intermediate_size") or n_embd * 4)
    if arch == "arwkv7":  # RMS-norm family
        eps = float(config.get("rms_norm_eps", 1e-6))
    else:
        eps = float(config.get("layer_norm_epsilon", 1e-5))

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 1 << 20)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", 0)
    if arch == "arwkv7":
        w.add(f"{arch}.attention.layer_norm_rms_epsilon", eps)
        w.add(f"{arch}.token_shift_count", 1)
    else:
        w.add(f"{arch}.attention.layer_norm_epsilon", eps)
    w.add(f"{arch}.wkv.head_size", head_size)
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    _emit(w, "token_embd.weight", npy(state_dict["model.embeddings.weight"]), gtype)
    if "model.pre_ln.weight" in state_dict:  # rwkv7 embedding norm
        _emit(w, "token_embd_norm.weight", npy(state_dict["model.pre_ln.weight"]), GGMLType.F32)
        _emit(w, "token_embd_norm.bias", npy(state_dict["model.pre_ln.bias"]), GGMLType.F32)
    for il in range(n_layer):
        p = f"model.layers.{il}."
        o = f"blk.{il}."
        a = p + "attention."
        if arch == "arwkv7":
            _emit(w, o + "attn_norm.weight", npy(state_dict[p + "input_layernorm.weight"]), GGMLType.F32)
        else:
            _emit(w, o + "attn_norm.weight", npy(state_dict[p + "ln1.weight"]), GGMLType.F32)
            _emit(w, o + "attn_norm.bias", npy(state_dict[p + "ln1.bias"]), GGMLType.F32)
            _emit(w, o + "attn_norm_2.weight", npy(state_dict[p + "ln2.weight"]), GGMLType.F32)
            _emit(w, o + "attn_norm_2.bias", npy(state_dict[p + "ln2.bias"]), GGMLType.F32)

        has_gate = a + "g1" in state_dict
        lerp = npy(state_dict[a + "x_x"]).reshape(6 if has_gate else 5, 1, 1, n_embd)
        _emit(w, o + "time_mix_lerp_fused.weight", lerp, GGMLType.F32)
        _emit(w, o + "time_mix_w0.weight", npy(state_dict[a + "w0"]).reshape(-1), GGMLType.F32)
        _emit(w, o + "time_mix_w1.weight", npy(state_dict[a + "w1"]).T, gtype)
        _emit(w, o + "time_mix_w2.weight", npy(state_dict[a + "w2"]).T, gtype)
        _emit(w, o + "time_mix_a0.weight", npy(state_dict[a + "a0"]).reshape(-1), GGMLType.F32)
        _emit(w, o + "time_mix_a1.weight", npy(state_dict[a + "a1"]).T, gtype)
        _emit(w, o + "time_mix_a2.weight", npy(state_dict[a + "a2"]).T, gtype)
        if il > 0:  # layer 0 sets v_first; its v0/v1/v2 are dummies
            _emit(w, o + "time_mix_v0.weight", npy(state_dict[a + "v0"]).reshape(-1), GGMLType.F32)
            _emit(w, o + "time_mix_v1.weight", npy(state_dict[a + "v1"]).T, gtype)
            _emit(w, o + "time_mix_v2.weight", npy(state_dict[a + "v2"]).T, gtype)
        if has_gate:
            _emit(w, o + "time_mix_g1.weight", npy(state_dict[a + "g1"]).T, gtype)
            _emit(w, o + "time_mix_g2.weight", npy(state_dict[a + "g2"]).T, gtype)
        _emit(w, o + "time_mix_k_k.weight", npy(state_dict[a + "k_k"]).reshape(-1), GGMLType.F32)
        _emit(w, o + "time_mix_k_a.weight", npy(state_dict[a + "k_a"]).reshape(-1), GGMLType.F32)
        _emit(w, o + "time_mix_r_k.weight", npy(state_dict[a + "r_k"]).reshape(-1), GGMLType.F32)
        _emit(w, o + "time_mix_receptance.weight", npy(state_dict[a + "receptance.weight"]), gtype)
        _emit(w, o + "time_mix_key.weight", npy(state_dict[a + "key.weight"]), gtype)
        _emit(w, o + "time_mix_value.weight", npy(state_dict[a + "value.weight"]), gtype)
        _emit(w, o + "time_mix_output.weight", npy(state_dict[a + "output.weight"]), gtype)
        if a + "ln_x.weight" in state_dict:
            _emit(w, o + "time_mix_ln.weight", npy(state_dict[a + "ln_x.weight"]), GGMLType.F32)
            _emit(w, o + "time_mix_ln.bias", npy(state_dict[a + "ln_x.bias"]), GGMLType.F32)

        ff = p + "feed_forward."
        if arch == "arwkv7":
            _emit(w, o + "ffn_norm.weight", npy(state_dict[p + "post_attention_layernorm.weight"]), GGMLType.F32)
            _emit(w, o + "ffn_gate.weight", npy(state_dict[ff + "gate_proj.weight"]), gtype)
            _emit(w, o + "ffn_up.weight", npy(state_dict[ff + "up_proj.weight"]), gtype)
            _emit(w, o + "ffn_down.weight", npy(state_dict[ff + "down_proj.weight"]), gtype)
        else:
            _emit(w, o + "channel_mix_lerp_k.weight", npy(state_dict[ff + "x_k"]).reshape(-1), GGMLType.F32)
            _emit(w, o + "channel_mix_key.weight", npy(state_dict[ff + "key.weight"]), gtype)
            _emit(w, o + "channel_mix_value.weight", npy(state_dict[ff + "value.weight"]), gtype)
    _emit(w, "output_norm.weight", npy(state_dict["model.norm.weight"]), GGMLType.F32)
    if "model.norm.bias" in state_dict:
        _emit(w, "output_norm.bias", npy(state_dict["model.norm.bias"]), GGMLType.F32)
    _emit(w, "output.weight", npy(state_dict["lm_head.weight"]), gtype)
    w.write()
    return out_path


def convert_hf_nemotron_h(state_dict, config, out_path, *, gtype=GGMLType.F32,
                          tokenizer_kv=None):
    """HF NemotronHForCausalLM -> GGUF (reference: convert_hf_to_gguf.py
    NemotronHModel): the hybrid_override_pattern string assigns each layer
    exactly ONE component — M = mamba2 mixer, * = NoPE attention,
    - = squared-relu MLP."""
    npy = _npy
    arch = "nemotron-h"
    n_layer = int(config["num_hidden_layers"])
    n_embd = int(config["hidden_size"])
    n_head = int(config["num_attention_heads"])
    n_kv = int(config.get("num_key_value_heads", n_head))
    head_dim = int(config.get("head_dim", config.get("attention_head_dim",
                                                     n_embd // n_head)))
    pattern = config["hybrid_override_pattern"]
    assert len(pattern) == n_layer
    mamba_heads = int(config.get("mamba_num_heads", config.get("num_heads", 1)))
    mamba_hd = int(config.get("mamba_head_dim", 64))
    d_inner = mamba_heads * mamba_hd
    kv_vec = [n_kv if ch == "*" else 0 for ch in pattern]

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", int(config.get("max_position_embeddings", 4096)))
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", int(config["intermediate_size"]))
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", kv_vec)
    w.add(f"{arch}.attention.key_length", head_dim)
    w.add(f"{arch}.attention.value_length", head_dim)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", float(config.get("rms_norm_eps", 1e-5)))
    w.add(f"{arch}.ssm.conv_kernel", int(config.get("conv_kernel", 4)))
    w.add(f"{arch}.ssm.inner_size", d_inner)
    w.add(f"{arch}.ssm.state_size", int(config.get("ssm_state_size", 128)))
    w.add(f"{arch}.ssm.time_step_rank", mamba_heads)
    w.add(f"{arch}.ssm.group_count", int(config.get("n_groups", 1)))
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    _emit(w, "token_embd.weight", npy(state_dict["backbone.embeddings.weight"]), gtype)
    for il in range(n_layer):
        p = f"backbone.layers.{il}."
        o = f"blk.{il}."
        kind = pattern[il]
        # the shared pre-norm keys to the component the layer carries
        # (zllm ffn-only blocks norm through ffn_norm)
        _emit(w, o + ("ffn_norm.weight" if kind == "-" else "attn_norm.weight"),
              npy(state_dict[p + "norm.weight"]), GGMLType.F32)
        if kind == "M":
            m = p + "mixer."
            _emit(w, o + "ssm_in.weight", npy(state_dict[m + "in_proj.weight"]), gtype)
            conv = npy(state_dict[m + "conv1d.weight"])
            _emit(w, o + "ssm_conv1d.weight", conv.reshape(conv.shape[0], conv.shape[-1]), GGMLType.F32)
            if m + "conv1d.bias" in state_dict:
                _emit(w, o + "ssm_conv1d.bias", npy(state_dict[m + "conv1d.bias"]), GGMLType.F32)
            _emit(w, o + "ssm_dt.bias", npy(state_dict[m + "dt_bias"]), GGMLType.F32)
            _emit(w, o + "ssm_a", -np.exp(npy(state_dict[m + "A_log"])), GGMLType.F32)
            _emit(w, o + "ssm_d", npy(state_dict[m + "D"]), GGMLType.F32)
            _emit(w, o + "ssm_norm.weight", npy(state_dict[m + "norm.weight"]), GGMLType.F32)
            _emit(w, o + "ssm_out.weight", npy(state_dict[m + "out_proj.weight"]), gtype)
        elif kind == "*":
            m = p + "mixer."
            for hf, gg in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                           ("v_proj", "attn_v"), ("o_proj", "attn_output")):
                _emit(w, o + f"{gg}.weight", npy(state_dict[m + f"{hf}.weight"]), gtype)
        else:  # '-' MLP layer (squared relu, non-gated)
            m = p + "mixer."
            _emit(w, o + "ffn_up.weight", npy(state_dict[m + "up_proj.weight"]), gtype)
            _emit(w, o + "ffn_down.weight", npy(state_dict[m + "down_proj.weight"]), gtype)
            if m + "up_proj.bias" in state_dict:
                _emit(w, o + "ffn_up.bias", npy(state_dict[m + "up_proj.bias"]), GGMLType.F32)
                _emit(w, o + "ffn_down.bias", npy(state_dict[m + "down_proj.bias"]), GGMLType.F32)
    _emit(w, "output_norm.weight", npy(state_dict["backbone.norm_f.weight"]), GGMLType.F32)
    if "lm_head.weight" in state_dict:
        _emit(w, "output.weight", npy(state_dict["lm_head.weight"]), gtype)
    else:
        _emit(w, "output.weight", npy(state_dict["backbone.embeddings.weight"]), gtype)
    w.write()
    return out_path


def convert_hf_qwen(state_dict, config, out_path, *, gtype=GGMLType.F32,
                    tokenizer_kv=None):
    """Qwen v1 (QWenLMHeadModel): fused c_attn split into q/k/v here, RMS
    norms, neox rope, silu FFN with gate=w2 / up=w1 and the halved
    intermediate size (reference convert_hf_to_gguf.py QwenModel;
    src/models/qwen.cpp)."""
    npy = _npy
    arch = "qwen"
    n_layer = int(config["num_hidden_layers"])
    n_embd = int(config["hidden_size"])
    n_head = int(config["num_attention_heads"])
    n_ff = int(config["intermediate_size"]) // 2

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", int(config.get("max_position_embeddings", 8192)))
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", float(config.get("layer_norm_epsilon", 1e-6)))
    w.add(f"{arch}.rope.freq_base", float(config.get("rotary_emb_base", 10000.0)))
    w.add(f"{arch}.rope.dimension_count", n_embd // n_head)
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    _emit(w, "token_embd.weight", npy(state_dict["transformer.wte.weight"]), gtype)
    for il in range(n_layer):
        p = f"transformer.h.{il}."
        o = f"blk.{il}."
        _emit(w, o + "attn_norm.weight", npy(state_dict[p + "ln_1.weight"]), GGMLType.F32)
        _emit(w, o + "ffn_norm.weight", npy(state_dict[p + "ln_2.weight"]), GGMLType.F32)
        ca = npy(state_dict[p + "attn.c_attn.weight"])  # [3E, E]
        cb = npy(state_dict[p + "attn.c_attn.bias"])
        _emit(w, o + "attn_q.weight", ca[:n_embd], gtype)
        _emit(w, o + "attn_k.weight", ca[n_embd : 2 * n_embd], gtype)
        _emit(w, o + "attn_v.weight", ca[2 * n_embd :], gtype)
        _emit(w, o + "attn_q.bias", cb[:n_embd], GGMLType.F32)
        _emit(w, o + "attn_k.bias", cb[n_embd : 2 * n_embd], GGMLType.F32)
        _emit(w, o + "attn_v.bias", cb[2 * n_embd :], GGMLType.F32)
        _emit(w, o + "attn_output.weight", npy(state_dict[p + "attn.c_proj.weight"]), gtype)
        _emit(w, o + "ffn_gate.weight", npy(state_dict[p + "mlp.w2.weight"]), gtype)
        _emit(w, o + "ffn_up.weight", npy(state_dict[p + "mlp.w1.weight"]), gtype)
        _emit(w, o + "ffn_down.weight", npy(state_dict[p + "mlp.c_proj.weight"]), gtype)
    _emit(w, "output_norm.weight", npy(state_dict["transformer.ln_f.weight"]), GGMLType.F32)
    _emit(w, "output.weight", npy(state_dict["lm_head.weight"]), gtype)
    w.write()
    return out_path


def convert_hf_codeshell(state_dict, config, out_path, *, gtype=GGMLType.F32,
                         tokenizer_kv=None):
    """CodeShell: gpt2-family LayerNorm(+bias) blocks with grouped-query
    fused c_attn (split here), non-gated GELU FFN with biases, neox rope
    (reference convert_hf_to_gguf.py CodeShellModel;
    src/models/codeshell.cpp)."""
    npy = _npy
    arch = "codeshell"
    n_layer = int(config["n_layer"])
    n_embd = int(config["n_embd"])
    n_head = int(config["n_head"])
    n_kv = int(config.get("num_query_groups", 1))
    head_dim = n_embd // n_head
    kvd = n_kv * head_dim

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", int(config.get("n_positions", 8192)))
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", 4 * n_embd)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_kv)
    w.add(f"{arch}.attention.layer_norm_epsilon", float(config.get("layer_norm_epsilon", 1e-5)))
    w.add(f"{arch}.rope.freq_base", 10000.0)
    w.add(f"{arch}.rope.dimension_count", head_dim)
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    _emit(w, "token_embd.weight", npy(state_dict["transformer.wte.weight"]), gtype)
    for il in range(n_layer):
        p = f"transformer.h.{il}."
        o = f"blk.{il}."
        for hf, gg in (("ln_1", "attn_norm"), ("ln_2", "ffn_norm")):
            _emit(w, o + f"{gg}.weight", npy(state_dict[p + hf + ".weight"]), GGMLType.F32)
            _emit(w, o + f"{gg}.bias", npy(state_dict[p + hf + ".bias"]), GGMLType.F32)
        ca = npy(state_dict[p + "attn.c_attn.weight"])  # [E + 2*kvd, E]
        cb = npy(state_dict[p + "attn.c_attn.bias"])
        _emit(w, o + "attn_q.weight", ca[:n_embd], gtype)
        _emit(w, o + "attn_k.weight", ca[n_embd : n_embd + kvd], gtype)
        _emit(w, o + "attn_v.weight", ca[n_embd + kvd :], gtype)
        _emit(w, o + "attn_q.bias", cb[:n_embd], GGMLType.F32)
        _emit(w, o + "attn_k.bias", cb[n_embd : n_embd + kvd], GGMLType.F32)
        _emit(w, o + "attn_v.bias", cb[n_embd + kvd :], GGMLType.F32)
        _emit(w, o + "attn_output.weight", npy(state_dict[p + "attn.c_proj.weight"]), gtype)
        _emit(w, o + "attn_output.bias", npy(state_dict[p + "attn.c_proj.bias"]), GGMLType.F32)
        _emit(w, o + "ffn_up.weight", npy(state_dict[p + "mlp.c_fc.weight"]), gtype)
        _emit(w, o + "ffn_up.bias", npy(state_dict[p + "mlp.c_fc.bias"]), GGMLType.F32)
        _emit(w, o + "ffn_down.weight", npy(state_dict[p + "mlp.c_proj.weight"]), gtype)
        _emit(w, o + "ffn_down.bias", npy(state_dict[p + "mlp.c_proj.bias"]), GGMLType.F32)
    _emit(w, "output_norm.weight", npy(state_dict["transformer.ln_f.weight"]), GGMLType.F32)
    _emit(w, "output_norm.bias", npy(state_dict["transformer.ln_f.bias"]), GGMLType.F32)
    _emit(w, "output.weight", npy(state_dict["lm_head.weight"]), gtype)
    w.write()
    return out_path


def convert_hf_cogvlm(state_dict, config, out_path, *, gtype=GGMLType.F32,
                      tokenizer_kv=None):
    """CogVLM text stack: per-layer dual weight sets — the language expert
    serves token batches, the vision expert serves image-embedding batches
    (reference src/models/cogvlm.cpp:15-37).  Fused query_key_value stays
    fused (the loader splits by rows)."""
    npy = _npy
    arch = "cogvlm"
    n_layer = int(config["num_hidden_layers"])
    n_embd = int(config["hidden_size"])
    n_head = int(config["num_attention_heads"])

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", int(config.get("max_position_embeddings", 2048)))
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", int(config["intermediate_size"]))
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", float(config.get("rms_norm_eps", 1e-5)))
    w.add(f"{arch}.rope.freq_base", float(config.get("rope_theta", 10000.0)))
    w.add(f"{arch}.rope.dimension_count", n_embd // n_head)
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    _emit(w, "token_embd.weight", npy(state_dict["model.embed_tokens.weight"]), gtype)
    for il in range(n_layer):
        p = f"model.layers.{il}."
        o = f"blk.{il}."
        _emit(w, o + "attn_norm.weight", npy(state_dict[p + "input_layernorm.weight"]), GGMLType.F32)
        _emit(w, o + "ffn_norm.weight", npy(state_dict[p + "post_attention_layernorm.weight"]), GGMLType.F32)
        a = p + "self_attn."
        _emit(w, o + "attn_qkv.weight", npy(state_dict[a + "language_expert_query_key_value.weight"]), gtype)
        _emit(w, o + "attn_output.weight", npy(state_dict[a + "language_expert_dense.weight"]), gtype)
        _emit(w, o + "vis_attn_qkv.weight", npy(state_dict[a + "vision_expert_query_key_value.weight"]), gtype)
        _emit(w, o + "vis_attn_output.weight", npy(state_dict[a + "vision_expert_dense.weight"]), gtype)
        for hf, gg in (("gate_proj", "ffn_gate"), ("up_proj", "ffn_up"), ("down_proj", "ffn_down")):
            _emit(w, o + f"{gg}.weight", npy(state_dict[f"{p}mlp.language_mlp.{hf}.weight"]), gtype)
            _emit(w, o + f"vis_{gg.replace('ffn_', '')}.weight",
                  npy(state_dict[f"{p}mlp.vision_mlp.{hf}.weight"]), gtype)
    _emit(w, "output_norm.weight", npy(state_dict["model.norm.weight"]), GGMLType.F32)
    _emit(w, "output.weight", npy(state_dict["lm_head.weight"]), gtype)
    w.write()
    return out_path


def convert_hf_starcoder(state_dict, config, out_path, *, gtype=GGMLType.F32,
                         tokenizer_kv=None):
    """StarCoder v1 (GPTBigCodeForCausalLM): gpt2-family learned
    positions + LayerNorm(+bias) blocks, multi-query fused c_attn, gelu
    FFN with biases, no rope (reference src/models/starcoder.cpp)."""
    npy = _npy
    arch = "starcoder"
    n_layer = int(config["n_layer"])
    n_embd = int(config["n_embd"])
    n_head = int(config["n_head"])
    n_kv = 1 if config.get("multi_query", True) else n_head
    head_dim = n_embd // n_head
    kvd = n_kv * head_dim

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", int(config.get("n_positions", 8192)))
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", int(config.get("n_inner") or 4 * n_embd))
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_kv)
    w.add(f"{arch}.attention.layer_norm_epsilon", float(config.get("layer_norm_epsilon", 1e-5)))
    w.add(f"{arch}.vocab_size", int(config["vocab_size"]))
    for key, val in (tokenizer_kv or {}).items():
        w.add(key, val)

    _emit(w, "token_embd.weight", npy(state_dict["transformer.wte.weight"]), gtype)
    _emit(w, "position_embd.weight", npy(state_dict["transformer.wpe.weight"]), GGMLType.F32)
    for il in range(n_layer):
        p = f"transformer.h.{il}."
        o = f"blk.{il}."
        for hf, gg in (("ln_1", "attn_norm"), ("ln_2", "ffn_norm")):
            _emit(w, o + f"{gg}.weight", npy(state_dict[p + hf + ".weight"]), GGMLType.F32)
            _emit(w, o + f"{gg}.bias", npy(state_dict[p + hf + ".bias"]), GGMLType.F32)
        ca = npy(state_dict[p + "attn.c_attn.weight"])
        cb = npy(state_dict[p + "attn.c_attn.bias"])
        _emit(w, o + "attn_q.weight", ca[:n_embd], gtype)
        _emit(w, o + "attn_k.weight", ca[n_embd : n_embd + kvd], gtype)
        _emit(w, o + "attn_v.weight", ca[n_embd + kvd :], gtype)
        _emit(w, o + "attn_q.bias", cb[:n_embd], GGMLType.F32)
        _emit(w, o + "attn_k.bias", cb[n_embd : n_embd + kvd], GGMLType.F32)
        _emit(w, o + "attn_v.bias", cb[n_embd + kvd :], GGMLType.F32)
        _emit(w, o + "attn_output.weight", npy(state_dict[p + "attn.c_proj.weight"]), gtype)
        _emit(w, o + "attn_output.bias", npy(state_dict[p + "attn.c_proj.bias"]), GGMLType.F32)
        _emit(w, o + "ffn_up.weight", npy(state_dict[p + "mlp.c_fc.weight"]), gtype)
        _emit(w, o + "ffn_up.bias", npy(state_dict[p + "mlp.c_fc.bias"]), GGMLType.F32)
        _emit(w, o + "ffn_down.weight", npy(state_dict[p + "mlp.c_proj.weight"]), gtype)
        _emit(w, o + "ffn_down.bias", npy(state_dict[p + "mlp.c_proj.bias"]), GGMLType.F32)
    _emit(w, "output_norm.weight", npy(state_dict["transformer.ln_f.weight"]), GGMLType.F32)
    _emit(w, "output_norm.bias", npy(state_dict["transformer.ln_f.bias"]), GGMLType.F32)
    if "lm_head.weight" in state_dict:
        _emit(w, "output.weight", npy(state_dict["lm_head.weight"]), gtype)
    else:
        _emit(w, "output.weight", npy(state_dict["transformer.wte.weight"]), gtype)
    w.write()
    return out_path
