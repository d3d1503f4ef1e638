"""GGUF -> params pytree loader.

The analogue of the reference's model loader + repack path
(src/llama-model-loader.cpp load_all_data; ggml-cpu/repack.cpp set_tensor):
2-D matmul weights in a repackable quant format become QTensor planes
(quantized in HBM, dequantized inside the matmul kernels); everything else
(norm weights, biases, embeddings, experts for now) is dequantized to a
dense dtype at load.
"""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFFile, read_gguf
from ..quant import blocks as qb
from ..quant.repack import REPACK_FORMATS, QTensor, QTensorE, concat_n, repack, repack_experts
from ..tokenizer import Tokenizer
from .config import ModelConfig

log = logging.getLogger(__name__)

# GGUF tensor suffix -> params key, per layer
_LAYER_MAP = {
    "attn_norm.weight": "attn_norm",
    "attn_q.weight": "wq",
    "attn_k.weight": "wk",
    "attn_v.weight": "wv",
    "attn_output.weight": "wo",
    "attn_q.bias": "bq",
    "attn_k.bias": "bk",
    "attn_v.bias": "bv",
    "attn_output.bias": "bo",
    "attn_q_norm.weight": "attn_q_norm",
    "attn_q_norm.bias": "attn_q_norm_b",
    "attn_k_norm.bias": "attn_k_norm_b",
    "attn_k_norm.weight": "attn_k_norm",
    "attn_post_norm.weight": "attn_post_norm",
    "post_attention_norm.weight": "attn_post_norm",
    # bitnet: inner RMS norms before wo / ffn_down and per-projection TQ
    # scales (reference src/models/bitnet.cpp; tensors blk.N.*.scale)
    "attn_sub_norm.weight": "attn_sub_norm",
    "ffn_sub_norm.weight": "ffn_sub_norm",
    "attn_q.scale": "wq_scale",
    "attn_k.scale": "wk_scale",
    "attn_v.scale": "wv_scale",
    "attn_output.scale": "wo_scale",
    "ffn_gate.scale": "ffn_gate_scale",
    "ffn_up.scale": "ffn_up_scale",
    "ffn_down.scale": "ffn_down_scale",
    "ffn_norm.weight": "ffn_norm",
    "ffn_norm.bias": "ffn_norm_b",
    "ffn_gate.weight": "ffn_gate",
    "ffn_up.weight": "ffn_up",
    "ffn_down.weight": "ffn_down",
    "ffn_post_norm.weight": "ffn_post_norm",
    "post_ffw_norm.weight": "ffn_post_norm",
    "ffn_gate_inp.weight": "ffn_gate_inp",
    "ffn_gate_exps.weight": "ffn_gate_exps",
    "ffn_up_exps.weight": "ffn_up_exps",
    "ffn_down_exps.weight": "ffn_down_exps",
    "ffn_gate_chexps.weight": "ffn_gate_chexps",
    "ffn_up_chexps.weight": "ffn_up_chexps",
    "ffn_down_chexps.weight": "ffn_down_chexps",
    "ffn_gate_inp.bias": "ffn_gate_inp_b",
    "ffn_gate_exps.bias": "ffn_gate_exps_b",
    "ffn_up_exps.bias": "ffn_up_exps_b",
    "ffn_down_exps.bias": "ffn_down_exps_b",
    "ffn_gate_inp_shexp.weight": "ffn_gate_inp_shexp",
    "ffn_gate_shexp.weight": "ffn_gate_shexp",
    "ffn_up_shexp.weight": "ffn_up_shexp",
    "ffn_down_shexp.weight": "ffn_down_shexp",
    "attn_sinks.weight": "attn_sinks",
    # gemma3n AltUp / LAuReL / per-layer-input blocks (reference:
    # src/llama-arch.cpp LLM_ARCH_GEMMA3N table)
    "altup_correct_coef.weight": "altup_correct_coef",
    "altup_correct_scale.weight": "altup_correct_scale",
    "altup_predict_coef.weight": "altup_predict_coef",
    "altup_router.weight": "altup_router",
    "altup_router_norm.weight": "altup_router_norm",
    "laurel_l.weight": "laurel_l",
    "laurel_r.weight": "laurel_r",
    "laurel_post_norm.weight": "laurel_post_norm",
    "inp_gate.weight": "pli_gate",
    "proj.weight": "pli_proj",
    "post_norm.weight": "pli_post_norm",
    # mamba SSM mixer (reference: src/llama-arch.cpp LLM_ARCH_MAMBA table)
    "ssm_in.weight": "ssm_in",
    "attn_gate.weight": "ssm_z",
    "ssm_ba.weight": "ssm_ba",
    "ssm_conv1d.weight": "ssm_conv1d",
    "ssm_conv1d.bias": "ssm_conv1d_b",
    "ssm_x.weight": "ssm_x",
    "ssm_dt.weight": "ssm_dt",
    "ssm_dt.bias": "ssm_dt_b",
    "ssm_a": "ssm_a",
    "ssm_d": "ssm_d",
    "ssm_out.weight": "ssm_out",
    "ssm_dt_norm.weight": "ssm_dt_norm",
    "ssm_norm.weight": "ssm_norm",
    # lfm2 short-conv mixer (reference: src/llama-arch.cpp LLM_TENSOR_SHORTCONV_*)
    "shortconv.conv.weight": "shortconv_conv",
    "shortconv.in_proj.weight": "shortconv_in",
    "shortconv.out_proj.weight": "shortconv_out",
    "ssm_b_norm.weight": "ssm_b_norm",
    "ssm_c_norm.weight": "ssm_c_norm",
    # deepseek2 MLA projections (reference: src/llama-arch.cpp:374-400,
    # src/models/deepseek2.cpp); wk_b/wv_b are per-head 3-D (dense-loaded)
    "attn_q_a.weight": "wq_a",
    "attn_q_b.weight": "wq_b",
    "attn_q_a_norm.weight": "attn_q_a_norm",
    "attn_kv_a_mqa.weight": "wkv_a_mqa",
    "attn_kv_a_norm.weight": "attn_kv_a_norm",
    "attn_k_b.weight": "wk_b",
    "attn_v_b.weight": "wv_b",
    "attn_kv_b.weight": "wkv_b",
    "exp_probs_b.bias": "ffn_exp_probs_b",
    # rwkv6 time-mix / channel-mix (reference: src/llama-arch.cpp:436-459,
    # src/models/rwkv6-base.cpp)
    "attn_norm.bias": "attn_norm_b",
    "attn_norm_2.weight": "attn_norm_2",
    "attn_norm_2.bias": "attn_norm_2_b",
    "time_mix_w1.weight": "time_mix_w1",
    "time_mix_w2.weight": "time_mix_w2",
    "time_mix_lerp_x.weight": "time_mix_lerp_x",
    "time_mix_lerp_w.weight": "time_mix_lerp_w",
    "time_mix_lerp_k.weight": "time_mix_lerp_k",
    "time_mix_lerp_v.weight": "time_mix_lerp_v",
    "time_mix_lerp_r.weight": "time_mix_lerp_r",
    "time_mix_lerp_g.weight": "time_mix_lerp_g",
    "time_mix_lerp_fused.weight": "time_mix_lerp_fused",
    "time_mix_first.weight": "time_mix_first",
    "time_mix_decay.weight": "time_mix_decay",
    "time_mix_decay_w1.weight": "time_mix_decay_w1",
    "time_mix_decay_w2.weight": "time_mix_decay_w2",
    "time_mix_key.weight": "time_mix_key",
    "time_mix_value.weight": "time_mix_value",
    "time_mix_receptance.weight": "time_mix_receptance",
    "time_mix_gate.weight": "time_mix_gate",
    "time_mix_ln.weight": "time_mix_ln",
    "time_mix_ln.bias": "time_mix_ln_b",
    "time_mix_output.weight": "time_mix_output",
    # rwkv7 (generalized delta rule; reference src/models/rwkv7-base.cpp)
    "time_mix_w0.weight": "time_mix_w0",
    "time_mix_a0.weight": "time_mix_a0",
    "time_mix_a1.weight": "time_mix_a1",
    "time_mix_a2.weight": "time_mix_a2",
    "time_mix_v0.weight": "time_mix_v0",
    "time_mix_v1.weight": "time_mix_v1",
    "time_mix_v2.weight": "time_mix_v2",
    "time_mix_g1.weight": "time_mix_g1",
    "time_mix_g2.weight": "time_mix_g2",
    "time_mix_k_k.weight": "time_mix_k_k",
    "time_mix_k_a.weight": "time_mix_k_a",
    "time_mix_r_k.weight": "time_mix_r_k",
    "channel_mix_lerp_k.weight": "channel_mix_lerp_k",
    "channel_mix_lerp_r.weight": "channel_mix_lerp_r",
    "channel_mix_key.weight": "channel_mix_key",
    "channel_mix_value.weight": "channel_mix_value",
    "channel_mix_receptance.weight": "channel_mix_receptance",
    # bert-family encoder blocks (reference: src/models/bert.cpp)
    "attn_output_norm.weight": "attn_out_norm",
    "attn_output_norm.bias": "attn_out_norm_b",
    "layer_output_norm.weight": "layer_out_norm",
    "layer_output_norm.bias": "layer_out_norm_b",
    "ffn_up.bias": "ffn_up_b",
    "ffn_down.bias": "ffn_down_b",
    "ffn_gate.bias": "ffn_gate_b",  # jais swiglu biases
    "ffn_norm_exps.weight": "ffn_norm_exps",  # arctic residual-MoE norm
    # cogvlm vision-expert weights (reference LLM_TENSOR_VISEXP_*,
    # src/llama-arch.cpp:495-499; selected for embedding batches)
    "vis_attn_output.weight": "visexp_wo",
    "vis_gate.weight": "visexp_ffn_gate",
    "vis_up.weight": "visexp_ffn_up",
    "vis_down.weight": "visexp_ffn_down",
}

# params keys holding 2-D matmul weights (eligible for quantized execution)
_MATMUL_KEYS = {"wq", "wk", "wv", "wo", "ffn_gate", "ffn_up", "ffn_down",
                "ffn_gate_inp", "output", "visexp_wo", "visexp_ffn_gate",
                "visexp_ffn_up", "visexp_ffn_down"}

# 1-D / small tensors stay f32; large dense tensors go bf16 by default
_VECTOR_KEYS = {
    "attn_norm", "ffn_norm", "ffn_norm_b", "attn_q_norm", "attn_k_norm",
    "attn_q_norm_b", "attn_k_norm_b", "attn_post_norm",
    "ffn_post_norm", "out_norm", "bq", "bk", "bv", "bo", "attn_sinks",
    "attn_sub_norm", "ffn_sub_norm", "wq_scale", "wk_scale", "wv_scale",
    "wo_scale", "ffn_gate_scale", "ffn_up_scale", "ffn_down_scale",
    "attn_out_norm", "attn_out_norm_b", "layer_out_norm", "layer_out_norm_b",
    "ffn_up_b", "ffn_down_b", "ffn_gate_b", "ffn_norm_exps",
    "attn_q_a_norm", "attn_kv_a_norm", "ffn_exp_probs_b",
    "ssm_conv1d", "ssm_conv1d_b", "ssm_a", "ssm_d", "ssm_dt_b", "shortconv_conv",
    "ssm_dt_norm", "ssm_b_norm", "ssm_c_norm", "ssm_norm",
    "attn_norm_b", "attn_norm_2", "attn_norm_2_b", "time_mix_first",
    "time_mix_decay", "time_mix_ln", "time_mix_ln_b",
    "time_mix_w0", "time_mix_a0", "time_mix_v0",
    "time_mix_k_k", "time_mix_k_a", "time_mix_r_k",
    "ffn_gate_inp_b", "ffn_gate_exps_b", "ffn_up_exps_b", "ffn_down_exps_b",
    "altup_correct_scale", "altup_router_norm", "laurel_post_norm", "pli_post_norm",
}

# rwkv lerp coefficients: GGUF stores them {C, 1, 1}; flatten to [C]
# (time_mix_lerp_fused keeps its leading 5-way axis: {C,1,1,5} -> [5, C])
_FLATTEN_KEYS = {
    "time_mix_lerp_x", "time_mix_lerp_w", "time_mix_lerp_k", "time_mix_lerp_v",
    "time_mix_lerp_r", "time_mix_lerp_g", "channel_mix_lerp_k", "channel_mix_lerp_r",
}

# per-head 3-D MLA projections: dense arrays, einsum-consumed
_DENSE3D_KEYS = {"wk_b", "wv_b"}

# t5 encoder/decoder block tensors (reference: LLM_TENSOR_ENC_*/DEC_*,
# src/llama-arch.cpp:409-435)
_T5_MAP = {
    "attn_norm.weight": "attn_norm",
    "attn_q.weight": "wq",
    "attn_k.weight": "wk",
    "attn_v.weight": "wv",
    "attn_o.weight": "wo",
    "attn_rel_b.weight": "rel_b",
    "cross_attn_norm.weight": "cross_attn_norm",
    "cross_attn_q.weight": "cross_wq",
    "cross_attn_k.weight": "cross_wk",
    "cross_attn_v.weight": "cross_wv",
    "cross_attn_o.weight": "cross_wo",
    "ffn_norm.weight": "ffn_norm",
    "ffn_gate.weight": "ffn_gate",
    "ffn_up.weight": "ffn_up",
    "ffn_down.weight": "ffn_down",
}
_T5_VEC = {"attn_norm", "cross_attn_norm", "ffn_norm", "rel_b"}


def _load_dense(f: GGUFFile, name: str, dtype):
    meta = f.tensors[name]
    x = f.tensor_f32(name)
    return jnp.asarray(x, dtype=dtype)


def _load_matmul(f: GGUFFile, name: str, quantized: bool, dtype):
    """2-D weight: GGUF [N, K] row-major -> QTensor or dense [K, N]."""
    meta = f.tensors[name]
    if quantized and meta.gtype in REPACK_FORMATS and len(meta.shape) == 2:
        return repack(f.tensor_bytes(name), meta.shape, meta.gtype)
    x = f.tensor_f32(name)
    return jnp.asarray(np.ascontiguousarray(x.T), dtype=dtype)


def _load_matmul_rows(f: GGUFFile, name: str, row_ranges, quantized: bool, dtype):
    """Split a fused tensor by output rows (phi3 attn_qkv / gate_up):
    quantized rows are independent blocks, so slicing raw rows is exact."""
    meta = f.tensors[name]
    raw = f.tensor_bytes(name)
    out = []
    for lo, hi in row_ranges:
        sub = np.ascontiguousarray(raw[lo:hi])
        if quantized and meta.gtype in REPACK_FORMATS:
            out.append(repack(sub, (hi - lo, meta.shape[-1]), meta.gtype))
        else:
            x = qb.dequantize(sub, meta.gtype).reshape(hi - lo, meta.shape[-1])
            out.append(jnp.asarray(np.ascontiguousarray(x.T), dtype=dtype))
    return out


def load_params(f: GGUFFile, cfg: ModelConfig, *, quantized: bool = True, dtype=jnp.bfloat16):
    params: dict = {"layers": [dict() for _ in range(cfg.n_layers)]}
    handled = set()

    for name, meta in f.tensors.items():
        if name == "token_embd.weight":
            params["tok_emb"] = _load_dense(f, name, dtype)
        elif name == "output_norm.weight":
            params["out_norm"] = _load_dense(f, name, jnp.float32)
        elif name == "output_norm.bias":
            params["out_norm_b"] = _load_dense(f, name, jnp.float32)
        elif name == "output.weight":
            params["output"] = _load_matmul(f, name, quantized, dtype)
        elif name == "output.bias":  # phi2 lm_head bias
            params["output_b"] = _load_dense(f, name, jnp.float32)
        elif name == "rope_freqs.weight":
            params["rope_freqs"] = _load_dense(f, name, jnp.float32)
        # gemma3n model-level AltUp / per-layer-input tensors
        elif name == "per_layer_token_embd.weight":
            params["plt_emb"] = _load_dense(f, name, dtype)
        elif name == "per_layer_model_proj.weight":
            params["pl_model_proj"] = _load_matmul(f, name, quantized, dtype)
        elif name == "per_layer_proj_norm.weight":
            params["pl_proj_norm"] = _load_dense(f, name, jnp.float32)
        elif name == "altup_proj.weight":
            params["altup_proj"] = jnp.asarray(f.tensor_f32(name), dtype=dtype)
        elif name == "altup_unembd_proj.weight":
            params["altup_unembd_proj"] = jnp.asarray(f.tensor_f32(name), dtype=dtype)
        # bert-family encoder extras (reference LLM_TENSOR_* names,
        # src/llama-arch.cpp:349-356)
        elif name == "token_types.weight":
            params["type_emb"] = _load_dense(f, name, dtype)
        elif name == "position_embd.weight":
            params["pos_emb"] = _load_dense(f, name, dtype)
        elif name == "token_embd_norm.weight":
            params["tok_norm"] = _load_dense(f, name, jnp.float32)
        elif name == "token_embd_norm.bias":
            params["tok_norm_b"] = _load_dense(f, name, jnp.float32)
        elif name == "cls.weight":
            params["cls_w"] = _load_matmul(f, name, quantized, dtype)
        elif name == "cls.bias":
            params["cls_b"] = _load_dense(f, name, jnp.float32)
        elif name == "cls.output.weight":
            params["cls_out_w"] = _load_matmul(f, name, quantized, dtype)
        elif name == "cls.output.bias":
            params["cls_out_b"] = _load_dense(f, name, jnp.float32)
        elif name.startswith(("enc.", "dec.")):
            # t5 encoder/decoder stacks
            stack, rest = name.split(".", 1)
            lkey = f"{stack}_layers"
            if rest == "output_norm.weight":
                params[f"{stack}_out_norm"] = _load_dense(f, name, jnp.float32)
                handled.add(name)
                continue
            _, il_s, suffix = rest.split(".", 2)
            il = int(il_s)
            key = _T5_MAP.get(suffix)
            if key is None:
                log.warning("unmapped tensor %s", name)
                continue
            layers = params.setdefault(lkey, [])
            while len(layers) <= il:
                layers.append({})
            if key in _T5_VEC:
                layers[il][key] = _load_dense(f, name, jnp.float32)
            else:
                layers[il][key] = _load_matmul(f, name, quantized, dtype)
        elif name.startswith("blk."):
            _, il_s, suffix = name.split(".", 2)
            il = int(il_s)
            key = _LAYER_MAP.get(suffix)
            if suffix == "attn_qkv.weight" and cfg.arch == "qwen3next":
                # deltanet q|k|v projection (conversion-reordered); head
                # layout differs from the attention layers — keep whole
                params["layers"][il]["ssm_qkv"] = _load_matmul(f, name, quantized, dtype)
                continue
            if suffix == "vis_attn_qkv.weight":  # cogvlm vision expert
                qd, kvd = cfg.q_dim, cfg.kv_dim
                wq, wk, wv = _load_matmul_rows(
                    f, name, [(0, qd), (qd, qd + kvd), (qd + kvd, qd + 2 * kvd)], quantized, dtype
                )
                params["layers"][il].update(visexp_wq=wq, visexp_wk=wk, visexp_wv=wv)
                continue
            if suffix == "attn_qkv.weight":  # phi3-style fused QKV
                qd, kvd = cfg.q_dim, cfg.kv_dim
                wq, wk, wv = _load_matmul_rows(
                    f, name, [(0, qd), (qd, qd + kvd), (qd + kvd, qd + 2 * kvd)], quantized, dtype
                )
                params["layers"][il].update(wq=wq, wk=wk, wv=wv)
                continue
            if suffix == "ffn_up.weight" and cfg.arch in ("phi3",):  # fused gate|up
                g, u = _load_matmul_rows(f, name, [(0, cfg.n_ff), (cfg.n_ff, 2 * cfg.n_ff)], quantized, dtype)
                params["layers"][il].update(ffn_gate=g, ffn_up=u)
                continue
            if key is None:
                log.warning("unmapped tensor %s", name)
                continue
            if key in _FLATTEN_KEYS:
                params["layers"][il][key] = jnp.asarray(f.tensor_f32(name).reshape(-1), jnp.float32)
            elif key == "time_mix_lerp_fused":
                x = f.tensor_f32(name)  # numpy [5|6, 1, 1, C] (rwkv6 | rwkv7)
                params["layers"][il][key] = jnp.asarray(x.reshape(x.shape[0], -1), jnp.float32)
            elif key == "time_mix_w2" and f.tensor_f32(name).ndim == 3:
                # rwkv6 GGUF ne {E, C, 5} -> numpy [5, C, E] -> [5, E, C]
                # (rwkv7's w2 is a plain 2-D matmul and falls through)
                x = f.tensor_f32(name)
                params["layers"][il][key] = jnp.asarray(np.swapaxes(x, 1, 2), dtype=dtype)
            elif key in _DENSE3D_KEYS:
                params["layers"][il][key] = jnp.asarray(f.tensor_f32(name), dtype=dtype)
            elif key in _MATMUL_KEYS:
                params["layers"][il][key] = _load_matmul(f, name, quantized, dtype)
            elif key in _VECTOR_KEYS:
                params["layers"][il][key] = _load_dense(f, name, jnp.float32)
            elif key.endswith(("_exps", "_chexps")):
                # expert stacks: GGUF [E, N, K] -> QTensorE (kept quantized
                # in HBM; sparse dispatch gathers per-expert planes) or
                # dense [E, K, N]
                meta_t = f.tensors[name]
                if quantized and meta_t.gtype in REPACK_FORMATS and len(meta_t.shape) == 3:
                    params["layers"][il][key] = repack_experts(
                        f.tensor_bytes(name), meta_t.shape, meta_t.gtype
                    )
                else:
                    x = f.tensor_f32(name)
                    params["layers"][il][key] = jnp.asarray(np.swapaxes(x, 1, 2), dtype=dtype)
            else:
                params["layers"][il][key] = _load_matmul(f, name, quantized, dtype)
        else:
            log.warning("unmapped tensor %s", name)
        handled.add(name)

    if cfg.arch.startswith("lfm2") and "out_norm" not in params and "tok_norm" in params:
        # lfm2's output norm ships under the token_embd_norm name
        # (reference: LLM_TENSOR_OUTPUT_NORM_LFM2 -> "token_embd_norm")
        params["out_norm"] = params.pop("tok_norm")
    if "output" not in params and not cfg.is_encoder:
        # tied embedding (e.g. gemma, tinyllama variants)
        params["output"] = jnp.asarray(np.asarray(params["tok_emb"], dtype=np.float32).T, dtype=dtype)
    return params


# GGUF top-level tensor name -> (params key, transpose-back)
_TOP_MAP = {
    "token_embd.weight": ("tok_emb", False),
    "output_norm.weight": ("out_norm", False),
    "output_norm.bias": ("out_norm_b", False),
    "output.weight": ("output", True),
    "output.bias": ("output_b", False),
    "rope_freqs.weight": ("rope_freqs", False),
    "position_embd.weight": ("pos_emb", False),
    "token_types.weight": ("type_emb", False),
    "token_embd_norm.weight": ("tok_norm", False),
    "token_embd_norm.bias": ("tok_norm_b", False),
}


_NEOX_PERMUTED_KEYS = ("wq", "wk", "bq", "bk", "attn_q_norm", "attn_k_norm",
                       "attn_q_norm_b", "attn_k_norm_b")


def save_params_gguf(src_path: str, params: dict, out_path: str,
                     gtype: GGMLType = GGMLType.F32, cfg=None) -> str:
    """Inverse of load_params for DENSE, UNFUSED params — the model saver
    behind full-weight fine-tuning (reference capability: the finetuned-
    model write-out of examples/training/finetune.cpp via gguf_write).

    Walks the SOURCE gguf's tensor list so metadata, ordering, and any
    tensors the params tree doesn't carry (unmapped extras) pass through
    byte-identical; mapped tensors are re-emitted from the trained arrays
    (matmul weights transposed back to GGUF [N, K] row-major).

    `cfg` should be the loaded Model's config: when cfg.neox_permuted the
    load-time rope_to_neox q/k column permute is INVERTED here so the
    written file is in the GGUF norm-rope basis (reference analogue:
    src/llama-model-saver.cpp writes the on-disk layout, so save must
    undo any load-time relayout).  With cfg=None the flag is re-derived
    from the source file + ZLLM_ROPE_NEOX, matching Model.load defaults."""
    from ..gguf.writer import GGUFWriter

    f = read_gguf(src_path)
    if cfg is None:
        src_cfg = ModelConfig.from_gguf(f)
        neox = (os.environ.get("ZLLM_ROPE_NEOX", "1") == "1"
                and _neox_eligible(src_cfg))
        head_dim = src_cfg.head_dim
    else:
        neox = bool(getattr(cfg, "neox_permuted", False))
        head_dim = cfg.head_dim
    if neox and any("wq" not in l or "wk" not in l
                    for l in params.get("layers", [])):
        raise ValueError("save_params_gguf: params look fused (wqkv) but the "
                         "neox basis inversion needs unfused wq/wk — load "
                         "with fuse=False")

    def unperm_neox(x, key):
        n = int(x.shape[-1])
        if x.ndim == 1 and n == head_dim:
            return x[..., neox_within_perm(head_dim, inverse=True)]
        return x[..., neox_head_perm(n, head_dim, inverse=True)]

    w = GGUFWriter(out_path, alignment=f.alignment)
    for key, val in f.metadata.items():
        if key != "general.file_type":
            w.add(key, val)
    for name, meta in f.tensors.items():
        val, transpose, key = None, False, None
        if name in _TOP_MAP:
            key, transpose = _TOP_MAP[name]
            val = params.get(key)
        elif name.startswith("blk."):
            _, il_s, suffix = name.split(".", 2)
            key = _LAYER_MAP.get(suffix)
            if key is not None and int(il_s) < len(params.get("layers", [])):
                val = params["layers"][int(il_s)].get(key)
                transpose = (getattr(val, "ndim", 1) >= 2
                             and key not in _VECTOR_KEYS)
        if val is None or isinstance(val, (QTensor, QTensorE)):
            raw = np.asarray(f.tensor_bytes(name))
            w.add_tensor(name, raw, logical_shape=meta.shape, gtype=meta.gtype)
            continue
        x = np.asarray(val, np.float32)
        if neox and key in _NEOX_PERMUTED_KEYS:
            x = unperm_neox(x, key)
        if transpose:
            x = np.ascontiguousarray(x.T if x.ndim == 2 else x.transpose(0, 2, 1))
        if tuple(x.shape) != tuple(meta.shape):
            raise ValueError(f"{name}: params shape {x.shape} != gguf {tuple(meta.shape)} "
                             "(save requires a fuse=False-loaded model)")
        if gtype == GGMLType.F32:
            w.add_tensor(name, x)
        else:
            w.add_tensor(name, qb.quantize(x, gtype), logical_shape=x.shape, gtype=gtype)
    w.write()
    f.close()
    return out_path


def _permute_cols(w, perm_n):
    """Permute the output-feature (N) columns of a dense [K, N] weight or
    every plane of a QTensor (all planes are [rows, N])."""
    if isinstance(w, QTensor):
        planes = {k: p[..., perm_n] for k, p in w.planes.items()}
        return QTensor(fmt=w.fmt, shape=w.shape, planes=planes, fold=w.fold,
                       psum_axis=w.psum_axis, gather_axis=w.gather_axis,
                       npack=w.npack)
    return w[..., perm_n]


def neox_within_perm(d: int, inverse: bool = False) -> np.ndarray:
    """Within-head column permutation of the load-time norm->neox rope
    conversion: neox element i <- adjacent element (2i | 2(i-d/2)+1)."""
    within = np.concatenate([np.arange(0, d, 2), np.arange(1, d, 2)])
    return np.argsort(within) if inverse else within


def neox_head_perm(n: int, d: int, inverse: bool = False) -> np.ndarray:
    """The within-head perm replicated across all n//d heads of an
    n-column q/k projection (or its inverse)."""
    within = neox_within_perm(d, inverse)
    return (np.arange(n // d)[:, None] * d + within[None, :]).reshape(-1)


def _neox_eligible(cfg) -> bool:
    rope = cfg.rope
    return (cfg.use_rope and rope is not None and rope.style == "norm"
            and cfg.mla is None and not cfg.is_encoder
            and rope.dim == cfg.head_dim)


def rope_to_neox(params: dict, cfg) -> tuple[dict, object]:
    """Convert adjacent-pair ("norm") rope models to half-split ("neox")
    rope by permuting q/k head columns at load time — the inverse of the
    GGUF conversion permute.  Attention scores are invariant to a shared
    q/k permutation, but the neox rope path is strided-op free: the
    adjacent-pair path's even/odd gathers + interleave stack cost ~2
    relayout copies per layer per decode step (XLA profile), the neox path
    splits contiguous halves.  Applied only to full-dim standard-attention
    rope; per-head q/k norms and biases carry the same permutation.
    Sets cfg.neox_permuted so basis-crossing paths (load_lora,
    save_params_gguf) can apply/invert the permutation."""
    if not _neox_eligible(cfg):
        return params, cfg
    d = cfg.head_dim
    within = neox_within_perm(d)

    def vec_perm(v):
        n = int(v.shape[-1])
        return v[..., within] if n == d else v[..., neox_head_perm(n, d)]

    for layer in params.get("layers", []):
        if "wq" not in layer or "wk" not in layer:
            return params, cfg  # fused or exotic layout: leave as-is
    for layer in params.get("layers", []):
        for key in ("wq", "wk"):
            w = layer[key]
            n = w.shape[1] if not isinstance(w, QTensor) else w.shape[1]
            layer[key] = _permute_cols(w, neox_head_perm(n, d))
        for key in ("bq", "bk", "attn_q_norm", "attn_k_norm",
                    "attn_q_norm_b", "attn_k_norm_b"):
            if key in layer:
                layer[key] = vec_perm(layer[key])
    new_rope = cfg.rope._replace(style="neox")
    cfg = cfg.with_(rope=new_rope, neox_permuted=True,
                    rope_swa=cfg.rope_swa._replace(style="neox") if cfg.rope_swa else None)
    return params, cfg


def _fusable(ws) -> bool:
    if any(w is None for w in ws):
        return False
    if all(isinstance(w, QTensor) for w in ws):
        return (
            len({w.fmt for w in ws}) == 1
            and len({w.shape[0] for w in ws}) == 1
            and len({w.fold for w in ws}) == 1
        )
    if all(not isinstance(w, (QTensor, QTensorE)) for w in ws):
        return len({w.shape[0] for w in ws}) == 1 and len({w.dtype for w in ws}) == 1
    return False


def _cat(ws):
    if isinstance(ws[0], QTensor):
        return concat_n(list(ws))
    return jnp.concatenate(ws, axis=-1)


def fuse_projections(params: dict, cfg: ModelConfig) -> dict:
    """Load-time fusion of per-layer projections: wq|wk|wv -> wqkv and
    ffn_gate|ffn_up -> ffn_gateup (one kernel launch instead of three/two;
    decode is launch-overhead-bound at M=1).  The forward splits outputs
    at static offsets.  Reference analogue: fused attn_qkv tensors that
    some GGUFs already ship (phi3) — here every model gets the fusion.
    Skipped for layers carrying LoRA on the affected keys (adapter applies
    per projection)."""
    for layer in params["layers"]:
        if all(k in layer for k in ("wq", "wk", "wv")) and not any(
            k + ".lora" in layer for k in ("wq", "wk", "wv")
        ):
            ws = [layer["wq"], layer["wk"], layer["wv"]]
            if _fusable(ws):
                layer["wqkv"] = _cat(ws)
                for k in ("wq", "wk", "wv"):
                    del layer[k]
                if all(b in layer for b in ("bq", "bk", "bv")):
                    layer["bqkv"] = jnp.concatenate([layer["bq"], layer["bk"], layer["bv"]])
                    for b in ("bq", "bk", "bv"):
                        del layer[b]
        if all(k in layer for k in ("ffn_gate", "ffn_up")) and not any(
            k + ".lora" in layer for k in ("ffn_gate", "ffn_up")
        ):
            ws = [layer["ffn_gate"], layer["ffn_up"]]
            has_b = ("ffn_gate_b" in layer, "ffn_up_b" in layer)
            if _fusable(ws) and has_b[0] == has_b[1]:
                layer["ffn_gateup"] = _cat(ws)
                del layer["ffn_gate"], layer["ffn_up"]
                if all(has_b):  # jais swiglu biases ride along
                    layer["ffn_gateup_b"] = jnp.concatenate(
                        [layer.pop("ffn_gate_b"), layer.pop("ffn_up_b")])
    return params


def unfuse_projections(params: dict, cfg: ModelConfig) -> dict:
    """Inverse of fuse_projections (tensor-parallel sharding needs the
    separate projections; see zllm.parallel.tp.shard_params)."""
    from ..quant.repack import split_n

    def _split(w, sizes):
        if isinstance(w, QTensor):
            return split_n(w, sizes)
        off, outs = 0, []
        for n in sizes:
            outs.append(w[..., off : off + n])
            off += n
        return outs

    for layer in params["layers"]:
        if "wqkv" in layer:
            qd, kvd = cfg.q_dim, cfg.kv_dim
            layer["wq"], layer["wk"], layer["wv"] = _split(layer.pop("wqkv"), [qd, kvd, kvd])
            if "bqkv" in layer:
                b = layer.pop("bqkv")
                layer["bq"], layer["bk"], layer["bv"] = b[:qd], b[qd : qd + kvd], b[qd + kvd :]
        if "ffn_gateup_b" in layer:
            b = layer.pop("ffn_gateup_b")
            half = b.shape[0] // 2
            layer["ffn_gate_b"], layer["ffn_up_b"] = b[:half], b[half:]
        if "ffn_gateup" in layer:
            gu = layer.pop("ffn_gateup")
            half = gu.shape[1] // 2
            layer["ffn_gate"], layer["ffn_up"] = _split(gu, [half, half])
    return params


class Model:
    """Loaded model bundle: config + params + tokenizer (the analogue of
    llama_model, include/llama.h)."""

    def __init__(self, cfg: ModelConfig, params, tokenizer: Tokenizer | None, path: str = ""):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.path = path

    @property
    def chat_template(self) -> str:
        """The GGUF tokenizer.chat_template jinja source (reference:
        llama_model_chat_template, src/llama-model.cpp) — consumed by
        zllm.server.chat.detect_format's marker sniffing."""
        if self.tokenizer is not None:
            return self.tokenizer.vocab.chat_template
        return ""

    @classmethod
    def load(cls, path: str, *, quantized: bool = True, dtype=jnp.bfloat16,
             fuse: bool = True, npack: bool = True) -> "Model":
        f = read_gguf(path)
        cfg = ModelConfig.from_gguf(f)
        tok = None
        if f.kv("tokenizer.ggml.tokens") is not None:
            try:
                tok = Tokenizer.from_gguf(f)
            except NotImplementedError as e:
                log.warning("tokenizer unavailable: %s", e)
        params = load_params(f, cfg, quantized=quantized, dtype=dtype)
        if cfg.arch == "dbrx":
            # dbrx's norm_2 (GGUF attn_output_norm) is the PRE-FFN norm of
            # its graph (reference src/models/dbrx.cpp build_norm on
            # ffn_inp), not an encoder-style post-attention norm
            for layer in params.get("layers", []):
                if "attn_out_norm" in layer:
                    layer["ffn_norm"] = layer.pop("attn_out_norm")
        if cfg.arch == "qwen3next":
            hv, hk = cfg.ssm.dt_rank, cfg.ssm.n_group
            r = hv // hk
            # reference ssm_ba keeps HF's per-k-head [b_0..b_{r-1}, a_0..a_{r-1}]
            # interleave (convert_hf_to_gguf.py passes in_proj_ba through);
            # reorder columns to [all b | all a] for the mixer's simple split
            idx = ([kh * 2 * r + j for kh in range(hk) for j in range(r)]
                   + [kh * 2 * r + r + j for kh in range(hk) for j in range(r)])
            for layer in params.get("layers", []):
                if "ssm_ba" in layer:
                    layer["ssm_ba"] = _permute_cols(layer["ssm_ba"], np.asarray(idx))
                # the stack's pre-FFN norm ships as attn_post_norm
                # (qwen3next tensor table has no FFN_NORM)
                if "attn_post_norm" in layer:
                    layer["ffn_norm"] = layer.pop("attn_post_norm")
        if cfg.arch in ("chatglm", "plamo2", "plamo3"):
            # reference chatglm/plamo2/plamo3 GGUFs store the fused
            # [gate|up] projection as ffn_up (build_ffn LLM_FFN_SWIGLU with
            # no gate tensor); our graph consumes it as ffn_gateup
            for layer in params.get("layers", []):
                if "ffn_up" in layer and "ffn_gate" not in layer:
                    layer["ffn_gateup"] = layer.pop("ffn_up")
        if os.environ.get("ZLLM_ROPE_NEOX", "1") == "1":
            params, cfg = rope_to_neox(params, cfg)
        if (fuse and not cfg.is_encoder
                and cfg.arch not in ("qwen3next", "gemma3n")
                and cfg.kv_heads_layers is None):
            # (qwen3next attention layers carry the [query|gate] wq whose
            # width breaks the fused-projection split contract; gemma3n's
            # custom AltUp loop consumes the separate projections; deci's
            # per-layer GQA widths break the global q_dim/kv_dim split)
            params = fuse_projections(params, cfg)
        if isinstance(params.get("output"), QTensor):
            from ..quant.repack import pad_n

            # widest kernel N-tile for the vocab head (forward slices the
            # logits back to cfg.vocab_size)
            params["output"] = pad_n(params["output"], 1024)
        if npack and os.environ.get("ZLLM_NPACK", "1") == "1":
            # LAST (after fuse/pad: both would break the global column
            # pairing): nibble formats to the N-major packed-byte layout
            # consumed dual-dot by the decode kernel (quant/repack.to_npack)
            from ..quant.repack import can_npack, to_npack

            params = jax.tree_util.tree_map(
                lambda w: to_npack(w) if isinstance(w, QTensor) and can_npack(w) else w,
                params, is_leaf=lambda w: isinstance(w, (QTensor, QTensorE)),
            )
        f.close()

        # route QTensor matmuls through the fused Pallas kernels on TPU
        if jax.default_backend() != "cpu":
            from ..ops import qmatmul

            qmatmul.install()
        return cls(cfg, params, tok, path)
