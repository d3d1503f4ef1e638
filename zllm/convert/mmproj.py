"""HF vision tower + projector -> mmproj GGUF converter.

Produces the standard `mmproj` file consumed by zllm.mtmd.clip (and by
the reference's tools/mtmd stack — tensor names per clip-impl.h TN_*,
hparams in the `clip.vision.*` KV namespace, matching the reference
convert_hf_to_gguf.py MmprojModel contract).

Covered HF sources:
- CLIPVisionModel + llava-style 2-layer MLP projector (`mlp`)
- SiglipVisionModel + gemma3 avg-pool projector (`gemma3`)
- Qwen2Audio's Whisper-style tower + linear projector (`qwen2a`)
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.writer import GGUFWriter
from .hf import _emit, _npy


_VIT_LAYER = (
    # (HF suffix, GGUF mid name)
    ("self_attn.q_proj", "attn_q"),
    ("self_attn.k_proj", "attn_k"),
    ("self_attn.v_proj", "attn_v"),
    ("self_attn.out_proj", "attn_out"),
    ("layer_norm1", "ln1"),
    ("layer_norm2", "ln2"),
    ("mlp.fc1", "ffn_up"),
    ("mlp.fc2", "ffn_down"),
)


def convert_hf_mmproj(
    state_dict: Mapping[str, Any],
    config: Mapping[str, Any],
    out_path: str,
    *,
    proj_type: str = "mlp",
    gtype: GGMLType = GGMLType.F32,
) -> str:
    """state_dict: the FULL multimodal model's tensors (numpy or torch);
    `vision_tower.`/`vision_model.` and `multi_modal_projector.` prefixes
    are located automatically.  config: the HF *vision* config dict
    (hidden_size, image_size, patch_size, ...) plus optionally
    `text_hidden_size` for the projector dim."""
    sd = {k: v for k, v in state_dict.items()}

    def find(*cands):
        for c in cands:
            if c in sd:
                return _npy(sd[c])
        return None

    def req(*cands):
        v = find(*cands)
        if v is None:
            raise KeyError(f"none of {cands} in state dict")
        return v

    # locate the vision tower prefix
    vt = None
    for k in sd:
        i = k.find("vision_model.")
        if i >= 0:
            vt = k[: i + len("vision_model.")]
            break
    if vt is None:
        raise KeyError("no vision_model.* tensors in state dict")

    n_embd = int(config["hidden_size"])
    n_layer = int(config["num_hidden_layers"])
    n_head = int(config["num_attention_heads"])
    n_ff = int(config["intermediate_size"])
    image_size = int(config["image_size"])
    patch_size = int(config["patch_size"])
    eps = float(config.get("layer_norm_eps", 1e-5))
    mean = config.get("image_mean") or [0.48145466, 0.4578275, 0.40821073]
    std = config.get("image_std") or [0.26862954, 0.26130258, 0.27577711]

    w = GGUFWriter(out_path)
    w.add("general.architecture", "clip")
    w.add("clip.projector_type", proj_type)
    w.add("clip.has_vision_encoder", True)
    w.add("clip.has_audio_encoder", False)
    act = config.get("hidden_act", "quick_gelu")
    w.add("clip.use_gelu", act in ("gelu", "gelu_new", "gelu_pytorch_tanh"))
    w.add("clip.use_silu", act in ("silu", "swish"))
    v = "clip.vision."
    w.add(v + "image_size", image_size)
    w.add(v + "patch_size", patch_size)
    w.add(v + "embedding_length", n_embd)
    w.add(v + "feed_forward_length", n_ff)
    w.add(v + "block_count", n_layer)
    w.add(v + "attention.head_count", n_head)
    w.add(v + "attention.layer_norm_epsilon", eps)
    w.add(v + "image_mean", [float(x) for x in mean])
    w.add(v + "image_std", [float(x) for x in std])
    if proj_type == "gemma3":
        # HF Gemma3: tokens_per_side**2 output tokens via avg-pool merge
        side = image_size // patch_size
        mm_tokens = int(config.get("mm_tokens_per_image", 256))
        merge = max(1, side // max(1, int(round(mm_tokens ** 0.5))))
        w.add(v + "projector.scale_factor", merge)

    def emit(name, arr):
        arr = np.asarray(arr, np.float32)
        _emit(w, name, arr, gtype if arr.ndim >= 2 else GGMLType.F32)

    emb = vt + "embeddings."
    patch = req(emb + "patch_embedding.weight")  # [C, 3, ps, ps]
    emit("v.patch_embd.weight", patch.reshape(n_embd, -1))
    pb = find(emb + "patch_embedding.bias")
    if pb is not None:
        emit("v.patch_embd.bias", pb)
    cls = find(emb + "class_embedding")
    if cls is not None:
        emit("v.class_embd", cls.reshape(-1))
    emit("v.position_embd.weight", req(emb + "position_embedding.weight"))
    for hf, gg in (("pre_layrnorm", "v.pre_ln"), ("post_layernorm", "v.post_ln")):
        pw = find(vt + hf + ".weight")
        if pw is not None:
            emit(gg + ".weight", pw)
            bb = find(vt + hf + ".bias")
            if bb is not None:
                emit(gg + ".bias", bb)
    for il in range(n_layer):
        hfp = f"{vt}encoder.layers.{il}."
        for suf, mid in _VIT_LAYER:
            for part in ("weight", "bias"):
                t = find(hfp + suf + "." + part)
                if t is not None:
                    emit(f"v.blk.{il}.{mid}.{part}", t)

    # projector
    proj_prefix = None
    for k in sd:
        i = k.find("multi_modal_projector.")
        if i >= 0:
            proj_prefix = k[: i + len("multi_modal_projector.")]
            break
    if proj_type == "mlp":
        if proj_prefix is None:
            raise KeyError("no multi_modal_projector.* tensors for mlp projector")
        emit("mm.0.weight", req(proj_prefix + "linear_1.weight"))
        emit("mm.0.bias", req(proj_prefix + "linear_1.bias"))
        emit("mm.2.weight", req(proj_prefix + "linear_2.weight"))
        emit("mm.2.bias", req(proj_prefix + "linear_2.bias"))
    elif proj_type == "gemma3":
        # stored [vision_hidden, text_hidden], consumed as x @ w (zllm) /
        # mul_mat(cont(transpose(w)), x) (reference siglip.cpp:37)
        emit("mm.input_projection.weight",
             req(proj_prefix + "mm_input_projection_weight"))
        # HF Gemma3RMSNorm is zero-centered (y = x * (1 + w)); the GGUF
        # stores the effective multiplier like the text-side gemma norms
        emit("mm.soft_emb_norm.weight",
             1.0 + req(proj_prefix + "mm_soft_emb_norm.weight"))
    else:
        raise NotImplementedError(f"mmproj converter: projector {proj_type}")
    w.write()
    return out_path


_WHISPER_LAYER = (
    ("self_attn.q_proj", "attn_q"),
    ("self_attn.k_proj", "attn_k"),
    ("self_attn.v_proj", "attn_v"),
    ("self_attn.out_proj", "attn_out"),
    ("self_attn_layer_norm", "ln1"),
    ("final_layer_norm", "ln2"),
    ("fc1", "ffn_up"),
    ("fc2", "ffn_down"),
)


def convert_hf_mmproj_audio(
    state_dict: Mapping[str, Any],
    config: Mapping[str, Any],
    out_path: str,
    *,
    proj_type: str = "qwen2a",
    gtype: GGMLType = GGMLType.F32,
) -> str:
    """HF Qwen2Audio-style audio tower -> audio mmproj GGUF.  config: the
    HF *audio* config dict (d_model, encoder_layers, num_mel_bins, ...)."""
    sd = dict(state_dict)

    at = None
    for k in sd:
        i = k.find("audio_tower.")
        if i >= 0:
            at = k[: i + len("audio_tower.")]
            break
    if at is None:
        raise KeyError("no audio_tower.* tensors in state dict")

    def find(*cands):
        for c in cands:
            if c in sd:
                return _npy(sd[c])
        return None

    def req(*cands):
        v = find(*cands)
        if v is None:
            raise KeyError(f"none of {cands} in state dict")
        return v

    n_embd = int(config["d_model"])
    n_layer = int(config["encoder_layers"])
    n_head = int(config["encoder_attention_heads"])
    n_ff = int(config["encoder_ffn_dim"])
    n_mel = int(config["num_mel_bins"])

    w = GGUFWriter(out_path)
    w.add("general.architecture", "clip")
    w.add("clip.projector_type", proj_type)
    w.add("clip.has_vision_encoder", False)
    w.add("clip.has_audio_encoder", True)
    a = "clip.audio."
    w.add(a + "num_mel_bins", n_mel)
    w.add(a + "embedding_length", n_embd)
    w.add(a + "feed_forward_length", n_ff)
    w.add(a + "block_count", n_layer)
    w.add(a + "attention.head_count", n_head)
    w.add(a + "attention.layer_norm_epsilon", 1e-5)

    def emit(name, arr):
        arr = np.asarray(arr, np.float32)
        _emit(w, name, arr, gtype if arr.ndim >= 2 else GGMLType.F32)

    for i, hf in ((1, "conv1"), (2, "conv2")):
        cw = req(at + hf + ".weight")  # [n_embd, c_in, 3]
        emit(f"a.conv1d.{i}.weight", cw.reshape(n_embd, -1))
        emit(f"a.conv1d.{i}.bias", req(at + hf + ".bias"))
    emit("a.position_embd.weight", req(at + "embed_positions.weight"))
    emit("a.post_ln.weight", req(at + "layer_norm.weight"))
    emit("a.post_ln.bias", req(at + "layer_norm.bias"))
    for il in range(n_layer):
        hfp = f"{at}layers.{il}."
        for suf, mid in _WHISPER_LAYER:
            for part in ("weight", "bias"):
                t = find(hfp + suf + "." + part)
                if t is not None:
                    emit(f"a.blk.{il}.{mid}.{part}", t)

    if proj_type == "qwen2a":
        pp = None
        for k in sd:
            i = k.find("multi_modal_projector.")
            if i >= 0:
                pp = k[: i + len("multi_modal_projector.")]
                break
        if pp is None:
            raise KeyError("no multi_modal_projector.* for qwen2a")
        emit("mm.a.fc.weight", req(pp + "linear.weight"))
        emit("mm.a.fc.bias", req(pp + "linear.bias"))
    else:
        raise NotImplementedError(f"audio mmproj converter: {proj_type}")
    w.write()
    return out_path
