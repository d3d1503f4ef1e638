"""From-disk HF checkpoint -> GGUF conversion.

The CLI-facing counterpart of the reference's convert_hf_to_gguf.py: read
config.json + *.safetensors (sharded or single) + tokenizer files from a
model directory and write one GGUF.  The safetensors container and the
sentencepiece model are parsed directly (mmap + minimal protobuf wire
reader) — tensors load lazily, one at a time, so a 70B checkpoint converts
in O(largest tensor) memory like the reference's lazy torch loader
(convert_hf_to_gguf.py ModelBase.get_tensors / gguf-py lazy.py).
"""

from __future__ import annotations

import json
import mmap
import os
import struct
from typing import Any, Iterator, Mapping

import numpy as np

from ..gguf.constants import GGMLType

_ST_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_,
}


def _bf16_to_f32(raw: np.ndarray) -> np.ndarray:
    """uint16 bf16 bit patterns -> f32 (numpy has no bfloat16)."""
    return (raw.astype(np.uint32) << 16).view(np.float32)


class SafetensorsFile:
    """mmap-backed lazy reader for one .safetensors file (format: u64
    header length + JSON header {name: {dtype, shape, data_offsets}} +
    raw little-endian buffer)."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        (hlen,) = struct.unpack("<Q", self._mm[:8])
        header = json.loads(self._mm[8 : 8 + hlen].decode("utf-8"))
        self._base = 8 + hlen
        header.pop("__metadata__", None)
        self.tensors: dict[str, dict] = header

    def keys(self):
        return self.tensors.keys()

    def get(self, name: str) -> np.ndarray:
        info = self.tensors[name]
        lo, hi = info["data_offsets"]
        buf = self._mm[self._base + lo : self._base + hi]
        shape = tuple(info["shape"])
        if info["dtype"] == "BF16":
            return _bf16_to_f32(np.frombuffer(buf, np.uint16)).reshape(shape)
        arr = np.frombuffer(buf, _ST_DTYPES[info["dtype"]]).reshape(shape)
        return arr.astype(np.float32) if arr.dtype in (np.float16, np.float64) else arr

    def close(self):
        self._mm.close()
        self._f.close()


class LazyStateDict(Mapping[str, Any]):
    """dict-like view over one or many safetensors shards; tensors
    materialize on access (per-tensor, not per-shard)."""

    def __init__(self, files: list[SafetensorsFile]):
        self._files = files
        self._where = {name: f for f in files for name in f.keys()}

    @classmethod
    def from_dir(cls, d: str) -> "LazyStateDict":
        index = os.path.join(d, "model.safetensors.index.json")
        if os.path.exists(index):
            with open(index) as fh:
                shards = sorted(set(json.load(fh)["weight_map"].values()))
            return cls([SafetensorsFile(os.path.join(d, s)) for s in shards])
        singles = sorted(
            fn for fn in os.listdir(d) if fn.endswith(".safetensors")
        )
        if not singles:
            raise FileNotFoundError(f"no .safetensors files under {d}")
        return cls([SafetensorsFile(os.path.join(d, s)) for s in singles])

    def __getitem__(self, name: str) -> np.ndarray:
        return self._where[name].get(name)

    def __contains__(self, name) -> bool:
        return name in self._where

    def __iter__(self) -> Iterator[str]:
        return iter(self._where)

    def __len__(self) -> int:
        return len(self._where)

    def close(self):
        for f in self._files:
            f.close()


# ---------------------------------------------------------------------------
# sentencepiece model parsing (minimal protobuf wire reader)
# ---------------------------------------------------------------------------

def _pb_fields(buf: bytes) -> Iterator[tuple[int, int, bytes | int]]:
    """Yield (field_no, wire_type, value) from a protobuf message."""
    i, n = 0, len(buf)
    while i < n:
        tag = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            tag |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        field, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            val = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                val |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield field, wt, val
        elif wt == 2:  # length-delimited
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield field, wt, buf[i : i + ln]
            i += ln
        elif wt == 5:  # fixed32
            yield field, wt, buf[i : i + 4]
            i += 4
        elif wt == 1:  # fixed64
            yield field, wt, buf[i : i + 8]
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")


# sentencepiece piece types -> GGUF token types (llama.h llama_token_attr;
# sentencepiece_model.proto: NORMAL=1 UNKNOWN=2 CONTROL=3 USER_DEFINED=4
# BYTE=6 UNUSED=5)
_SPM_TYPE_MAP = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 6}


def parse_sentencepiece(path: str):
    """tokenizer.model -> (tokens, scores, types) (reference:
    convert_hf_to_gguf.py _set_vocab_sentencepiece, which uses the
    sentencepiece lib; here the ModelProto is decoded directly: field 1 =
    repeated SentencePiece{piece=1 string, score=2 float, type=3 enum})."""
    with open(path, "rb") as fh:
        data = fh.read()
    tokens, scores, types = [], [], []
    for field, wt, val in _pb_fields(data):
        if field != 1 or wt != 2:
            continue
        piece, score, ptype = "", 0.0, 1
        for f2, w2, v2 in _pb_fields(val):
            if f2 == 1 and w2 == 2:
                piece = v2.decode("utf-8")
            elif f2 == 2 and w2 == 5:
                score = struct.unpack("<f", v2)[0]
            elif f2 == 3 and w2 == 0:
                ptype = v2
        tokens.append(piece)
        scores.append(score)
        types.append(_SPM_TYPE_MAP.get(ptype, 1))
    return tokens, scores, types


# ---------------------------------------------------------------------------
# tokenizer.json (HF fast tokenizer) -> BPE vocab
# ---------------------------------------------------------------------------

def parse_tokenizer_json(path: str):
    """tokenizer.json -> (tokens, types, merges) for byte-level BPE
    (reference: convert_hf_to_gguf.py _set_vocab_gpt2 via AutoTokenizer)."""
    with open(path, encoding="utf-8") as fh:
        tj = json.load(fh)
    model = tj.get("model", {})
    if model.get("type") not in ("BPE", None):
        raise NotImplementedError(f"tokenizer.json model type {model.get('type')}")
    vocab = model.get("vocab", {})
    n = max(vocab.values()) + 1 if vocab else 0
    tokens = [""] * n
    for tok, idx in vocab.items():
        tokens[idx] = tok
    types = [1] * n  # NORMAL
    for added in tj.get("added_tokens", []):
        idx = added["id"]
        if idx >= n:
            tokens.extend([""] * (idx + 1 - n))
            types.extend([1] * (idx + 1 - n))
            n = idx + 1
        tokens[idx] = added["content"]
        types[idx] = 3 if added.get("special") else 4  # CONTROL / USER_DEFINED
    merges = model.get("merges", [])
    if merges and not isinstance(merges[0], str):
        merges = [" ".join(m) for m in merges]
    return tokens, types, merges


# HF model_type -> GGUF tokenizer.ggml.pre pretokenizer name (the
# reference fingerprints via chkhsh hashes in convert_hf_to_gguf.py
# get_vocab_base_pre; model_type is a good-enough proxy offline)
_PRE_BY_MODEL_TYPE = {
    "llama": "llama3",
    "qwen2": "qwen2",
    "qwen3": "qwen2",
    "gpt2": "gpt-2",
    "deepseek_v2": "deepseek-llm",
    "gemma2": "default",
    "gemma3": "default",
    "phi3": "default",
}


def tokenizer_kv_from_dir(d: str, arch: str, model_type: str = "") -> dict:
    """Build the GGUF tokenizer.* KV dict from HF tokenizer files."""
    kv: dict[str, Any] = {}
    cfg_path = os.path.join(d, "tokenizer_config.json")
    tok_cfg = {}
    if os.path.exists(cfg_path):
        with open(cfg_path, encoding="utf-8") as fh:
            tok_cfg = json.load(fh)

    spm = os.path.join(d, "tokenizer.model")
    tjson = os.path.join(d, "tokenizer.json")
    if os.path.exists(spm):
        tokens, scores, types = parse_sentencepiece(spm)
        kv["tokenizer.ggml.model"] = "llama"
        kv["tokenizer.ggml.pre"] = "default"
        kv["tokenizer.ggml.tokens"] = tokens
        kv["tokenizer.ggml.scores"] = scores
        kv["tokenizer.ggml.token_type"] = types
        kv["tokenizer.ggml.add_space_prefix"] = bool(tok_cfg.get("add_prefix_space", True))
    elif os.path.exists(tjson):
        tokens, types, merges = parse_tokenizer_json(tjson)
        kv["tokenizer.ggml.model"] = "gpt2"
        kv["tokenizer.ggml.pre"] = _PRE_BY_MODEL_TYPE.get(model_type, "default")
        kv["tokenizer.ggml.tokens"] = tokens
        kv["tokenizer.ggml.scores"] = [0.0] * len(tokens)
        kv["tokenizer.ggml.token_type"] = types
        kv["tokenizer.ggml.merges"] = merges
    else:
        return kv

    tok_index = {t: i for i, t in enumerate(kv["tokenizer.ggml.tokens"])}

    def tid(entry):
        if entry is None:
            return -1
        if isinstance(entry, dict):
            entry = entry.get("content")
        return tok_index.get(entry, -1)

    bos, eos = tid(tok_cfg.get("bos_token")), tid(tok_cfg.get("eos_token"))
    if bos >= 0:
        kv["tokenizer.ggml.bos_token_id"] = bos
    if eos >= 0:
        kv["tokenizer.ggml.eos_token_id"] = eos
    unk, pad = tid(tok_cfg.get("unk_token")), tid(tok_cfg.get("pad_token"))
    if unk >= 0:
        kv["tokenizer.ggml.unknown_token_id"] = unk
    if pad >= 0:
        kv["tokenizer.ggml.padding_token_id"] = pad
    if "add_bos_token" in tok_cfg:
        kv["tokenizer.ggml.add_bos_token"] = bool(tok_cfg["add_bos_token"])
    if "add_eos_token" in tok_cfg:
        kv["tokenizer.ggml.add_eos_token"] = bool(tok_cfg["add_eos_token"])
    if tok_cfg.get("chat_template"):
        kv["tokenizer.chat_template"] = str(tok_cfg["chat_template"])
    return kv


# HF architectures[0] -> (zllm converter, gguf arch)
_CONVERTERS: dict[str, tuple[str, str]] = {
    "LlamaForCausalLM": ("llama", "llama"),
    "MiniMaxM2ForCausalLM": ("llama", "minimax-m2"),
    "MistralForCausalLM": ("llama", "mistral"),
    "Qwen2ForCausalLM": ("llama", "qwen2"),
    "Qwen3ForCausalLM": ("llama", "qwen3"),
    "Gemma2ForCausalLM": ("llama", "gemma2"),
    "Gemma3ForCausalLM": ("llama", "gemma3"),
    "MixtralForCausalLM": ("llama", "mixtral"),
    "Phi3ForCausalLM": ("llama", "phi3"),
    "Olmo2ForCausalLM": ("llama", "olmo2"),
    "GraniteForCausalLM": ("llama", "granite"),
    "Qwen2MoeForCausalLM": ("llama", "qwen2moe"),
    "Qwen3MoeForCausalLM": ("llama", "qwen3moe"),
    "GroveMoeForCausalLM": ("llama", "grovemoe"),
    "PlamoForCausalLM": ("plamo", "plamo"),
    "Plamo3ForCausalLM": ("plamo3", "plamo3"),
    "PLaMo3ForCausalLM": ("plamo3", "plamo3"),
    "BitnetForCausalLM": ("bitnet", "bitnet"),
    "ModernBertModel": ("modern-bert", "modern-bert"),
    "ModernBertForMaskedLM": ("modern-bert", "modern-bert"),
    "ModernBertForSequenceClassification": ("modern-bert", "modern-bert"),
    "NeoBERT": ("neo-bert", "neo-bert"),
    "NeoBERTLMHead": ("neo-bert", "neo-bert"),
    "NeoBERTForSequenceClassification": ("neo-bert", "neo-bert"),
    # qwen-vl text stacks (vision tower dropped; equal text positions make
    # m-rope == neox rope, so the text GGUF serves standalone)
    "Qwen2VLForConditionalGeneration": ("qwenvl", "qwen2vl"),
    "Qwen2_5_VLForConditionalGeneration": ("qwenvl", "qwen2vl"),
    "Qwen3VLForConditionalGeneration": ("qwenvl", "qwen3vl"),
    "Qwen3VLMoeForConditionalGeneration": ("qwenvl", "qwen3vlmoe"),
    # diffusion LMs (reference convert: DreamModel/LLaDAModel/LLaDAMoEModel/
    # RND1Model; generation via tools/diffusion.py)
    "DreamModel": ("llama", "dream"),
    "LLaDAModelLM": ("llama", "llada"),
    "LLaDAMoEModel": ("llama", "llada-moe"),
    "LLaDAMoEModelLM": ("llama", "llada-moe"),
    "RND1": ("llama", "rnd1"),
    "GptOssForCausalLM": ("llama", "gpt-oss"),
    "BertModel": ("bert", "bert"),
    "BertForMaskedLM": ("bert", "bert"),
    "DeepseekV2ForCausalLM": ("deepseek2", "deepseek2"),
    "DeepseekV3ForCausalLM": ("deepseek2", "deepseek2"),
    "MiniCPM3ForCausalLM": ("deepseek2", "minicpm3"),
    "PLMForCausalLM": ("deepseek2", "plm"),
    "MambaForCausalLM": ("mamba", "mamba"),
    "Rwkv6ForCausalLM": ("rwkv6", "rwkv6"),
    "RWKV7ForCausalLM": ("rwkv7", "rwkv7"),
    "Rwkv7ForCausalLM": ("rwkv7", "rwkv7"),
    "RwkvHybridForCausalLM": ("rwkv7", "arwkv7"),
    "NemotronHForCausalLM": ("nemotron_h", "nemotron-h"),
    "RwkvForCausalLM": ("rwkv6", "rwkv6"),
    "ArceeForCausalLM": ("llama", "arcee"),
    "Ernie4_5ForCausalLM": ("llama", "ernie4_5"),
    "Ernie4_5_ForCausalLM": ("llama", "ernie4_5"),
    "Exaone4ForCausalLM": ("llama", "exaone4"),
    "Cohere2ForCausalLM": ("llama", "cohere2"),
    "CohereForCausalLM": ("llama", "command-r"),
    "OlmoeForCausalLM": ("llama", "olmoe"),
    "Glm4MoeForCausalLM": ("llama", "glm4moe"),
    "Dots1ForCausalLM": ("llama", "dots1"),
    "MiniCPMForCausalLM": ("llama", "minicpm"),
    "BaichuanForCausalLM": ("llama", "baichuan"),
    "BaiChuanForCausalLM": ("llama", "baichuan"),
    "InternLM2ForCausalLM": ("internlm2", "internlm2"),
    "OpenELMForCausalLM": ("openelm", "openelm"),
    "ChameleonForCausalLM": ("llama", "chameleon"),
    "ChameleonForConditionalGeneration": ("llama", "chameleon"),
    "OrionForCausalLM": ("llama", "orion"),
    "XverseForCausalLM": ("llama", "xverse"),
    "GPTRefactForCausalLM": ("llama", "refact"),
    "MaincoderForCausalLM": ("llama", "maincoder"),
    "PanguEmbeddedForCausalLM": ("llama", "pangu-embedded"),
    "QWenLMHeadModel": ("qwen", "qwen"),
    "CodeShellForCausalLM": ("codeshell", "codeshell"),
    "AfmoeForCausalLM": ("llama", "afmoe"),
    "CogVLMForCausalLM": ("cogvlm", "cogvlm"),
    "ExaoneMoEForCausalLM": ("llama", "exaone-moe"),
    "GPTBigCodeForCausalLM": ("starcoder", "starcoder"),
    "Mistral3ForConditionalGeneration": ("llama", "mistral3"),
    "LlamaModel": ("llama", "llama-embed"),
    "BloomForCausalLM": ("bloom", "bloom"),
    "GraniteMoeForCausalLM": ("llama", "granitemoe"),
    "GraniteMoeSharedForCausalLM": ("llama", "granitemoe"),
    "GlmForCausalLM": ("llama", "chatglm"),
    "DbrxForCausalLM": ("dbrx", "dbrx"),
    "HunYuanMoEV1ForCausalLM": ("llama", "hunyuan-moe"),
    "HunYuanDenseV1ForCausalLM": ("llama", "hunyuan-dense"),
    "ApertusForCausalLM": ("llama", "apertus"),
    "Ernie4_5_MoeForCausalLM": ("llama", "ernie4_5-moe"),
    # arch wave 5 batch 1
    "DeepseekForCausalLM": ("llama", "deepseek"),
    "Grok1ForCausalLM": ("llama", "grok"),
    "GrokForCausalLM": ("llama", "grok"),
    "ArcticForCausalLM": ("llama", "arctic"),
    "SmallThinkerForCausalLM": ("llama", "smallthinker"),
    "SmallthinkerForCausalLM": ("llama", "smallthinker"),
    "BailingMoeForCausalLM": ("bailingmoe", "bailingmoe"),
    "BailingMoeV2ForCausalLM": ("bailingmoe", "bailingmoe2"),
    "BailingMoeLinearV2ForCausalLM": ("bailingmoe", "bailingmoe2"),
    "ExaoneForCausalLM": ("exaone", "exaone"),
    "JAISLMHeadModel": ("jais", "jais"),
}


def convert_hf_dir(
    d: str,
    out_path: str,
    *,
    gtype: GGMLType = GGMLType.F16,
    arch: str | None = None,
) -> str:
    """Convert an HF model directory (config.json + safetensors +
    tokenizer files) to GGUF."""
    from . import hf as hfmod

    with open(os.path.join(d, "config.json"), encoding="utf-8") as fh:
        config = json.load(fh)
    archs = config.get("architectures") or []
    hf_arch = archs[0] if archs else ""
    if hf_arch not in _CONVERTERS and arch is None:
        raise NotImplementedError(f"no converter for {hf_arch or 'unknown architecture'}")
    family, gguf_arch = _CONVERTERS.get(hf_arch, ("llama", arch or "llama"))
    if arch:
        gguf_arch = arch

    sd = LazyStateDict.from_dir(d)
    tok_kv = tokenizer_kv_from_dir(d, gguf_arch, str(config.get("model_type", "")))
    try:
        if family == "llama":
            return hfmod.convert_hf_llama(
                sd, config, out_path, arch=gguf_arch, gtype=gtype, tokenizer_kv=tok_kv
            )
        if family == "bert":
            return hfmod.convert_hf_bert(sd, config, out_path, gtype=gtype, tokenizer_kv=tok_kv)
        if family == "deepseek2":
            return hfmod.convert_hf_deepseek2(sd, config, out_path, arch=gguf_arch,
                                              gtype=gtype, tokenizer_kv=tok_kv)
        if family == "mamba":
            return hfmod.convert_hf_mamba(sd, config, out_path, gtype=gtype, tokenizer_kv=tok_kv)
        if family == "rwkv6":
            return hfmod.convert_hf_rwkv6(sd, config, out_path, gtype=gtype, tokenizer_kv=tok_kv)
        if family == "nemotron_h":
            return hfmod.convert_hf_nemotron_h(sd, config, out_path, gtype=gtype,
                                               tokenizer_kv=tok_kv)
        if family == "rwkv7":
            return hfmod.convert_hf_rwkv7(sd, config, out_path, arch=gguf_arch,
                                          gtype=gtype, tokenizer_kv=tok_kv)
        if family == "internlm2":
            return hfmod.convert_hf_internlm2(sd, config, out_path, gtype=gtype, tokenizer_kv=tok_kv)
        if family == "qwen":
            return hfmod.convert_hf_qwen(sd, config, out_path, gtype=gtype, tokenizer_kv=tok_kv)
        if family == "cogvlm":
            return hfmod.convert_hf_cogvlm(sd, config, out_path, gtype=gtype, tokenizer_kv=tok_kv)
        if family == "starcoder":
            return hfmod.convert_hf_starcoder(sd, config, out_path, gtype=gtype, tokenizer_kv=tok_kv)
        if family == "codeshell":
            return hfmod.convert_hf_codeshell(sd, config, out_path, gtype=gtype, tokenizer_kv=tok_kv)
        if family == "openelm":
            return hfmod.convert_hf_openelm(sd, config, out_path, gtype=gtype, tokenizer_kv=tok_kv)
        if family == "plamo":
            return hfmod.convert_hf_plamo(sd, config, out_path, gtype=gtype, tokenizer_kv=tok_kv)
        if family == "plamo3":
            return hfmod.convert_hf_plamo3(sd, config, out_path, gtype=gtype, tokenizer_kv=tok_kv)
        if family == "modern-bert":
            return hfmod.convert_hf_modern_bert(sd, config, out_path, gtype=gtype, tokenizer_kv=tok_kv)
        if family == "neo-bert":
            return hfmod.convert_hf_neo_bert(sd, config, out_path, gtype=gtype, tokenizer_kv=tok_kv)
        if family == "bitnet":
            return hfmod.convert_hf_bitnet(sd, config, out_path, gtype=gtype, tokenizer_kv=tok_kv)
        if family == "qwenvl":
            # strip the VLM nesting: text weights live under
            # model.language_model.* (new transformers) or model.* (older
            # qwen2vl); the vision tower (visual.*) is not part of the
            # text GGUF (reference emits it as a separate mmproj file)
            tsd = {}
            for k, v in sd.items():
                if "visual." in k:
                    continue
                tsd[k.replace("model.language_model.", "model.")
                     .replace("language_model.model.", "model.")] = v
            tcfg = dict(config.get("text_config") or config)
            tcfg.setdefault("rope_scaling", config.get("rope_scaling"))
            return hfmod.convert_hf_llama(tsd, tcfg, out_path, arch=gguf_arch,
                                          gtype=gtype, tokenizer_kv=tok_kv)
        if family == "bloom":
            return hfmod.convert_hf_bloom(sd, config, out_path, gtype=gtype, tokenizer_kv=tok_kv)
        if family == "bailingmoe":
            return hfmod.convert_hf_bailingmoe(sd, config, out_path, arch=gguf_arch,
                                               gtype=gtype, tokenizer_kv=tok_kv)
        if family == "exaone":
            return hfmod.convert_hf_exaone(sd, config, out_path, gtype=gtype, tokenizer_kv=tok_kv)
        if family == "jais":
            return hfmod.convert_hf_jais(sd, config, out_path, gtype=gtype, tokenizer_kv=tok_kv)
        raise NotImplementedError(family)
    finally:
        sd.close()
