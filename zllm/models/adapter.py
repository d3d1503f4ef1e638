"""LoRA adapters.

The counterpart of the reference's adapter subsystem (reference:
src/llama-adapter.cpp llama_adapter_lora_init + runtime scale;
convert_lora_to_gguf.py for the PEFT conversion).  Adapter GGUFs carry
general.type="adapter", adapter.type="lora", adapter.lora.alpha, and
tensors "<base>.lora_a" [K, r] / "<base>.lora_b" [r, N] in our layout.
"""

from __future__ import annotations

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import read_gguf
from ..gguf.writer import GGUFWriter

_SUFFIX_TO_KEY = {
    "attn_q": "wq",
    "attn_k": "wk",
    "attn_v": "wv",
    "attn_output": "wo",
    "ffn_gate": "ffn_gate",
    "ffn_up": "ffn_up",
    "ffn_down": "ffn_down",
}

_HF_TO_SUFFIX = {
    "self_attn.q_proj": "attn_q",
    "self_attn.k_proj": "attn_k",
    "self_attn.v_proj": "attn_v",
    "self_attn.o_proj": "attn_output",
    "mlp.gate_proj": "ffn_gate",
    "mlp.up_proj": "ffn_up",
    "mlp.down_proj": "ffn_down",
}


def convert_peft_lora(state_dict, peft_config: dict, out_path: str, arch: str = "llama") -> str:
    """PEFT LoRA state_dict -> zllm adapter GGUF.  Weights are stored
    pre-transposed for y = x @ A @ B ([K, r] and [r, N])."""
    from .loader import log  # noqa: F401
    from ..convert.hf import _npy, _permute_qk

    w = GGUFWriter(out_path)
    w.add("general.type", "adapter")
    w.add("adapter.type", "lora")
    w.add("general.architecture", arch)
    w.add("adapter.lora.alpha", float(peft_config.get("lora_alpha", 16)))
    w.add("adapter.lora.rank", int(peft_config.get("r", 8)))

    n_head = peft_config.get("_n_head")  # needed to permute q/k B for llama
    n_kv = peft_config.get("_n_kv_head", n_head)

    for name, t in state_dict.items():
        if ".lora_A.weight" not in name and ".lora_B.weight" not in name:
            continue
        is_a = ".lora_A.weight" in name
        core = name.split("model.layers.")[1]
        il = int(core.split(".")[0])
        proj = ".".join(core.split(".")[1:3])
        suffix = _HF_TO_SUFFIX[proj]
        x = _npy(t)  # A: [r, K]; B: [N, r]
        if is_a:
            data = np.ascontiguousarray(x.T)  # [K, r]
            out_name = f"blk.{il}.{suffix}.lora_a"
        else:
            if arch == "llama" and suffix in ("attn_q", "attn_k") and n_head:
                x = _permute_qk(x, n_head if suffix == "attn_q" else n_kv)
            data = np.ascontiguousarray(x.T)  # [r, N]
            out_name = f"blk.{il}.{suffix}.lora_b"
        w.add_tensor(out_name, data.astype(np.float32))
    w.write()
    return out_path


def load_lora(model, path: str, scale: float = 1.0):
    """Attach a LoRA adapter GGUF to a loaded model (in place).  The delta
    runs at inference via lora_linear; `scale` multiplies the adapter's
    alpha/rank scaling (reference llama_adapter_lora_set_scale)."""
    import jax.numpy as jnp

    f = read_gguf(path)
    if f.kv("general.type") != "adapter" or f.kv("adapter.type") != "lora":
        raise ValueError(f"{path}: not a LoRA adapter GGUF")
    alpha = float(f.kv("adapter.lora.alpha", 16.0))
    rank = int(f.kv("adapter.lora.rank", 8))
    eff = scale * alpha / rank

    pairs: dict[tuple[int, str], dict] = {}
    for name, meta in f.tensors.items():
        if not name.startswith("blk."):
            continue
        _, il_s, suffix, ab = name.split(".")
        key = _SUFFIX_TO_KEY.get(suffix)
        if key is None:
            continue
        pairs.setdefault((int(il_s), key), {})[ab] = jnp.asarray(f.tensor_f32(name))

    # hot-loaded adapters may target projections that were fused at load
    # time (wqkv / ffn_gateup) — undo the fusion so the per-projection
    # delta applies cleanly
    fused_targets = {k for (_, k) in pairs} & {"wq", "wk", "wv", "ffn_gate", "ffn_up"}
    if fused_targets and any(
        "wqkv" in l or "ffn_gateup" in l for l in model.params["layers"]
    ):
        from .loader import unfuse_projections

        model.params = unfuse_projections(model.params, model.cfg)

    # adapter GGUFs are in the on-disk norm-rope basis; when the model was
    # load-time permuted to neox (loader.rope_to_neox) the q/k delta's
    # OUTPUT columns must cross bases with it — permute lora_b the same way
    # wq/wk were (lora_a contracts the unchanged input basis; untouched)
    neox = bool(getattr(model.cfg, "neox_permuted", False))
    if neox:
        from .loader import neox_head_perm

    n = 0
    for (il, key), ab in pairs.items():
        if "lora_a" in ab and "lora_b" in ab:
            b = ab["lora_b"]
            if neox and key in ("wq", "wk"):
                b = b[..., neox_head_perm(int(b.shape[-1]), model.cfg.head_dim)]
            model.params["layers"][il][key + ".lora"] = (ab["lora_a"], b, eff)
            n += 1
    f.close()
    return n


def clear_lora(model):
    for layer in model.params["layers"]:
        for key in [k for k in layer if k.endswith(".lora")]:
            del layer[key]


def load_cvector(model, path: str, scale: float = 1.0, il_start: int = 1, il_end: int = 10**9):
    """Attach a control-vector GGUF (reference: llama_apply_adapter_cvec,
    src/llama-adapter.cpp + common/control-vector): tensors direction.{il}
    add `scale * v` to layer il's residual stream output within
    [il_start, il_end]."""
    import jax.numpy as jnp

    f = read_gguf(path)
    n = 0
    for name in f.tensors:
        if not name.startswith("direction."):
            continue
        il = int(name.split(".")[1])
        if il_start <= il <= il_end and il < len(model.params["layers"]):
            v = f.tensor_f32(name) * scale
            model.params["layers"][il]["cvec"] = jnp.asarray(v, jnp.float32)
            n += 1
    f.close()
    return n


def clear_cvector(model):
    for layer in model.params["layers"]:
        layer.pop("cvec", None)
