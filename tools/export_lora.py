"""Merge a LoRA adapter GGUF into a base model GGUF (reference:
tools/export-lora — W' = W + scale * B^T A^T per targeted tensor; output
is a standalone dense model)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zllm.gguf.constants import GGMLType
from zllm.gguf.reader import read_gguf
from zllm.gguf.writer import GGUFWriter
from zllm.models.adapter import _SUFFIX_TO_KEY  # suffix -> params key map
from zllm.quant import blocks as qb

_KEY_TO_SUFFIX = {v: k for k, v in _SUFFIX_TO_KEY.items()}


def export_lora(base_path: str, lora_path: str, out_path: str, scale: float = 1.0,
                gtype: GGMLType = GGMLType.F16) -> str:
    base = read_gguf(base_path)
    lora = read_gguf(lora_path)
    if lora.kv("adapter.type") != "lora":
        raise ValueError(f"{lora_path}: not a LoRA adapter GGUF")
    alpha = float(lora.kv("adapter.lora.alpha", 16.0))
    rank = int(lora.kv("adapter.lora.rank", 8))
    eff = scale * alpha / rank

    # collect adapter deltas keyed by base tensor name
    deltas: dict[str, dict] = {}
    for name in lora.tensors:
        if name.endswith(".lora_a") or name.endswith(".lora_b"):
            stem, ab = name.rsplit(".", 1)
            deltas.setdefault(stem + ".weight", {})[ab] = lora.tensor_f32(name)

    w = GGUFWriter(out_path)
    for k, v in base.metadata.items():
        w.add(k, v)
    n_merged = 0
    for name, meta in base.tensors.items():
        if name in deltas and "lora_a" in deltas[name] and "lora_b" in deltas[name]:
            a, b = deltas[name]["lora_a"], deltas[name]["lora_b"]  # [K, r], [r, N]
            x = base.tensor_f32(name)  # GGUF [N, K]
            x = x + eff * (a @ b).T.astype(np.float32)
            t = gtype
            blk, _ = qb.GGML_BLOCK_SIZES[t]
            if x.shape[-1] % blk != 0:
                t = GGMLType.F32
            if t == GGMLType.F32:
                w.add_tensor(name, x.astype(np.float32))
            else:
                w.add_tensor(name, qb.quantize(x, t), logical_shape=x.shape, gtype=t)
            n_merged += 1
        else:
            w.add_tensor(name, base.tensor_bytes(name), logical_shape=meta.shape, gtype=meta.gtype)
    w.write()
    base.close()
    lora.close()
    print(f"merged {n_merged} tensors -> {out_path}")
    return out_path


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("base")
    ap.add_argument("lora")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--outtype", default="f16", choices=["f32", "f16", "q8_0"])
    args = ap.parse_args()
    gt = {"f32": GGMLType.F32, "f16": GGMLType.F16, "q8_0": GGMLType.Q8_0}[args.outtype]
    export_lora(args.base, args.lora, args.output, args.scale, gt)


if __name__ == "__main__":
    main()
