#!/usr/bin/env python
"""Model (re)quantization tool.

The analogue of llama-quantize (reference: tools/quantize/quantize.cpp +
src/llama-quant.cpp): streams tensors from a source GGUF, picks a target
type per tensor with the reference's role-aware heuristics (embeddings /
output / attn_v get bumped types), quantizes, writes a new GGUF.

Usage: python tools/quantize.py IN.gguf OUT.gguf Q4_K_M [--threads N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from zllm.gguf.constants import GGML_BLOCK_SIZES, GGMLType
from zllm.gguf.reader import read_gguf
from zllm.gguf.writer import GGUFWriter
from zllm.quant import blocks as qb

# ftype presets: default type + per-role bumps (mirrors the reference's
# llama_tensor_get_type heuristics, src/llama-quant.cpp:178-360, simplified)
FTYPES = {
    "Q4_0": dict(default=GGMLType.Q4_0),
    "Q4_1": dict(default=GGMLType.Q4_1),
    "Q5_0": dict(default=GGMLType.Q5_0),
    "Q5_1": dict(default=GGMLType.Q5_1),
    "Q8_0": dict(default=GGMLType.Q8_0),
    "Q2_K": dict(default=GGMLType.Q2_K, attn_v=GGMLType.Q4_K, output=GGMLType.Q6_K),
    "Q3_K_M": dict(default=GGMLType.Q3_K, attn_v=GGMLType.Q5_K, output=GGMLType.Q6_K),
    "Q4_K_S": dict(default=GGMLType.Q4_K, output=GGMLType.Q6_K),
    "Q4_K_M": dict(default=GGMLType.Q4_K, attn_v=GGMLType.Q6_K, ffn_down_frac=(GGMLType.Q6_K, 0.5), output=GGMLType.Q6_K),
    "Q5_K_S": dict(default=GGMLType.Q5_K, output=GGMLType.Q6_K),
    "Q5_K_M": dict(default=GGMLType.Q5_K, attn_v=GGMLType.Q6_K, output=GGMLType.Q6_K),
    "Q6_K": dict(default=GGMLType.Q6_K),
    "IQ4_NL": dict(default=GGMLType.IQ4_NL, output=GGMLType.Q6_K),
    "IQ4_XS": dict(default=GGMLType.IQ4_XS, output=GGMLType.Q6_K),
    "MXFP4": dict(default=GGMLType.MXFP4, output=GGMLType.Q6_K),
    # sub-4-bit imatrix flagship formats (reference LLAMA_FTYPE_MOSTLY_IQ*,
    # src/llama-quant.cpp; encoders: zllm/quant/blocks.py IQ section)
    "IQ1_S": dict(default=GGMLType.IQ1_S, attn_v=GGMLType.Q4_K,
                  embd=GGMLType.Q2_K, output=GGMLType.Q5_K),
    "IQ1_M": dict(default=GGMLType.IQ1_M, attn_v=GGMLType.Q4_K,
                  embd=GGMLType.Q2_K, output=GGMLType.Q5_K),
    "IQ2_XXS": dict(default=GGMLType.IQ2_XXS, attn_v=GGMLType.Q4_K,
                    embd=GGMLType.Q2_K, output=GGMLType.Q5_K),
    "IQ2_XS": dict(default=GGMLType.IQ2_XS, attn_v=GGMLType.Q4_K,
                   embd=GGMLType.Q2_K, output=GGMLType.Q5_K),
    "IQ2_S": dict(default=GGMLType.IQ2_S, attn_v=GGMLType.Q4_K,
                  embd=GGMLType.Q2_K, output=GGMLType.Q5_K),
    "IQ3_XXS": dict(default=GGMLType.IQ3_XXS, attn_v=GGMLType.Q4_K,
                    output=GGMLType.Q5_K),
    "IQ3_S": dict(default=GGMLType.IQ3_S, attn_v=GGMLType.Q4_K,
                  output=GGMLType.Q5_K),
    "TQ1_0": dict(default=GGMLType.TQ1_0, output=GGMLType.Q6_K),
    "TQ2_0": dict(default=GGMLType.TQ2_0, output=GGMLType.Q6_K),
    "F16": dict(default=GGMLType.F16),
    "BF16": dict(default=GGMLType.BF16),
}


def pick_type(name: str, shape, il: int, n_layers: int, preset: dict) -> GGMLType:
    if len(shape) < 2:
        return GGMLType.F32  # norms/biases stay f32
    t = preset["default"]
    if name == "token_embd.weight":
        t = preset.get("embd", GGMLType.Q4_K if t not in (GGMLType.F16, GGMLType.BF16) else t)
    elif name == "output.weight":
        t = preset.get("output", t)
    elif ".attn_v.weight" in name:
        t = preset.get("attn_v", t)
    elif ".ffn_down" in name and "ffn_down_frac" in preset:
        bump, frac = preset["ffn_down_frac"]
        if il < int(n_layers * frac):
            t = bump
    blk, _ = GGML_BLOCK_SIZES[t]
    if shape[-1] % blk != 0:
        t = GGMLType.F16  # non-divisible rows fall back
    return t


def quantize_file(src: str, dst: str, ftype: str, imatrix: dict | None = None,
                  quiet: bool = False) -> dict:
    """Quantize GGUF src -> dst with the ftype preset's role-aware types.

    Returns per-tensor stats: {name: (src_type, dst_type, weighted_rmse)}
    where weighted_rmse is the imatrix-weighted RMS reconstruction error
    (plain RMS when no imatrix) of each re-quantized 2D tensor."""
    imatrix = imatrix or {}
    preset = FTYPES[ftype]
    f = read_gguf(src)
    n_layers = int(f.kv("{arch}.block_count".format(arch=f.architecture), 0))

    w = GGUFWriter(dst, alignment=f.alignment)
    for key, val in f.metadata.items():
        if key == "general.file_type":
            continue
        w.add(key, val)

    stats: dict = {}
    total_in = total_out = 0
    for name, meta in f.tensors.items():
        il = int(name.split(".")[1]) if name.startswith("blk.") else 0
        target = pick_type(name, meta.shape, il, n_layers, preset)
        if target == meta.gtype:
            raw = np.asarray(f.tensor_bytes(name))
            w.add_tensor(name, raw, logical_shape=meta.shape, gtype=meta.gtype)
            total_out += raw.nbytes
            stats[name] = (meta.gtype.name, target.name, 0.0)
        else:
            x = f.tensor_f32(name)
            if target in (GGMLType.F32,):
                w.add_tensor(name, x)
                total_out += x.nbytes
                stats[name] = (meta.gtype.name, target.name, 0.0)
            else:
                wt = imatrix.get(name)
                raw = qb.quantize(x, target, weights=wt)
                w.add_tensor(name, raw, logical_shape=meta.shape, gtype=target)
                total_out += raw.nbytes
                dec = qb.dequantize(raw, target).reshape(x.shape)
                err2 = (dec.astype(np.float64) - x.astype(np.float64)) ** 2
                if wt is not None:
                    wrow = np.asarray(wt, np.float64)
                    err2 = err2 * wrow / max(float(wrow.mean()), 1e-30)
                stats[name] = (meta.gtype.name, target.name, float(np.sqrt(err2.mean())))
        total_in += meta.nbytes
        if not quiet:
            print(f"{name}: {meta.gtype.name} -> {target.name}", file=sys.stderr)

    w.write()
    if not quiet:
        print(f"{src} ({total_in/1e6:.1f} MB) -> {dst} ({total_out/1e6:.1f} MB) [{ftype}]")
    f.close()
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("ftype", choices=sorted(FTYPES))
    ap.add_argument("--imatrix", default=None, help="importance matrix GGUF from tools/imatrix.py")
    args = ap.parse_args()

    imatrix = {}
    if args.imatrix:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from imatrix import read_imatrix

        imatrix = read_imatrix(args.imatrix)
        print(f"imatrix: {len(imatrix)} tensors", file=sys.stderr)

    quantize_file(args.src, args.dst, args.ftype, imatrix)


if __name__ == "__main__":
    main()
