"""Split / merge GGUF files (reference: tools/gguf-split — shards named
PREFIX-%05d-of-%05d.gguf carrying split.no / split.count /
split.tensors.count KVs; the loader reads shard sets transparently)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zllm.gguf.reader import SPLIT_PATTERN, read_gguf
from zllm.gguf.writer import GGUFWriter


def _parse_size(s: str) -> int:
    s = s.strip().upper()
    mult = 1
    if s.endswith("G"):
        mult, s = 1 << 30, s[:-1]
    elif s.endswith("M"):
        mult, s = 1 << 20, s[:-1]
    return int(float(s) * mult)


def split(path: str, prefix: str, max_tensors: int = 128, max_size: int = 0):
    f = read_gguf(path)
    names = list(f.tensors)
    groups: list[list[str]] = [[]]
    size = 0
    for name in names:
        nb = f.tensors[name].nbytes
        full = (max_size and size + nb > max_size and groups[-1]) or (
            not max_size and len(groups[-1]) >= max_tensors
        )
        if full:
            groups.append([])
            size = 0
        groups[-1].append(name)
        size += nb
    n = len(groups)
    outs = []
    for i, group in enumerate(groups):
        out = SPLIT_PATTERN.format(prefix=prefix, no=i + 1, count=n)
        w = GGUFWriter(out)
        if i == 0:  # metadata rides on the first shard
            for k, v in f.metadata.items():
                if not k.startswith("split."):
                    w.add(k, v)
        w.add("split.no", i)
        w.add("split.count", n)
        w.add("split.tensors.count", len(f.tensors))
        for name in group:
            meta = f.tensors[name]
            w.add_tensor(name, f.tensor_bytes(name), logical_shape=meta.shape, gtype=meta.gtype)
        w.write()
        outs.append(out)
        print(f"wrote {out} ({len(group)} tensors)")
    f.close()
    return outs


def merge(first_shard: str, out_path: str):
    f = read_gguf(first_shard)  # SplitGGUF: opens all siblings
    w = GGUFWriter(out_path)
    for k, v in f.metadata.items():
        if not k.startswith("split."):
            w.add(k, v)
    for name, meta in f.tensors.items():
        w.add_tensor(name, f.tensor_bytes(name), logical_shape=meta.shape, gtype=meta.gtype)
    w.write()
    f.close()
    print(f"wrote {out_path} ({len(f.tensors)} tensors)")
    return out_path


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input")
    ap.add_argument("output", help="split: output prefix; merge: output path")
    ap.add_argument("--merge", action="store_true")
    ap.add_argument("--split-max-tensors", type=int, default=128)
    ap.add_argument("--split-max-size", default="", help="e.g. 500M or 2G")
    args = ap.parse_args()
    if args.merge:
        merge(args.input, args.output)
    else:
        split(args.input, args.output, args.split_max_tensors,
              _parse_size(args.split_max_size) if args.split_max_size else 0)


if __name__ == "__main__":
    main()
