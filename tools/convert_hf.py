"""HF checkpoint directory -> GGUF (reference: convert_hf_to_gguf.py).

Usage:
    python tools/convert_hf.py /path/to/hf-model -o model.gguf [--gtype F16]

Reads config.json + *.safetensors (single or index-sharded) + tokenizer
files (tokenizer.model sentencepiece or tokenizer.json BPE) lazily and
writes one GGUF.  Quantize afterwards with tools/quantize.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from zllm.gguf.constants import GGMLType  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("model_dir", help="HF model directory")
    ap.add_argument("-o", "--out", required=True, help="output GGUF path")
    ap.add_argument(
        "--gtype", default="F16",
        help="storage type for matmul weights (F32/F16/Q8_0/...)",
    )
    ap.add_argument("--arch", default=None, help="override GGUF architecture name")
    args = ap.parse_args(argv)

    from zllm.convert.from_disk import convert_hf_dir

    gtype = GGMLType[args.gtype.upper()]
    out = convert_hf_dir(args.model_dir, args.out, gtype=gtype, arch=args.arch)
    size = os.path.getsize(out)
    print(f"wrote {out} ({size / 1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
