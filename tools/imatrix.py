#!/usr/bin/env python
"""Importance-matrix collection.

The analogue of llama-imatrix (reference: tools/imatrix/imatrix.cpp
collect_imatrix via the eval callback): runs a calibration corpus and
accumulates per-input-column mean squares of every matmul's activations.
Output GGUF uses the reference's naming: "<tensor>.in_sum2" f32[K] and
"<tensor>.counts" f32[1], consumed by tools/quantize.py --imatrix.

Usage: python tools/imatrix.py MODEL.gguf corpus.txt out.imatrix.gguf [--ctx 512]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def collect_imatrix(model, token_ids, n_ctx: int = 512, batch: int = 2, progress=True):
    import jax
    import jax.numpy as jnp

    from zllm.models.llama import forward

    cfg = model.cfg

    @jax.jit
    def chunk_taps(params, toks, positions):
        taps: dict = {}
        forward(params, cfg, toks, positions, None, taps=taps)
        # mean over batch x tokens of x^2, per input column
        return {k: jnp.sum(v.astype(jnp.float32) ** 2, axis=(0, 1)) for k, v in taps.items()}

    ids = np.asarray(token_ids, dtype=np.int32)
    n_chunks = max(len(ids) // n_ctx, 1)
    sums: dict[str, np.ndarray] = {}
    counts: dict[str, float] = {}
    positions = np.broadcast_to(np.arange(n_ctx, dtype=np.int32), (batch, n_ctx))

    for start in range(0, n_chunks, batch):
        nb = min(batch, n_chunks - start)
        toks = np.zeros((batch, n_ctx), dtype=np.int32)
        for j in range(nb):
            o = (start + j) * n_ctx
            toks[j] = ids[o : o + n_ctx] if o + n_ctx <= len(ids) else 0
        out = chunk_taps(model.params, jnp.asarray(toks), jnp.asarray(positions))
        for name, s in out.items():
            s = np.asarray(s)
            if name not in sums:
                sums[name] = s.copy()
                counts[name] = 0.0
            else:
                sums[name] += s
            counts[name] += batch * n_ctx
        if progress:
            print(f"[{start + nb}/{n_chunks}] chunks", file=sys.stderr)
    return sums, counts


def write_imatrix(path: str, model_path: str, sums: dict, counts: dict):
    from zllm.gguf.writer import GGUFWriter

    w = GGUFWriter(path)
    w.add("general.type", "imatrix")
    w.add("imatrix.datasets", ["zllm"])
    w.add("imatrix.chunk_size", 512)
    w.add("general.base_model", model_path)
    for name, s in sums.items():
        w.add_tensor(name + ".in_sum2", s.astype(np.float32))
        w.add_tensor(name + ".counts", np.asarray([counts[name]], np.float32))
    w.write()


def read_imatrix(path: str) -> dict[str, np.ndarray]:
    """-> {tensor_name: mean-square weights f32[K]}"""
    from zllm.gguf.reader import read_gguf

    f = read_gguf(path)
    out = {}
    for name in f.tensors:
        if name.endswith(".in_sum2"):
            base = name[: -len(".in_sum2")]
            s = f.tensor_f32(name)
            cnt = f.tensor_f32(base + ".counts")[0] if base + ".counts" in f.tensors else 1.0
            out[base] = s / max(cnt, 1.0)
    f.close()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("corpus")
    ap.add_argument("output")
    ap.add_argument("--ctx", type=int, default=512)
    args = ap.parse_args()

    import jax.numpy as jnp

    from zllm.models.loader import Model

    m = Model.load(args.model, quantized=True, dtype=jnp.bfloat16)
    with open(args.corpus, encoding="utf-8") as fh:
        ids = m.tokenizer.encode(fh.read(), add_special=True)
    sums, counts = collect_imatrix(m, ids, n_ctx=args.ctx)
    write_imatrix(args.output, args.model, sums, counts)
    print(f"wrote {len(sums)} tensors to {args.output}")


if __name__ == "__main__":
    main()
