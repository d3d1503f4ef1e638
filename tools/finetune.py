#!/usr/bin/env python
"""Full-weight fine-tuning CLI.

The analogue of the reference's examples/training/finetune.cpp (backed by
ggml-opt.cpp AdamW full-graph backward): load a GGUF dense and unfused,
run optax AdamW epochs over a token stream, write the trained model back
as a GGUF (zllm.models.loader.save_params_gguf).  For adapter-only
training use --lora (exports a LoRA adapter GGUF via tools/export_lora
conventions instead of full weights).

Usage:
  python tools/finetune.py model.gguf --data corpus.txt --out tuned.gguf
  python tools/finetune.py model.gguf --tokens ids.txt --epochs 2 --lr 1e-4
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("--data", help="UTF-8 text file (model tokenizer)")
    ap.add_argument("--tokens", help="whitespace-separated token-id file")
    ap.add_argument("--out", default=None, help="output GGUF (default <model>.tuned.gguf)")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--seq-len", type=int, default=128)
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()

    import jax.numpy as jnp

    from zllm.models.loader import Model, save_params_gguf
    from zllm.training import Trainer

    m = Model.load(args.model, quantized=False, dtype=jnp.float32,
                   fuse=False, npack=False)
    if args.tokens:
        with open(args.tokens) as fh:
            ids = [int(t) for t in fh.read().split()]
    elif args.data:
        if m.tokenizer is None:
            ap.error("model has no tokenizer; pass --tokens")
        with open(args.data, encoding="utf-8") as fh:
            ids = m.tokenizer.encode(fh.read())
    else:
        ap.error("need --data or --tokens")

    tr = Trainer(m, lr=args.lr)
    losses = tr.fit(ids, seq_len=args.seq_len, batch=args.batch, epochs=args.epochs,
                    log=lambda i, l: print(f"step {i}: loss {l:.4f}", file=sys.stderr))
    out = args.out or (os.path.splitext(args.model)[0] + ".tuned.gguf")
    save_params_gguf(args.model, m.params, out, cfg=m.cfg)
    print(f"{len(losses)} steps, loss {losses[0]:.4f} -> {losses[-1]:.4f}; wrote {out}")


if __name__ == "__main__":
    main()
