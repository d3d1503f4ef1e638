#!/usr/bin/env python
"""WikiText-2-style perplexity evaluation.

The analogue of the reference's llama-perplexity (reference:
tools/perplexity/perplexity.cpp:107-140 — chunked eval, nll accumulation
with running sigma).  Tokenizes a corpus, splits into n_ctx windows, runs
batched forwards with the second half of each window scored, and reports
PPL +- sigma.

Usage: python tools/perplexity.py MODEL.gguf corpus.txt [--ctx 512]
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def perplexity(model, token_ids, n_ctx: int = 512, batch: int = 4, progress=True):
    """Returns (ppl, ppl_err, n_scored). Scores the second half of every
    non-overlapping n_ctx window, like the reference default."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zllm.models.llama import forward

    cfg = model.cfg

    @jax.jit
    def chunk_logits(params, toks, positions):
        logits, _ = forward(params, cfg, toks, positions, None)
        return jax.nn.log_softmax(logits, axis=-1)

    ids = np.asarray(token_ids, dtype=np.int32)
    n_chunks = len(ids) // n_ctx
    if n_chunks == 0:
        raise ValueError(f"corpus too short: {len(ids)} tokens < n_ctx {n_ctx}")

    first = n_ctx // 2
    nll = 0.0
    nll2 = 0.0
    count = 0
    positions = np.broadcast_to(np.arange(n_ctx, dtype=np.int32), (batch, n_ctx))

    for start in range(0, n_chunks, batch):
        nb = min(batch, n_chunks - start)
        toks = np.zeros((batch, n_ctx), dtype=np.int32)
        for j in range(nb):
            toks[j] = ids[(start + j) * n_ctx : (start + j + 1) * n_ctx]
        logp = np.asarray(chunk_logits(model.params, jnp.asarray(toks), jnp.asarray(positions)))
        for j in range(nb):
            for t in range(first, n_ctx - 1):
                ll = float(logp[j, t, toks[j, t + 1]])
                nll -= ll
                nll2 += ll * ll
                count += 1
        if progress:
            ppl = math.exp(nll / count)
            print(f"[{start + nb}/{n_chunks}] ppl={ppl:.4f}", file=sys.stderr)

    mean = nll / count
    var = nll2 / count - mean * mean
    ppl = math.exp(mean)
    err = ppl * math.sqrt(var / count)
    return ppl, err, count


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("corpus")
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dense", action="store_true", help="dequantize weights at load")
    args = ap.parse_args()

    import jax.numpy as jnp

    from zllm.models.loader import Model

    m = Model.load(args.model, quantized=not args.dense, dtype=jnp.bfloat16)
    if m.tokenizer is None:
        raise SystemExit("model has no tokenizer")
    with open(args.corpus, encoding="utf-8") as fh:
        text = fh.read()
    ids = m.tokenizer.encode(text, add_special=True)
    print(f"{len(ids)} tokens", file=sys.stderr)

    ppl, err, n = perplexity(m, ids, n_ctx=args.ctx, batch=args.batch)
    print(f"PPL = {ppl:.4f} +/- {err:.4f}  ({n} tokens scored, ctx {args.ctx})")


if __name__ == "__main__":
    main()
