#!/usr/bin/env python
"""Batched decode throughput matrix.

The analogue of llama-batched-bench (reference: tools/batched-bench):
prefill PP tokens into B parallel sequences, then measure aggregate decode
tokens/s at each batch size.  On TPU the per-weight-tile dequant cost is
amortized across the batch, so aggregate throughput grows until the MXU
or HBM saturates.

Usage: python tools/batched_bench.py [MODEL.gguf] [--pp 128 --tg 64 -b 1,4,8,16]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", nargs="?", default=os.path.join(REPO, ".cache", "bench_tinyllama_q4k.gguf"))
    ap.add_argument("--pp", type=int, default=128)
    ap.add_argument("--tg", type=int, default=64)
    ap.add_argument("-b", "--batches", default="1,4,8,16")
    ap.add_argument("--ctx", type=int, default=512)
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from zllm.models.llama import forward
    from zllm.models.loader import Model
    from zllm.runtime.kvcache import KVCache

    if not os.path.exists(args.model):
        from zllm.gguf.constants import GGMLType
        from zllm.testing import make_llama_gguf

        os.makedirs(os.path.dirname(args.model), exist_ok=True)
        make_llama_gguf(args.model, gtype=GGMLType.Q4_K, n_layers=22, n_embd=2048,
                        n_heads=32, n_kv_heads=4, n_ff=5632, vocab_size=32000)

    m = Model.load(args.model, quantized=True, dtype=jnp.bfloat16)
    cfg = m.cfg
    rng = np.random.default_rng(0)

    print(f"| B | PP | TG | S_PP t/s | S_TG t/s | T_total s |")
    print(f"|---|----|----|----------|----------|-----------|")
    for b in [int(x) for x in args.batches.split(",")]:
        kv = KVCache.create(cfg.n_layers, b, args.ctx, cfg.n_kv_heads, cfg.head_dim, jnp.bfloat16)

        @jax.jit
        def prefill(params, toks, pos, kv):
            lg, kv = forward(params, cfg, toks, pos, kv, logits_for="last")
            return lg, kv

        @functools.partial(jax.jit, donate_argnums=(3,))
        def step(params, tok, pos, kv):
            lg, kv = forward(params, cfg, tok, pos, kv, logits_for="last")
            nxt = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32).reshape(b, 1)
            return nxt, pos + 1, kv

        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, args.pp)).astype(np.int32))
        pos = jnp.asarray(np.broadcast_to(np.arange(args.pp, dtype=np.int32), (b, args.pp)))
        lg, kv = prefill(m.params, toks, pos, kv)
        float(jnp.sum(lg))  # compile + drain (tunnel-safe fence)

        kv2 = KVCache.create(cfg.n_layers, b, args.ctx, cfg.n_kv_heads, cfg.head_dim, jnp.bfloat16)
        t0 = time.perf_counter()
        lg, kv2 = prefill(m.params, toks, pos, kv2)
        float(jnp.sum(lg))
        t_pp = time.perf_counter() - t0

        tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, 1)).astype(np.int32))
        p = jnp.full((b, 1), args.pp, jnp.int32)
        tok, p, kv2 = step(m.params, tok, p, kv2)
        int(tok[0, 0])  # compile + drain
        t0 = time.perf_counter()
        for _ in range(args.tg):
            tok, p, kv2 = step(m.params, tok, p, kv2)
        int(tok[0, 0])
        t_tg = time.perf_counter() - t0

        s_pp = b * args.pp / t_pp
        s_tg = b * args.tg / t_tg
        print(f"| {b} | {args.pp} | {args.tg} | {s_pp:8.1f} | {s_tg:8.1f} | {t_pp + t_tg:9.2f} |", flush=True)


if __name__ == "__main__":
    main()
