"""Paged vs contiguous decode-step device time (interleaved A/B in one
process — the only trustworthy protocol through this image's noisy TPU
tunnel).  Decides whether the paged layout can become the default."""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from zllm.gguf.constants import GGMLType
    from zllm.models.llama import forward
    from zllm.models.loader import Model
    from zllm.ops import qmatmul
    from zllm.runtime.kvcache import KVCache
    from zllm.runtime.paged import PagedKVCache
    from zllm.testing import make_llama_gguf

    qmatmul.install()
    cache = os.path.join(REPO, ".cache", "bench_tinyllama_q4k.gguf")
    if not os.path.exists(cache):
        from bench import SHAPE

        make_llama_gguf(cache, gtype=GGMLType.Q4_K, **SHAPE)
    m = Model.load(cache, quantized=True, dtype=jnp.bfloat16)
    cfg = m.cfg

    batch, max_len = 1, 1024
    kv_c = KVCache.create(cfg.n_layers, batch, max_len, cfg.n_kv_heads, cfg.head_dim, jnp.bfloat16)
    kv_p = PagedKVCache.create(cfg.n_layers, batch, max_len, cfg.n_kv_heads, cfg.head_dim,
                               jnp.bfloat16, page_size=128)

    import functools

    @functools.partial(jax.jit, donate_argnums=(3,))
    def step(params, tok, positions, kv):
        logits, kv = forward(params, cfg, tok, positions, kv, logits_for="last")
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32).reshape(batch, 1)
        return nxt, positions + 1, kv

    rng = np.random.default_rng(0)
    results = {}
    state = {}
    for name, kv in (("contig", kv_c), ("paged", kv_p)):
        tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, 1)).astype(np.int32))
        pos = jnp.full((batch, 1), 64, jnp.int32)
        for _ in range(8):
            tok, pos, kv = step(m.params, tok, pos, kv)
        int(tok[0, 0])
        state[name] = (tok, pos, kv)
        results[name] = []
    # interleave measurement rounds
    n = 128
    for _ in range(4):
        for name in ("contig", "paged"):
            tok, pos, kv = state[name]
            t0 = time.perf_counter()
            for _ in range(n):
                tok, pos, kv = step(m.params, tok, pos, kv)
            int(tok[0, 0])
            results[name].append((time.perf_counter() - t0) / n)
            state[name] = (tok, pos, kv)
    for name, ts in results.items():
        best = min(ts) * 1e3
        print(f"{name}: best {best:.3f} ms/step = {1/min(ts):.1f} tok/s "
              f"(rounds: {[f'{t*1e3:.2f}' for t in ts]})")


if __name__ == "__main__":
    main()
