"""Dispatch/device overlap experiment for the decode loop.

Discriminates WHERE the per-step decode time goes through this image's
TPU tunnel:
  - per-call dispatch latency distribution (does an enqueue RPC block
    until the previous step completes, or does it return early?)
  - drained wall-clock per step (the bench number)
  - a two-stream interleave (independent KV caches): if enqueue and
    device execution overlap, two streams approach 2x the single-stream
    rate; if the tunnel serializes at the device, they stay at 1x.

This decides whether decode perf work should target device time (kernel
bytes) or dispatch amortization (multi-token graphs).
"""

import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        cache_dir = os.path.join(REPO, ".cache", "jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from zllm.models.llama import forward
    from zllm.models.loader import Model
    from zllm.ops import qmatmul
    from zllm.runtime.kvcache import KVCache

    qmatmul.install()
    gguf = os.environ.get(
        "ZLLM_BENCH_GGUF", os.path.join(REPO, ".cache", "bench_tinyllama_q4k.gguf")
    )
    m = Model.load(gguf, quantized=True, dtype=jnp.bfloat16)
    cfg = m.cfg
    batch, max_len, pp = 1, 1024, 512
    kv = KVCache.create(cfg.n_layers, batch, max_len, cfg.n_kv_heads, cfg.head_dim, jnp.bfloat16)

    @jax.jit
    def prefill_step(params, tokens, positions, kv):
        logits, kv = forward(params, cfg, tokens, positions, kv, logits_for="last")
        return logits, kv

    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, pp)).astype(np.int32))
    pos = jnp.asarray(np.broadcast_to(np.arange(pp, dtype=np.int32), (batch, pp)))
    logits, kv0 = prefill_step(m.params, toks, pos, kv)
    float(jnp.sum(logits))

    @functools.partial(jax.jit, donate_argnums=(3,))
    def decode_step(params, tok, positions, kv):
        logits, kv = forward(params, cfg, tok, positions, kv, logits_for="last")
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32).reshape(batch, 1)
        return nxt, positions + 1, kv

    def fresh(seed):
        rng = np.random.default_rng(seed)
        return (
            jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, 1)).astype(np.int32)),
            jnp.full((batch, 1), pp, jnp.int32),
            jax.tree.map(jnp.copy, kv0),
        )

    # warmup/compile
    tok, p, kvv = fresh(0)
    for _ in range(4):
        tok, p, kvv = decode_step(m.params, tok, p, kvv)
    int(tok[0, 0])

    n = 64
    # --- 1. per-call dispatch latency ---
    tok, p, kvv = fresh(1)
    lat = []
    t_all0 = time.perf_counter()
    for _ in range(n):
        t0 = time.perf_counter()
        tok, p, kvv = decode_step(m.params, tok, p, kvv)
        lat.append((time.perf_counter() - t0) * 1e3)
    t_loop = time.perf_counter() - t_all0
    int(tok[0, 0])
    t_drain = time.perf_counter() - t_all0
    lat_s = sorted(lat)
    print(
        f"single: loop {t_loop/n*1e3:.3f} ms/step, drained {t_drain/n*1e3:.3f} ms/step\n"
        f"  dispatch lat ms p10={lat_s[n//10]:.3f} p50={lat_s[n//2]:.3f} "
        f"p90={lat_s[9*n//10]:.3f} max={lat_s[-1]:.3f}"
    )

    # --- 2. two independent streams, interleaved dispatch ---
    s1, s2 = fresh(2), fresh(3)
    t0 = time.perf_counter()
    for _ in range(n):
        s1 = decode_step(m.params, *s1)
        s2 = decode_step(m.params, *s2)
    int(s1[0][0, 0]), int(s2[0][0, 0])
    dt = time.perf_counter() - t0
    print(f"two-stream: {2*n/dt:.1f} tok/s total, {dt/n*1e3:.3f} ms per pair "
          f"(1x-serial would be {2*t_drain/n*1e3:.3f} ms)")


if __name__ == "__main__":
    main()
