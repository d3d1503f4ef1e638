"""Decode-throughput experiment harness (single process, interleaved A/B).

Measures tokens/s of decode-step dispatch variants on the bench model:
  eager   — one jitted step per host dispatch (current engine/bench path)
  unroll4/8/16 — k steps unrolled inside ONE jitted call (amortizes the
            host->device enqueue cost of this image's TPU tunnel)
  fori8   — k steps via lax.fori_loop (tests whether the loop carry copies
            that made lax.scan 20-25% slower also hit fori_loop)

Interleaves rounds across variants because tunnel throughput fluctuates
run-to-run (TODO.md quirks). Prints one line per variant.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import functools

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

    def one_step(params, tok, positions, kv):
        logits, kv = forward(params, cfg, tok, positions, kv, logits_for="last")
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32).reshape(batch, 1)
        return nxt, positions + 1, kv

    @functools.partial(jax.jit, donate_argnums=(3,))
    def step1(params, tok, positions, kv):
        return one_step(params, tok, positions, kv)

    def make_unroll(ksteps):
        @functools.partial(jax.jit, donate_argnums=(3,), static_argnums=(4,))
        def stepk(params, tok, positions, kv, k):
            for _ in range(k):
                tok, positions, kv = one_step(params, tok, positions, kv)
            return tok, positions, kv

        return lambda params, tok, positions, kv: stepk(params, tok, positions, kv, ksteps)

    def make_fori(ksteps):
        @functools.partial(jax.jit, donate_argnums=(3,))
        def stepk(params, tok, positions, kv):
            def body(_, carry):
                tok, positions, kv = carry
                return one_step(params, tok, positions, kv)

            return jax.lax.fori_loop(0, ksteps, body, (tok, positions, kv))

        return lambda params, tok, positions, kv: stepk(params, tok, positions, kv)

    variants = {
        "eager": (step1, 1),
        "unroll4": (make_unroll(4), 4),
        "unroll8": (make_unroll(8), 8),
        "unroll16": (make_unroll(16), 16),
        "fori8": (make_fori(8), 8),
    }
    sel = os.environ.get("ZLLM_EXP_VARIANTS")
    if sel:
        variants = {k: v for k, v in variants.items() if k in sel.split(",")}

    n_tokens = 128
    state = {}
    for name in variants:
        state[name] = (
            jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, 1)).astype(np.int32)),
            jnp.full((batch, 1), pp, jnp.int32),
            jax.tree.map(jnp.copy, kv0),
        )

    # warmup/compile each variant
    for name, (fn, k) in variants.items():
        tok, p, kvv = state[name]
        t0 = time.perf_counter()
        tok, p, kvv = fn(m.params, tok, p, kvv)
        int(tok[0, 0])
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        state[name] = (tok, p, kvv)

    results = {name: [] for name in variants}
    rounds = int(os.environ.get("ZLLM_EXP_ROUNDS", "4"))
    for r in range(rounds):
        for name, (fn, k) in variants.items():
            tok, p, kvv = state[name]
            n_disp = max(1, n_tokens // k)
            t0 = time.perf_counter()
            for _ in range(n_disp):
                tok, p, kvv = fn(m.params, tok, p, kvv)
            int(tok[0, 0])
            dt = time.perf_counter() - t0
            results[name].append(n_disp * k / dt)
            state[name] = (tok, p, kvv)

    for name, vals in results.items():
        best = max(vals)
        print(f"{name:9s} best {best:7.1f} tok/s  runs {[f'{v:.0f}' for v in vals]}")


if __name__ == "__main__":
    main()
