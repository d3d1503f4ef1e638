"""A/B: fully-fused decode (attn_decode_qkv: in-kernel qkv split + rope +
insert + attend) vs the round-3 path (outside rope/split + attn_decode_update).

Interleaved in ONE process, round-robin (the only protocol that survives the
tunnel's dispatch-latency swings — see TODO.md).  Both variants are traced
explicitly under their env setting via .lower().compile() so the trace-time
env read in use_decode_qkv actually differentiates them.

Usage: python tools/exp_decode_qkv_ab.py [--8b] [rounds]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zllm.models.llama import forward
    from zllm.models.loader import Model
    from zllm.ops import qmatmul
    from zllm.runtime.kvcache import KVCache

    try:
        cache_dir = os.path.join(REPO, ".cache", "jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    qmatmul.install()
    geom = "8b" if "--8b" in sys.argv else "tinyllama"
    fname = {"tinyllama": "bench_tinyllama_q4k.gguf", "8b": "bench_8bshape_q4k.gguf"}[geom]
    path = os.path.join(REPO, ".cache", fname)
    if not os.path.exists(path):
        print(f"missing {path}; run bench.py first", file=sys.stderr)
        sys.exit(1)

    m = Model.load(path, quantized=True, dtype=jnp.bfloat16)
    cfg = m.cfg
    batch, max_len, pp = 1, 1024, 512
    rng = np.random.default_rng(0)

    unroll = int(os.environ.get("ZLLM_AB_UNROLL", "1"))

    def make_decode_fn():
        # fresh closure per variant: jax's global trace cache is keyed on
        # the function object, so reusing one function would serve the
        # FIRST variant's lowering to both (the env flag is read at trace)
        def decode_fn(params, tok, positions, kv):
            # ZLLM_AB_UNROLL>1 chains steps inside one dispatch, exposing
            # device-side deltas the tunnel's launch latency would hide
            for _ in range(unroll):
                logits, kv = forward(params, cfg, tok, positions, kv, logits_for="last")
                tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32).reshape(batch, 1)
                positions = positions + 1
            return tok, positions, kv
        return decode_fn

    tok0 = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, 1)).astype(np.int32))

    variants = {}
    for name, envval in (("old", "1"), ("new", "0")):
        os.environ["ZLLM_NO_DECODE_QKV"] = envval
        decode_fn = make_decode_fn()
        kv = KVCache.create(cfg.n_layers, batch, max_len, cfg.n_kv_heads,
                            cfg.head_dim, jnp.bfloat16)
        fn = jax.jit(decode_fn, donate_argnums=(3,))
        lowered = fn.lower(m.params, tok0, jnp.full((batch, 1), pp, jnp.int32), kv)
        compiled = lowered.compile()
        variants[name] = [compiled, tok0, jnp.full((batch, 1), pp, jnp.int32), kv]
        print(f"compiled {name}", file=sys.stderr)
    os.environ.pop("ZLLM_NO_DECODE_QKV", None)

    # warmup both
    for name, st in variants.items():
        fn = st[0]
        for _ in range(8):
            st[1], st[2], st[3] = fn(m.params, st[1], st[2], st[3])
        int(st[1][0, 0])

    rounds = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 8
    steps = max(1, 64 // unroll)
    times = {"old": [], "new": []}
    for r in range(rounds):
        for name, st in variants.items():
            fn = st[0]
            t0 = time.perf_counter()
            for _ in range(steps):
                st[1], st[2], st[3] = fn(m.params, st[1], st[2], st[3])
            int(st[1][0, 0])
            times[name].append((time.perf_counter() - t0) / (steps * unroll))
    for name in ("old", "new"):
        ts = np.array(times[name]) * 1e6
        print(f"{name}: best {ts.min():.0f}us  p50 {np.median(ts):.0f}us  "
              f"mean {ts.mean():.0f}us  ({1e6/ts.min():.1f} tok/s best)")
    sp = np.median(times["old"]) / np.median(times["new"])
    print(f"speedup (p50): {sp:.3f}x")


if __name__ == "__main__":
    main()
