"""A/B: Q4_K diet scale layout (sm/sd/sb, exact in-kernel two-level
scales) vs the collapsed f32 a/b planes (q4k_to_ab).  Interleaved in one
process, round-robin, fresh closure per variant (trace-cache rule).

Usage: python tools/exp_q4k_diet_ab.py [rounds]   (ZLLM_AB_UNROLL chains
steps inside one dispatch to expose device-side deltas)
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
    from zllm.quant.repack import QTensor, QTensorE, q4k_to_ab
    from zllm.runtime.kvcache import KVCache

    try:
        cache_dir = os.path.join(REPO, ".cache", "jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    qmatmul.install()
    path = os.path.join(REPO, ".cache", "bench_tinyllama_q4k.gguf")
    if not os.path.exists(path):
        print(f"missing {path}; run bench.py first", file=sys.stderr)
        sys.exit(1)

    m = Model.load(path, quantized=True, dtype=jnp.bfloat16)
    cfg = m.cfg
    batch, max_len, pp = 1, 1024, 512
    rng = np.random.default_rng(0)
    unroll = int(os.environ.get("ZLLM_AB_UNROLL", "8"))

    ab_params = jax.tree_util.tree_map(
        lambda w: q4k_to_ab(w) if isinstance(w, QTensor) else w,
        m.params, is_leaf=lambda w: isinstance(w, (QTensor, QTensorE)),
    )

    def make_decode_fn():
        def decode_fn(params, tok, positions, kv):
            for _ in range(unroll):
                logits, kv = forward(params, cfg, tok, positions, kv, logits_for="last")
                tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32).reshape(batch, 1)
                positions = positions + 1
            return tok, positions, kv
        return decode_fn

    tok0 = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, 1)).astype(np.int32))

    variants = {}
    for name, params in (("diet", m.params), ("ab", ab_params)):
        decode_fn = make_decode_fn()
        kv = KVCache.create(cfg.n_layers, batch, max_len, cfg.n_kv_heads,
                            cfg.head_dim, jnp.bfloat16)
        fn = jax.jit(decode_fn, donate_argnums=(3,))
        compiled = fn.lower(params, tok0, jnp.full((batch, 1), pp, jnp.int32), kv).compile()
        variants[name] = [compiled, params, tok0, jnp.full((batch, 1), pp, jnp.int32), kv]
        print(f"compiled {name}", file=sys.stderr)

    for name, st in variants.items():
        for _ in range(4):
            st[2], st[3], st[4] = st[0](st[1], st[2], st[3], st[4])
        int(st[2][0, 0])

    rounds = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 8
    steps = max(1, 64 // unroll)
    times = {"diet": [], "ab": []}
    for r in range(rounds):
        for name, st in variants.items():
            t0 = time.perf_counter()
            for _ in range(steps):
                st[2], st[3], st[4] = st[0](st[1], st[2], st[3], st[4])
            int(st[2][0, 0])
            times[name].append((time.perf_counter() - t0) / (steps * unroll))
    for name in ("diet", "ab"):
        ts = np.array(times[name]) * 1e6
        print(f"{name}: best {ts.min():.0f}us  p50 {np.median(ts):.0f}us  "
              f"mean {ts.mean():.0f}us  ({1e6/ts.min():.1f} tok/s best)")
    sp = np.median(times["ab"]) / np.median(times["diet"])
    print(f"diet speedup vs ab (p50): {sp:.3f}x")


if __name__ == "__main__":
    main()
