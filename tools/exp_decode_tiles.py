"""Full-model decode A/B over tile-table configs, interleaved in ONE
process (the only protocol that survives this image's tunnel noise).
Each config re-traces the decode step with its own (TN, TK) statics via
qtune._table; winner is written to .cache/qmm_tiles.json with --save."""

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

# candidate tables: (K, N) -> (tn, tk, fuse)
CONFIGS = {
    "builtin": {},  # whatever qtune resolves today
    "wide-tk": {
        ("Q4_K", 2048, 2560): (512, 2048, 1),
        ("Q4_K", 2048, 2048): (256, 2048, 1),
        ("Q4_K", 2048, 11264): (512, 2048, 1),
        ("Q4_K", 5632, 2048): (1024, 512, 1),
    },
    "wide-tn": {
        ("Q4_K", 2048, 2560): (2560, 256, 1),
        ("Q4_K", 2048, 2048): (1024, 1024, 1),
        ("Q4_K", 2048, 11264): (11264, 256, 1),
        ("Q4_K", 5632, 2048): (2048, 256, 1),
    },
    "mixed": {
        ("Q4_K", 2048, 2560): (2560, 512, 1),
        ("Q4_K", 2048, 2048): (1024, 2048, 1),
        ("Q4_K", 2048, 11264): (1024, 1024, 1),
        ("Q4_K", 5632, 2048): (2048, 512, 1),
    },
}


def main():
    from zllm.gguf.constants import GGMLType
    from zllm.models.llama import forward
    from zllm.models.loader import Model
    from zllm.ops import qmatmul, qtune
    from zllm.runtime.kvcache import KVCache
    from zllm.testing import make_llama_gguf

    qmatmul.install()
    cache = os.path.join(REPO, ".cache", "bench_tinyllama_q4k.gguf")
    if not os.path.exists(cache):
        from bench import SHAPE

        make_llama_gguf(cache, gtype=GGMLType.Q4_K, **SHAPE)
    m = Model.load(cache, quantized=True, dtype=jnp.bfloat16)
    cfg = m.cfg
    batch, max_len = 1, 1024
    rng = np.random.default_rng(0)

    state = {}
    base = dict(qtune._load())
    for name, overrides in CONFIGS.items():
        qtune._table = {**base, **overrides}

        # fresh jit per config: tile statics differ (closure tag busts the
        # jit cache across configs)
        def make(tag):
            @functools.partial(jax.jit, donate_argnums=(3,), static_argnums=(4,))
            def step(params, tok, positions, kv, _tag):
                logits, kv = forward(params, cfg, tok, positions, kv, logits_for="last")
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32).reshape(batch, 1)
                return nxt, positions + 1, kv

            return lambda p, t, q, kv: step(p, t, q, kv, tag)

        fn = make(name)
        kv = KVCache.create(cfg.n_layers, batch, max_len, cfg.n_kv_heads,
                            cfg.head_dim, jnp.bfloat16)
        tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, 1)).astype(np.int32))
        pos = jnp.full((batch, 1), 64, jnp.int32)
        for _ in range(8):
            tok, pos, kv = fn(m.params, tok, pos, kv)
        int(tok[0, 0])
        state[name] = [fn, tok, pos, kv, []]
        print(f"compiled {name}", file=sys.stderr)
    qtune._table = base

    n = 128
    for _ in range(4):
        for name, st in state.items():
            fn, tok, pos, kv, times = st
            t0 = time.perf_counter()
            for _ in range(n):
                tok, pos, kv = fn(m.params, tok, pos, kv)
            int(tok[0, 0])
            times.append((time.perf_counter() - t0) / n)
            st[1], st[2], st[3] = tok, pos, kv

    results = {}
    for name, st in state.items():
        best = min(st[4])
        results[name] = best
        print(f"{name:10s} best {best*1e3:.3f} ms/step = {1/best:.1f} tok/s "
              f"(rounds {[f'{t*1e3:.2f}' for t in st[4]]})")
    winner = min(results, key=results.get)
    print("winner:", winner)
    if "--save" in sys.argv and winner != "builtin":
        qtune.save(CONFIGS[winner])
        print("saved", CONFIGS[winner])


if __name__ == "__main__":
    main()
