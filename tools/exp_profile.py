"""Capture a jax.profiler trace of the bench model's decode / prefill
steps and print an aggregated per-kernel device-time table.

The TPU tunnel in this image adds ~ms-scale wall-clock noise; trace event
durations are measured on-device and are exact, so this is the honest way
to attribute step time (reference workflow analogue: nsys / ncu over
llama-bench).

Usage: python tools/exp_profile.py [decode|prefill] [pp]
"""

import collections
import functools
import gzip
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def aggregate(logdir: str, n_steps: int, top: int = 30):
    pdir = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(logdir)
        for f in fs
        if f.endswith("trace.json.gz")
    )[-1]
    with gzip.open(pdir) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
            name = e["name"]
            if name.startswith("jit_"):
                continue
            base = re.sub(r"\.\d+$", "", name)
            agg[base] += e.get("dur", 0)
            cnt[base] += 1
    tot = sum(agg.values())
    print(f"device total: {tot/n_steps:.1f} us/step")
    for name, us in agg.most_common(top):
        print(f"{us/n_steps:9.1f} us/step  x{cnt[name]/n_steps:6.1f}  {name[:100]}")
    return agg, cnt


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "decode"
    pp = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jax_cache"))
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
    batch, max_len = 1, 1024
    kv = KVCache.create(cfg.n_layers, batch, max_len, cfg.n_kv_heads, cfg.head_dim, jnp.bfloat16)
    rng = np.random.default_rng(0)
    logdir = f"/tmp/prof_{mode}"

    if mode == "prefill":
        @jax.jit
        def prefill_step(params, tokens, positions, kv):
            logits, kv = forward(params, cfg, tokens, positions, kv, logits_for="last")
            return logits, kv

        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, pp)).astype(np.int32))
        pos = jnp.asarray(np.broadcast_to(np.arange(pp, dtype=np.int32), (batch, pp)))
        logits, _ = prefill_step(m.params, toks, pos, kv)
        float(jnp.sum(logits))
        n = 8
        with jax.profiler.trace(logdir):
            for _ in range(n):
                logits, _ = prefill_step(m.params, toks, pos, kv)
                float(jnp.sum(logits))
    else:
        @functools.partial(jax.jit, donate_argnums=(3,))
        def decode_step(params, tok, positions, kv):
            logits, kv = forward(params, cfg, tok, positions, kv, logits_for="last")
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32).reshape(batch, 1)
            return nxt, positions + 1, kv

        tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, 1)).astype(np.int32))
        pos = jnp.full((batch, 1), pp, jnp.int32)
        for _ in range(8):
            tok, pos, kv = decode_step(m.params, tok, pos, kv)
        int(tok[0, 0])
        n = 32
        with jax.profiler.trace(logdir):
            for _ in range(n):
                tok, pos, kv = decode_step(m.params, tok, pos, kv)
            int(tok[0, 0])

    aggregate(logdir, n)


if __name__ == "__main__":
    main()
