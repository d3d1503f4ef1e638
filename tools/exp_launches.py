"""Decompose the decode step into (weight-matvec floor) + (glue cost).

Times three drained jitted programs on the bench model:
  matvecs — ONLY the 88 weight matvecs (qkv/o/gateup/down x 22), each on a
            fixed activation row: the HBM weight-read floor + 88 pallas
            launches of tunnel overhead
  matvecs+attn — adds the 22 fused decode-attention kernels
  full    — the real decode step (bench path)

full - matvecs+attn = the cost of the XLA glue kernels (norms, rope,
softmax-free adds, argmax...), i.e. what per-layer fusion could reclaim.
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
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from zllm.models.llama import forward
    from zllm.models.loader import Model
    from zllm.ops import qmatmul
    from zllm.ops.attention import attn_decode_update
    from zllm.runtime.kvcache import KVCache

    qmatmul.install()
    gguf = os.environ.get(
        "ZLLM_BENCH_GGUF", os.path.join(REPO, ".cache", "bench_tinyllama_q4k.gguf")
    )
    m = Model.load(gguf, quantized=True, dtype=jnp.bfloat16)
    cfg = m.cfg
    batch, max_len, pp = 1, 1024, 512
    kv0 = KVCache.create(cfg.n_layers, batch, max_len, cfg.n_kv_heads, cfg.head_dim, jnp.bfloat16)

    @jax.jit
    def matvecs_only(params, x):
        acc = jnp.zeros((1, cfg.n_embd), jnp.float32)
        from zllm.ops.linear import linear

        for layer in params["layers"]:
            q = linear(x, layer["wqkv"])
            o = linear(x, layer["wo"])
            gu = linear(x, layer["ffn_gateup"])
            xg = gu[..., : cfg.n_ff] * jax.nn.sigmoid(gu[..., : cfg.n_ff].astype(jnp.float32)).astype(gu.dtype) * gu[..., cfg.n_ff :]
            d = linear(xg.astype(jnp.bfloat16), layer["ffn_down"])
            acc = acc + d.astype(jnp.float32) + o.astype(jnp.float32) + jnp.sum(q).astype(jnp.float32)
        out = linear(x, params["output"])
        return acc[0, 0] + jnp.sum(out)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def matvecs_attn(params, x, kv, positions):
        acc = jnp.zeros((), jnp.float32)
        from zllm.ops.linear import linear

        scale = 1.0 / (cfg.head_dim**0.5)
        for il, layer in enumerate(params["layers"]):
            qkv = linear(x, layer["wqkv"])
            qd, kvd = cfg.q_dim, cfg.kv_dim
            q = qkv[..., :qd].reshape(batch, 1, -1, cfg.head_dim)
            k = qkv[..., qd : qd + kvd].reshape(batch, 1, -1, cfg.head_dim)
            v = qkv[..., qd + kvd :].reshape(batch, 1, -1, cfg.head_dim)
            att, kl, vl = attn_decode_update(
                q, k, v, kv.k[il], kv.v[il], positions, scale=scale
            )
            kv = kv.replace_layer(il, kl, vl)
            o = linear(att.reshape(batch, 1, -1), layer["wo"])
            gu = linear(x, layer["ffn_gateup"])
            xg = (gu[..., : cfg.n_ff] * gu[..., cfg.n_ff :]).astype(jnp.bfloat16)
            d = linear(xg, layer["ffn_down"])
            acc = acc + jnp.sum(d) + jnp.sum(o)
        out = linear(x, params["output"])
        return acc + jnp.sum(out), kv

    @functools.partial(jax.jit, donate_argnums=(3,))
    def full(params, tok, positions, kv):
        logits, kv = forward(params, cfg, tok, positions, kv, logits_for="last")
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32).reshape(batch, 1)
        return nxt, positions + 1, kv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 1, cfg.n_embd)).astype(np.float32)).astype(jnp.bfloat16)
    xr = x.reshape(1, cfg.n_embd)

    def timed(name, fn, *args, drain=lambda r: float(jnp.sum(r[0]) if isinstance(r, tuple) else r)):
        r = fn(*args)
        drain(r)
        best = float("inf")
        res = r
        for _ in range(6):
            t0 = time.perf_counter()
            res = fn(*args)
            drain(res)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:14s} {best*1e3:7.3f} ms")
        return res, best

    # NB: matvecs_only x must be [1, K] 2D for linear
    timed("matvecs", matvecs_only, m.params, xr, drain=lambda r: float(r))

    kv = jax.tree.map(jnp.copy, kv0)
    pos = jnp.full((batch, 1), pp, jnp.int32)
    # warm + time, re-donating kv each call
    r = matvecs_attn(m.params, x, kv, pos)
    float(r[0])
    best = float("inf")
    kvv = r[1]
    for _ in range(6):
        t0 = time.perf_counter()
        r = matvecs_attn(m.params, x, kvv, pos)
        float(r[0])
        kvv = r[1]
        best = min(best, time.perf_counter() - t0)
    print(f"{'matvecs+attn':14s} {best*1e3:7.3f} ms")

    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, 1)).astype(np.int32))
    kvv = jax.tree.map(jnp.copy, kv0)
    posd = jnp.full((batch, 1), pp, jnp.int32)
    state = (tok, posd, kvv)
    state = full(m.params, *state)
    int(state[0][0, 0])
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        state = full(m.params, *state)
        int(state[0][0, 0])
        best = min(best, time.perf_counter() - t0)
    print(f"{'full':14s} {best*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
