"""Prefill-shape (M=512) per-op timing: where does MXU time go?

For each QTensor matmul shape in the bench model, times at M tokens:
  fused — the Pallas dequant-tile kernel (_qmm_call, current path)
  dense — XLA dequant-then-matmul (x @ qt.dequant(bf16))
  bf16  — XLA matmul against a pre-dequantized weight (MXU ceiling)
Then times one full prefill step and reports the attention+norms residue.
"""

import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MXU_TFLOPS = float(os.environ.get("ZLLM_MXU_TFLOPS", "197"))


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
    from zllm.quant.repack import QTensor
    from zllm.runtime.kvcache import KVCache

    qmatmul.install()
    gguf = os.environ.get(
        "ZLLM_BENCH_GGUF", os.path.join(REPO, ".cache", "bench_tinyllama_q4k.gguf")
    )
    m = Model.load(gguf, quantized=True, dtype=jnp.bfloat16)
    cfg = m.cfg
    M = int(os.environ.get("ZLLM_EXP_M", "512"))

    shapes = {}
    def walk(tree):
        if isinstance(tree, QTensor):
            k, n = qmatmul.local_shape(tree)
            key = (tree.fmt.name, k, n)
            shapes[key] = (tree, shapes.get(key, (None, 0))[1] + 1)
            return
        if isinstance(tree, dict):
            for v in tree.values():
                walk(v)
        elif isinstance(tree, (list, tuple)):
            for v in tree:
                walk(v)
    walk(m.params)

    rng = np.random.default_rng(0)
    reps = int(os.environ.get("ZLLM_EXP_REPS", "20"))

    def bench(fn, *args):
        float(jnp.sum(fn(*args, 1)))
        float(jnp.sum(fn(*args, reps)))
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args, reps)))
        base = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args, 1)))
        ovh = time.perf_counter() - t0
        return max(base - ovh, 1e-9) / (reps - 1)

    print(f"M={M}  {'fmt':6s} {'K':>6s} {'N':>6s} {'cnt':>3s} "
          f"{'fused us':>9s} {'dense us':>9s} {'bf16 us':>8s} {'%MXU(fused)':>11s}")
    tot_fused = tot_dense = tot_bf16 = 0.0
    for (fmt, k, n), (qt, cnt) in sorted(shapes.items(), key=lambda e: -e[0][1] * e[0][2]):
        x = jnp.asarray(rng.standard_normal((M, k)).astype(np.float32)).astype(jnp.bfloat16)
        wd = qt.dequant(jnp.bfloat16)

        @functools.partial(jax.jit, static_argnames=("n_iter",))
        def loop_fused(x, qt, n_iter):
            def body(_, c):
                x, acc = c
                y = qmatmul.qmatmul(x, qt)
                s = jnp.sum(y[0, :8])
                return x * (1.0 + 1e-30 * s).astype(x.dtype), acc + s
            x, acc = jax.lax.fori_loop(0, n_iter, body, (x, jnp.float32(0)))
            return acc

        @functools.partial(jax.jit, static_argnames=("n_iter",))
        def loop_dense(x, qt, n_iter):
            def body(_, c):
                x, acc = c
                y = x @ qt.dequant(jnp.bfloat16)
                s = jnp.sum(y[0, :8].astype(jnp.float32))
                return x * (1.0 + 1e-30 * s).astype(x.dtype), acc + s
            x, acc = jax.lax.fori_loop(0, n_iter, body, (x, jnp.float32(0)))
            return acc

        @functools.partial(jax.jit, static_argnames=("n_iter",))
        def loop_bf16(x, w, n_iter):
            def body(_, c):
                x, acc = c
                y = x @ w
                s = jnp.sum(y[0, :8].astype(jnp.float32))
                return x * (1.0 + 1e-30 * s).astype(x.dtype), acc + s
            x, acc = jax.lax.fori_loop(0, n_iter, body, (x, jnp.float32(0)))
            return acc

        tf = bench(loop_fused, x, qt)
        td = bench(loop_dense, x, qt)
        tb = bench(loop_bf16, x, wd)
        flops = 2 * M * k * n
        pct = 100 * flops / tf / (MXU_TFLOPS * 1e12)
        tot_fused += tf * cnt; tot_dense += td * cnt; tot_bf16 += tb * cnt
        print(f"      {fmt:6s} {k:6d} {n:6d} {cnt:3d} {tf*1e6:9.1f} {td*1e6:9.1f} "
              f"{tb*1e6:8.1f} {pct:10.1f}%")

    print(f"\nsum fused {tot_fused*1e3:.2f} ms   dense {tot_dense*1e3:.2f} ms   "
          f"bf16 {tot_bf16*1e3:.2f} ms")

    # full prefill step
    batch, max_len = 1, 1024
    kv = KVCache.create(cfg.n_layers, batch, max_len, cfg.n_kv_heads, cfg.head_dim, jnp.bfloat16)

    @jax.jit
    def prefill_step(params, tokens, positions, kv):
        return forward(params, cfg, tokens, positions, kv, logits_for="last")

    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, M)).astype(np.int32))
    pos = jnp.asarray(np.broadcast_to(np.arange(M, dtype=np.int32), (batch, M)))
    logits, _ = prefill_step(m.params, toks, pos, kv)
    float(jnp.sum(logits))
    t0 = time.perf_counter()
    n_it = 8
    for _ in range(n_it):
        logits, _ = prefill_step(m.params, toks, pos, kv)
    float(jnp.sum(logits))
    dt = (time.perf_counter() - t0) / n_it
    print(f"full prefill({M} tok): {dt*1e3:.2f} ms  ({M/dt:.0f} tok/s)")
    print(f"residue (attn+norm+rope+embed): {(dt-tot_fused)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
