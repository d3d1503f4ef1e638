"""Per-kernel decode-shape timing: which op is below the HBM roofline?

For each distinct QTensor matmul in the bench model (M=1 decode shape),
times the fused kernel standalone (enqueue a batch of calls, fence once)
and reports achieved GB/s vs the quantized-byte roofline.  Also times the
non-matmul residue (attention, norms, sampler) by differencing a full
step against the sum of matmul times.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HBM_GBPS = float(os.environ.get("ZLLM_HBM_GBPS", "819"))


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

    # collect distinct QTensor shapes (one representative each) + counts
    shapes = {}  # (fmt, k, n) -> (qt, count)
    def walk(tree, path=""):
        if isinstance(tree, QTensor):
            k, n = qmatmul.local_shape(tree)
            key = (tree.fmt.name, k, n)
            if key in shapes:
                shapes[key] = (shapes[key][0], shapes[key][1] + 1)
            else:
                shapes[key] = (tree, 1)
            return
        if isinstance(tree, dict):
            for kk, v in tree.items():
                walk(v, f"{path}/{kk}")
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                walk(v, f"{path}[{i}]")

    walk(m.params)

    rng = np.random.default_rng(0)
    reps = int(os.environ.get("ZLLM_EXP_REPS", "50"))

    def qbytes(qt):
        return sum(int(np.prod(p.shape)) * p.dtype.itemsize for p in qt.planes.values())

    import functools

    print(f"{'fmt':8s} {'K':>6s} {'N':>6s} {'cnt':>3s} {'us':>8s} {'GB/s':>7s} {'%roof':>6s}")
    total_mm = 0.0

    @functools.partial(jax.jit, static_argnames=("n_iter",))
    def loop_fn(x, qt, n_iter):
        # serialize n_iter kernel invocations via a scalar data dependency
        def body(_, carry):
            x, acc = carry
            y = qmatmul.qmatmul(x, qt)
            s = jnp.sum(y[0, :8])
            return x * (1.0 + 1e-30 * s.astype(jnp.float32)).astype(x.dtype), acc + s

        x, acc = jax.lax.fori_loop(0, n_iter, body, (x, jnp.float32(0)))
        return acc

    for (fmt, k, n), (qt, cnt) in sorted(shapes.items(), key=lambda e: -e[0][1] * e[0][2]):
        x = jnp.asarray(rng.standard_normal((1, k)).astype(np.float32)).astype(jnp.bfloat16)
        float(loop_fn(x, qt, 1))  # compile small
        float(loop_fn(x, qt, reps))  # compile big + warm
        t0 = time.perf_counter()
        float(loop_fn(x, qt, reps))
        base = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop_fn(x, qt, 1))
        overhead = time.perf_counter() - t0
        dt = max(base - overhead, 1e-9) / (reps - 1)
        gbs = qbytes(qt) / dt / 1e9
        roof = 100.0 * gbs / HBM_GBPS
        total_mm += dt * cnt
        print(f"{fmt:8s} {k:6d} {n:6d} {cnt:3d} {dt*1e6:8.1f} {gbs:7.1f} {roof:5.1f}%")

    # full step for the residue
    batch, max_len, pp = 1, 1024, 512
    kv = KVCache.create(cfg.n_layers, batch, max_len, cfg.n_kv_heads, cfg.head_dim, jnp.bfloat16)

    @jax.jit
    def prefill_step(params, tokens, positions, kv):
        return forward(params, cfg, tokens, positions, kv, logits_for="last")

    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, pp)).astype(np.int32))
    pos = jnp.asarray(np.broadcast_to(np.arange(pp, dtype=np.int32), (batch, pp)))
    logits, kv0 = prefill_step(m.params, toks, pos, kv)
    float(jnp.sum(logits))

    import functools

    @functools.partial(jax.jit, donate_argnums=(3,))
    def step1(params, tok, positions, kv):
        logits, kv = forward(params, cfg, tok, positions, kv, logits_for="last")
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32).reshape(batch, 1)
        return nxt, positions + 1, kv

    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, 1)).astype(np.int32))
    p = jnp.full((batch, 1), pp, jnp.int32)
    tok2, p2, kvv = step1(m.params, tok, p, kv0)
    int(tok2[0, 0])
    t0 = time.perf_counter()
    n_steps = 64
    for _ in range(n_steps):
        tok2, p2, kvv = step1(m.params, tok2, p2, kvv)
    int(tok2[0, 0])
    step_dt = (time.perf_counter() - t0) / n_steps
    print(f"\nfull step: {step_dt*1e6:8.1f} us  ({1.0/step_dt:.1f} tok/s)")
    print(f"sum of matmuls: {total_mm*1e6:8.1f} us")
    print(f"residue (attn+norms+sampler+dispatch): {(step_dt-total_mm)*1e6:8.1f} us")


if __name__ == "__main__":
    main()
