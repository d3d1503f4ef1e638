"""Tile sweep for one decode matvec shape (finds pathological tilings).

Times _qmm_w4a8_call for a given (K, N) over a grid of (tn, tk-mult)
choices, all inside one process with in-jit fori_loop serialization.
"""

import functools
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

    from zllm.gguf.constants import GGMLType
    from zllm.ops import qmatmul
    from zllm.quant import blocks as qb
    from zllm.quant.repack import repack

    k = int(os.environ.get("ZLLM_EXP_K", "2048"))
    n = int(os.environ.get("ZLLM_EXP_N", "2560"))
    rng = np.random.default_rng(0)
    w = rng.standard_normal((n, k)).astype(np.float32)  # gguf row-major [N, K]
    raw = qb.quantize(w, GGMLType.Q4_K)
    qt = repack(raw, (n, k), GGMLType.Q4_K)
    qbytes = sum(int(np.prod(p.shape)) * p.dtype.itemsize for p in qt.planes.values())
    reps = int(os.environ.get("ZLLM_EXP_REPS", "100"))

    x = jnp.asarray(rng.standard_normal((1, k)).astype(np.float32)).astype(jnp.bfloat16)
    planes_tuple = tuple(qmatmul._plane_view(qt, nm) for nm in qmatmul._PLANE_ORDER[qt.fmt])
    group = qmatmul._INT_FMT[qt.fmt][0]

    noquant = os.environ.get("ZLLM_EXP_NOQUANT", "0") == "1"

    @functools.partial(jax.jit, static_argnames=("tn", "tk", "n_iter"))
    def loop_fn(x, planes_tuple, tn, tk, n_iter):
        if noquant:
            xq0, dx0, e0 = qmatmul._quant_acts(x, group)

            def body(_, carry):
                xq, acc = carry
                y = qmatmul._qmm_w4a8_call(
                    xq, dx0, e0, planes_tuple, fmt=qt.fmt, fold=qt.fold, k=k, n=n, tn=tn, tk=tk
                )
                s = jnp.sum(y[0, :8])
                pert = (1 + (s > 1e30).astype(jnp.int8))
                return xq * pert, acc + s

            xq, acc = jax.lax.fori_loop(0, n_iter, body, (xq0, jnp.float32(0)))
            return acc

        def body(_, carry):
            x, acc = carry
            xq, dx, e = qmatmul._quant_acts(x, group)
            y = qmatmul._qmm_w4a8_call(
                xq, dx, e, planes_tuple, fmt=qt.fmt, fold=qt.fold, k=k, n=n, tn=tn, tk=tk
            )
            s = jnp.sum(y[0, :8])
            return x * (1.0 + 1e-30 * s).astype(x.dtype), acc + s

        x, acc = jax.lax.fori_loop(0, n_iter, body, (x, jnp.float32(0)))
        return acc

    print(f"shape K={k} N={n} qbytes={qbytes/1e6:.2f}MB  ideal={qbytes/HBM_GBPS/1e3:.1f}us")
    tns = [t for t in (128, 256, 512, 1024, 2048, 4096, 8192, n) if n % t == 0 and t <= n]
    sel_tn = os.environ.get("ZLLM_EXP_TNS")
    if sel_tn:
        tns = [int(t) for t in sel_tn.split(",")]
    tks = [qt.fold * m for m in (1, 2, 4, 8, 16) if k % (qt.fold * m) == 0 and qt.fold * m <= k]
    for tn in dict.fromkeys(tns):
        for tk in tks:
            try:
                float(loop_fn(x, planes_tuple, tn, tk, 1))
                float(loop_fn(x, planes_tuple, tn, tk, reps))
                t0 = time.perf_counter()
                float(loop_fn(x, planes_tuple, tn, tk, reps))
                base = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(loop_fn(x, planes_tuple, tn, tk, 1))
                ovh = time.perf_counter() - t0
                dt = max(base - ovh, 1e-9) / (reps - 1)
                gbs = qbytes / dt / 1e9
                print(f"tn={tn:5d} tk={tk:5d}: {dt*1e6:8.1f} us  {gbs:7.1f} GB/s  {100*gbs/HBM_GBPS:5.1f}%")
            except Exception as ex:
                print(f"tn={tn:5d} tk={tk:5d}: FAIL {type(ex).__name__}: {str(ex)[:100]}")


if __name__ == "__main__":
    main()
