"""Autotune (TN, TK) tiles for the fused W4A8 decode matvec kernels.

Sweeps the feasible tile grid (zllm.ops.qtune.candidates) for each decode
matvec shape of a model — either the shapes found in a GGUF file or an
explicit --shapes list — times each candidate on the attached device with
in-jit fori_loop serialization, and persists the winners to
.cache/qmm_tiles.json where qmatmul_w4a8 picks them up automatically.

The reference hand-tunes the same launch-config space per GPU arch with
template specializations (ggml/src/ggml-cuda/mmq.cuh); here the optimum
is measured per shape on the actual TPU because achieved HBM bandwidth
swings 2-4x with tiling (see zllm/ops/qtune.py).

Usage:
  python tools/tune_tiles.py model.gguf               # shapes from model
  python tools/tune_tiles.py --fmt Q4_K --shapes 2048x2560,2048x11264
"""

import argparse
import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def model_shapes(path):
    """Distinct (fmt, K, N) of W4A8-eligible 2-D tensors in a GGUF file."""
    from zllm.gguf.reader import read_gguf
    from zllm.ops.qmatmul import _INT_FMT

    shapes = {}
    r = read_gguf(path)
    for t in r.tensors.values():
        if len(t.shape) == 2 and t.gtype in _INT_FMT:
            n, k = int(t.shape[0]), int(t.shape[1])  # numpy shape [N, K]
            shapes[(t.gtype, k, n)] = None
    return list(shapes)


def tune_shape(fmt, k, n, reps, hbm_gbps):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zllm.ops import qmatmul, qtune
    from zllm.quant import blocks as qb
    from zllm.quant.repack import repack

    from zllm.quant.repack import can_npack, to_npack

    rng = np.random.default_rng(0)
    w = rng.standard_normal((n, k)).astype(np.float32)
    qt = repack(qb.quantize(w, fmt), (n, k), fmt)
    if can_npack(qt):  # tune the layout the loader will actually serve
        qt = to_npack(qt)
    qbytes = sum(int(np.prod(p.shape)) * p.dtype.itemsize for p in qt.planes.values())
    group = qmatmul._INT_FMT[qt.fmt][0]
    x = jnp.asarray(rng.standard_normal((1, k)).astype(np.float32)).astype(jnp.bfloat16)
    planes_tuple = tuple(
        qmatmul._plane_view(qt, nm) for nm in qmatmul._PLANE_ORDER[qt.fmt]
    )

    @functools.partial(jax.jit, static_argnames=("tn", "tk", "fuse", "n_iter"))
    def loop_fn(x, planes_tuple, tn, tk, fuse, n_iter):
        xq0, dx0, e0 = qmatmul._quant_acts(x, group)

        def body(_, carry):
            xq, acc = carry
            if qt.npack:
                y = qmatmul._qmm_w4a8np_call(
                    x, None, planes_tuple,
                    fmt=qt.fmt, fold=qt.fold, k=k, n=n, tn=tn, tk=tk, fuse="q",
                )
            elif fuse:
                y = qmatmul._qmm_w4a8_call(
                    x, None, None, None, planes_tuple,
                    fmt=qt.fmt, fold=qt.fold, k=k, n=n, tn=tn, tk=tk, fuse="q",
                )
            else:
                y = qmatmul._qmm_w4a8_call(
                    xq, dx0, e0, None, planes_tuple,
                    fmt=qt.fmt, fold=qt.fold, k=k, n=n, tn=tn, tk=tk,
                )
            s = jnp.sum(y[0, :8])
            return xq * (1 + (s > 1e30).astype(jnp.int8)), acc + s

        _, acc = jax.lax.fori_loop(0, n_iter, body, (xq0, jnp.float32(0)))
        return acc

    # the device tunnel in this image can stall or ack early; a single
    # differenced pair is not trustworthy.  Take the min of several rounds
    # and reject physically impossible readings (faster than 1.5x the HBM
    # speed-of-light for the quantized bytes).
    floor = qbytes / (1.5 * hbm_gbps * 1e9)

    def timed(tn, tk, fuse, rounds=3):
        float(loop_fn(x, planes_tuple, tn, tk, fuse, 1))  # compile
        float(loop_fn(x, planes_tuple, tn, tk, fuse, reps))  # warm
        best = None
        for _ in range(rounds):
            t0 = time.perf_counter()
            float(loop_fn(x, planes_tuple, tn, tk, fuse, 2 * reps))
            t1 = time.perf_counter()
            float(loop_fn(x, planes_tuple, tn, tk, fuse, reps))
            t2 = time.perf_counter()
            dt = ((t1 - t0) - (t2 - t1)) / reps
            if dt >= floor and (best is None or dt < best):
                best = dt
        return best  # None if every round was noise

    kdiv = qmatmul._plane_kdiv(qt.fmt, qmatmul._PLANE_ORDER[qt.fmt][0])
    best, best_dt = None, None
    for tn, tk in qtune.candidates(k, n, qt.fold, kdiv):
        if qt.npack and tn < 256:  # packed tile needs >= 128 lanes
            continue
        for fuse in ((1,) if qt.npack else (0, 1)):
            try:
                dt = timed(tn, tk, bool(fuse))
            except Exception as ex:  # infeasible tiling (VMEM, layout)
                print(f"  tn={tn:5d} tk={tk:5d} fuse={fuse}: FAIL {type(ex).__name__}")
                continue
            if dt is None:
                print(f"  tn={tn:5d} tk={tk:5d} fuse={fuse}: NOISE (all rounds rejected)")
                continue
            gbs = qbytes / dt / 1e9
            mark = ""
            if best_dt is None or dt < best_dt:
                best, best_dt, mark = (tn, tk, fuse), dt, "  <- best"
            print(
                f"  tn={tn:5d} tk={tk:5d} fuse={fuse}: {dt*1e6:8.1f} us  {gbs:7.1f} GB/s"
                f"  {100*gbs/hbm_gbps:5.1f}%{mark}"
            )
    if best is not None:
        # confirm the winner: it must reproduce within 30% or we refuse to
        # persist a potentially noise-selected tile
        dt = timed(*best, rounds=4)
        if dt is None or dt > best_dt * 1.3:
            print(f"  winner {best} failed confirmation (dt={dt}); not saving")
            return None
    return best


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model", nargs="?", help="GGUF file to take shapes from")
    ap.add_argument("--fmt", default="Q4_K", help="format for --shapes")
    ap.add_argument("--shapes", help="comma list of KxN, e.g. 2048x2560,2048x11264")
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--hbm-gbps", type=float,
                    default=float(os.environ.get("ZLLM_HBM_GBPS", "819")))
    args = ap.parse_args()

    import jax

    try:
        cache_dir = os.path.join(REPO, ".cache", "jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from zllm.gguf.constants import GGMLType
    from zllm.ops import qtune

    if args.shapes:
        fmt = GGMLType[args.fmt]
        todo = [(fmt, *map(int, s.split("x"))) for s in args.shapes.split(",")]
    elif args.model:
        todo = model_shapes(args.model)
    else:
        ap.error("need a model path or --shapes")

    results = {}
    for fmt, k, n in todo:
        print(f"{fmt.name} K={k} N={n}")
        best = tune_shape(fmt, k, n, args.reps, args.hbm_gbps)
        if best:
            results[(fmt.name, k, n)] = best
    if results:
        path = qtune.save(results)
        print(f"saved {len(results)} entries -> {path}")


if __name__ == "__main__":
    main()
