"""A/B the HBM-pinned npack decode matvec vs the VMEM-blocked one on the
real TinyLlama decode shapes (per-kernel device time via profiler +
interleaved wall clock).  Round-5 follow-up to the round-4 profile that
showed 384 copy + 380 slice staging ops per decode step."""

import functools
import glob
import gzip
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from zllm.gguf.constants import GGMLType
from zllm.ops import qmatmul as qmm
from zllm.quant import blocks as qb
from zllm.quant.repack import repack, to_npack

SHAPES = [  # (K, N, tn, tk) from the qtune table (TinyLlama decode)
    (2048, 2560, 2560, 256),
    (2048, 2048, 1024, 1024),
    (2048, 11264, 11264, 256),
    (5632, 2048, 2048, 512),
    (2048, 32768, 8192, 512),
]


def main():
    rng = np.random.default_rng(0)
    for K, N, tn, tk in SHAPES:
        w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
        raw = qb.quantize(np.ascontiguousarray(w.T), GGMLType.Q4_K)
        qt = to_npack(repack(raw, (N, K), GGMLType.Q4_K))
        x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
        names = qmm._plane_names(qt)
        diet = names is qmm._Q4K_DIET
        pt = tuple(qmm._plane_view(qt, nm) for nm in names)
        kw = dict(fmt=qt.fmt, fold=qt.fold, k=K, n=N, tn=tn, tk=tk,
                  fuse="q", diet=diet)

        def f_old(x, _pt=pt, _kw=kw):
            return qmm._qmm_w4a8np_call(x, None, _pt, **_kw)

        def f_hbm(x, _pt=pt, _kw=kw):
            return qmm._qmm_w4a8np_hbm_call(x, None, _pt, **_kw)

        try:
            y0 = np.asarray(f_old(x))
            y1 = np.asarray(f_hbm(x))
        except Exception as e:
            print(f"K={K} N={N}: FAILED {type(e).__name__}: {str(e)[:300]}")
            continue
        err = np.max(np.abs(y1 - y0))
        hbm_bound_us = qt.nbytes / 819e9 * 1e6

        res = {}
        for name, fn in (("old", f_old), ("hbm", f_hbm)):
            jax.block_until_ready(fn(x))
            iters = 200
            logdir = tempfile.mkdtemp()
            with jax.profiler.trace(logdir):
                y = None
                for _ in range(iters):
                    y = fn(x)
                _ = float(jnp.sum(y))
            durs = []
            for path in glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                                  recursive=True):
                with gzip.open(path, "rt") as fh:
                    tr = json.load(fh)
                for ev in tr.get("traceEvents", []):
                    if ev.get("ph") == "X" and ev.get("dur") and \
                            "qmm" in ev.get("name", ""):
                        durs.append(ev["dur"])
            durs = sorted(durs)[: int(len(durs) * 0.9)] or [float("nan")]
            res[name] = float(np.mean(durs))
        print(f"K={K:6d} N={N:6d} tn={tn:5d} tk={tk:4d}  "
              f"old {res['old']:7.2f}us  hbm {res['hbm']:7.2f}us  "
              f"bound {hbm_bound_us:6.2f}us  maxdiff {err:g}")


if __name__ == "__main__":
    main()
