"""Sweep (TK, TN) for the N-major packed-byte dual-dot decode kernel and
the unpack kernel.  Wider TK raises the block-diagonal M (=TK/32) and with
it MXU utilization: at TK=2048 the dual-dot should sit at the HBM bound.
Device time via profiler (wall clock through the tunnel measures dispatch).
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, N = 2048, 2048
GROUP = 32


def kernel_npack(gt, x_ref, qs_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xbd = x_ref[:]
    bp = qs_ref[:]
    lo = pltpu.bitcast(pltpu.bitcast(bp, jnp.uint8) & 0x0F, jnp.int8)
    pi_full = jax.lax.dot_general(
        xbd, bp, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    pi_lo = jax.lax.dot_general(
        xbd, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    sx = jnp.sum(xbd.astype(jnp.int32), axis=1, keepdims=True)
    pi_hi = (pi_full - pi_lo + 128 * sx) >> 4
    pi = jnp.concatenate([pi_lo, pi_hi], axis=1)
    out_ref[:] += jnp.sum(pi.astype(jnp.float32), axis=0, keepdims=True)


def kernel_unpack(gt, x_ref, qs_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xbd = x_ref[:]
    g = qs_ref[:].astype(jnp.int32)
    qi = jnp.concatenate([(g & 0xF), (g >> 4)], axis=0).astype(jnp.int8)
    pi = jax.lax.dot_general(
        xbd, qi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    out_ref[:] += jnp.sum(pi.astype(jnp.float32), axis=0, keepdims=True)


def main():
    rng = np.random.default_rng(0)
    q = rng.integers(0, 16, (K, N), np.uint8)
    xq = rng.integers(-127, 128, (1, K), np.int8)
    want = (xq[0].astype(np.int64)[:, None] * q.astype(np.int64)).sum(0)

    bp = ((q[:, : N // 2] | (q[:, N // 2 :] << 4)) ^ 0x80).view(np.int8)
    fold = 256
    qr = q.reshape(K // fold, 2, fold // 2, N)
    sp = (qr[:, 0] | (qr[:, 1] << 4)).reshape(K // 2, N)

    cases = []
    for tk in (512, 1024, 2048):
        for tn in (1024, 2048):
            gt = tk // GROUP
            xbd = np.zeros((gt, K), np.int8)
            for j in range(K // tk):
                for g in range(gt):
                    s = j * tk + g * GROUP
                    xbd[g % gt, s : s + GROUP] = xq[0, s : s + GROUP]
            for kind in ("npack", "unpack"):
                if kind == "npack" and tn // 2 < 128:
                    continue

                def make(kind=kind, tk=tk, tn=tn, gt=gt):
                    kern = kernel_npack if kind == "npack" else kernel_unpack
                    if kind == "npack":
                        qspec = pl.BlockSpec((tk, tn // 2), lambda i, j: (j, i),
                                             memory_space=pltpu.VMEM)
                        qs = jnp.asarray(bp)
                    else:
                        qspec = pl.BlockSpec((tk // 2, tn), lambda i, j: (j, i),
                                             memory_space=pltpu.VMEM)
                        qs = jnp.asarray(sp)

                    import functools
                    @jax.jit
                    def f(x, qs):
                        return pl.pallas_call(
                            functools.partial(kern, gt),
                            grid=(N // tn, K // tk),
                            in_specs=[
                                pl.BlockSpec((gt, tk), lambda i, j: (0, j),
                                             memory_space=pltpu.VMEM),
                                qspec,
                            ],
                            out_specs=pl.BlockSpec((1, tn), lambda i, j: (0, i),
                                                   memory_space=pltpu.VMEM),
                            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
                            compiler_params=pltpu.CompilerParams(
                                dimension_semantics=("parallel", "arbitrary")),
                        )(x, qs)

                    return f, qs

                cases.append((f"{kind}_tk{tk}_tn{tn}", make, xbd))

    import glob
    import gzip
    import json
    import tempfile

    built = []
    for name, make, xbd in cases:
        try:
            f, qs = make()
            x = jnp.asarray(xbd)
            y = np.asarray(f(x, qs))[0]
            ok = np.array_equal(y.astype(np.int64), want)
            print(f"{name}: exact={ok}")
            built.append((name, f, x, qs))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:160]}")

    iters = 300
    for name, f, x, qs in built:
        logdir = tempfile.mkdtemp()
        # warm
        jax.block_until_ready(f(x, qs))
        with jax.profiler.trace(logdir):
            y = None
            for _ in range(iters):
                y = f(x, qs)
            jax.block_until_ready(y)
            _ = float(jnp.asarray(y).sum())  # fence
        durs = []
        for path in glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                              recursive=True):
            with gzip.open(path, "rt") as fh:
                tr = json.load(fh)
            for ev in tr.get("traceEvents", []):
                nm = ev.get("name", "")
                if ev.get("ph") == "X" and nm.startswith("jit_f") and ev.get("dur"):
                    durs.append(ev["dur"])
        durs = sorted(durs)[: max(1, int(len(durs) * 0.9))]  # trim tail noise
        print(f"  {name:22s} {np.mean(durs):8.2f} us/call x {len(durs)}")
    print("HBM bound for", K * N // 2, "bytes:",
          round(K * N / 2 / 819e9 * 1e6, 2), "us")


if __name__ == "__main__":
    main()
