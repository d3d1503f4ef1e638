"""Full Q4_K decode matvec with the N-major packed-byte dual-dot layout
(pairing column c with c+N/2 so the [2, N/2] output reshapes to original
order for FREE) + the in-kernel activation-quant prologue, vs the current
unpack kernel.  Exactness vs f64 oracle; device time via profiler."""

import functools
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zllm.gguf.constants import GGMLType
from zllm.ops import qmatmul as qmm
from zllm.quant import blocks as qb
from zllm.quant.repack import repack

K, N = 2048, 2048
GROUP = 32
TK, TN = 512, 2048
GT = TK // GROUP


def npack_kernel(tk, tn, x_ref, a_lo_ref, a_hi_ref, b_lo_ref, b_hi_ref,
                 qs_ref, out_ref):
    gt = tk // GROUP
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # in-kernel activation quant + block-diagonal spread (same as qmatmul)
    xf = x_ref[:].astype(jnp.float32)  # [1, tk]
    rows = jax.lax.broadcasted_iota(jnp.int32, (gt, tk), 0)
    gid = jax.lax.broadcasted_iota(jnp.int32, (gt, tk), 1) // GROUP
    xm = jnp.where(rows == gid, jnp.broadcast_to(xf, (gt, tk)), 0.0)
    dx = jnp.maximum(jnp.max(jnp.abs(xm), axis=1, keepdims=True) / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(xm / dx), -127, 127).astype(jnp.int32)
    e = dx * jnp.sum(xq, axis=1, keepdims=True).astype(jnp.float32)
    sx = jnp.sum(xq, axis=1, keepdims=True)  # [gt, 1] int32
    x_bd = xq.astype(jnp.int8)

    bp = qs_ref[:]  # int8 [tk, tn/2], (lo | hi<<4) ^ 0x80
    lo = pltpu.bitcast(pltpu.bitcast(bp, jnp.uint8) & 0x0F, jnp.int8)
    pi_full = jax.lax.dot_general(
        x_bd, bp, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    pi_lo = jax.lax.dot_general(
        x_bd, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    pi_hi = (pi_full - pi_lo + 128 * sx) >> 4

    a_lo = qmm._fp16_bits_to_f32(a_lo_ref[:])
    a_hi = qmm._fp16_bits_to_f32(a_hi_ref[:])
    c_lo = pi_lo.astype(jnp.float32) * a_lo * dx - qmm._fp16_bits_to_f32(b_lo_ref[:]) * e
    c_hi = pi_hi.astype(jnp.float32) * a_hi * dx - qmm._fp16_bits_to_f32(b_hi_ref[:]) * e
    out_ref[0:1, :] += jnp.sum(c_lo, axis=0, keepdims=True)
    out_ref[1:2, :] += jnp.sum(c_hi, axis=0, keepdims=True)


def build_npack(qt):
    """Rebuild Q4_K planes in npack layout from the dequantized codes."""
    # decode integer codes + scales from the planar QTensor
    qs = np.asarray(qt.planes["qs"])  # [K/2, N] split-half fold packing
    fold = qt.fold
    kh, n = qs.shape
    g = qs.reshape(kh // (fold // 2), fold // 2, n)
    codes = np.concatenate([g & 0xF, g >> 4], axis=1).reshape(K, N)  # [K, N]
    bp = ((codes[:, : N // 2] | (codes[:, N // 2:] << 4)) ^ 0x80).astype(np.uint8)
    a = np.asarray(qt.planes["a"])  # [G, N] u16 bits
    b = np.asarray(qt.planes["b"])
    return (jnp.asarray(bp.view(np.int8)), jnp.asarray(a[:, : N // 2]),
            jnp.asarray(a[:, N // 2:]), jnp.asarray(b[:, : N // 2]),
            jnp.asarray(b[:, N // 2:]))


def main():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((K, N)).astype(np.float32)
    raw = qb.quantize(w.T.copy(), GGMLType.Q4_K)  # row-major [N, K] blocks
    qt = repack(raw, (N, K), GGMLType.Q4_K)
    x = rng.standard_normal((1, K)).astype(np.float32)

    # oracle: current kernel
    y_ref = np.asarray(qmm.qmatmul_w4a8(jnp.asarray(x), qt))

    bp, a_lo, a_hi, b_lo, b_hi = build_npack(qt)
    gk = K // GROUP

    @jax.jit
    def f_np(x, a_lo, a_hi, b_lo, b_hi, bp):
        out2 = pl.pallas_call(
            functools.partial(npack_kernel, TK, TN),
            grid=(N // TN, K // TK),
            in_specs=[
                pl.BlockSpec((1, TK), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((GT, TN // 2), lambda i, j: (j, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((GT, TN // 2), lambda i, j: (j, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((GT, TN // 2), lambda i, j: (j, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((GT, TN // 2), lambda i, j: (j, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((TK, TN // 2), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2, TN // 2), lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, N // 2), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(x, a_lo, a_hi, b_lo, b_hi, bp)
        return out2.reshape(1, N)

    try:
        y_np = np.asarray(f_np(jnp.asarray(x), a_lo, a_hi, b_lo, b_hi, bp))
    except Exception as e:
        print("npack FAILED:", type(e).__name__, str(e)[:400])
        return
    err = np.max(np.abs(y_np - y_ref)) / max(1e-9, np.max(np.abs(y_ref)))
    print("npack rel err vs current kernel:", err)

    import glob
    import gzip
    import json
    import tempfile

    iters = 300
    xj = jnp.asarray(x)
    cases = [
        ("npack_q4k", lambda: f_np(xj, a_lo, a_hi, b_lo, b_hi, bp)),
        ("current_q4k", lambda: qmm.qmatmul_w4a8(xj, qt)),
    ]
    for name, fn in cases:
        jax.block_until_ready(fn())
        logdir = tempfile.mkdtemp()
        with jax.profiler.trace(logdir):
            y = None
            for _ in range(iters):
                y = fn()
            jax.block_until_ready(y)
            _ = float(jnp.asarray(y).sum())
        durs = []
        for path in glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                              recursive=True):
            with gzip.open(path, "rt") as fh:
                tr = json.load(fh)
            for ev in tr.get("traceEvents", []):
                nm = ev.get("name", "")
                if (ev.get("ph") == "X" and ev.get("dur")
                        and (nm.startswith("jit_") or "fusion" in nm)):
                    durs.append((nm, ev["dur"]))
        agg = {}
        for nm, d in durs:
            agg.setdefault(nm, []).append(d)
        tot = 0.0
        for nm, ds in sorted(agg.items(), key=lambda kv: -sum(kv[1])):
            if len(ds) >= iters // 2:
                tot += float(np.mean(sorted(ds)[: int(len(ds) * 0.9)]))
        print(f"  {name:14s} {tot:8.2f} us/call (sum of hot kernels)")
    print("HBM bound:", round(K * N / 2 / 819e9 * 1e6, 2), "us (qs only)",
          round((K * N / 2 + 2 * 2 * (K // 32) * N) / 819e9 * 1e6, 2),
          "us (qs+scales)")


if __name__ == "__main__":
    main()
