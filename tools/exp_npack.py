"""Prototype the N-major packed-byte dual-dot decode kernel.

Idea: pack nibbles along N (byte at [k, c] = q[k, c] | q[k, c+N/2]<<4,
stored XOR 0x80 so the int8 view is lo + 16*hi - 128 exactly), so BOTH
nibbles of a byte multiply the SAME activation x[k]:

  pi_full = dot(x_bd, b')            # int8 MXU, [gt, TN/2]
  lo      = b' & 0x0F                # ONE u8 bitwise op per byte
  pi_lo   = dot(x_bd, lo)
  pi_hi   = (pi_full - pi_lo + 128*sx) >> 4     # exact int32
  out     = concat([pi_lo, pi_hi], axis=1)      # n order restored

vs the current kernel's i32 widen+shift+mask unpack (~3.3 VPU slots/byte).
Measures device time via profiler and checks exactness vs the unpack path.
"""

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

K, N = 2048, 2048
TK, TN = 512, 2048
GROUP = 32
GT = TK // GROUP


def kernel_npack(x_ref, qs_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xbd = x_ref[:]  # int8 [GT, TK] block-diagonal activation codes
    bp = qs_ref[:]  # int8 [TK, TN//2] = lo + 16*hi - 128
    lo = pltpu.bitcast(pltpu.bitcast(bp, jnp.uint8) & 0x0F, jnp.int8)
    pi_full = jax.lax.dot_general(
        xbd, bp, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    pi_lo = jax.lax.dot_general(
        xbd, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    sx = jnp.sum(xbd.astype(jnp.int32), axis=1, keepdims=True)  # [GT, 1]
    pi_hi = (pi_full - pi_lo + 128 * sx) >> 4
    pi = jnp.concatenate([pi_lo, pi_hi], axis=1)  # [GT, TN]
    out_ref[:] += jnp.sum(pi.astype(jnp.float32), axis=0, keepdims=True)


def kernel_unpack(x_ref, qs_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xbd = x_ref[:]  # [GT, TK]
    g = qs_ref[:].astype(jnp.int32)  # [TK//2, TN]
    qi = jnp.concatenate([(g & 0xF), (g >> 4)], axis=0).astype(jnp.int8)
    pi = jax.lax.dot_general(
        xbd, qi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    out_ref[:] += jnp.sum(pi.astype(jnp.float32), axis=0, keepdims=True)


def main():
    rng = np.random.default_rng(0)
    q = rng.integers(0, 16, (K, N), np.uint8)  # unsigned nibble codes
    xq = rng.integers(-127, 128, (1, K), np.int8)

    # block-diagonal x per k-tile: [GT, TK] per j step -> build full [GT, K]
    xbd = np.zeros((GT, K), np.int8)
    for j in range(K // TK):
        for g in range(GT):
            s = j * TK + g * GROUP
            xbd[g, s : s + GROUP] = xq[0, s : s + GROUP]
    # oracle: per (j, g) group sums -> total y[n] = sum over all k
    want = (xq[0].astype(np.int64)[:, None] * q.astype(np.int64)).sum(0)

    # npack plane: byte[k, c] = q[k, c] | q[k, c+N/2]<<4, XOR 0x80
    bp = ((q[:, : N // 2] | (q[:, N // 2 :] << 4)) ^ 0x80).view(np.int8)
    # split-half plane (current layout): byte[r, n] = q[r] | q[r+fold/2]<<4
    fold = 256
    qr = q.reshape(K // fold, 2, fold // 2, N)
    sp = (qr[:, 0] | (qr[:, 1] << 4)).reshape(K // 2, N)

    def call(kern, qs, qspec):
        @jax.jit
        def f(x, qs):
            return pl.pallas_call(
                kern,
                grid=(N // TN, K // TK),
                in_specs=[
                    pl.BlockSpec((GT, TK), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                    qspec,
                ],
                out_specs=pl.BlockSpec((1, TN), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")
                ),
            )(x, qs)

        return f

    f_np = call(
        kernel_npack, jnp.asarray(bp),
        pl.BlockSpec((TK, TN // 2), lambda i, j: (j, i), memory_space=pltpu.VMEM),
    )
    f_up = call(
        kernel_unpack, jnp.asarray(sp),
        pl.BlockSpec((TK // 2, TN), lambda i, j: (j, i), memory_space=pltpu.VMEM),
    )
    xbd_j = jnp.asarray(xbd)
    try:
        y_np = np.asarray(f_np(xbd_j, jnp.asarray(bp)))[0]
        print("npack: runs; exact:", np.array_equal(y_np.astype(np.int64), want))
    except Exception as e:
        print("npack FAILED:", type(e).__name__, str(e)[:300])
        return
    y_up = np.asarray(f_up(xbd_j, jnp.asarray(sp)))[0]
    print("unpack oracle exact:", np.array_equal(y_up.astype(np.int64), want))

    import collections, glob, gzip, json, re, tempfile

    iters = 300
    logdir = tempfile.mkdtemp()
    fs = {"npack": (f_np, jnp.asarray(bp)), "unpack": (f_up, jnp.asarray(sp))}
    with jax.profiler.trace(logdir):
        for v, (f, qs) in fs.items():
            y = None
            for _ in range(iters):
                y = f(xbd_j, qs)
            float(jnp.sum(y))
    tr = sorted(glob.glob(os.path.join(logdir, "**", "*trace.json.gz"), recursive=True))[-1]
    with gzip.open(tr) as fobj:
        data = json.load(fobj)
    events = data.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg, cnt = collections.Counter(), collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
            base = re.sub(r"\.\d+$", "", e["name"])
            agg[base] += e.get("dur", 0)
            cnt[base] += 1
    for name, us in agg.most_common(8):
        print(f"{us/max(cnt[name],1):8.2f} us/call x{cnt[name]:5d}  {name[:90]}")
    print(f"HBM bound for {K*N//2} bytes: {K*N/2/819e9*1e6:.2f} us")


if __name__ == "__main__":
    main()
