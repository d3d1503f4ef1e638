"""Probe Mosaic legality + device-time of nibble-unpack strategies for the
W4A8 decode kernel (device-exact via jax.profiler; wall-clock through the
TPU tunnel measures dispatch, not the kernel).

Variants (qs plane -> int8 [TK, TN] codes inside a matvec-shaped kernel):
  a) i32 widen + shift/mask + sublane concat   (current _unpack_nib)
  b) u8 bitwise & for lo + i32 path for hi + concat
  c) K-paired i16 view: plane stored as i16[KH/2, TN] pairing adjacent
     K byte-rows; mask/shift in i16; pltpu.bitcast doubles sublanes back
     to u8 [KH, TN] in k order -> concat as usual
  d) like c but no concat: two half-length dots (lo rows, hi rows)
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
KH = TK // 2


def _mk_kernel(variant):
    def kernel(x_ref, qs_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        x = x_ref[:]  # int8 [1, TK]
        xb = jnp.broadcast_to(x, (8, TK))
        if variant == "a":
            g = qs_ref[:].astype(jnp.int32)
            qi = jnp.concatenate([(g & 0xF), (g >> 4)], axis=0).astype(jnp.int8)
        elif variant == "b":
            qs = qs_ref[:]
            lo = pltpu.bitcast(qs & 0x0F, jnp.int8)
            hi = (qs.astype(jnp.int32) >> 4).astype(jnp.int8)
            qi = jnp.concatenate([lo, hi], axis=0)
        elif variant in ("c", "d"):
            v = qs_ref[:]  # i16 [KH//2, TN] pairing adjacent K byte-rows
            lo = pltpu.bitcast(v & 0x0F0F, jnp.int8)          # [KH, TN]
            hi = pltpu.bitcast((v >> 4) & 0x0F0F, jnp.int8)   # [KH, TN]
            if variant == "c":
                qi = jnp.concatenate([lo, hi], axis=0)
            else:
                plo = jax.lax.dot_general(
                    xb[:, :KH], lo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                phi = jax.lax.dot_general(
                    xb[:, KH:], hi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                out_ref[:] += (plo + phi).astype(jnp.float32)[:1]
                return
        pi = jax.lax.dot_general(
            xb, qi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        out_ref[:] += pi.astype(jnp.float32)[:1]

    return kernel


def build(variant, qs8):
    if variant in ("c", "d"):
        # pair adjacent K byte-rows into i16: v[r, c] = b(2r, c) | b(2r+1, c)<<8
        paired = (
            qs8.reshape(K // 2 // 2, 2, N).transpose(0, 2, 1).reshape(K // 4, N * 2)
        ).copy().view("<i2")  # [KH/2 * (K/TK), TN] overall: [K//4, N]
        qs = jnp.asarray(paired)
        spec = pl.BlockSpec((KH // 2, TN), lambda i, j: (j, i), memory_space=pltpu.VMEM)
    else:
        qs = jnp.asarray(qs8)
        spec = pl.BlockSpec((KH, TN), lambda i, j: (j, i), memory_space=pltpu.VMEM)

    @jax.jit
    def f(x, qs):
        return pl.pallas_call(
            _mk_kernel(variant),
            grid=(N // TN, K // TK),
            in_specs=[
                pl.BlockSpec((1, TK), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                spec,
            ],
            out_specs=pl.BlockSpec((1, TN), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")
            ),
        )(x, qs)

    return f, qs


def main():
    qs8 = np.random.randint(0, 255, (K // 2, N), np.uint8)
    x = jnp.asarray(np.random.randint(-127, 127, (1, K), np.int8))
    fs, want = {}, None
    for v in ("a", "b", "c", "d"):
        try:
            f, qs = build(v, qs8)
            y = np.asarray(f(x, qs))
            ok = True if want is None else np.array_equal(want, y)
            if want is None:
                want = y
            print(f"variant {v}: runs, matches_a={ok}")
            fs[v] = (f, qs)
        except Exception as e:
            print(f"variant {v}: FAILED: {type(e).__name__}: {str(e)[:250]}")

    # device-exact timing via profiler
    import collections, glob, gzip, json, re, tempfile

    iters = 300
    logdir = tempfile.mkdtemp()
    with jax.profiler.trace(logdir):
        for v, (f, qs) in fs.items():
            y = None
            for _ in range(iters):
                y = f(x, qs)
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
    for name, us in agg.most_common(12):
        print(f"{us/max(cnt[name],1):8.2f} us/call x{cnt[name]:5d}  {name[:80]}")


if __name__ == "__main__":
    main()
