"""Fused dequant-matmul Pallas kernels.

The TPU replacement for the reference's Zyk/repack dequant-GEMM CPU
kernels (reference: ggml/src/ggml-cpu/arch/x86/repack.cpp:510-527
ggml_gemm_q4_0_trans_q8_0 etc.) and CUDA mmq/mmvq (ggml/src/ggml-cuda/
mmq.cu, mmvq.cu): weights stay bit-packed in HBM, each kernel grid step
DMAs a packed tile into VMEM, widens it to bf16 in registers applying the
per-group scales, and feeds the MXU — so HBM traffic stays at the
quantized byte-rate (the decode roofline) while the matmul runs at MXU
rate for prefill.

Grid: (N/TN, K/TK) with K innermost; the [M, TN] f32 output tile lives in
VMEM across the K sweep and accumulates partial dots.  TK equals the
QTensor `fold` so nibble/crumb unpacking is a concat along sublanes (see
zllm/quant/repack.py choose_fold).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gguf.constants import QK_K, GGMLType
from ..quant import blocks as qb
from ..quant.repack import QTensor

# plane name order per format (matches QTensor.tree_flatten's sorted keys)
_PLANE_ORDER = {
    GGMLType.Q4_0: ("qs", "d"),
    GGMLType.Q8_0: ("qs", "d"),
    GGMLType.MXFP4: ("qs", "e"),
    GGMLType.IQ4_NL: ("qs", "d"),
    GGMLType.IQ4_XS: ("qs", "a"),
    GGMLType.Q4_K: ("qs", "a", "b"),
    GGMLType.Q5_K: ("qs", "qh", "a", "b"),
    GGMLType.Q6_K: ("ql", "qh", "a"),
}

# rows-per-k of each plane: plane rows per k-tile = TK // kdiv
_PLANE_KDIV = {
    "qs": 2,  # packed nibbles (Q8_0 overrides to 1)
    "ql": 2,
    "qh": 8,  # Q5_K bit-plane; Q6_K crumbs override to 4
    "a": 32,  # fused per-group scales (Q6_K overrides to 16)
    "b": 32,
    "e": 32,
    "d": 32,
}


def _plane_kdiv(fmt: GGMLType, name: str) -> int:
    if fmt == GGMLType.Q8_0 and name == "qs":
        return 1
    if fmt == GGMLType.Q6_K:
        return {"ql": 2, "qh": 4, "a": 16}[name]
    return _PLANE_KDIV[name]


# ---------------------------------------------------------------------------
# in-kernel tile dequantizers: packed VMEM tiles -> bf16 [TK, TN]
# (shared with the fallback path via xp; written in plain jnp so they also
# run under the Pallas interpreter for CPU tests)
# ---------------------------------------------------------------------------

def _unpack_nib(qs, fold):
    half = fold // 2
    kh, n = qs.shape
    g = qs.astype(jnp.int32).reshape(kh // half, half, n)
    return jnp.concatenate([(g & 0xF), (g >> 4)], axis=1).reshape(kh * 2, n)


def _unpack_crumb(qh, fold):
    quart = fold // 4
    kq, n = qh.shape
    g = qh.astype(jnp.int32).reshape(kq // quart, quart, n)
    parts = [((g >> (2 * i)) & 0x3) for i in range(4)]
    return jnp.concatenate(parts, axis=1).reshape(kq * 4, n)


def _gexpand(s, group, tk, tn):
    """[TK//group, TN] per-group values -> [TK, TN] via broadcast+reshape."""
    return jnp.broadcast_to(s[:, None, :], (tk // group, group, tn)).reshape(tk, tn)


def _mxfp4_mag(idx):
    """|e2m1| value*2 as f32 from the low 3 bits (0,1,2,3,4,6,8,12)."""
    t = idx & 0x7
    lin = t.astype(jnp.float32)  # t<2: doubled value is t itself (0 or 1)
    m = (t & 1).astype(jnp.float32)
    e = (t >> 1) - 1
    # t>=2: doubled value = (2+m) * 2^(e-1):
    # t=2 -> 2, t=3 -> 3, t=4 -> 4, t=5 -> 6, t=6 -> 8, t=7 -> 12
    big = (2.0 + m) * jnp.exp2(e.astype(jnp.float32))
    return jnp.where(t < 2, lin, big)


def _iq4_lut(idx):
    """IQ4_NL codebook via arithmetic select chain (16 entries)."""
    vals = qb.IQ4NL_VALUES.astype(np.float32)
    out = jnp.full(idx.shape, vals[0], jnp.float32)
    for i in range(1, 16):
        out = jnp.where(idx == i, vals[i], out)
    return out


def _fp16_bits_to_f32(u16):
    """uint16 IEEE fp16 bits -> f32 via int32 math (Mosaic has no
    uint->float casts)."""
    u = u16.astype(jnp.int32)
    sign = (u >> 15) & 1
    exp = (u >> 10) & 0x1F
    mant = u & 0x3FF
    # normal: 2^(exp-15) * (1 + mant/1024); subnormal: 2^-14 * mant/1024
    norm = jnp.exp2(exp.astype(jnp.float32) - 15.0) * (1.0 + mant.astype(jnp.float32) / 1024.0)
    sub = 6.103515625e-05 * (mant.astype(jnp.float32) / 1024.0)  # 2**-14
    mag = jnp.where(exp == 0, sub, norm)
    return jnp.where(sign == 1, -mag, mag)


def _load_f16(ref_val):
    """fp16 plane tile -> f32; planes are stored as uint16 bit patterns."""
    if ref_val.dtype == jnp.float16:
        return ref_val.astype(jnp.float32)
    return _fp16_bits_to_f32(ref_val)


def _dequant_tile(fmt: GGMLType, fold: int, tk: int, tn: int, planes: dict):
    """Dequantize one [TK, TN] weight tile from packed VMEM tiles."""
    if fmt == GGMLType.Q4_0:
        q = _unpack_nib(planes["qs"], fold) - 8
        d = _gexpand(_load_f16(planes["d"]), 32, tk, tn)
        return q.astype(jnp.float32) * d
    if fmt == GGMLType.Q8_0:
        d = _gexpand(_load_f16(planes["d"]), 32, tk, tn)
        return planes["qs"].astype(jnp.float32) * d
    if fmt == GGMLType.MXFP4:
        idx = _unpack_nib(planes["qs"], fold)
        sign = jnp.where((idx & 0x8) != 0, -1.0, 1.0)
        mag = _mxfp4_mag(idx)
        e = planes["e"].astype(jnp.int32).astype(jnp.float32)
        # e8m0 half: 2^(e-127)/2 = 2^(e-128)
        d = _gexpand(jnp.exp2(e - 128.0), 32, tk, tn)
        return sign * mag * d
    if fmt == GGMLType.IQ4_NL:
        q = _iq4_lut(_unpack_nib(planes["qs"], fold))
        d = _gexpand(_load_f16(planes["d"]), 32, tk, tn)
        return q * d
    if fmt == GGMLType.IQ4_XS:
        q = _iq4_lut(_unpack_nib(planes["qs"], fold))
        a = _gexpand(_load_f16(planes["a"]), 32, tk, tn)
        return q * a
    if fmt == GGMLType.Q4_K:
        q = _unpack_nib(planes["qs"], fold).astype(jnp.float32)
        a = _gexpand(_load_f16(planes["a"]), 32, tk, tn)
        b = _gexpand(_load_f16(planes["b"]), 32, tk, tn)
        return q * a - b
    if fmt == GGMLType.Q5_K:
        lo = _unpack_nib(planes["qs"], fold)
        qh = planes["qh"].astype(jnp.int32)  # [TK//8, TN] bit-plane (k = 8r+i)
        q = (lo | (_q5k_bits(qh, tk, tn) << 4)).astype(jnp.float32)
        a = _gexpand(_load_f16(planes["a"]), 32, tk, tn)
        b = _gexpand(_load_f16(planes["b"]), 32, tk, tn)
        return q * a - b
    if fmt == GGMLType.Q6_K:
        lo = _unpack_nib(planes["ql"], fold)
        hi = _unpack_crumb(planes["qh"], fold)
        q = (lo | (hi << 4)).astype(jnp.float32) - 32.0
        a = _gexpand(_load_f16(planes["a"]), 16, tk, tn)
        return q * a
    raise NotImplementedError(fmt.name)


def _q5k_bits(qh, tk, tn):
    """Q5_K high-bit plane [TK//8, TN] (bit i of row r -> k = 8r+i) ->
    int32[TK, TN].  Interleaved layout needs a stack+reshape relayout."""
    parts = jnp.stack([((qh >> i) & 1) for i in range(8)], axis=1)  # [TK//8, 8, TN]
    return parts.reshape(tk, tn)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _qmm_kernel(fmt, fold, tk, tn, slice_rows, x_ref, *refs):
    out_ref = refs[-1]
    plane_refs = refs[:-1]
    names = _PLANE_ORDER[fmt]
    j = pl.program_id(1)
    planes = {}
    for nm, r, srows in zip(names, plane_refs, slice_rows):
        if srows is None:
            planes[nm] = r[:]  # k-blocked plane: block spec already sliced
        else:
            # full-K plane (tiny per-superblock scales): slice this k-step's
            # rows here because their per-tile row count breaks the (8, 128)
            # block-shape rule
            planes[nm] = r[pl.ds(j * srows, srows), :]

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    w = _dequant_tile(fmt, fold, tk, tn, planes).astype(jnp.bfloat16)
    out_ref[:] += jnp.dot(
        x_ref[:].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("fmt", "fold", "k", "n", "tn", "interpret"))
def _qmm_call(x, planes_tuple, *, fmt, fold, k, n, tn, interpret=False):
    import os as _os

    m = x.shape[0]
    tk = fold
    mult = int(_os.environ.get("ZLLM_QMM_TK_MULT", "2"))
    if mult > 1 and k % (fold * mult) == 0:
        tk = fold * mult
    names = _PLANE_ORDER[fmt]
    grid = (n // tn, k // tk)

    in_specs = [pl.BlockSpec((m, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM)]
    slice_rows = []
    for nm, arr in zip(names, planes_tuple):
        kdiv = _plane_kdiv(fmt, nm)
        rows = tk // kdiv
        if rows % 8 == 0:
            in_specs.append(
                pl.BlockSpec((rows, tn), lambda i, j: (j, i), memory_space=pltpu.VMEM)
            )
            slice_rows.append(None)
        else:
            # too few rows per k-step for a legal block: keep the whole
            # (small) K extent resident per N-tile and slice in-kernel
            in_specs.append(
                pl.BlockSpec((k // kdiv, tn), lambda i, j: (0, i), memory_space=pltpu.VMEM)
            )
            slice_rows.append(rows)

    kernel = functools.partial(_qmm_kernel, fmt, fold, tk, tn, tuple(slice_rows))
    flops = 2 * m * k * n
    qbytes = sum(int(np.prod(p.shape)) * p.dtype.itemsize for p in planes_tuple)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, tn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=qbytes + 4 * m * (k + n), transcendentals=0
        ),
        interpret=interpret,
    )(x, *planes_tuple)


def _plane_view(qt: QTensor, name: str):
    """fp16 planes as uint16 bit patterns (Mosaic prefers integer loads)."""
    p = qt.planes[name]
    if p.dtype == jnp.float16:
        return jax.lax.bitcast_convert_type(p, jnp.uint16)
    return p


def local_shape(qt: QTensor) -> tuple[int, int]:
    """(K, N) of the *local* shard, derived from plane shapes (under
    shard_map qt.shape still holds the global dims)."""
    names = _PLANE_ORDER.get(qt.fmt)
    qname = names[0] if names else "qs"
    p = qt.planes[qname]
    kdiv = _plane_kdiv(qt.fmt, qname)
    return p.shape[0] * kdiv, p.shape[1]


def supports(qt: QTensor) -> bool:
    if qt.fmt not in _PLANE_ORDER or qt.fold < 256:
        return False
    k, n = local_shape(qt)
    return k % qt.fold == 0 and n % 128 == 0


def qmatmul(x: jax.Array, qt: QTensor, *, interpret: bool = False) -> jax.Array:
    """y[M, N] = x[M, K] @ dequant(qt); fused Pallas path.

    Falls back to dequant-then-matmul when the shape/format is unsupported.
    """
    if not supports(qt):
        return (x @ qt.dequant(x.dtype)).astype(jnp.float32)
    k, n = local_shape(qt)
    import os

    # TN=512 measured ~17% faster full-model decode than 256 (fewer grid
    # steps); narrow-dtype (u8/bf16) dequant is blocked on Mosaic's missing
    # u8 shift legalization
    tn_pref = int(os.environ.get("ZLLM_QMM_TN", "512"))
    tn = next((t for t in (tn_pref, 512, 256, 128) if n % t == 0), 128)
    planes_tuple = tuple(_plane_view(qt, nm) for nm in _PLANE_ORDER[qt.fmt])
    y = _qmm_call(x, planes_tuple, fmt=qt.fmt, fold=qt.fold, k=k, n=n, tn=tn, interpret=interpret)
    return y


def install(interpret: bool = False):
    """Route zllm.ops.linear's QTensor matmuls through the fused kernel."""
    from . import linear

    linear.set_fused_matmul(lambda x, qt: qmatmul(x, qt, interpret=interpret))
