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
    GGMLType.Q4_1: ("qs", "a", "b"),
    GGMLType.Q5_0: ("qs", "qh", "a"),
    GGMLType.Q5_1: ("qs", "qh", "a", "b"),
    GGMLType.Q8_0: ("qs", "d"),
    GGMLType.MXFP4: ("qs", "e"),
    GGMLType.IQ4_NL: ("qs", "d"),
    GGMLType.IQ4_XS: ("qs", "a"),
    GGMLType.Q2_K: ("qs", "a", "b"),
    GGMLType.Q3_K: ("qs", "qh", "a"),
    GGMLType.Q4_K: ("qs", "a", "b"),
    GGMLType.Q5_K: ("qs", "qh", "a", "b"),
    GGMLType.Q6_K: ("ql", "qh", "a"),
    GGMLType.IQ2_XXS: ("qs", "a"),
    GGMLType.IQ2_XS: ("qs", "a"),
    GGMLType.IQ2_S: ("qs", "a"),
    GGMLType.IQ3_XXS: ("qs", "a"),
    GGMLType.IQ3_S: ("qs", "a"),
    GGMLType.IQ1_S: ("qs", "a", "b"),
    GGMLType.IQ1_M: ("qs", "a", "b"),
    GGMLType.TQ1_0: ("qs", "a"),
    GGMLType.TQ2_0: ("qs", "a"),
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


_Q4K_DIET = ("qs", "sm", "sd", "sb")


def _plane_names(qt) -> tuple:
    """Per-tensor plane order: Q4_K tensors carry either the exact "diet"
    layout (sm/sd/sb: 6-bit sc|mn fields + per-256 fp16 d/dmin — the
    repack default, ~38% smaller scale traffic) or the collapsed fp16 a/b
    planes (derived by quant.repack.q4k_to_ab for TP K-shards)."""
    if qt.fmt == GGMLType.Q4_K and "sm" in qt.planes:
        return _Q4K_DIET
    return _PLANE_ORDER[qt.fmt]


def _plane_kdiv(fmt: GGMLType, name: str) -> int:
    if name in ("sm", "sd", "sb"):  # Q4_K diet planes
        return {"sm": 32, "sd": 256, "sb": 256}[name]
    if fmt == GGMLType.Q8_0 and name == "qs":
        return 1
    if fmt == GGMLType.Q6_K:
        return {"ql": 2, "qh": 4, "a": 16}[name]
    if fmt == GGMLType.Q2_K:
        return {"qs": 4, "a": 16, "b": 16}[name]
    if fmt == GGMLType.Q3_K:
        return {"qs": 4, "qh": 8, "a": 16}[name]
    if fmt in (GGMLType.IQ2_XS, GGMLType.IQ2_S):
        return {"qs": 2, "a": 16}[name]
    if fmt == GGMLType.IQ1_S:
        return {"qs": 4, "a": 32, "b": 32}[name]
    if fmt == GGMLType.IQ1_M:
        return {"qs": 4, "a": 16, "b": 8}[name]
    if fmt in (GGMLType.TQ1_0, GGMLType.TQ2_0):
        return {"qs": 4, "a": 32}[name]
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
    uint->float casts).

    Default is the exponent-rebias bit trick: place the fp16 fields in an
    f32 bit pattern with the exponent rebias (+112 = 127-15) applied in
    the integer domain — pure bitwise VPU ops, no exp2 transcendental.
    Subnormals (exp==0) take an exact int->float convert * 2^-24.
    ZLLM_F16_MODE=exp2 restores the transcendental path, =bitcast tries
    Mosaic's native u16->f16 bitcast + f16->f32 convert."""
    import os

    mode = os.environ.get("ZLLM_F16_MODE", "magic")
    if mode == "bitcast":
        return jax.lax.bitcast_convert_type(u16, jnp.float16).astype(jnp.float32)
    u = u16.astype(jnp.int32)
    exp = (u >> 10) & 0x1F
    mant = u & 0x3FF
    if mode == "exp2":
        sign = (u >> 15) & 1
        norm = jnp.exp2(exp.astype(jnp.float32) - 15.0) * (1.0 + mant.astype(jnp.float32) / 1024.0)
        sub = 6.103515625e-05 * (mant.astype(jnp.float32) / 1024.0)  # 2**-14
        mag = jnp.where(exp == 0, sub, norm)
        return jnp.where(sign == 1, -mag, mag)
    bits = ((u & 0x8000) << 16) | ((exp + 112) << 23) | (mant << 13)
    f = jax.lax.bitcast_convert_type(bits, jnp.float32)
    sub = mant.astype(jnp.float32) * 5.9604644775390625e-08  # 2**-24, exact
    f_sub = jnp.where((u & 0x8000) != 0, -sub, sub)
    return jnp.where(exp == 0, f_sub, f)


def _load_f16(ref_val):
    """fp16 plane tile -> f32; planes are stored as uint16 bit patterns
    (f32 planes — q4k_to_ab's exact products — pass through)."""
    if ref_val.dtype == jnp.float32:
        return ref_val
    if ref_val.dtype == jnp.float16:
        return ref_val.astype(jnp.float32)
    return _fp16_bits_to_f32(ref_val)


def _q4k_group_scales(sm, d_full, m_full, gt: int, tn: int, j, rows: int,
                      nsteps: int):
    """Q4_K diet scales -> per-32-group f32 (a, b) [gt, tn]: a = d * sc,
    b = dmin * mn — the exact ggml dequantize_row_q4_K two-level math.

    sm is this tile's 6-bit fields [gt, tn]; d/m are the FULL [K//256, tn]
    super planes (their per-k-step row count is below the 8-sublane rule
    AND Mosaic can't prove a dynamic sublane offset j*rows is 8-aligned,
    so ref slicing is out).  K-step j's rows are picked by a branchless
    where-chain over the nsteps static slices — pure VPU selects on the
    raw u16 rows.  (Rejected alternatives, measured on TinyLlama decode:
    a [gt, K//256] f32 selection matmul costs 4 little 6-pass MXU dots
    per tile, +66us/step; pltpu.roll's dynamic sublane rotate +120us.)"""
    smi = sm.astype(jnp.int32)
    d = d_full[0:rows]
    dm = m_full[0:rows]
    for jj in range(1, nsteps):
        d = jnp.where(j == jj, d_full[jj * rows:(jj + 1) * rows], d)
        dm = jnp.where(j == jj, m_full[jj * rows:(jj + 1) * rows], dm)
    d = _gexpand(_load_f16(d), 8, 8 * rows, tn)[:gt]
    dm = _gexpand(_load_f16(dm), 8, 8 * rows, tn)[:gt]
    return (d * (smi & 63).astype(jnp.float32),
            dm * (smi >> 6).astype(jnp.float32))


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
        if "sm" in planes:
            a32, b32 = _q4k_group_scales(
                planes["sm"], planes["sd"], planes["sb"], tk // 32, tn,
                pl.program_id(1), tk // 256, pl.num_programs(1))
            a, b = _gexpand(a32, 32, tk, tn), _gexpand(b32, 32, tk, tn)
        else:
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
    if fmt == GGMLType.Q4_1:
        q = _unpack_nib(planes["qs"], fold).astype(jnp.float32)
        a = _gexpand(_load_f16(planes["a"]), 32, tk, tn)
        b = _gexpand(_load_f16(planes["b"]), 32, tk, tn)
        return q * a - b
    if fmt == GGMLType.Q5_0:
        lo = _unpack_nib(planes["qs"], fold)
        qh = planes["qh"].astype(jnp.int32)
        q = ((lo | (_q5k_bits(qh, tk, tn) << 4)) - 16).astype(jnp.float32)
        a = _gexpand(_load_f16(planes["a"]), 32, tk, tn)
        return q * a
    if fmt == GGMLType.Q5_1:
        lo = _unpack_nib(planes["qs"], fold)
        qh = planes["qh"].astype(jnp.int32)
        q = (lo | (_q5k_bits(qh, tk, tn) << 4)).astype(jnp.float32)
        a = _gexpand(_load_f16(planes["a"]), 32, tk, tn)
        b = _gexpand(_load_f16(planes["b"]), 32, tk, tn)
        return q * a - b
    if fmt == GGMLType.Q2_K:
        q = _unpack_crumb(planes["qs"], fold).astype(jnp.float32)
        a = _gexpand(_load_f16(planes["a"]), 16, tk, tn)
        b = _gexpand(_load_f16(planes["b"]), 16, tk, tn)
        return q * a - b
    if fmt == GGMLType.Q3_K:
        lo = _unpack_crumb(planes["qs"], fold)
        qh = planes["qh"].astype(jnp.int32)
        q = ((lo | (_q5k_bits(qh, tk, tn) << 2)) - 4).astype(jnp.float32)
        a = _gexpand(_load_f16(planes["a"]), 16, tk, tn)
        return q * a
    if fmt in (GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S):
        q = _iq2_val(_unpack_nib(planes["qs"], fold)).astype(jnp.float32)
        group = 32 if fmt == GGMLType.IQ2_XXS else 16
        a = _gexpand(_load_f16(planes["a"]), group, tk, tn)
        return q * a
    if fmt == GGMLType.IQ3_XXS:
        q = _iq3xxs_val(_unpack_nib(planes["qs"], fold)).astype(jnp.float32)
        a = _gexpand(_load_f16(planes["a"]), 32, tk, tn)
        return q * a
    if fmt == GGMLType.IQ3_S:
        idx = _unpack_nib(planes["qs"], fold)
        q = ((2 * (idx & 7) + 1) * (1 - 2 * (idx >> 3))).astype(jnp.float32)
        a = _gexpand(_load_f16(planes["a"]), 32, tk, tn)
        return q * a
    if fmt == GGMLType.IQ1_S:
        q = (_unpack_crumb(planes["qs"], fold) - 1).astype(jnp.float32)
        a = _gexpand(_load_f16(planes["a"]), 32, tk, tn)
        b = _gexpand(_load_f16(planes["b"]), 32, tk, tn)
        return q * a - b
    if fmt == GGMLType.IQ1_M:
        q = (_unpack_crumb(planes["qs"], fold) - 1).astype(jnp.float32)
        a = _gexpand(_load_f16(planes["a"]), 16, tk, tn)
        b = _gexpand(_load_f16(planes["b"]), 8, tk, tn)
        return q * a - b
    if fmt in (GGMLType.TQ1_0, GGMLType.TQ2_0):
        q = (_unpack_crumb(planes["qs"], fold) - 1).astype(jnp.float32)
        a = _gexpand(_load_f16(planes["a"]), 32, tk, tn)
        return q * a
    raise NotImplementedError(fmt.name)


def _iq2_val(idx):
    """IQ2 value-index -> signed int: mag {8,25,43} via select chain,
    sign from bit 2."""
    t = idx & 3
    mag = jnp.where(t == 0, 8, jnp.where(t == 1, 25, 43))
    return mag * (1 - 2 * ((idx >> 2) & 1))


def _iq3xxs_val(idx):
    """IQ3_XXS value-index -> signed int: mag {4,12,...,52,62} = 4+8t
    (t<7) else 62, sign from bit 3."""
    t = idx & 7
    mag = jnp.where(t == 7, 62, 4 + 8 * t)
    return mag * (1 - 2 * ((idx >> 3) & 1))


def _q5k_bits(qh, tk, tn):
    """Q5_K high-bit plane [TK//8, TN] (bit i of row r -> k = 8r+i) ->
    int32[TK, TN].  Interleaved layout needs a stack+reshape relayout."""
    parts = jnp.stack([((qh >> i) & 1) for i in range(8)], axis=1)  # [TK//8, 8, TN]
    return parts.reshape(tk, tn)


# ---------------------------------------------------------------------------
# int8-MXU W4A8 decode path
# ---------------------------------------------------------------------------
# The reference computes decode GEMV as int8 dot products against on-the-
# fly-quantized activations (block_q8_2, ggml-cpu/repack.h:90-103; CUDA
# mmvq.cu quantize_row_q8_1).  Same formulation here, mapped to the MXU:
# with w[k,n] = q[k,n]*a[g,n] - b[g,n] (g = k//GROUP) and x[k] ~ dx[g]*
# xq[k] (per-group int8), the matvec becomes
#
#   y[n] = sum_g dx[g]*a[g,n]*Pi[g,n] - sum_g b[g,n]*e[g]
#   Pi[g,n] = sum_{k in g} xq[k]*q[k,n]      (int8 x int8 -> int32, MXU)
#   e[g]   = dx[g] * sum_{k in g} xq[k]
#
# Pi for all groups of a k-tile is ONE dense MXU matmul X @ q where
# X[gt, TK] is the block-diagonal spread of xq (X[g,k] = xq[k] iff
# k//GROUP == g) — 32x more MXU MACs than the plain matvec but the MXU has
# orders of magnitude of headroom at M=1; in exchange the per-element VPU
# work drops from ~7 f32 passes (dequant-to-bf16) to the integer nibble
# unpack alone, and the scale math runs at [G, N] granularity (32x fewer
# elements).  This keeps decode at the quantized HBM byte-rate.

# per-format int path config: GROUP size, scale plane, optional min plane
_INT_FMT = {
    GGMLType.Q4_0: (32, "d", None),
    GGMLType.Q4_1: (32, "a", "b"),
    GGMLType.Q5_0: (32, "a", None),
    GGMLType.Q5_1: (32, "a", "b"),
    GGMLType.Q8_0: (32, "d", None),
    GGMLType.MXFP4: (32, "e", None),
    GGMLType.IQ4_NL: (32, "d", None),
    GGMLType.IQ4_XS: (32, "a", None),
    GGMLType.Q2_K: (16, "a", "b"),
    GGMLType.Q3_K: (16, "a", None),
    GGMLType.Q4_K: (32, "a", "b"),
    GGMLType.Q5_K: (32, "a", "b"),
    GGMLType.Q6_K: (16, "a", None),
    GGMLType.IQ2_XXS: (32, "a", None),
    GGMLType.IQ2_XS: (16, "a", None),
    GGMLType.IQ2_S: (16, "a", None),
    GGMLType.IQ3_XXS: (32, "a", None),
    GGMLType.IQ3_S: (32, "a", None),
    GGMLType.IQ1_S: (32, "a", "b"),
    # IQ1_M excluded: its a (per-16) and b (per-8) planes have mixed
    # granularity; it runs on the dequant-tile kernel path instead
    GGMLType.TQ1_0: (32, "a", None),
    GGMLType.TQ2_0: (32, "a", None),
}


def _int_qtile(fmt: GGMLType, fold: int, tk: int, tn: int, planes: dict):
    """[TK, TN] int8 integer codes (offset applied where the format has a
    constant bias; K-quants with separate mins keep q unsigned)."""
    if fmt == GGMLType.Q4_0:
        return (_unpack_nib(planes["qs"], fold) - 8).astype(jnp.int8)
    if fmt == GGMLType.Q8_0:
        return planes["qs"][...]
    if fmt in (GGMLType.Q4_K, GGMLType.Q4_1):
        return _unpack_nib(planes["qs"], fold).astype(jnp.int8)
    if fmt == GGMLType.Q5_0:
        lo = _unpack_nib(planes["qs"], fold)
        qh = planes["qh"].astype(jnp.int32)
        return ((lo | (_q5k_bits(qh, tk, tn) << 4)) - 16).astype(jnp.int8)
    if fmt == GGMLType.Q5_1:
        lo = _unpack_nib(planes["qs"], fold)
        qh = planes["qh"].astype(jnp.int32)
        return (lo | (_q5k_bits(qh, tk, tn) << 4)).astype(jnp.int8)
    if fmt == GGMLType.Q2_K:
        return _unpack_crumb(planes["qs"], fold).astype(jnp.int8)
    if fmt == GGMLType.Q3_K:
        lo = _unpack_crumb(planes["qs"], fold)
        qh = planes["qh"].astype(jnp.int32)
        return ((lo | (_q5k_bits(qh, tk, tn) << 2)) - 4).astype(jnp.int8)
    if fmt == GGMLType.Q5_K:
        lo = _unpack_nib(planes["qs"], fold)
        qh = planes["qh"].astype(jnp.int32)
        return (lo | (_q5k_bits(qh, tk, tn) << 4)).astype(jnp.int8)
    if fmt == GGMLType.Q6_K:
        lo = _unpack_nib(planes["ql"], fold)
        hi = _unpack_crumb(planes["qh"], fold)
        return ((lo | (hi << 4)) - 32).astype(jnp.int8)
    if fmt == GGMLType.MXFP4:
        idx = _unpack_nib(planes["qs"], fold)
        t = idx & 0x7
        m = t & 1
        e = jnp.maximum((t >> 1) - 1, 0)
        big = (2 + m) << e  # t>=2: 2,3,4,6,8,12
        mag = jnp.where(t < 2, t, big)
        return jnp.where((idx & 0x8) != 0, -mag, mag).astype(jnp.int8)
    if fmt in (GGMLType.IQ4_NL, GGMLType.IQ4_XS):
        idx = _unpack_nib(planes["qs"], fold)
        vals = qb.IQ4NL_VALUES.astype(np.int32)  # already int8-range ints
        out = jnp.full(idx.shape, int(vals[0]), jnp.int32)
        for i in range(1, 16):
            out = jnp.where(idx == i, int(vals[i]), out)
        return out.astype(jnp.int8)
    if fmt in (GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S):
        return _iq2_val(_unpack_nib(planes["qs"], fold)).astype(jnp.int8)
    if fmt == GGMLType.IQ3_XXS:
        return _iq3xxs_val(_unpack_nib(planes["qs"], fold)).astype(jnp.int8)
    if fmt == GGMLType.IQ3_S:
        idx = _unpack_nib(planes["qs"], fold)
        return ((2 * (idx & 7) + 1) * (1 - 2 * (idx >> 3))).astype(jnp.int8)
    if fmt in (GGMLType.IQ1_S, GGMLType.TQ1_0, GGMLType.TQ2_0):
        return (_unpack_crumb(planes["qs"], fold) - 1).astype(jnp.int8)
    raise NotImplementedError(fmt.name)


def _int_scale_f32(fmt: GGMLType, planes: dict):
    """The [G_t, TN] f32 per-group scale for the int path."""
    if fmt == GGMLType.MXFP4:
        e = planes["e"].astype(jnp.int32).astype(jnp.float32)
        return jnp.exp2(e - 128.0)
    name = _INT_FMT[fmt][1]
    return _load_f16(planes[name])


def _prologue_quant(fuse, eps, group, gt, tk, j, x_ref, aux_ref, r_ref):
    """Shared fused-prologue: raw [1, TK] activations (or raw residual /
    gate-up halves) -> (x_bd int8 [gt, TK] block-diagonal codes, dx f32
    [gt, 1], sx int32 [gt, 1]).  Grouping, int8 quantization, and the
    block-diagonal spread happen in ONE broadcast+iota-mask pass (a
    [1,TK]->[gt,group] vector reshape is an unsupported Mosaic shape
    cast)."""
    if fuse == "norm":
        # full-row mean square is grid-invariant: compute on each i-row's
        # first k-step only, reuse from SMEM scratch across the K sweep
        @pl.when(j == 0)
        def _():
            xf_full = x_ref[:].astype(jnp.float32)  # [1, K]
            r_ref[0] = jax.lax.rsqrt(jnp.mean(xf_full * xf_full) + eps)

        xf = (
            x_ref[:, pl.ds(j * tk, tk)].astype(jnp.float32)
            * aux_ref[:, pl.ds(j * tk, tk)].astype(jnp.float32)
            * r_ref[0]
        )
    elif fuse == "glu":
        g_ = x_ref[:].astype(jnp.float32)
        u_ = aux_ref[:].astype(jnp.float32)
        xf = g_ * jax.nn.sigmoid(g_) * u_  # silu(g) * u, f32 like ops.layers.swiglu
    else:
        xf = x_ref[:].astype(jnp.float32)  # [1, TK]
    rows = jax.lax.broadcasted_iota(jnp.int32, (gt, tk), 0)
    gid = jax.lax.broadcasted_iota(jnp.int32, (gt, tk), 1) // group
    xm = jnp.where(rows == gid, jnp.broadcast_to(xf, (gt, tk)), 0.0)
    dx = jnp.maximum(jnp.max(jnp.abs(xm), axis=1, keepdims=True) / 127.0, 1e-12)
    xq_bd = jnp.clip(jnp.round(xm / dx), -127, 127).astype(jnp.int32)
    sx = jnp.sum(xq_bd, axis=1, keepdims=True)  # [gt, 1] int32
    return xq_bd.astype(jnp.int8), dx, sx


def _w4a8_kernel(fmt, fold, tk, tn, group, has_b, slice_rows, fuse, eps, names, x_ref, *refs):
    if fuse == "norm":
        out_ref, r_ref = refs[-2], refs[-1]  # SMEM scratch holds rsqrt(ms)
        refs = refs[:-1]
    else:
        out_ref = refs[-1]
    gt = tk // group
    j = pl.program_id(1)
    if fuse:
        # activations arrive raw in their NATURAL [1, K] row layout and are
        # prepared + quantized here — no external reshape/astype (each one
        # was an XLA relayout copy kernel per matvec; the reference fuses
        # the analogous quantize_row_q8_1 into its mmvq launch path,
        # ggml-cuda/mmvq.cu):
        #   "q"    x_ref is the [1, TK] raw activation slice
        #   "norm" x_ref is the FULL raw residual row [1, K]; RMS-norm
        #          (rsqrt of the full-row mean square, then the per-element
        #          norm weight from wn_ref) happens in-kernel
        #   "glu"  x_ref/u_ref are the [1, TK] gate/up slices of the fused
        #          gate|up row; swiglu (silu(g)*u, f32) happens in-kernel
        if fuse in ("norm", "glu"):
            aux_ref, plane_refs = refs[0], refs[1:-1]
        else:
            aux_ref, plane_refs = None, refs[:-1]
        x_bd, dx, sx = _prologue_quant(
            fuse, eps, group, gt, tk, j, x_ref, aux_ref,
            r_ref if fuse == "norm" else None,
        )
        if has_b:
            e = dx * sx.astype(jnp.float32)
    else:
        if has_b:
            dx_ref, e_ref, plane_refs = refs[0], refs[1], refs[2:-1]
            e = e_ref[:, :1]
        else:
            dx_ref, plane_refs = refs[0], refs[1:-1]
        dx = dx_ref[:, :1]
        xq_t = jnp.broadcast_to(x_ref[:].astype(jnp.int32), (gt, tk))  # [1,TK] xq
    planes = {}
    for nm, r, srows in zip(names, plane_refs, slice_rows):
        if srows is None or nm in ("sd", "sb"):  # diet super planes ride whole
            planes[nm] = r[:]
        else:
            planes[nm] = r[pl.ds(j * srows, srows), :]

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    qi = _int_qtile(fmt, fold, tk, tn, planes)  # int8 [TK, TN]
    if not fuse:
        # block-diagonal X in the i32 domain (Mosaic can't relayout an i1
        # mask onto int8's (32,128) tiling; i32 multiply + convert lowers)
        rows = jax.lax.broadcasted_iota(jnp.int32, (gt, tk), 0)
        gid = jax.lax.broadcasted_iota(jnp.int32, (gt, tk), 1) // group
        ind = (rows == gid).astype(jnp.int32)
        x_bd = (xq_t * ind).astype(jnp.int8)
    pi = jax.lax.dot_general(
        x_bd, qi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )  # [gt, TN]
    if "sm" in planes:  # Q4_K diet
        a, bmin = _q4k_group_scales(planes["sm"], planes["sd"], planes["sb"],
                                    gt, tn, j, tk // 256, pl.num_programs(1))
    else:
        a = _int_scale_f32(fmt, planes)
        bmin = _load_f16(planes["b"]) if has_b else None
    contrib = pi.astype(jnp.float32) * a * dx
    if has_b:
        contrib = contrib - bmin * e
    out_ref[0:1, :] += jnp.sum(contrib, axis=0, keepdims=True)


@functools.partial(
    jax.jit,
    static_argnames=("fmt", "fold", "k", "n", "tn", "tk", "fuse", "eps", "diet",
                     "interpret"),
)
def _qmm_w4a8_call(
    xq, dx, e, wn, planes_tuple, *, fmt, fold, k, n, tn, tk=0, fuse=None,
    eps=0.0, diet=False, interpret=False
):
    group, _, bname = _INT_FMT[fmt]
    tk = tk or fold
    gt = tk // group
    names = _Q4K_DIET if diet else _PLANE_ORDER[fmt]
    grid = (n // tn, k // tk)
    has_b = bname is not None

    if fuse == "norm":
        # xq is the RAW residual row [1, K] (whole row resident per grid
        # step: the full-row mean square is computed in-kernel); wn is the
        # RMS-norm weight row [1, K]
        in_specs = [
            pl.BlockSpec((1, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ]
        args = [xq, wn]
    elif fuse == "glu":
        # xq is the fused gate|up row [1, 2K]: pass it twice, the gate
        # half sliced at block j and the up half at block K//tk + j
        in_specs = [
            pl.BlockSpec((1, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda i, j, _kb=k // tk: (0, _kb + j),
                         memory_space=pltpu.VMEM),
        ]
        args = [xq, xq]
    elif fuse:
        # xq is the RAW activation row [1, K]; quantization happens inside
        # the kernel (dx/e args unused)
        in_specs = [
            pl.BlockSpec((1, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM)
        ]
        args = [xq]
    else:
        in_specs = [
            pl.BlockSpec((1, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),  # xq
            pl.BlockSpec((gt, 128), lambda i, j: (j, 0), memory_space=pltpu.VMEM),  # dx
        ]
        args = [xq, dx]
        if has_b:
            in_specs.append(
                pl.BlockSpec((gt, 128), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
            )
            args.append(e)
    slice_rows = []
    for nm, _arr in zip(names, planes_tuple):
        kdiv = _plane_kdiv(fmt, nm)
        rows = tk // kdiv
        if rows % 8 == 0 and nm not in ("sd", "sb"):
            in_specs.append(
                pl.BlockSpec((rows, tn), lambda i, j: (j, i), memory_space=pltpu.VMEM)
            )
            slice_rows.append(None)
        else:
            # whole-K resident per N-tile: rows below the (8, 128) rule, or
            # a diet super plane (kernel row-selects via dynamic roll);
            # plane shape is authoritative (supers carry alignment padding)
            in_specs.append(
                pl.BlockSpec((_arr.shape[0], tn), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM)
            )
            slice_rows.append(rows)
    args.extend(planes_tuple)

    kernel = functools.partial(
        _w4a8_kernel, fmt, fold, tk, tn, group, has_b, tuple(slice_rows), fuse,
        eps, names,
    )
    qbytes = sum(int(np.prod(p.shape)) * p.dtype.itemsize for p in planes_tuple)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)] if fuse == "norm" else [],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (tk // group) * k * n, bytes_accessed=qbytes + 4 * n, transcendentals=0
        ),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# npack W4A8 decode: the MXU consumes packed bytes, no nibble unpack
# ---------------------------------------------------------------------------
# For npack-layout QTensors (quant/repack.to_npack: byte(k, c) = code[k, c]
# | code[k, c + N/2] << 4, XOR 0x80), the dual-dot identity
#
#   pi_full = X_bd @ bytes            (int8 MXU) = pi_lo + 16*pi_hi - 128*sx
#   pi_lo   = X_bd @ (bytes & 0x0F)   (one u8 bitwise op per byte)
#   pi_hi   = (pi_full - pi_lo + 128*sx) >> 4          (exact int32)
#
# replaces the i32 widen+shift+mask+concat unpack (the VPU cost that held
# decode at ~60% of HBM bandwidth) with a single u8 mask.  The [2, TN/2]
# output tile reshapes row-major to original column order for free.
# Measured (tools/exp_npack2.py, Q4_K 2048x2048 matvec): 4.98us vs 6.33us
# for the unpack kernel (HBM bound incl. scale planes: 3.2us).

def _w4a8np_kernel(fmt, tk, tn, group, has_b, fuse, eps, diet, x_ref, *refs):
    if fuse == "norm":
        out_ref, r_ref = refs[-2], refs[-1]
        refs = refs[:-1]
    else:
        out_ref, r_ref = refs[-1], None
    gt = tk // group
    j = pl.program_id(1)
    if fuse in ("norm", "glu"):
        aux_ref, srefs = refs[0], refs[1:-1]
    else:
        aux_ref, srefs = None, refs[:-1]
    q5 = fmt in (GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q5_K)
    if q5:  # high-bit planes ride after qs (see _qmm_w4a8np_call)
        qs_ref, qh_lo_ref, qh_hi_ref = srefs[-3], srefs[-2], srefs[-1]
        scale_refs = srefs[:-3]
    else:
        qs_ref = srefs[-1]
        scale_refs = srefs[:-1]  # (a_lo, a_hi[, b_lo, b_hi]) or (d_lo, d_hi)

    x_bd, dx, sx = _prologue_quant(fuse, eps, group, gt, tk, j, x_ref, aux_ref, r_ref)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    bp = qs_ref[:]  # int8 [TK, TN/2]
    lo = pltpu.bitcast(pltpu.bitcast(bp, jnp.uint8) & 0x0F, jnp.int8)
    pi_full = jax.lax.dot_general(
        x_bd, bp, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    pi_lo = jax.lax.dot_general(
        x_bd, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    pi_hi = (pi_full - pi_lo + 128 * sx) >> 4
    if fmt == GGMLType.Q4_0:  # constant -8 code offset
        pi_lo = pi_lo - 8 * sx
        pi_hi = pi_hi - 8 * sx
    if q5:
        # the 5th bit rides a separate [TK/8, TN/2] bit-plane per column
        # half: unpack to 0/1 int8 and add its dot scaled by 16 (the lo
        # nibbles in the packed bytes hold Q5 codes' low 4 bits only)
        b5_lo = _q5k_bits(qh_lo_ref[:].astype(jnp.int32), tk, tn // 2).astype(jnp.int8)
        b5_hi = _q5k_bits(qh_hi_ref[:].astype(jnp.int32), tk, tn // 2).astype(jnp.int8)
        pi_lo = pi_lo + 16 * jax.lax.dot_general(
            x_bd, b5_lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        pi_hi = pi_hi + 16 * jax.lax.dot_general(
            x_bd, b5_hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        if fmt == GGMLType.Q5_0:  # constant -16 code offset
            pi_lo = pi_lo - 16 * sx
            pi_hi = pi_hi - 16 * sx
    half = tn // 2
    if diet:
        # Q4_K: per-group a/b reconstructed from the 6-bit fields + the
        # full-K per-256 fp16 d/dmin planes (see _q4k_group_scales)
        a_lo, b_lo = _q4k_group_scales(
            scale_refs[0][:], scale_refs[2][:], scale_refs[4][:],
            gt, half, j, gt // 8, pl.num_programs(1))
        a_hi, b_hi = _q4k_group_scales(
            scale_refs[1][:], scale_refs[3][:], scale_refs[5][:],
            gt, half, j, gt // 8, pl.num_programs(1))
    else:
        a_lo = _load_f16(scale_refs[0][:])
        a_hi = _load_f16(scale_refs[1][:])
        if has_b:
            b_lo = _load_f16(scale_refs[2][:])
            b_hi = _load_f16(scale_refs[3][:])
    c_lo = pi_lo.astype(jnp.float32) * a_lo * dx
    c_hi = pi_hi.astype(jnp.float32) * a_hi * dx
    if has_b:
        e = dx * sx.astype(jnp.float32)
        c_lo = c_lo - b_lo * e
        c_hi = c_hi - b_hi * e
    out_ref[0:1, :] += jnp.sum(c_lo, axis=0, keepdims=True)
    out_ref[1:2, :] += jnp.sum(c_hi, axis=0, keepdims=True)


@functools.partial(
    jax.jit,
    static_argnames=("fmt", "fold", "k", "n", "tn", "tk", "fuse", "eps", "diet",
                     "interpret"),
)
def _qmm_w4a8np_call(
    x, wn, planes_tuple, *, fmt, fold, k, n, tn, tk=0, fuse="q", eps=0.0,
    diet=False, interpret=False
):
    group, _, bname = _INT_FMT[fmt]
    tk = tk or fold
    gt = tk // group
    has_b = bname is not None
    nb = n // tn  # hi-half block offset for the [G, N] scale planes
    grid = (nb, k // tk)

    if fuse == "norm":
        in_specs = [
            pl.BlockSpec((1, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ]
        args = [x, wn]
    elif fuse == "glu":
        in_specs = [
            pl.BlockSpec((1, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda i, j, _kb=k // tk: (0, _kb + j),
                         memory_space=pltpu.VMEM),
        ]
        args = [x, x]
    else:
        in_specs = [
            pl.BlockSpec((1, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM)
        ]
        args = [x]
    # scale planes [K/group, N]: lo view at block (j, i), hi at (j, i + nb).
    # Diet super planes [K/256, N] ride whole (their per-tile rows break
    # the (8, 128) block rule) and are row-sliced in-kernel.
    q5 = fmt in (GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q5_K)
    if q5:  # planes: qs, qh (bit-plane [K/8, N]), a[, b]
        qs, qh = planes_tuple[0], planes_tuple[1]
        scale_planes = planes_tuple[2:]
    else:
        qs, scale_planes = planes_tuple[0], planes_tuple[1:]
    for pi_, p in enumerate(scale_planes):
        if diet and pi_ > 0:  # sd / sb (rows carry 8-alignment padding)
            in_specs.append(
                pl.BlockSpec((p.shape[0], tn // 2), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM))
            in_specs.append(
                pl.BlockSpec((p.shape[0], tn // 2), lambda i, j, _nb=nb: (0, i + _nb),
                             memory_space=pltpu.VMEM))
        else:
            in_specs.append(
                pl.BlockSpec((gt, tn // 2), lambda i, j: (j, i), memory_space=pltpu.VMEM))
            in_specs.append(
                pl.BlockSpec((gt, tn // 2), lambda i, j, _nb=nb: (j, i + _nb),
                             memory_space=pltpu.VMEM))
        args.extend([p, p])
    in_specs.append(
        pl.BlockSpec((tk, tn // 2), lambda i, j: (j, i), memory_space=pltpu.VMEM))
    args.append(qs)
    if q5:  # [TK/8, TN/2] bit-plane tiles for each column half
        in_specs.append(
            pl.BlockSpec((tk // 8, tn // 2), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM))
        in_specs.append(
            pl.BlockSpec((tk // 8, tn // 2), lambda i, j, _nb=nb: (j, i + _nb),
                         memory_space=pltpu.VMEM))
        args.extend([qh, qh])

    kernel = functools.partial(_w4a8np_kernel, fmt, tk, tn, group, has_b, fuse,
                               eps, diet)
    qbytes = int(np.prod(qs.shape)) + sum(
        2 * int(np.prod(p.shape)) * p.dtype.itemsize for p in scale_planes)
    if q5:
        qbytes += int(np.prod(planes_tuple[1].shape))
    out2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((2, tn // 2), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, n // 2), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)] if fuse == "norm" else [],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (k // group) * k * n, bytes_accessed=qbytes + 4 * n,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    # row-major [2, N/2] == [lo columns | hi columns] == original order
    return out2.reshape(1, n)


# ---------------------------------------------------------------------------
# dual-dot packed-byte W4A8 (nibble formats)
# ---------------------------------------------------------------------------
# The nibble unpack (u8 -> i32 widen, mask, shift, concat) is the VPU cost
# that holds the plain W4A8 kernel at ~60% of HBM bandwidth.  This variant
# never unpacks: the MXU consumes the *packed* bytes directly, twice.
# With byte[r] = lo[r] + 16*hi[r] (split-half fold packing):
#
#   B1 = byte - 128            (s8 via xor 0x80 + bitcast)
#   B2 = lo - 128              (s8 via (byte & 0x0F) ^ 0x80 + bitcast)
#
# and a coefficient matrix C [2*GB, KH] holding, for byte-group j
# (32 byte rows), the activation codes at the lo positions (row 2j) and hi
# positions (row 2j+1), zeros elsewhere:
#
#   P1 = C @ B1 = C.lo + 16*C.hi - 128*S     (S = row sums of C)
#   P2 = C @ B2 = C.lo         - 128*S
#   => Plo = P2 + 128*S ;  Phi = (P1 - P2)/16
#
# Row 2j's wanted group-sum is Plo, row 2j+1's is Phi (the other half of
# each equation is a cross-term that drops out).  All values stay < 2^24,
# so the f32 epilogue is exact (P1-P2 = 16*C.hi is exactly divisible).
# Per-byte VPU work: one u8 mask + two xors — pure bitwise, the only u8
# vector ops this Mosaic legalizes (add/mul/shift on i8 are rejected:
# "Only vector<i16> and vector<i32> are supported") — ~6x less than the
# unpack path; MXU MACs unchanged (two dots at half the contraction
# length).
#
# Measured (TinyLlama Q4_K decode, real TPU): 452 tok/s vs 558 for the
# unpack path at the same TN=1024 tiling — the per-step C-matrix build +
# epilogue permutes outweigh the unpack saving, so this stays opt-in
# (ZLLM_QMM_DUALDOT=1) as a documented experiment.
# Q4_K dropped when its repack moved to the diet scale layout (the dd
# kernel reads collapsed a/b planes); the experiment stays for Q4_0/Q4_1.
_DUALDOT_FMTS = {GGMLType.Q4_0, GGMLType.Q4_1}


def _rowperm_fold(t, nc: int):
    """[G, W] per-k-group rows -> byte-row-group order (chunk-major,
    lo/hi interleaved): row c*(G/nc) + 2j + parity <- k-group row
    c*(G/nc) + parity*(G/(2nc)) + j."""
    g, w = t.shape
    tr = t.reshape(nc, 2, g // (2 * nc), w)
    return jnp.stack([tr[:, 0], tr[:, 1]], axis=2).reshape(g, w)


def _w4a8dd_kernel(fmt, fold, tk, tn, has_b, slice_rows, xq2_ref, dx_ref, *refs):
    out_ref = refs[-1]
    if has_b:
        e_ref, plane_refs = refs[0], refs[1:-1]
    else:
        e_ref, plane_refs = None, refs[:-1]
    names = _PLANE_ORDER[fmt]
    j = pl.program_id(1)
    planes = {}
    for nm, r, srows in zip(names, plane_refs, slice_rows):
        planes[nm] = r[:] if srows is None else r[pl.ds(j * srows, srows), :]

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    kh = tk // 2  # packed byte rows in this k-step
    g = tk // 32  # scale groups (also C rows: 2 per byte-group of 32 rows)
    nc = tk // fold  # fold chunks
    qs = planes["qs"]  # u8 [KH, TN]
    b1 = jax.lax.bitcast_convert_type(qs ^ 0x80, jnp.int8)
    b2 = jax.lax.bitcast_convert_type((qs & 0x0F) ^ 0x80, jnp.int8)

    # coefficient matrix C [G, KH]: row 2j+p holds xq2[p] on byte-group j
    xq2 = xq2_ref[:].astype(jnp.int32)  # [2, KH] lo/hi-ordered act codes
    rows = jax.lax.broadcasted_iota(jnp.int32, (g, kh), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, kh), 1)
    ind = ((rows >> 1) == (cols // 32)).astype(jnp.int32)
    xsel = jnp.where((rows & 1) == 0, xq2[0:1, :], xq2[1:2, :])
    c32 = xsel * ind
    cmat = c32.astype(jnp.int8)
    s = jnp.sum(c32, axis=1, keepdims=True).astype(jnp.float32)  # [G, 1]

    p1 = jax.lax.dot_general(
        cmat, b1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    p2 = jax.lax.dot_general(
        cmat, b2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    plo = p2 + 128.0 * s
    phi = (p1 - p2) * 0.0625
    parity = jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0) & 1
    pi = jnp.where(parity == 0, plo, phi)  # [G, TN] in byte-row-group order
    if fmt == GGMLType.Q4_0:
        pi = pi - 8.0 * s  # constant -8 offset of the format

    a = _rowperm_fold(_int_scale_f32(fmt, planes), nc)  # scales, same order
    dxp = _rowperm_fold(dx_ref[:], nc)
    contrib = pi * a * dxp[:, :1]
    if has_b:
        contrib = contrib - _load_f16(planes["b"]) * e_ref[:, :1]  # k-order; sum-invariant
    out_ref[0:1, :] += jnp.sum(contrib, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("fmt", "fold", "k", "n", "tn", "interpret"))
def _qmm_w4a8dd_call(xq2, dx, e, planes_tuple, *, fmt, fold, k, n, tn, interpret=False):
    import os as _os

    _, _, bname = _INT_FMT[fmt]
    tk = fold
    mult = int(_os.environ.get("ZLLM_QMM_TK_MULT", "2"))
    if mult > 1 and k % (fold * mult) == 0:
        tk = fold * mult
    g = tk // 32
    names = _PLANE_ORDER[fmt]
    grid = (n // tn, k // tk)
    has_b = bname is not None

    in_specs = [
        pl.BlockSpec((2, tk // 2), lambda i, j: (0, j), memory_space=pltpu.VMEM),  # xq2
        pl.BlockSpec((g, 128), lambda i, j: (j, 0), memory_space=pltpu.VMEM),  # dx
    ]
    args = [xq2, dx]
    if has_b:
        in_specs.append(pl.BlockSpec((g, 128), lambda i, j: (j, 0), memory_space=pltpu.VMEM))
        args.append(e)
    slice_rows = []
    for nm in names:
        kdiv = _plane_kdiv(fmt, nm)
        rows = tk // kdiv
        if rows % 8 == 0:
            in_specs.append(
                pl.BlockSpec((rows, tn), lambda i, j: (j, i), memory_space=pltpu.VMEM)
            )
            slice_rows.append(None)
        else:
            in_specs.append(
                pl.BlockSpec((k // kdiv, tn), lambda i, j: (0, i), memory_space=pltpu.VMEM)
            )
            slice_rows.append(rows)
    args.extend(planes_tuple)

    kernel = functools.partial(_w4a8dd_kernel, fmt, fold, tk, tn, has_b, tuple(slice_rows))
    qbytes = sum(int(np.prod(p.shape)) * p.dtype.itemsize for p in planes_tuple)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * g * k * n // 2, bytes_accessed=qbytes + 4 * n, transcendentals=0
        ),
        interpret=interpret,
    )(*args)


def _quant_acts(x: jax.Array, group: int):
    """Per-group symmetric int8 activation quantization (the analogue of
    the reference's quantize_row_q8_0/q8_2).  x: [1, K] -> (xq int8 [1,K],
    dx f32 [G,128] lane-replicated, e = dx*sum(xq) f32 [G,128])."""
    m, k = x.shape
    g = x.astype(jnp.float32).reshape(m, k // group, group)
    dx = jnp.max(jnp.abs(g), axis=-1) / 127.0
    dx = jnp.maximum(dx, 1e-12)
    xq = jnp.clip(jnp.round(g / dx[..., None]), -127, 127).astype(jnp.int8)
    sq = jnp.sum(xq.astype(jnp.int32), axis=-1).astype(jnp.float32)
    e = dx * sq
    gdim = k // group
    dxb = jnp.broadcast_to(dx[0][:, None], (gdim, 128))
    eb = jnp.broadcast_to(e[0][:, None], (gdim, 128))
    return xq.reshape(m, k), dxb, eb


def supports_w4a8(qt: QTensor, m: int) -> bool:
    return m == 1 and qt.fmt in _INT_FMT and supports(qt)


def _pick_tiles(qt: QTensor, k: int, n: int, prologue: str = "q") -> tuple[int, int, bool]:
    """(tn, tk, fuse_act_quant) for an M=1 matvec from env/table/heuristic."""
    import os

    tn = tk = 0
    fuse = True
    if "ZLLM_QMM_TN" not in os.environ and "ZLLM_QMM_TK_MULT" not in os.environ:
        from . import qtune

        cand = qtune.lookup(qt.fmt.name, k, n, qt.fold,
                            _plane_kdiv(qt.fmt, _PLANE_ORDER[qt.fmt][0]), prologue=prologue)
        if cand and n % cand[0] == 0 and k % cand[1] == 0 and cand[1] % qt.fold == 0:
            tn, tk = cand[0], cand[1]
            fuse = bool(cand[2])
    if not tn:
        tn_pref = int(os.environ.get("ZLLM_QMM_TN", "2048"))
        tn = next((t for t in (tn_pref, 2048, 1024, 512, 256, 128) if n % t == 0), 128)
        tk = qt.fold
        mult = int(os.environ.get("ZLLM_QMM_TK_MULT", "2"))
        if mult > 1 and k % (qt.fold * mult) == 0:
            tk = qt.fold * mult
    env_fuse = os.environ.get("ZLLM_QMM_FUSEQ")
    if env_fuse is not None:
        fuse = env_fuse == "1"
    return tn, tk, fuse


def qmatmul_w4a8(x: jax.Array, qt: QTensor, *, interpret: bool = False) -> jax.Array:
    """Decode-shaped (M=1) fused quantized matvec on the int8 MXU path."""
    import os

    k, n = local_shape(qt)
    group = _INT_FMT[qt.fmt][0]
    tn, tk, fuse = _pick_tiles(qt, k, n)
    names = _plane_names(qt)
    diet = names is _Q4K_DIET
    planes_tuple = tuple(_plane_view(qt, nm) for nm in names)
    if qt.npack:
        call = (_qmm_w4a8np_hbm_call if _hbm_np_ok(qt, tn, tk, k, n)
                else _qmm_w4a8np_call)
        return call(
            x, None, planes_tuple, fmt=qt.fmt, fold=qt.fold, k=k, n=n,
            tn=tn, tk=tk, fuse="q", diet=diet, interpret=interpret,
        )
    if fuse:
        return _qmm_w4a8_call(
            x, None, None, None, planes_tuple, fmt=qt.fmt, fold=qt.fold, k=k, n=n,
            tn=tn, tk=tk, fuse="q", diet=diet, interpret=interpret,
        )
    xq, dx, e = _quant_acts(x, group)
    if qt.fmt in _DUALDOT_FMTS and os.environ.get("ZLLM_QMM_DUALDOT", "0") == "1":
        # lo/hi-ordered activation codes (one row per nibble position)
        xq2 = xq.reshape(k // qt.fold, 2, qt.fold // 2).transpose(1, 0, 2).reshape(2, k // 2)
        return _qmm_w4a8dd_call(
            xq2, dx, e, planes_tuple, fmt=qt.fmt, fold=qt.fold, k=k, n=n, tn=tn,
            interpret=interpret,
        )
    return _qmm_w4a8_call(
        xq, dx, e, None, planes_tuple, fmt=qt.fmt, fold=qt.fold, k=k, n=n, tn=tn, tk=tk,
        diet=diet, interpret=interpret
    )


def qmatvec_norm(
    x: jax.Array, wn: jax.Array, eps: float, qt: QTensor, *, interpret: bool = False
) -> jax.Array:
    """y[1, N] = rms_norm(x, wn, eps) @ dequant(qt), norm fused into the
    matvec prologue (x [1, K] is the RAW residual row).  Removes the
    separate norm kernel launch and its normalized-row HBM round-trip —
    the reference fuses norms into graph epilogues the same way via
    ggml_cuda fusion (ggml/src/ggml-cuda/ggml-cuda.cu RMS_NORM+MUL fusion)."""
    k, n = local_shape(qt)
    group = _INT_FMT[qt.fmt][0]
    tn, tk, _ = _pick_tiles(qt, k, n, prologue="norm")
    names = _plane_names(qt)
    diet = names is _Q4K_DIET
    planes_tuple = tuple(_plane_view(qt, nm) for nm in names)
    if qt.npack:
        call = (_qmm_w4a8np_hbm_call if _hbm_np_ok(qt, tn, tk, k, n)
                else _qmm_w4a8np_call)
        return call(
            x, wn.reshape(1, k), planes_tuple, fmt=qt.fmt, fold=qt.fold, k=k, n=n,
            tn=tn, tk=tk, fuse="norm", eps=float(eps), diet=diet,
            interpret=interpret,
        )
    return _qmm_w4a8_call(
        x, None, None, wn.reshape(1, k), planes_tuple, fmt=qt.fmt, fold=qt.fold,
        k=k, n=n, tn=tn, tk=tk, fuse="norm", eps=float(eps), diet=diet,
        interpret=interpret,
    )


def qmatvec_glu(gup: jax.Array, qt: QTensor, *, interpret: bool = False) -> jax.Array:
    """y[1, N] = swiglu(gup[:, :F], gup[:, F:]) @ dequant(qt), with the
    silu(g)*u gating fused into the matvec prologue.  gup is the fused
    gate|up projection output [1, 2F] (reference analogue: the
    LLM_FFN_SWIGLU epilogue of build_ffn, src/llama-graph.cpp:1160)."""
    k, n = local_shape(qt)
    group = _INT_FMT[qt.fmt][0]
    tn, tk, _ = _pick_tiles(qt, k, n, prologue="glu")
    names = _plane_names(qt)
    diet = names is _Q4K_DIET
    planes_tuple = tuple(_plane_view(qt, nm) for nm in names)
    if qt.npack:
        call = (_qmm_w4a8np_hbm_call if _hbm_np_ok(qt, tn, tk, k, n)
                else _qmm_w4a8np_call)
        return call(
            gup, None, planes_tuple, fmt=qt.fmt, fold=qt.fold, k=k, n=n,
            tn=tn, tk=tk, fuse="glu", diet=diet, interpret=interpret,
        )
    return _qmm_w4a8_call(
        gup, None, None, None, planes_tuple, fmt=qt.fmt, fold=qt.fold, k=k, n=n,
        tn=tn, tk=tk, fuse="glu", diet=diet, interpret=interpret,
    )


# ---------------------------------------------------------------------------
# HBM-pinned npack decode: weight planes stay in HBM, the kernel DMAs its
# own tiles (hand double-buffered)
# ---------------------------------------------------------------------------
# Round-5 experiment, OFF by default (ZLLM_QMM_HBM=1 enables).  The
# round-4 hypothesis was that XLA memory-space assignment pre-staging
# weight planes through alternate memory (S(1)) cost ~173us/step of
# copy/slice waits, and that HBM-pinned refs + in-kernel make_async_copy
# (the recipe that fixed the attention caches) would remove it.  Measured
# on TinyLlama Q4_K decode (tools/exp_hbmpin.py + full-model A/B):
#   - MSA stages the planes into S(1) EVEN when the BlockSpec says
#     memory_space=HBM (380 slice ops/step remain), so the staging is
#     not suppressible from Pallas; and
#   - this hand-rolled DMA chain is slower in-kernel than Mosaic's
#     auto-pipeline (904 vs 792 us/step over the 89 matvecs; device
#     total 1088 vs 1027), because staged S(1) reads are faster than
#     the straight HBM reads this kernel does.
# Net: the auto-pipelined kernel + MSA staging is the better system on
# this toolchain.  Kept as an A/B harness because the balance depends on
# MSA behavior, which future libtpu versions may change.

def _w4a8np_hbm_kernel(fmt, tk, tn, group, has_b, fuse, eps, diet, kb, nb, nh,
                       x_ref, *refs):
    half = tn // 2
    gt = tk // group
    if fuse == "norm":
        r_ref = refs[-1]
        refs = refs[:-1]
    else:
        r_ref = None
    if fuse in ("norm", "glu"):
        aux_ref, refs = refs[0], refs[1:]
    else:
        aux_ref = None
    if diet:
        (qs_ref, sm_ref, sd_ref, sb_ref, out_ref,
         qbuf, smbuf, sdbuf, sbbuf, dsem, ssem) = refs
        blocked = ((sm_ref, smbuf),)
        supers = ((sd_ref, sdbuf), (sb_ref, sbbuf))
    elif has_b:
        qs_ref, a_ref, b_ref, out_ref, qbuf, abuf, bbuf, dsem = refs
        blocked = ((a_ref, abuf), (b_ref, bbuf))
        supers = ()
    else:
        qs_ref, a_ref, out_ref, qbuf, abuf, dsem = refs
        blocked = ((a_ref, abuf),)
        supers = ()

    i = pl.program_id(0)
    j = pl.program_id(1)
    t = i * kb + j

    def start_fetch(t2, slot):
        i2 = t2 // kb
        j2 = t2 - i2 * kb
        pltpu.make_async_copy(
            qs_ref.at[pl.ds(j2 * tk, tk), pl.ds(i2 * half, half)],
            qbuf.at[slot], dsem.at[slot, 0]).start()
        for m, (p_ref, pbuf) in enumerate(blocked):
            pltpu.make_async_copy(
                p_ref.at[pl.ds(j2 * gt, gt), pl.ds(i2 * half, half)],
                pbuf.at[slot, 0], dsem.at[slot, 1 + 2 * m]).start()
            pltpu.make_async_copy(
                p_ref.at[pl.ds(j2 * gt, gt), pl.ds(nh + i2 * half, half)],
                pbuf.at[slot, 1], dsem.at[slot, 2 + 2 * m]).start()
        if supers:
            # per-256 super planes are constant across the K sweep: fetch
            # once per N tile, double-buffered on i parity
            @pl.when(j2 == 0)
            def _():
                sl = jax.lax.rem(i2, 2)
                for m, (p_ref, pbuf) in enumerate(supers):
                    pltpu.make_async_copy(
                        p_ref.at[:, pl.ds(i2 * half, half)],
                        pbuf.at[sl, 0], ssem.at[sl, 2 * m]).start()
                    pltpu.make_async_copy(
                        p_ref.at[:, pl.ds(nh + i2 * half, half)],
                        pbuf.at[sl, 1], ssem.at[sl, 1 + 2 * m]).start()

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        start_fetch(0, 0)

    @pl.when(t + 1 < nb * kb)
    def _():
        start_fetch(t + 1, 1 - slot)

    # wait on this step's tiles (same descriptors as the start)
    pltpu.make_async_copy(
        qs_ref.at[pl.ds(j * tk, tk), pl.ds(i * half, half)],
        qbuf.at[slot], dsem.at[slot, 0]).wait()
    for m, (p_ref, pbuf) in enumerate(blocked):
        pltpu.make_async_copy(
            p_ref.at[pl.ds(j * gt, gt), pl.ds(i * half, half)],
            pbuf.at[slot, 0], dsem.at[slot, 1 + 2 * m]).wait()
        pltpu.make_async_copy(
            p_ref.at[pl.ds(j * gt, gt), pl.ds(nh + i * half, half)],
            pbuf.at[slot, 1], dsem.at[slot, 2 + 2 * m]).wait()
    if supers:
        @pl.when(j == 0)
        def _():
            sl = jax.lax.rem(i, 2)
            for m, (p_ref, pbuf) in enumerate(supers):
                pltpu.make_async_copy(
                    p_ref.at[:, pl.ds(i * half, half)],
                    pbuf.at[sl, 0], ssem.at[sl, 2 * m]).wait()
                pltpu.make_async_copy(
                    p_ref.at[:, pl.ds(nh + i * half, half)],
                    pbuf.at[sl, 1], ssem.at[sl, 1 + 2 * m]).wait()

    x_bd, dx, sx = _prologue_quant(fuse, eps, group, gt, tk, j, x_ref, aux_ref, r_ref)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    bp = qbuf[slot]  # int8 [TK, TN/2]
    lo = pltpu.bitcast(pltpu.bitcast(bp, jnp.uint8) & 0x0F, jnp.int8)
    pi_full = jax.lax.dot_general(
        x_bd, bp, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    pi_lo = jax.lax.dot_general(
        x_bd, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    pi_hi = (pi_full - pi_lo + 128 * sx) >> 4
    if fmt == GGMLType.Q4_0:
        pi_lo = pi_lo - 8 * sx
        pi_hi = pi_hi - 8 * sx
    if diet:
        isl = jax.lax.rem(i, 2)
        a_lo, b_lo = _q4k_group_scales(
            smbuf[slot, 0], sdbuf[isl, 0], sbbuf[isl, 0],
            gt, half, j, gt // 8, kb)
        a_hi, b_hi = _q4k_group_scales(
            smbuf[slot, 1], sdbuf[isl, 1], sbbuf[isl, 1],
            gt, half, j, gt // 8, kb)
    else:
        a_lo = _load_f16(abuf[slot, 0])
        a_hi = _load_f16(abuf[slot, 1])
        if has_b:
            b_lo = _load_f16(bbuf[slot, 0])
            b_hi = _load_f16(bbuf[slot, 1])
    c_lo = pi_lo.astype(jnp.float32) * a_lo * dx
    c_hi = pi_hi.astype(jnp.float32) * a_hi * dx
    if has_b:
        e = dx * sx.astype(jnp.float32)
        c_lo = c_lo - b_lo * e
        c_hi = c_hi - b_hi * e
    out_ref[0:1, :] += jnp.sum(c_lo, axis=0, keepdims=True)
    out_ref[1:2, :] += jnp.sum(c_hi, axis=0, keepdims=True)


@functools.partial(
    jax.jit,
    static_argnames=("fmt", "fold", "k", "n", "tn", "tk", "fuse", "eps", "diet",
                     "interpret"),
)
def _qmm_w4a8np_hbm_call(
    x, wn, planes_tuple, *, fmt, fold, k, n, tn, tk=0, fuse="q", eps=0.0,
    diet=False, interpret=False
):
    group, _, bname = _INT_FMT[fmt]
    tk = tk or fold
    gt = tk // group
    half = tn // 2
    has_b = bname is not None
    nb = n // tn
    kb = k // tk
    grid = (nb, kb)
    hbm = pltpu.MemorySpace.HBM

    if fuse == "norm":
        in_specs = [
            pl.BlockSpec((1, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ]
        args = [x, wn]
    elif fuse == "glu":
        in_specs = [
            pl.BlockSpec((1, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda i, j, _kb=kb: (0, _kb + j),
                         memory_space=pltpu.VMEM),
        ]
        args = [x, x]
    else:
        in_specs = [
            pl.BlockSpec((1, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM)
        ]
        args = [x]
    in_specs.extend(pl.BlockSpec(memory_space=hbm) for _ in planes_tuple)
    args.extend(planes_tuple)

    qs, scale_planes = planes_tuple[0], planes_tuple[1:]
    scratch = [pltpu.VMEM((2, tk, half), qs.dtype)]
    nblk = 1 if diet else len(scale_planes)
    for p in scale_planes[:nblk]:
        scratch.append(pltpu.VMEM((2, 2, gt, half), p.dtype))
    if diet:
        for p in scale_planes[1:]:
            scratch.append(pltpu.VMEM((2, 2, p.shape[0], half), p.dtype))
    scratch.append(pltpu.SemaphoreType.DMA((2, 1 + 2 * nblk)))
    if diet:
        scratch.append(pltpu.SemaphoreType.DMA((2, 4)))
    if fuse == "norm":
        scratch.append(pltpu.SMEM((1,), jnp.float32))

    kernel = functools.partial(_w4a8np_hbm_kernel, fmt, tk, tn, group, has_b,
                               fuse, eps, diet, kb, nb, n // 2)
    qbytes = int(np.prod(qs.shape)) + sum(
        int(np.prod(p.shape)) * p.dtype.itemsize for p in scale_planes)
    out2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((2, half), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, n // 2), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (k // group) * k * n, bytes_accessed=qbytes + 4 * n,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out2.reshape(1, n)


def _hbm_np_ok(qt: QTensor, tn: int, tk: int, k: int, n: int) -> bool:
    """HBM-pinned variant preconditions: DMA-sliceable tiles."""
    import os

    if os.environ.get("ZLLM_QMM_HBM", "0") != "1":
        return False
    if "qh" in qt.planes:  # Q5 bit-plane not wired into the DMA chain
        return False
    group = _INT_FMT[qt.fmt][0]
    return (
        tk % (8 * group) == 0  # >=8 scale-plane rows per k-step DMA
        and tn % 256 == 0
        and k % tk == 0
        and n % tn == 0
    )


# ---------------------------------------------------------------------------
# npack prefill GEMM: dequantize lo/hi column halves straight from the
# packed bytes (one widen + mask/shift/xor; no sublane concat relayout)
# ---------------------------------------------------------------------------

def _qmm_np_kernel(fmt, tk, tn, diet, x_ref, *refs):
    out_ref = refs[-1]  # [2, M, TN/2]
    q5 = fmt in (GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q5_K)
    if q5:
        qs_ref, qh_lo_ref, qh_hi_ref = refs[-4], refs[-3], refs[-2]
        scale_refs = refs[:-4]
    else:
        qs_ref = refs[-2]
        scale_refs = refs[:-2]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    half = tn // 2
    bp = pltpu.bitcast(qs_ref[:], jnp.uint8).astype(jnp.int32)  # [TK, TN/2]
    lo = (bp & 0xF).astype(jnp.float32)
    hi = ((bp >> 4) ^ 0x8).astype(jnp.float32)  # XOR 0x80 flipped the top bit
    if q5:  # the 5th bit rides separate per-half bit-planes
        lo = lo + 16.0 * _q5k_bits(
            qh_lo_ref[:].astype(jnp.int32), tk, half).astype(jnp.float32)
        hi = hi + 16.0 * _q5k_bits(
            qh_hi_ref[:].astype(jnp.int32), tk, half).astype(jnp.float32)
    if diet:  # Q4_K exact two-level scales (see _q4k_group_scales)
        g32 = tk // 32
        al32, bl32 = _q4k_group_scales(
            scale_refs[0][:], scale_refs[2][:], scale_refs[4][:],
            g32, half, j, tk // 256, pl.num_programs(1))
        ah32, bh32 = _q4k_group_scales(
            scale_refs[1][:], scale_refs[3][:], scale_refs[5][:],
            g32, half, j, tk // 256, pl.num_programs(1))
        w_lo = lo * _gexpand(al32, 32, tk, half) - _gexpand(bl32, 32, tk, half)
        w_hi = hi * _gexpand(ah32, 32, tk, half) - _gexpand(bh32, 32, tk, half)
    else:
        a_lo = _gexpand(_load_f16(scale_refs[0][:]), 32, tk, half)
        a_hi = _gexpand(_load_f16(scale_refs[1][:]), 32, tk, half)
        if fmt == GGMLType.Q4_0:
            w_lo = (lo - 8.0) * a_lo
            w_hi = (hi - 8.0) * a_hi
        elif fmt == GGMLType.Q5_0:
            w_lo = (lo - 16.0) * a_lo
            w_hi = (hi - 16.0) * a_hi
        else:
            w_lo = lo * a_lo - _gexpand(_load_f16(scale_refs[2][:]), 32, tk, half)
            w_hi = hi * a_hi - _gexpand(_load_f16(scale_refs[3][:]), 32, tk, half)
    xb = x_ref[:].astype(jnp.bfloat16)
    out_ref[0] += jnp.dot(xb, w_lo.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    out_ref[1] += jnp.dot(xb, w_hi.astype(jnp.bfloat16), preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("fmt", "fold", "k", "n", "tn", "diet", "interpret"))
def _qmm_np_call(x, planes_tuple, *, fmt, fold, k, n, tn, diet=False, interpret=False):
    import os as _os

    m = x.shape[0]
    # round-5 device profile (TinyLlama prefill 512): TK_MULT=8 cuts the
    # np-GEMM device time ~9% (fewer grid steps); pick the largest
    # multiplier <= MULT that divides K.
    # XLA's memory-space pass parks mid-size full operands (x, the f32
    # output) in S(1) vmem at prefill shapes — small ones are cheap, huge
    # ones stay in HBM, but a 6-16MB resident plus fat kernel tiles blows
    # the 16MB scoped budget (the 8B fused-qkv compile OOM).  Use the fat
    # tiles only outside that danger window.
    danger = any(6 * 2**20 <= b <= 16 * 2**20 for b in (m * n * 4, m * k * 4))
    mult = int(_os.environ.get("ZLLM_QMM_TK_MULT", "2" if danger else "8"))
    tk = fold
    for mm in range(mult, 1, -1):
        if k % (fold * mm) == 0:
            tk = fold * mm
            break
    gt = tk // 32
    nb = n // tn
    grid = (nb, k // tk)
    q5 = fmt in (GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q5_K)
    if q5:  # planes: qs, qh (bit-plane [K/8, N]), a[, b]
        qs, qh = planes_tuple[0], planes_tuple[1]
        scale_planes = planes_tuple[2:]
    else:
        qs, scale_planes = planes_tuple[0], planes_tuple[1:]

    in_specs = [pl.BlockSpec((m, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM)]
    args = [x]
    for pi_, p in enumerate(scale_planes):
        if diet and pi_ > 0:  # sd / sb super planes ride whole (see np decode)
            in_specs.append(
                pl.BlockSpec((p.shape[0], tn // 2), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM))
            in_specs.append(
                pl.BlockSpec((p.shape[0], tn // 2), lambda i, j, _nb=nb: (0, i + _nb),
                             memory_space=pltpu.VMEM))
        else:
            in_specs.append(
                pl.BlockSpec((gt, tn // 2), lambda i, j: (j, i), memory_space=pltpu.VMEM))
            in_specs.append(
                pl.BlockSpec((gt, tn // 2), lambda i, j, _nb=nb: (j, i + _nb),
                             memory_space=pltpu.VMEM))
        args.extend([p, p])
    in_specs.append(
        pl.BlockSpec((tk, tn // 2), lambda i, j: (j, i), memory_space=pltpu.VMEM))
    args.append(qs)
    if q5:  # [TK/8, TN/2] bit-plane tiles per column half
        in_specs.append(
            pl.BlockSpec((tk // 8, tn // 2), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM))
        in_specs.append(
            pl.BlockSpec((tk // 8, tn // 2), lambda i, j, _nb=nb: (j, i + _nb),
                         memory_space=pltpu.VMEM))
        args.extend([qh, qh])

    kernel = functools.partial(_qmm_np_kernel, fmt, tk, tn, diet)
    qbytes = int(np.prod(qs.shape)) + sum(
        2 * int(np.prod(p.shape)) * p.dtype.itemsize for p in scale_planes)
    if q5:
        qbytes += int(np.prod(planes_tuple[1].shape))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((2, m, tn // 2), lambda i, j: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, m, n // 2), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n, bytes_accessed=qbytes + 4 * m * (k + n),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    # [lo columns | hi columns] along N == original order (global pairing)
    return jnp.concatenate([out[0], out[1]], axis=1)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _qmm_kernel(fmt, fold, tk, tn, slice_rows, names, x_ref, *refs):
    out_ref = refs[-1]
    plane_refs = refs[:-1]
    j = pl.program_id(1)
    planes = {}
    for nm, r, srows in zip(names, plane_refs, slice_rows):
        if srows is None or nm in ("sd", "sb"):
            # k-blocked plane (spec already sliced) or a Q4_K diet super
            # plane (kept whole; _q4k_group_scales row-selects by matmul)
            planes[nm] = r[:]
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


@functools.partial(jax.jit,
                   static_argnames=("fmt", "fold", "k", "n", "tn", "diet", "interpret"))
def _qmm_call(x, planes_tuple, *, fmt, fold, k, n, tn, diet=False, interpret=False):
    import os as _os

    m = x.shape[0]
    tk = fold
    mult = int(_os.environ.get("ZLLM_QMM_TK_MULT", "2"))
    if mult > 1 and k % (fold * mult) == 0:
        tk = fold * mult
    names = _Q4K_DIET if diet else _PLANE_ORDER[fmt]
    grid = (n // tn, k // tk)

    in_specs = [pl.BlockSpec((m, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM)]
    slice_rows = []
    for nm, arr in zip(names, planes_tuple):
        kdiv = _plane_kdiv(fmt, nm)
        rows = tk // kdiv
        if rows % 8 == 0 and nm not in ("sd", "sb"):
            in_specs.append(
                pl.BlockSpec((rows, tn), lambda i, j: (j, i), memory_space=pltpu.VMEM)
            )
            slice_rows.append(None)
        else:
            # too few rows per k-step for a legal block (or a diet super
            # plane, row-selected in-kernel by dynamic roll): keep the whole
            # (small) K extent resident per N-tile
            in_specs.append(
                pl.BlockSpec((arr.shape[0], tn), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM)
            )
            slice_rows.append(rows)

    kernel = functools.partial(_qmm_kernel, fmt, fold, tk, tn, tuple(slice_rows), names)
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
    if qt.npack:  # qs is [K, N//2] packed bytes
        p = qt.planes["qs"]
        return p.shape[0], p.shape[1] * 2
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
    import os

    if supports_w4a8(qt, x.shape[0]) and os.environ.get("ZLLM_QMM_W4A8", "1") == "1":
        return qmatmul_w4a8(x, qt, interpret=interpret)
    k, n = local_shape(qt)

    # TN=512 measured ~17% faster full-model decode than 256 (fewer grid
    # steps); round-5 prefill profile: TN=2048 with TK_MULT=8 cuts the
    # np-GEMM device time another 3% over TN=1024.  Narrow-dtype (u8/bf16)
    # dequant is blocked on Mosaic's missing u8 shift legalization
    m0 = x.shape[0]
    danger = any(6 * 2**20 <= b <= 16 * 2**20
                 for b in (m0 * n * 4, m0 * k * 4))  # see _qmm_np_call
    tn_pref = int(os.environ.get("ZLLM_QMM_TN", "1024" if danger else "2048"))
    tn = next((t for t in (tn_pref, 2048, 1024, 512, 256, 128) if n % t == 0), 128)
    names = _plane_names(qt)
    diet = names is _Q4K_DIET
    planes_tuple = tuple(_plane_view(qt, nm) for nm in names)
    if qt.npack:
        if tn < 256:  # packed tile needs >= 128 lanes
            return (x @ qt.dequant(x.dtype)).astype(jnp.float32)
        return _qmm_np_call(x, planes_tuple, fmt=qt.fmt, fold=qt.fold, k=k, n=n,
                            tn=tn, diet=diet, interpret=interpret)
    y = _qmm_call(x, planes_tuple, fmt=qt.fmt, fold=qt.fold, k=k, n=n, tn=tn,
                  diet=diet, interpret=interpret)
    return y


def install(interpret: bool = False):
    """Route zllm.ops.linear's QTensor matmuls through the fused kernel."""
    from . import linear

    linear.set_fused_matmul(lambda x, qt: qmatmul(x, qt, interpret=interpret))

    def norm_mv(x, wn, eps, qt):
        if not (isinstance(qt, QTensor) and supports_w4a8(qt, x.shape[0])
                and qt.psum_axis is None and qt.gather_axis is None):
            return None
        if local_shape(qt)[0] != x.shape[1]:
            return None
        return qmatvec_norm(x, wn, eps, qt, interpret=interpret)

    def glu_mv(gup, qt):
        if not (isinstance(qt, QTensor) and gup.shape[0] == 1
                and qt.fmt in _INT_FMT and supports(qt)
                and qt.psum_axis is None and qt.gather_axis is None):
            return None
        if 2 * local_shape(qt)[0] != gup.shape[1]:
            return None
        return qmatvec_glu(gup, qt, interpret=interpret)

    linear.set_fused_decode(norm_mv, glu_mv)
