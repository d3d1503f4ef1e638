"""Blockwise quantization codecs (numpy, host-side).

Decode/encode for the GGML block formats (layouts: reference
ggml/src/ggml-common.h:89-430; reference kernels: ggml/src/ggml-quants.c).
These are the host-side reference codecs: the TPU execution path never calls
them per-step — weights are repacked once at load (zllm.quant.repack) and
dequantized inside Pallas kernels.  Decoders are bit-compatible with the
reference; encoders produce valid blocks (the simple formats match the
reference's rounding exactly, the K-quant encoders use our own scale search).

All functions operate on `blocks: uint8[N, type_size] -> f32[N, block_size]`
(decode) and the reverse (encode).  Use `dequantize`/`quantize` for whole
tensors with arbitrary leading shape.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from ..gguf.constants import GGML_BLOCK_SIZES, QK_K, GGMLType

_DECODERS: dict[GGMLType, Callable[[np.ndarray], np.ndarray]] = {}
_ENCODERS: dict[GGMLType, Callable[[np.ndarray], np.ndarray]] = {}


def _decoder(gtype: GGMLType):
    def wrap(fn):
        _DECODERS[gtype] = fn
        return fn

    return wrap


def _encoder(gtype: GGMLType):
    def wrap(fn):
        _ENCODERS[gtype] = fn
        return fn

    return wrap


# ---------------------------------------------------------------------------
# shared bit-fiddling helpers
# ---------------------------------------------------------------------------

def _f16(b: np.ndarray) -> np.ndarray:
    """fp16 bytes -> f32 column vector."""
    return b.view("<f2").astype(np.float32)


def _to_f16_bytes(x: np.ndarray) -> np.ndarray:
    return x.astype("<f2").view(np.uint8)


def _nib_lo_hi(qs: np.ndarray, pair: int) -> np.ndarray:
    """Unpack ggml nibble pairing: within each run of `pair` bytes, low
    nibbles are elements [0, pair), high nibbles are elements [pair, 2*pair).
    qs: uint8[N, B] with B % pair == 0 -> uint8[N, 2*B] element-ordered."""
    n = qs.shape[0]
    g = qs.reshape(n, -1, pair)
    lo = g & np.uint8(0x0F)
    hi = g >> np.uint8(4)
    return np.stack([lo, hi], axis=2).reshape(n, -1)


def _nib_pack(q: np.ndarray, pair: int) -> np.ndarray:
    """Inverse of _nib_lo_hi: element-ordered 4-bit values -> packed bytes."""
    n = q.shape[0]
    g = q.reshape(n, -1, 2, pair).astype(np.uint8)
    return (g[:, :, 0, :] | (g[:, :, 1, :] << np.uint8(4))).reshape(n, -1)


def _bits_unpack(b: np.ndarray, nbits: int, stride: int) -> np.ndarray:
    """Unpack `nbits`-wide fields: element (k*stride + j) lives in byte j at
    bit position k*nbits.  b: uint8[N, stride] -> uint8[N, (8//nbits)*stride]."""
    n = b.shape[0]
    per = 8 // nbits
    shifts = (np.arange(per, dtype=np.uint8) * nbits).reshape(1, per, 1)
    vals = (b.reshape(n, 1, stride) >> shifts) & np.uint8((1 << nbits) - 1)
    return vals.reshape(n, per * stride)


def _bits_pack(q: np.ndarray, nbits: int, stride: int) -> np.ndarray:
    """Inverse of _bits_unpack."""
    n = q.shape[0]
    per = 8 // nbits
    g = q.reshape(n, per, stride).astype(np.uint8)
    shifts = (np.arange(per, dtype=np.uint8) * nbits).reshape(1, per, 1)
    return np.bitwise_or.reduce(g << shifts, axis=1)


def _round_away(x: np.ndarray) -> np.ndarray:
    """Round half away from zero (C roundf), unlike numpy's banker rounding."""
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def _signed_absmax(x: np.ndarray) -> np.ndarray:
    """Per-row value with the largest magnitude, sign preserved -> [N,1]."""
    idx = np.abs(x).argmax(axis=-1, keepdims=True)
    return np.take_along_axis(x, idx, axis=-1)


def _safe_inv(d: np.ndarray) -> np.ndarray:
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(d != 0, 1.0 / d, 0.0)


# ---------------------------------------------------------------------------
# trivial scalar formats
# ---------------------------------------------------------------------------

@_decoder(GGMLType.F32)
def _dec_f32(b):
    return b.view("<f4").astype(np.float32)


@_decoder(GGMLType.F16)
def _dec_f16(b):
    return _f16(b)


@_decoder(GGMLType.F64)
def _dec_f64(b):
    return b.view("<f8").astype(np.float32)


@_decoder(GGMLType.BF16)
def _dec_bf16(b):
    return (b.view("<u2").astype(np.uint32) << 16).view(np.float32)


for _t, _dt in ((GGMLType.I8, "<i1"), (GGMLType.I16, "<i2"), (GGMLType.I32, "<i4"), (GGMLType.I64, "<i8")):
    _DECODERS[_t] = (lambda dt: lambda b: b.view(dt).astype(np.float32))(_dt)


@_encoder(GGMLType.F32)
def _enc_f32(x):
    return x.astype("<f4").view(np.uint8)


@_encoder(GGMLType.F16)
def _enc_f16(x):
    return _to_f16_bytes(x)


@_encoder(GGMLType.BF16)
def _enc_bf16(x):
    u = x.astype(np.float32).view(np.uint32)
    # quiet NaNs, then round-to-nearest-even into the top 16 bits
    u = np.where((u & 0x7FFFFFFF) > 0x7F800000, (u & np.uint32(0xFFFF0000)) | np.uint32(0x00400000), u)
    u = ((u.astype(np.uint64) + (0x7FFF + ((u >> 16) & 1))) >> 16).astype(np.uint16)
    return u.view(np.uint8)


# ---------------------------------------------------------------------------
# 32-wide legacy blocks
# ---------------------------------------------------------------------------

@_decoder(GGMLType.Q4_0)
def _dec_q4_0(b):
    d, qs = b[:, :2], b[:, 2:]
    q = _nib_lo_hi(qs, 16).astype(np.int8) - np.int8(8)
    return _f16(d) * q.astype(np.float32)


@_encoder(GGMLType.Q4_0)
def _enc_q4_0(x):
    d = _signed_absmax(x) / -8.0
    q = np.trunc(x * _safe_inv(d) + 8.5).clip(0, 15).astype(np.uint8)
    return np.concatenate([_to_f16_bytes(d), _nib_pack(q, 16)], axis=1)


@_decoder(GGMLType.Q4_1)
def _dec_q4_1(b):
    d, m, qs = b[:, :2], b[:, 2:4], b[:, 4:]
    q = _nib_lo_hi(qs, 16).astype(np.float32)
    return _f16(d) * q + _f16(m)


@_encoder(GGMLType.Q4_1)
def _enc_q4_1(x):
    mx = x.max(axis=-1, keepdims=True)
    mn = x.min(axis=-1, keepdims=True)
    d = (mx - mn) / 15.0
    q = np.trunc((x - mn) * _safe_inv(d) + 0.5).clip(0, 15).astype(np.uint8)
    return np.concatenate([_to_f16_bytes(d), _to_f16_bytes(mn), _nib_pack(q, 16)], axis=1)


def _qh_bits32(qh_bytes: np.ndarray) -> np.ndarray:
    """32 per-element high bits from 4 bytes (bit i -> element i)."""
    n = qh_bytes.shape[0]
    u = qh_bytes.reshape(n, 4)
    bits = np.unpackbits(u, axis=-1, bitorder="little")
    return bits  # [N, 32]


def _qh_pack32(bits: np.ndarray) -> np.ndarray:
    return np.packbits(bits.astype(np.uint8), axis=-1, bitorder="little")


@_decoder(GGMLType.Q5_0)
def _dec_q5_0(b):
    d, qh, qs = b[:, :2], b[:, 2:6], b[:, 6:]
    lo = _nib_lo_hi(qs, 16)
    hi = _qh_bits32(qh)
    q = (lo | (hi << np.uint8(4))).astype(np.int8) - np.int8(16)
    return _f16(d) * q.astype(np.float32)


@_encoder(GGMLType.Q5_0)
def _enc_q5_0(x):
    d = _signed_absmax(x) / -16.0
    q = np.trunc(x * _safe_inv(d) + 16.5).clip(0, 31).astype(np.uint8)
    qs = _nib_pack(q & np.uint8(0x0F), 16)
    qh = _qh_pack32(q >> 4)
    return np.concatenate([_to_f16_bytes(d), qh, qs], axis=1)


@_decoder(GGMLType.Q5_1)
def _dec_q5_1(b):
    d, m, qh, qs = b[:, :2], b[:, 2:4], b[:, 4:8], b[:, 8:]
    q = (_nib_lo_hi(qs, 16) | (_qh_bits32(qh) << np.uint8(4))).astype(np.float32)
    return _f16(d) * q + _f16(m)


@_encoder(GGMLType.Q5_1)
def _enc_q5_1(x):
    mx = x.max(axis=-1, keepdims=True)
    mn = x.min(axis=-1, keepdims=True)
    d = (mx - mn) / 31.0
    q = np.trunc((x - mn) * _safe_inv(d) + 0.5).clip(0, 31).astype(np.uint8)
    qs = _nib_pack(q & np.uint8(0x0F), 16)
    qh = _qh_pack32(q >> 4)
    return np.concatenate([_to_f16_bytes(d), _to_f16_bytes(mn), qh, qs], axis=1)


@_decoder(GGMLType.Q8_0)
def _dec_q8_0(b):
    d, qs = b[:, :2], b[:, 2:]
    return _f16(d) * qs.view(np.int8).astype(np.float32)


@_encoder(GGMLType.Q8_0)
def _enc_q8_0(x):
    d = np.abs(x).max(axis=-1, keepdims=True) / 127.0
    q = _round_away(x * _safe_inv(d)).astype(np.int8)
    return np.concatenate([_to_f16_bytes(d), q.view(np.uint8)], axis=1)


@_decoder(GGMLType.Q8_1)
def _dec_q8_1(b):
    # block_q8_1: f32 d, f32 s (= d * sum(qs)), 32x int8
    d = b[:, :4].view("<f4").astype(np.float32)
    return d * b[:, 8:].view(np.int8).astype(np.float32)


@_encoder(GGMLType.Q8_1)
def _enc_q8_1(x):
    d = np.abs(x).max(axis=-1, keepdims=True) / 127.0
    q = _round_away(x * _safe_inv(d)).astype(np.int8)
    s = (d * q.astype(np.float32).sum(axis=-1, keepdims=True)).astype("<f4")
    return np.concatenate([d.astype("<f4").view(np.uint8), s.view(np.uint8), q.view(np.uint8)], axis=1)


# ---------------------------------------------------------------------------
# MXFP4 (OCP microscaling e2m1 with shared E8M0 scale)
# ---------------------------------------------------------------------------

# e2m1 magnitudes doubled to integers; index = 4-bit code (bit3 = sign)
MXFP4_VALUES = np.array([0, 1, 2, 3, 4, 6, 8, 12, 0, -1, -2, -3, -4, -6, -8, -12], dtype=np.int8)


def e8m0_half_to_f32(e: np.ndarray) -> np.ndarray:
    """2**(e-127)/2 as float32 bits, denormal-safe (ggml_e8m0_to_fp32_half)."""
    e = e.astype(np.uint32)
    bits = np.where(e < 2, np.uint32(0x00200000) << e, (e - 1) << np.uint32(23))
    return bits.view(np.float32)


@_decoder(GGMLType.MXFP4)
def _dec_mxfp4(b):
    e, qs = b[:, :1], b[:, 1:]
    d = e8m0_half_to_f32(e)
    idx = _nib_lo_hi(qs, 16)
    return d * MXFP4_VALUES[idx].astype(np.float32)


@_encoder(GGMLType.MXFP4)
def _enc_mxfp4(x):
    amax = np.abs(x).max(axis=-1, keepdims=True)
    with np.errstate(divide="ignore"):
        e = np.where(amax > 0, np.floor(np.log2(amax)) - 2 + 127, 0).astype(np.uint8)
    d = e8m0_half_to_f32(e)
    err = np.abs(d[:, :, None] * MXFP4_VALUES.astype(np.float32)[None, None, :] - x[:, :, None])
    idx = err.argmin(axis=-1).astype(np.uint8)
    return np.concatenate([e, _nib_pack(idx, 16)], axis=1)


# ---------------------------------------------------------------------------
# K-quant superblocks (256 elements)
# ---------------------------------------------------------------------------

def _unpack_kscales(sb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Q4_K/Q5_K 12-byte packed 6-bit (scale, min) x 8 -> two uint8[N, 8]."""
    n = sb.shape[0]
    a, b, c = sb[:, 0:4], sb[:, 4:8], sb[:, 8:12]
    sc = np.concatenate([a & 0x3F, (c & 0x0F) | ((a >> 6) << 4)], axis=1)
    mn = np.concatenate([b & 0x3F, (c >> 4) | ((b >> 6) << 4)], axis=1)
    return sc.reshape(n, 8), mn.reshape(n, 8)


def _pack_kscales(sc: np.ndarray, mn: np.ndarray) -> np.ndarray:
    """Inverse of _unpack_kscales."""
    sc = sc.astype(np.uint8)
    mn = mn.astype(np.uint8)
    a = (sc[:, :4] & 0x3F) | ((sc[:, 4:] >> 4) << 6)
    b = (mn[:, :4] & 0x3F) | ((mn[:, 4:] >> 4) << 6)
    c = (sc[:, 4:] & 0x0F) | ((mn[:, 4:] & 0x0F) << 4)
    return np.concatenate([a, b, c], axis=1)


@_decoder(GGMLType.Q2_K)
def _dec_q2_k(b):
    n = b.shape[0]
    scales, qs, d, dmin = b[:, :16], b[:, 16:80], b[:, 80:82], b[:, 82:84]
    dl = _f16(d) * (scales & 0x0F).astype(np.float32)  # [N,16]
    ml = _f16(dmin) * (scales >> 4).astype(np.float32)
    q = np.concatenate(
        [_bits_unpack(qs[:, c * 32 : (c + 1) * 32], 2, 32) for c in range(2)], axis=1
    ).reshape(n, 16, 16)
    return (dl[:, :, None] * q.astype(np.float32) - ml[:, :, None]).reshape(n, QK_K)


@_encoder(GGMLType.Q2_K)
def _enc_q2_k(x):
    n = x.shape[0]
    g = x.reshape(n, 16, 16)
    m_f = np.maximum(0.0, -g.min(axis=-1))  # [N,16]
    s_f = np.maximum(0.0, (g.max(axis=-1) + m_f)) / 3.0
    d = s_f.max(axis=-1, keepdims=True) / 15.0
    dmin = m_f.max(axis=-1, keepdims=True) / 15.0
    sc = _round_away(s_f * _safe_inv(d)).clip(0, 15).astype(np.uint8)
    mn = _round_away(m_f * _safe_inv(dmin)).clip(0, 15).astype(np.uint8)
    dl = d * sc.astype(np.float32)
    ml = dmin * mn.astype(np.float32)
    q = _round_away((g + ml[:, :, None]) * _safe_inv(dl)[:, :, None]).clip(0, 3)
    q = q.reshape(n, QK_K).astype(np.uint8)
    qs = np.concatenate([_bits_pack(q[:, c * 128 : (c + 1) * 128], 2, 32) for c in range(2)], axis=1)
    scales = sc | (mn << np.uint8(4))
    return np.concatenate([scales, qs, _to_f16_bytes(d), _to_f16_bytes(dmin)], axis=1)


@_decoder(GGMLType.Q3_K)
def _dec_q3_k(b):
    n = b.shape[0]
    hmask, qs, sb, d = b[:, :32], b[:, 32:96], b[:, 96:108], b[:, 108:110]
    # 6-bit scales: low nibbles in bytes 0-7, top 2 bits in bytes 8-11
    lo = np.concatenate([sb[:, :8] & 0x0F, sb[:, :8] >> 4], axis=1)  # [N,16]
    hi = _bits_unpack(sb[:, 8:12], 2, 4)  # [N,16] order 4s+i
    scales = ((lo | (hi << np.uint8(4))).astype(np.int8) - np.int8(32)).astype(np.float32)
    dl = _f16(d) * scales  # [N,16]
    ql = np.concatenate(
        [_bits_unpack(qs[:, c * 32 : (c + 1) * 32], 2, 32) for c in range(2)], axis=1
    ).astype(np.int8)
    hb = _bits_unpack(hmask, 1, 32)  # element (32b + j) from byte j bit b
    q = ql - np.where(hb == 0, np.int8(4), np.int8(0))
    return (dl[:, :, None] * q.reshape(n, 16, 16).astype(np.float32)).reshape(n, QK_K)


@_encoder(GGMLType.Q3_K)
def _enc_q3_k(x):
    n = x.shape[0]
    g = x.reshape(n, 16, 16)
    s_f = _signed_absmax(g.reshape(-1, 16)).reshape(n, 16) / -4.0
    d = np.abs(s_f).max(axis=-1, keepdims=True) / 31.0
    sc = _round_away(s_f * _safe_inv(d)).clip(-32, 31).astype(np.int8)
    dl = d * sc.astype(np.float32)
    q = _round_away(g * _safe_inv(dl)[:, :, None]).clip(-4, 3).astype(np.int8).reshape(n, QK_K)
    hbit = (q >= 0).astype(np.uint8)  # 1 -> no -4 offset
    ql = np.where(q >= 0, q, q + 4).astype(np.uint8)
    qs = np.concatenate([_bits_pack(ql[:, c * 128 : (c + 1) * 128], 2, 32) for c in range(2)], axis=1)
    hmask = _bits_pack(hbit, 1, 32)
    s6 = (sc.astype(np.int16) + 32).astype(np.uint8)
    lo_bytes = (s6[:, :8] & 0x0F) | ((s6[:, 8:] & 0x0F) << 4)
    hi_bytes = _bits_pack(s6 >> 4, 2, 4)
    return np.concatenate([hmask, qs, lo_bytes, hi_bytes, _to_f16_bytes(d)], axis=1)


@_decoder(GGMLType.Q4_K)
def _dec_q4_k(b):
    n = b.shape[0]
    d, dmin, sb, qs = b[:, :2], b[:, 2:4], b[:, 4:16], b[:, 16:]
    sc, mn = _unpack_kscales(sb)
    dl = _f16(d) * sc.astype(np.float32)  # [N,8]
    ml = _f16(dmin) * mn.astype(np.float32)
    q = _nib_lo_hi(qs, 32).reshape(n, 8, 32)  # 64-element chunks: lo 0-31, hi 32-63
    return (dl[:, :, None] * q.astype(np.float32) - ml[:, :, None]).reshape(n, QK_K)


def _kscale_search(x: np.ndarray, qmax: int) -> tuple[np.ndarray, ...]:
    """Two-level (scale, min) search shared by Q4_K/Q5_K: 8 groups of 32."""
    n = x.shape[0]
    g = x.reshape(n, 8, 32)
    m_f = np.maximum(0.0, -g.min(axis=-1))  # [N,8]
    s_f = np.maximum(0.0, g.max(axis=-1) + m_f) / qmax
    d = s_f.max(axis=-1, keepdims=True) / 63.0
    dmin = m_f.max(axis=-1, keepdims=True) / 63.0
    sc = _round_away(s_f * _safe_inv(d)).clip(0, 63).astype(np.uint8)
    mn = _round_away(m_f * _safe_inv(dmin)).clip(0, 63).astype(np.uint8)
    dl = d * sc.astype(np.float32)
    ml = dmin * mn.astype(np.float32)
    q = _round_away((g + ml[:, :, None]) * _safe_inv(dl)[:, :, None]).clip(0, qmax)
    return d, dmin, sc, mn, q.reshape(n, QK_K).astype(np.uint8)


@_encoder(GGMLType.Q4_K)
def _enc_q4_k(x):
    d, dmin, sc, mn, q = _kscale_search(x, 15)
    return np.concatenate(
        [_to_f16_bytes(d), _to_f16_bytes(dmin), _pack_kscales(sc, mn), _nib_pack(q, 32)], axis=1
    )


@_decoder(GGMLType.Q5_K)
def _dec_q5_k(b):
    n = b.shape[0]
    d, dmin, sb, qh, qs = b[:, :2], b[:, 2:4], b[:, 4:16], b[:, 16:48], b[:, 48:]
    sc, mn = _unpack_kscales(sb)
    dl = _f16(d) * sc.astype(np.float32)
    ml = _f16(dmin) * mn.astype(np.float32)
    lo = _nib_lo_hi(qs, 32)
    hi = _bits_unpack(qh, 1, 32)  # element (32b + j) from byte j bit b
    q = (lo | (hi << np.uint8(4))).reshape(n, 8, 32)
    return (dl[:, :, None] * q.astype(np.float32) - ml[:, :, None]).reshape(n, QK_K)


@_encoder(GGMLType.Q5_K)
def _enc_q5_k(x):
    d, dmin, sc, mn, q = _kscale_search(x, 31)
    qs = _nib_pack(q & np.uint8(0x0F), 32)
    qh = _bits_pack(q >> 4, 1, 32)
    return np.concatenate(
        [_to_f16_bytes(d), _to_f16_bytes(dmin), _pack_kscales(sc, mn), qh, qs], axis=1
    )


@_decoder(GGMLType.Q6_K)
def _dec_q6_k(b):
    n = b.shape[0]
    ql, qh, sb, d = b[:, :128], b[:, 128:192], b[:, 192:208], b[:, 208:210]
    scales = sb.view(np.int8).astype(np.float32)  # [N,16]
    dl = _f16(d) * scales
    lo = np.concatenate([_nib_lo_hi(ql[:, c * 64 : (c + 1) * 64], 64) for c in range(2)], axis=1)
    hi = np.concatenate([_bits_unpack(qh[:, c * 32 : (c + 1) * 32], 2, 32) for c in range(2)], axis=1)
    q = (lo | (hi << np.uint8(4))).astype(np.int8) - np.int8(32)
    return (dl[:, :, None] * q.reshape(n, 16, 16).astype(np.float32)).reshape(n, QK_K)


@_encoder(GGMLType.Q6_K)
def _enc_q6_k(x):
    n = x.shape[0]
    g = x.reshape(n, 16, 16)
    s_f = _signed_absmax(g.reshape(-1, 16)).reshape(n, 16) / -32.0
    d = np.abs(s_f).max(axis=-1, keepdims=True) / 127.0
    sc = _round_away(s_f * _safe_inv(d)).clip(-128, 127).astype(np.int8)
    dl = d * sc.astype(np.float32)
    q = _round_away(g * _safe_inv(dl)[:, :, None]).clip(-32, 31).astype(np.int8)
    qb = (q.reshape(n, QK_K).astype(np.int16) + 32).astype(np.uint8)
    ql = np.concatenate([_nib_pack(qb[:, c * 128 : (c + 1) * 128] & 0x0F, 64) for c in range(2)], axis=1)
    qh = np.concatenate([_bits_pack(qb[:, c * 128 : (c + 1) * 128] >> 4, 2, 32) for c in range(2)], axis=1)
    return np.concatenate([ql, qh, sc.view(np.uint8), _to_f16_bytes(d)], axis=1)


@_decoder(GGMLType.Q8_K)
def _dec_q8_k(b):
    d = b[:, :4].view("<f4").astype(np.float32)
    qs = b[:, 4:260].view(np.int8).astype(np.float32)
    return d * qs


@_encoder(GGMLType.Q8_K)
def _enc_q8_k(x):
    mx = _signed_absmax(x)
    iscale = np.where(mx != 0, -127.0 * _safe_inv(mx), 0.0)
    q = np.minimum(127, _round_away(x * iscale)).astype(np.int8)
    d = _safe_inv(iscale).astype("<f4")
    bsums = q.reshape(x.shape[0], 16, 16).astype(np.int32).sum(axis=-1).astype("<i2")
    return np.concatenate([d.view(np.uint8), q.view(np.uint8), bsums.view(np.uint8)], axis=1)


# ---------------------------------------------------------------------------
# IQ4 (non-linear 4-bit codebook)
# ---------------------------------------------------------------------------

IQ4NL_VALUES = np.array(
    [-127, -104, -83, -65, -49, -35, -22, -10, 1, 13, 25, 38, 53, 69, 89, 113], dtype=np.int8
)


def _iq4_nearest(scaled: np.ndarray) -> np.ndarray:
    """Nearest IQ4 codebook index for already-scaled values."""
    err = np.abs(scaled[..., None] - IQ4NL_VALUES.astype(np.float32))
    return err.argmin(axis=-1).astype(np.uint8)


@_decoder(GGMLType.IQ4_NL)
def _dec_iq4_nl(b):
    d, qs = b[:, :2], b[:, 2:]
    idx = _nib_lo_hi(qs, 16)
    return _f16(d) * IQ4NL_VALUES[idx].astype(np.float32)


@_encoder(GGMLType.IQ4_NL)
def _enc_iq4_nl(x):
    d = _signed_absmax(x) / -127.0
    idx = _iq4_nearest(x * _safe_inv(d))
    return np.concatenate([_to_f16_bytes(d), _nib_pack(idx, 16)], axis=1)


@_decoder(GGMLType.IQ4_XS)
def _dec_iq4_xs(b):
    n = b.shape[0]
    d, sh, sl, qs = b[:, :2], b[:, 2:4], b[:, 4:8], b[:, 8:]
    lo = _nib_lo_hi(sl, 1).reshape(n, 8)  # byte i -> groups 2i, 2i+1
    # group g's top 2 bits live at bit 2g of the little-endian u16
    sh16 = sh.view("<u2").astype(np.uint32)
    hi = np.stack([(sh16[:, 0] >> (2 * g)) & 3 for g in range(8)], axis=1).astype(np.uint8)
    sc = ((lo | (hi << np.uint8(4))).astype(np.int8) - np.int8(32)).astype(np.float32)
    dl = _f16(d) * sc  # [N,8]
    idx = _nib_lo_hi(qs, 16).reshape(n, 8, 32)
    q = IQ4NL_VALUES[idx].astype(np.float32)
    return (dl[:, :, None] * q).reshape(n, QK_K)


@_encoder(GGMLType.IQ4_XS)
def _enc_iq4_xs(x):
    n = x.shape[0]
    g = x.reshape(n, 8, 32)
    s_f = _signed_absmax(g.reshape(-1, 32)).reshape(n, 8) / -127.0
    d = np.abs(s_f).max(axis=-1, keepdims=True) / 31.0
    sc = _round_away(s_f * _safe_inv(d)).clip(-32, 31).astype(np.int8)
    dl = d * sc.astype(np.float32)
    idx = _iq4_nearest(g * _safe_inv(dl)[:, :, None]).reshape(n, QK_K)
    s6 = (sc.astype(np.int16) + 32).astype(np.uint8)
    sl = (s6[:, 0::2] & 0x0F) | ((s6[:, 1::2] & 0x0F) << 4)
    sh16 = np.zeros((n,), dtype=np.uint16)
    for gi in range(8):
        sh16 |= ((s6[:, gi] >> 4).astype(np.uint16)) << (2 * gi)
    return np.concatenate(
        [_to_f16_bytes(d), sh16.astype("<u2").view(np.uint8).reshape(n, 2), sl, _nib_pack(idx, 16)],
        axis=1,
    )


# ---------------------------------------------------------------------------
# ternary
# ---------------------------------------------------------------------------

@_decoder(GGMLType.TQ1_0)
def _dec_tq1_0(b):
    n = b.shape[0]
    qs, qh, d = b[:, :48], b[:, 48:52], b[:, 52:54]
    dv = _f16(d)
    m5 = np.array([1, 3, 9, 27, 81], dtype=np.uint8).reshape(1, 1, 5, 1)
    q0 = (qs[:, :32].reshape(n, 1, 1, 32) * m5).reshape(n, 160)
    q1 = (qs[:, 32:48].reshape(n, 1, 1, 16) * m5).reshape(n, 80)
    m4 = np.array([1, 3, 9, 27], dtype=np.uint8).reshape(1, 1, 4, 1)
    q2 = (qh.reshape(n, 1, 1, 4) * m4).reshape(n, 16)
    q = np.concatenate([q0, q1, q2], axis=1)
    q = ((q.astype(np.uint16) * 3) >> 8).astype(np.int8) - np.int8(1)
    return dv * q.astype(np.float32)


@_decoder(GGMLType.TQ2_0)
def _dec_tq2_0(b):
    n = b.shape[0]
    qs, d = b[:, :64], b[:, 64:66]
    q = np.concatenate(
        [_bits_unpack(qs[:, c * 32 : (c + 1) * 32], 2, 32) for c in range(2)], axis=1
    ).astype(np.int8) - np.int8(1)
    return _f16(d) * q.astype(np.float32).reshape(n, QK_K)


@_encoder(GGMLType.TQ2_0)
def _enc_tq2_0(x):
    d = np.abs(x).max(axis=-1, keepdims=True)
    q = (_round_away(x * _safe_inv(d)).astype(np.int8) + 1).astype(np.uint8)
    qs = np.concatenate([_bits_pack(q[:, c * 128 : (c + 1) * 128], 2, 32) for c in range(2)], axis=1)
    return np.concatenate([qs, _to_f16_bytes(d)], axis=1)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def supported_decode() -> set[GGMLType]:
    return set(_DECODERS)


def supported_encode() -> set[GGMLType]:
    return set(_ENCODERS)


def dequantize(data: np.ndarray, gtype: GGMLType) -> np.ndarray:
    """uint8[..., row_bytes] (or typed scalar array) -> f32[..., n_elements]."""
    gtype = GGMLType(gtype)
    blk, bsz = GGML_BLOCK_SIZES[gtype]
    if data.dtype != np.uint8:
        data = np.ascontiguousarray(data).view(np.uint8)
    lead = data.shape[:-1]
    blocks = data.reshape(-1, bsz)
    out = _DECODERS[gtype](blocks)
    return np.ascontiguousarray(out, dtype=np.float32).reshape(*lead, -1)


def quantize(data: np.ndarray, gtype: GGMLType, weights: np.ndarray | None = None) -> np.ndarray:
    """f32[..., n] -> uint8[..., row_bytes].

    `weights` (importance-matrix column weights, one per input column of
    the row dimension) steers the scale search for formats that support it
    (reference: quantize_<type> imatrix paths in ggml-quants.c)."""
    gtype = GGMLType(gtype)
    blk, bsz = GGML_BLOCK_SIZES[gtype]
    data = np.ascontiguousarray(data, dtype=np.float32)
    if data.shape[-1] % blk != 0:
        raise ValueError(f"last dim {data.shape[-1]} not divisible by {gtype.name} block {blk}")
    lead = data.shape[:-1]
    blocks = data.reshape(-1, blk)
    if gtype not in _ENCODERS:
        raise NotImplementedError(f"no encoder for {gtype.name}")
    if weights is not None and gtype in _WEIGHTED_ENCODERS:
        wcols = np.broadcast_to(
            np.asarray(weights, np.float32), data.shape
        ).reshape(-1, blk)
        out = _WEIGHTED_ENCODERS[gtype](blocks, wcols)
    else:
        out = _ENCODERS[gtype](blocks)
    return np.ascontiguousarray(out, dtype=np.uint8).reshape(*lead, -1)


# -- importance-weighted encoders -------------------------------------------

def _wls_affine(g: np.ndarray, wg: np.ndarray, qmax: int, iters: int = 4):
    """Weighted alternating least-squares for x ~= a*q - b per group (the
    reference's make_qkx2_quants/make_qkx3_quants imatrix search): fix the
    integer codes, refit (scale, min) by weighted LS, re-round, iterate.
    g/wg: [..., group]; returns (a, b) over the leading dims."""
    m_f = np.maximum(0.0, -g.min(axis=-1))
    s_f = np.maximum(0.0, g.max(axis=-1) + m_f) / qmax
    a, b = s_f, m_f
    for _ in range(iters):
        q = _round_away((g + b[..., None]) * _safe_inv(a)[..., None]).clip(0, qmax)
        sw = wg.sum(-1)
        swq = (wg * q).sum(-1)
        swq2 = (wg * q * q).sum(-1)
        swx = (wg * g).sum(-1)
        swxq = (wg * g * q).sum(-1)
        det = swq2 * sw - swq * swq
        safe = np.where(det > 1e-12, det, 1)
        new_a = np.where(det > 1e-12, (swxq * sw - swx * swq) / safe, a)
        new_b = np.where(det > 1e-12, -(swx * swq2 - swxq * swq) / safe, b)
        ok = (new_a > 0) & (new_b >= 0)
        a = np.where(ok, new_a, a)
        b = np.where(ok, new_b, b)
    return a, b


def _wls_sym(g: np.ndarray, wg: np.ndarray, qmin: int, qmax: int, iters: int = 4):
    """Weighted LS for symmetric x ~= d*q (reference make_qx_quants with
    quant_weights).  g/wg: [..., group]; returns d."""
    d = _signed_absmax(g.reshape(-1, g.shape[-1])).reshape(g.shape[:-1]) / qmin
    for _ in range(iters):
        q = _round_away(g * _safe_inv(d)[..., None]).clip(qmin, qmax)
        num = (wg * g * q).sum(-1)
        den = (wg * q * q).sum(-1)
        d = np.where(den > 1e-12, num / np.where(den > 1e-12, den, 1), d)
    return d


def _wg(w: np.ndarray, shape) -> np.ndarray:
    return np.maximum(w.reshape(shape), 1e-12)


def _kpack_affine(x, a, b, qmax):
    """Two-level 6-bit scale/min quantization + requantize (Q4_K/Q5_K)."""
    n = x.shape[0]
    g = x.reshape(n, 8, 32)
    d = a.max(axis=-1, keepdims=True) / 63.0
    dmin = b.max(axis=-1, keepdims=True) / 63.0
    sc = _round_away(a * _safe_inv(d)).clip(0, 63).astype(np.uint8)
    mn = _round_away(b * _safe_inv(dmin)).clip(0, 63).astype(np.uint8)
    dl = d * sc.astype(np.float32)
    ml = dmin * mn.astype(np.float32)
    q = _round_away((g + ml[:, :, None]) * _safe_inv(dl)[:, :, None]).clip(0, qmax)
    return d, dmin, sc, mn, q.reshape(n, QK_K).astype(np.uint8)


def _enc_q4_k_weighted(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    n = x.shape[0]
    a, b = _wls_affine(x.reshape(n, 8, 32), _wg(w, (n, 8, 32)), 15)
    d, dmin, sc, mn, q = _kpack_affine(x, a, b, 15)
    return np.concatenate(
        [_to_f16_bytes(d), _to_f16_bytes(dmin), _pack_kscales(sc, mn), _nib_pack(q, 32)], axis=1
    )


def _enc_q5_k_weighted(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    n = x.shape[0]
    a, b = _wls_affine(x.reshape(n, 8, 32), _wg(w, (n, 8, 32)), 31)
    d, dmin, sc, mn, q = _kpack_affine(x, a, b, 31)
    qs = _nib_pack(q & np.uint8(0x0F), 32)
    qh = _bits_pack(q >> 4, 1, 32)
    return np.concatenate(
        [_to_f16_bytes(d), _to_f16_bytes(dmin), _pack_kscales(sc, mn), qh, qs], axis=1
    )


def _enc_q2_k_weighted(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    n = x.shape[0]
    g = x.reshape(n, 16, 16)
    a, b = _wls_affine(g, _wg(w, (n, 16, 16)), 3)
    d = a.max(axis=-1, keepdims=True) / 15.0
    dmin = b.max(axis=-1, keepdims=True) / 15.0
    sc = _round_away(a * _safe_inv(d)).clip(0, 15).astype(np.uint8)
    mn = _round_away(b * _safe_inv(dmin)).clip(0, 15).astype(np.uint8)
    dl = d * sc.astype(np.float32)
    ml = dmin * mn.astype(np.float32)
    q = _round_away((g + ml[:, :, None]) * _safe_inv(dl)[:, :, None]).clip(0, 3)
    q = q.reshape(n, QK_K).astype(np.uint8)
    qs = np.concatenate([_bits_pack(q[:, c * 128 : (c + 1) * 128], 2, 32) for c in range(2)], axis=1)
    return np.concatenate([sc | (mn << np.uint8(4)), qs, _to_f16_bytes(d), _to_f16_bytes(dmin)], axis=1)


def _enc_q6_k_weighted(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    n = x.shape[0]
    g = x.reshape(n, 16, 16)
    s_f = _wls_sym(g, _wg(w, (n, 16, 16)), -32, 31)
    d = np.abs(s_f).max(axis=-1, keepdims=True) / 127.0
    sc = _round_away(s_f * _safe_inv(d)).clip(-128, 127).astype(np.int8)
    dl = d * sc.astype(np.float32)
    q = _round_away(g * _safe_inv(dl)[:, :, None]).clip(-32, 31).astype(np.int8)
    qb = (q.reshape(n, QK_K).astype(np.int16) + 32).astype(np.uint8)
    ql = np.concatenate([_nib_pack(qb[:, c * 128 : (c + 1) * 128] & 0x0F, 64) for c in range(2)], axis=1)
    qh = np.concatenate([_bits_pack(qb[:, c * 128 : (c + 1) * 128] >> 4, 2, 32) for c in range(2)], axis=1)
    return np.concatenate([ql, qh, sc.view(np.uint8), _to_f16_bytes(d)], axis=1)


def _enc_q3_k_weighted(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    n = x.shape[0]
    g = x.reshape(n, 16, 16)
    s_f = _wls_sym(g, _wg(w, (n, 16, 16)), -4, 3)
    d = np.abs(s_f).max(axis=-1, keepdims=True) / 31.0
    sc = _round_away(s_f * _safe_inv(d)).clip(-32, 31).astype(np.int8)
    dl = d * sc.astype(np.float32)
    q = _round_away(g * _safe_inv(dl)[:, :, None]).clip(-4, 3).astype(np.int8).reshape(n, QK_K)
    hbit = (q >= 0).astype(np.uint8)
    ql = np.where(q >= 0, q, q + 4).astype(np.uint8)
    qs = np.concatenate([_bits_pack(ql[:, c * 128 : (c + 1) * 128], 2, 32) for c in range(2)], axis=1)
    hmask = _bits_pack(hbit, 1, 32)
    s6 = (sc.astype(np.int16) + 32).astype(np.uint8)
    lo_bytes = (s6[:, :8] & 0x0F) | ((s6[:, 8:] & 0x0F) << 4)
    hi_bytes = _bits_pack(s6 >> 4, 2, 4)
    return np.concatenate([hmask, qs, lo_bytes, hi_bytes, _to_f16_bytes(d)], axis=1)


def _enc_q4_0_weighted(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    d = _wls_sym(x, _wg(w, x.shape), -8, 7)[:, None]
    q = (_round_away(x * _safe_inv(d)).clip(-8, 7) + 8).astype(np.uint8)
    return np.concatenate([_to_f16_bytes(d), _nib_pack(q, 16)], axis=1)


def _enc_q5_0_weighted(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    d = _wls_sym(x, _wg(w, x.shape), -16, 15)[:, None]
    q = (_round_away(x * _safe_inv(d)).clip(-16, 15) + 16).astype(np.uint8)
    return np.concatenate([_to_f16_bytes(d), _qh_pack32(q >> 4), _nib_pack(q & np.uint8(0x0F), 16)], axis=1)


def _enc_q4_1_weighted(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    a, b = _wls_affine(x, _wg(w, x.shape), 15)
    d, mn = a[:, None], -b[:, None]
    q = _round_away((x - mn) * _safe_inv(d)).clip(0, 15).astype(np.uint8)
    return np.concatenate([_to_f16_bytes(d), _to_f16_bytes(mn), _nib_pack(q, 16)], axis=1)


def _enc_q5_1_weighted(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    a, b = _wls_affine(x, _wg(w, x.shape), 31)
    d, mn = a[:, None], -b[:, None]
    q = _round_away((x - mn) * _safe_inv(d)).clip(0, 31).astype(np.uint8)
    return np.concatenate(
        [_to_f16_bytes(d), _to_f16_bytes(mn), _qh_pack32(q >> 4), _nib_pack(q & np.uint8(0x0F), 16)], axis=1
    )


# imatrix-steered encoders (reference: quantize_<type> quant_weights paths
# in ggml-quants.c — every K-quant and legacy format)
_WEIGHTED_ENCODERS = {
    GGMLType.Q4_K: _enc_q4_k_weighted,
    GGMLType.Q5_K: _enc_q5_k_weighted,
    GGMLType.Q2_K: _enc_q2_k_weighted,
    GGMLType.Q3_K: _enc_q3_k_weighted,
    GGMLType.Q6_K: _enc_q6_k_weighted,
    GGMLType.Q4_0: _enc_q4_0_weighted,
    GGMLType.Q5_0: _enc_q5_0_weighted,
    GGMLType.Q4_1: _enc_q4_1_weighted,
    GGMLType.Q5_1: _enc_q5_1_weighted,
}


# ---------------------------------------------------------------------------
# IQ grid-codebook formats (decode; grids are format constants shipped in
# iq_grids.npz — see ggml-common.h iq2xxs_grid etc.)
# ---------------------------------------------------------------------------

import functools as _functools
import os as _os

# 7-bit sign codes: bit i = sign of element i, top bit = parity (format
# constant ksigns_iq2xs from ggml-common.h)
_KSIGNS = np.array([i | (128 if bin(i).count("1") % 2 else 0) for i in range(128)], dtype=np.uint8)


@_functools.lru_cache(maxsize=1)
def _iq_grids() -> dict:
    path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "iq_grids.npz")
    return dict(np.load(path))


def _sign_bits(codes: np.ndarray) -> np.ndarray:
    """7-bit sign codes [...,] -> +-1 f32 [..., 8]."""
    bytes_ = _KSIGNS[codes & 0x7F]
    bits = (bytes_[..., None] >> np.arange(8, dtype=np.uint8)) & 1
    return np.where(bits == 0, np.float32(1), np.float32(-1))


def _raw_sign_bits(bytes_: np.ndarray) -> np.ndarray:
    bits = (bytes_[..., None] >> np.arange(8, dtype=np.uint8)) & 1
    return np.where(bits == 0, np.float32(1), np.float32(-1))


@_decoder(GGMLType.IQ2_XXS)
def _dec_iq2_xxs(b):
    n = b.shape[0]
    d = _f16(b[:, :2])
    u32 = b[:, 2:].copy().view("<u4").reshape(n, 8, 2)
    codes = u32[:, :, 0].copy().view(np.uint8).reshape(n, 8, 4)  # grid indices
    aux = u32[:, :, 1]
    db = d * (0.5 + (aux >> 28).astype(np.float32)) * 0.25  # [n, 8]
    signs = _sign_bits((aux[:, :, None] >> np.array([0, 7, 14, 21], np.uint32)).astype(np.uint8))
    grid = _iq_grids()["iq2_xxs_grid"][codes]  # [n, 32, 4, 8]
    return (db[:, :, None, None] * grid * signs).reshape(n, QK_K)


@_decoder(GGMLType.IQ2_XS)
def _dec_iq2_xs(b):
    n = b.shape[0]
    d = _f16(b[:, :2])
    qs = b[:, 2:66].copy().view("<u2").reshape(n, 32)
    sl = b[:, 66:74]
    sc = np.stack([sl & 0x0F, sl >> 4], axis=-1).reshape(n, 16)
    db = (d * (0.5 + sc.astype(np.float32)) * 0.25).repeat(2, axis=1)  # [n, 32]
    signs = _sign_bits((qs >> 9).astype(np.uint8))
    grid = _iq_grids()["iq2_xs_grid"][qs & 511]  # [n, 32, 8]
    return (db[:, :, None] * grid * signs).reshape(n, QK_K)


@_decoder(GGMLType.IQ2_S)
def _dec_iq2_s(b):
    n = b.shape[0]
    d = _f16(b[:, :2])
    qs = b[:, 2:34]
    sbytes = b[:, 34:66]
    qh = b[:, 66:74]
    sl = b[:, 74:82]
    sc = np.stack([sl & 0x0F, sl >> 4], axis=-1).reshape(n, 16)
    db = (d * (0.5 + sc.astype(np.float32)) * 0.25).repeat(2, axis=1)  # [n, 32]
    hi = ((qh[:, :, None] >> np.array([0, 2, 4, 6], np.uint8)) & 3).reshape(n, 32)
    idx = qs.astype(np.uint16) | (hi.astype(np.uint16) << 8)
    signs = _raw_sign_bits(sbytes).reshape(n, 32, 8)
    grid = _iq_grids()["iq2_s_grid"][idx]
    return (db[:, :, None] * grid * signs).reshape(n, QK_K)


@_decoder(GGMLType.IQ3_XXS)
def _dec_iq3_xxs(b):
    n = b.shape[0]
    d = _f16(b[:, :2])
    qs = b[:, 2:66]  # 64 grid indices (4 values each)
    aux = b[:, 66:98].copy().view("<u4").reshape(n, 8)
    db = d * (0.5 + (aux >> 28).astype(np.float32)) * 0.5  # [n, 8]
    signs = _sign_bits(
        (aux[:, :, None] >> np.array([0, 7, 14, 21], np.uint32)).astype(np.uint8)
    ).reshape(n, 32, 8)
    grid = _iq_grids()["iq3_xxs_grid"][qs].reshape(n, 32, 8)
    return (db.repeat(4, axis=1)[:, :, None] * grid * signs).reshape(n, QK_K)


@_decoder(GGMLType.IQ3_S)
def _dec_iq3_s(b):
    n = b.shape[0]
    d = _f16(b[:, :2])
    qs = b[:, 2:66]
    qh = b[:, 66:74]
    sbytes = b[:, 74:106]
    sl = b[:, 106:110]
    sc = np.stack([sl & 0x0F, sl >> 4], axis=-1).reshape(n, 8)
    db = (d * (1 + 2 * sc.astype(np.float32))).repeat(8, axis=1)  # [n, 64]
    hi = ((qh[:, :, None] >> np.arange(8, dtype=np.uint8)) & 1).reshape(n, 64)
    idx = qs.astype(np.uint16) | (hi.astype(np.uint16) << 8)
    signs = _raw_sign_bits(sbytes).reshape(n, 64, 4)
    grid = _iq_grids()["iq3_s_grid"][idx].reshape(n, 64, 4)
    return (db[:, :, None] * grid * signs).reshape(n, QK_K)


@_decoder(GGMLType.IQ1_S)
def _dec_iq1_s(b):
    n = b.shape[0]
    d = _f16(b[:, :2])
    qs = b[:, 2:34]  # 32 grid low-bytes
    qh = b[:, 34:50].copy().view("<u2").reshape(n, 8)  # 8 u16, 4 cells each
    dl = (d * (2 * ((qh >> 12) & 7) + 1).astype(np.float32)).repeat(4, axis=1)  # [n, 32]
    delta = np.where((qh & 0x8000) == 0, np.float32(0.125), np.float32(-0.125)).repeat(4, axis=1)
    hi = ((qh[:, :, None] >> np.array([0, 3, 6, 9], np.uint16)) & 7).reshape(n, 32)
    idx = qs.astype(np.uint16) | (hi << 8)
    grid = _iq_grids()["iq1_s_grid"][idx].astype(np.float32)  # [n, 32, 8]
    return (dl[:, :, None] * (grid + delta[:, :, None])).reshape(n, QK_K)


@_decoder(GGMLType.IQ1_M)
def _dec_iq1_m(b):
    n = b.shape[0]
    qs = b[:, :32]
    qh = b[:, 32:48]  # 16 bytes, 2 cells each (nibbles)
    sraw = b[:, 48:56].copy().view("<u2").reshape(n, 4)
    d16 = (sraw & np.uint16(0xF000)) >> np.array([12, 8, 4, 0], np.uint16)
    d = (d16[:, 0] | d16[:, 1] | d16[:, 2] | d16[:, 3]).astype("<u2").view("<f2").astype(np.float32)
    sc = ((sraw[:, :, None] >> np.array([0, 3, 6, 9], np.uint16)) & 7).reshape(n, 16)
    dl = (d[:, None] * (2 * sc.astype(np.float32) + 1)).repeat(2, axis=1)  # [n, 32]
    hi = np.stack([qh & 0x0F, qh >> 4], axis=-1).reshape(n, 32)
    idx = qs.astype(np.uint16) | ((hi.astype(np.uint16) & 7) << 8)
    delta = np.where((hi & 0x08) == 0, np.float32(0.125), np.float32(-0.125))
    grid = _iq_grids()["iq1_m_grid"][idx].astype(np.float32)
    return (dl[:, :, None] * (grid + delta[:, :, None])).reshape(n, QK_K)


# ---------------------------------------------------------------------------
# IQ grid-codebook ENCODERS (reference capability: quantize_iq2_xxs /
# quantize_iq2_xs / quantize_iq2_s / quantize_iq3_xxs / quantize_iq3_s /
# quantize_iq1_s / quantize_iq1_m / quantize_tq1_0, ggml-quants.c.  The
# algorithm here is an original vectorized design: per-cell weighted
# nearest-codebook search by matmul scoring, alternating with weighted LS
# scale refits and a two-level (d, per-group code) scale quantization —
# the same *search problem* the reference solves with scalar loops.)
# ---------------------------------------------------------------------------

def _grid_score_pick(a: np.ndarray, wt: np.ndarray, grid: np.ndarray,
                     db: np.ndarray, chunk: int = 65536) -> np.ndarray:
    """Weighted nearest codebook row per cell.

    a, wt: [C, L] target magnitudes + importance; grid: [G, L] (positive
    magnitudes); db: [C, 1] per-cell scale.  Minimizes
    sum_i wt_i (a_i - db*g_i)^2 -> argmin_k (-2 db A + db^2 B)."""
    g_t = grid.T.astype(np.float32)          # [L, G]
    g2_t = (grid * grid).T.astype(np.float32)
    out = np.empty(a.shape[0], np.int64)
    for s in range(0, a.shape[0], chunk):
        e = min(s + chunk, a.shape[0])
        A = (wt[s:e] * a[s:e]) @ g_t          # [c, G]
        B = wt[s:e] @ g2_t
        out[s:e] = np.argmin(B * (db[s:e] ** 2) - 2.0 * db[s:e] * A, axis=1)
    return out


def _ls_scale(a, wt, g, lo=1e-8):
    """Weighted LS scale per leading dims: argmin_d sum wt (a - d g)^2."""
    num = (wt * a * g).sum(-1)
    den = (wt * g * g).sum(-1)
    return np.maximum(num / np.maximum(den, 1e-12), lo)


def _two_level(db, smax, off, mul):
    """Continuous per-group scales [N, G] -> (d [N,1], s uint [N,G], dbq)
    with db ~= d * (off + s) * mul."""
    d = db.max(axis=-1, keepdims=True) / ((off + smax) * mul)
    d = np.maximum(d, 1e-12)
    s = _round_away(db / (d * mul) - off).clip(0, smax).astype(np.uint8)
    return d, s, d * (off + s.astype(np.float32)) * mul


def _ksign_codes(x_cells, wt, a, g, db):
    """7-bit ksign codes per 8-wide cell with the parity constraint: the
    stored bits are the natural signs of elements 0..6; element 7's sign is
    the parity.  On mismatch flip the cheapest element (weighted cost
    ~ wt*a*grid)."""
    neg = (x_cells < 0)
    c = np.zeros(x_cells.shape[0], np.uint16)
    for i in range(7):
        c |= neg[:, i].astype(np.uint16) << i
    par = np.zeros_like(c)
    for i in range(7):
        par ^= (c >> i) & 1
    mism = par.astype(bool) != neg[:, 7]
    cost = wt * a * np.maximum(g, 1e-9) * db
    # flipping element 7 = accept implied sign (no bit change); flipping
    # i<7 toggles bit i (and with it the implied parity)
    flip = np.argmin(cost, axis=1)
    do = mism & (flip < 7)
    c[do] ^= (1 << flip[do]).astype(np.uint16)
    return c.astype(np.uint32)


def _u32le(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x.astype("<u4")).view(np.uint8)


def _u16le(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x.astype("<u2")).view(np.uint8)


def _iq_fit(x, w, grid, cell, spg, smax, off, mul, iters=3):
    """Shared magnitude-fit: x [N, 256] -> (idx [N, C], d [N,1], s [N,G],
    dbq [N, G]) where C = 256//cell cells and G = 256//spg scale groups."""
    n = x.shape[0]
    ncell, ng = QK_K // cell, QK_K // spg
    cpg = ncell // ng  # cells per scale group
    a = np.abs(x).reshape(n * ncell, cell)
    wt = _wg(w, (n * ncell, cell)) if w is not None else np.maximum(
        (x * x).reshape(n, 1, -1).mean(-1, keepdims=True)
        + (x * x).reshape(n, ncell, cell), 1e-9
    ).reshape(n * ncell, cell)
    gmax = float(grid.max())
    db_g = np.maximum(a.reshape(n, ng, spg).max(-1), 1e-9) / gmax  # [N, G]
    idx = None
    for _ in range(iters):
        db_c = np.repeat(db_g.reshape(n * ng, 1), cpg, axis=0).reshape(n * ncell, 1)
        idx = _grid_score_pick(a, wt, grid, db_c)
        g_sel = grid[idx]  # [N*C, cell]
        db_g = _ls_scale(
            a.reshape(n, ng, spg), wt.reshape(n, ng, spg),
            g_sel.reshape(n, ng, spg),
        )
    d, s, dbq = _two_level(db_g, smax, off, mul)
    db_c = np.repeat(dbq.reshape(n * ng, 1), cpg, axis=0).reshape(n * ncell, 1)
    idx = _grid_score_pick(a, wt, grid, db_c)
    return idx.reshape(n, ncell), d, s, dbq, a, wt, grid[idx]


def _enc_iq2_xxs(x, w=None):
    n = x.shape[0]
    grid = _iq_grids()["iq2_xxs_grid"].reshape(256, 8)
    idx, d, s, dbq, a, wt, gsel = _iq_fit(x, w, grid, 8, 32, 15, 0.5, 0.25)
    db_c = np.repeat(dbq, 4, axis=1).reshape(n * 32, 1)
    signs = _ksign_codes(x.reshape(n * 32, 8), wt, a, gsel, db_c).reshape(n, 8, 4)
    aux = (signs[..., 0] | (signs[..., 1] << 7) | (signs[..., 2] << 14)
           | (signs[..., 3] << 21) | (s.astype(np.uint32) << 28))  # [n, 8]
    codes = idx.astype(np.uint8).reshape(n, 8, 4)  # 4 cell indexes per group
    u32 = np.empty((n, 8, 2), "<u4")
    u32[:, :, 0] = codes[..., 0] | (codes[..., 1].astype("<u4") << 8) \
        | (codes[..., 2].astype("<u4") << 16) | (codes[..., 3].astype("<u4") << 24)
    u32[:, :, 1] = aux
    return np.concatenate([_to_f16_bytes(d), u32.reshape(n, -1).view(np.uint8)], axis=1)


def _enc_iq2_xs(x, w=None):
    n = x.shape[0]
    grid = _iq_grids()["iq2_xs_grid"].reshape(512, 8)
    idx, d, s, dbq, a, wt, gsel = _iq_fit(x, w, grid, 8, 16, 15, 0.5, 0.25)
    db_c = np.repeat(dbq, 2, axis=1).reshape(n * 32, 1)
    signs = _ksign_codes(x.reshape(n * 32, 8), wt, a, gsel, db_c).reshape(n, 32)
    qs = idx.astype("<u2") | (signs.astype("<u2") << 9)  # [n, 32]
    sl = (s[:, 0::2] | (s[:, 1::2] << 4)).astype(np.uint8)  # [n, 8]
    return np.concatenate([_to_f16_bytes(d), _u16le(qs), sl], axis=1)


def _enc_iq2_s(x, w=None):
    n = x.shape[0]
    grid = _iq_grids()["iq2_s_grid"].reshape(1024, 8)
    idx, d, s, dbq, a, wt, gsel = _iq_fit(x, w, grid, 8, 16, 15, 0.5, 0.25)
    neg = (x.reshape(n, 32, 8) < 0)
    sbytes = np.zeros((n, 32), np.uint8)
    for i in range(8):
        sbytes |= neg[:, :, i].astype(np.uint8) << i
    qs = (idx & 0xFF).astype(np.uint8)  # [n, 32]
    hi = (idx >> 8).astype(np.uint8)  # 2 bits per cell
    qh = np.zeros((n, 8), np.uint8)
    hi4 = hi.reshape(n, 8, 4)
    for i in range(4):
        qh |= (hi4[:, :, i] & 3) << (2 * i)
    sl = (s[:, 0::2] | (s[:, 1::2] << 4)).astype(np.uint8)
    return np.concatenate([_to_f16_bytes(d), qs, sbytes, qh, sl], axis=1)


def _enc_iq3_xxs(x, w=None):
    n = x.shape[0]
    grid = _iq_grids()["iq3_xxs_grid"].reshape(256, 4)
    idx, d, s, dbq, a, wt, gsel = _iq_fit(x, w, grid, 4, 32, 15, 0.5, 0.5)
    # signs: one 7-bit code per 8 weights = per PAIR of 4-wide cells
    db_c = np.repeat(dbq, 4, axis=1).reshape(n * 32, 1)  # per sign-cell of 8
    signs = _ksign_codes(
        x.reshape(n * 32, 8), wt.reshape(n * 32, 8), a.reshape(n * 32, 8),
        gsel.reshape(n * 32, 8), db_c,
    ).reshape(n, 8, 4)
    aux = (signs[..., 0] | (signs[..., 1] << 7) | (signs[..., 2] << 14)
           | (signs[..., 3] << 21) | (s.astype(np.uint32) << 28))  # [n, 8]
    qs = idx.astype(np.uint8)  # [n, 64]
    return np.concatenate([_to_f16_bytes(d), qs, _u32le(aux)], axis=1)


def _enc_iq3_s(x, w=None):
    n = x.shape[0]
    grid = _iq_grids()["iq3_s_grid"].reshape(512, 4)
    idx, d, s, dbq, a, wt, gsel = _iq_fit(x, w, grid, 4, 32, 15, 0.5, 2.0)
    neg = (x.reshape(n, 32, 8) < 0)
    sbytes = np.zeros((n, 32), np.uint8)
    for i in range(8):
        sbytes |= neg[:, :, i].astype(np.uint8) << i
    qs = (idx & 0xFF).astype(np.uint8)  # [n, 64]
    hibit = (idx >> 8).astype(np.uint8).reshape(n, 8, 8)
    qh = np.zeros((n, 8), np.uint8)
    for i in range(8):
        qh |= (hibit[:, :, i] & 1) << i
    sl = (s[:, 0::2] | (s[:, 1::2] << 4)).astype(np.uint8)  # [n, 4]
    return np.concatenate([_to_f16_bytes(d), qs, qh, sbytes, sl], axis=1)


def _iq1_fit(x, w, grid, spg, dpg):
    """Shared IQ1 fit: signed ternary grid + per-group delta sign.
    spg: weights per scale group; dpg: weights per delta group (cell
    multiple).  Returns idx [N, 32], dl [N, G], delta_neg [N, D], wt."""
    n = x.shape[0]
    ncell, ng, nd = QK_K // 8, QK_K // spg, QK_K // dpg
    cpg, cpd = ncell // ng, dpg // 8
    xv = x.reshape(n * ncell, 8)
    wt = _wg(w, (n * ncell, 8)) if w is not None else np.maximum(
        (x * x).reshape(n, 1, -1).mean(-1, keepdims=True)
        + (x * x).reshape(n, ncell, 8), 1e-9
    ).reshape(n * ncell, 8)
    dl0 = np.maximum(np.abs(x).reshape(n, ng, spg).max(-1), 1e-9)  # [N, G]
    passes = []
    for dneg in (False, True):
        delta = np.float32(-0.125 if dneg else 0.125)
        gd = (grid + delta).astype(np.float32)
        g_t, g2_t = gd.T, (gd * gd).T
        dlc, idx = dl0.copy(), None
        for _ in range(3):
            db_c = np.repeat(dlc.reshape(n * ng, 1), cpg, axis=0).reshape(n * ncell, 1)
            A = (wt * xv) @ g_t  # signed targets: signs live in the grid
            B = wt @ g2_t
            idx = np.argmin(B * (db_c ** 2) - 2.0 * db_c * A, axis=1)
            dlc = _ls_scale(
                xv.reshape(n, ng, spg), wt.reshape(n, ng, spg),
                gd[idx].reshape(n, ng, spg),
            )
        db_c = np.repeat(dlc.reshape(n * ng, 1), cpg, axis=0).reshape(n * ncell, 1)
        err = (wt * (xv - db_c * gd[idx]) ** 2).reshape(n, nd, -1).sum(-1)  # [N, D]
        passes.append((idx.reshape(n, ncell), dlc, err))
    # choose the better delta sign per delta group, mix indices per cell,
    # then refit the scales once over the mixed targets
    dneg = passes[1][2] < passes[0][2]  # [N, D] True -> delta = -0.125
    sel_c = np.repeat(dneg, cpd, axis=1)  # per cell
    idx = np.where(sel_c, passes[1][0], passes[0][0])  # [N, 32]
    delta_c = np.where(sel_c, np.float32(-0.125), np.float32(0.125))
    gd_sel = grid[idx.reshape(-1)] + delta_c.reshape(-1, 1)
    dl = _ls_scale(
        xv.reshape(n, ng, spg), wt.reshape(n, ng, spg),
        gd_sel.reshape(n, ng, spg),
    )
    return idx, dl, dneg, wt


def _enc_iq1_s(x, w=None):
    n = x.shape[0]
    grid = _iq_grids()["iq1_s_grid"].reshape(2048, 8).astype(np.float32)
    idx, dl, dneg, wt = _iq1_fit(x, w, grid, 32, 32)
    # dl = d * (2s + 1), s in 0..7
    d = dl.max(axis=-1, keepdims=True) / 15.0
    d = np.maximum(d, 1e-12)
    s = _round_away((dl / d - 1.0) / 2.0).clip(0, 7).astype(np.uint16)
    qs = (idx & 0xFF).astype(np.uint8)  # [n, 32]
    hi = (idx >> 8).astype(np.uint16).reshape(n, 8, 4)  # 3 bits x 4 cells
    qh = (hi[:, :, 0] | (hi[:, :, 1] << 3) | (hi[:, :, 2] << 6)
          | (hi[:, :, 3] << 9)).astype(np.uint16)
    qh |= s << 12
    qh |= (dneg.astype(np.uint16) << 15)
    return np.concatenate([_to_f16_bytes(d), qs, _u16le(qh)], axis=1)


def _enc_iq1_m(x, w=None):
    n = x.shape[0]
    grid = _iq_grids()["iq1_m_grid"].reshape(2048, 8).astype(np.float32)
    idx, dl, dneg, wt = _iq1_fit(x, w, grid, 16, 8)
    d = dl.max(axis=-1, keepdims=True) / 15.0
    d = np.maximum(d, 1e-12)
    s = _round_away((dl / d - 1.0) / 2.0).clip(0, 7).astype(np.uint16)  # [n,16]
    qs = (idx & 0xFF).astype(np.uint8)  # [n, 32]
    hi3 = (idx >> 8).astype(np.uint8)  # [n, 32]
    nib = (hi3 | (dneg.astype(np.uint8) << 3)).reshape(n, 16, 2)
    qh = (nib[:, :, 0] | (nib[:, :, 1] << 4)).astype(np.uint8)  # [n, 16]
    s4 = s.reshape(n, 4, 4)
    sraw = (s4[:, :, 0] | (s4[:, :, 1] << 3) | (s4[:, :, 2] << 6)
            | (s4[:, :, 3] << 9)).astype("<u2")  # [n, 4]
    dbits = _to_f16_bytes(d).view("<u2").astype(np.uint16)  # [n, 1] f16 bits
    db = dbits[:, 0]
    # decoder reassembly: f16 bits = top(sraw0) | top(sraw1)<<4
    #                              | top(sraw2)<<8 | top(sraw3)<<12
    sraw[:, 0] |= (db & 0xF) << 12
    sraw[:, 1] |= ((db >> 4) & 0xF) << 12
    sraw[:, 2] |= ((db >> 8) & 0xF) << 12
    sraw[:, 3] |= ((db >> 12) & 0xF) << 12
    return np.concatenate([qs, qh, _u16le(sraw)], axis=1)


def _enc_tq1_0(x, w=None):
    n = x.shape[0]
    d = np.abs(x).max(axis=-1, keepdims=True)
    if w is not None:
        # weighted-LS ternary scale (reference quantize_tq1_0 ignores
        # quant_weights; steering the scale is a strict improvement)
        wg = _wg(w, x.shape)
        for _ in range(3):
            q = _round_away(x * _safe_inv(d)).clip(-1, 1)
            num = (wg * x * q).sum(-1, keepdims=True)
            den = (wg * q * q).sum(-1, keepdims=True)
            d = np.where(den > 1e-12, num / np.maximum(den, 1e-12), d)
        d = np.abs(d)
    t = (_round_away(x * _safe_inv(d)).clip(-1, 1) + 1).astype(np.uint32)  # 0..2
    # fixed-point base-3 packing: byte = ceil(v * 256 / 3^k); digit j
    # recovered as ((byte * 3^j mod 256) * 3) >> 8 (see _dec_tq1_0)
    def pack(digits, k):  # digits [n, m, k] most-significant first
        p3 = 3 ** np.arange(k - 1, -1, -1, dtype=np.uint32)
        v = (digits * p3).sum(-1)
        return ((v * 256 + (3 ** k - 1)) // (3 ** k)).astype(np.uint8)

    # elements 0..159: byte i digit j at position j*32 + i (5 digits)
    d0 = t[:, :160].reshape(n, 5, 32).transpose(0, 2, 1)  # [n, 32, 5]
    # elements 160..239: 16 bytes x 5 digits
    d1 = t[:, 160:240].reshape(n, 5, 16).transpose(0, 2, 1)
    # elements 240..255: 4 bytes x 4 digits
    d2 = t[:, 240:256].reshape(n, 4, 4).transpose(0, 2, 1)
    qs = np.concatenate([pack(d0, 5), pack(d1, 5)], axis=1)  # [n, 48]
    qh = pack(d2, 4)  # [n, 4]
    return np.concatenate([qs, qh, _to_f16_bytes(d)], axis=1)


for _fmt, _fn in (
    (GGMLType.IQ2_XXS, _enc_iq2_xxs), (GGMLType.IQ2_XS, _enc_iq2_xs),
    (GGMLType.IQ2_S, _enc_iq2_s), (GGMLType.IQ3_XXS, _enc_iq3_xxs),
    (GGMLType.IQ3_S, _enc_iq3_s), (GGMLType.IQ1_S, _enc_iq1_s),
    (GGMLType.IQ1_M, _enc_iq1_m), (GGMLType.TQ1_0, _enc_tq1_0),
):
    _ENCODERS[_fmt] = (lambda f: (lambda x: f(x)))(_fn)
    _WEIGHTED_ENCODERS[_fmt] = (lambda f: (lambda x, w: f(x, w)))(_fn)
