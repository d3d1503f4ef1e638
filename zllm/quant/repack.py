"""GGUF block formats -> TPU-native planar tile layouts.

This is the TPU rebirth of the reference's repack "extra buffer type"
(reference: ggml/src/ggml-cpu/repack.cpp:1622-2066, the Zyk transposed
layouts at :1745-1837): at load time, byte-packed blocks are split into
separate *planes* — packed integer quants, group scales, superblock
scales — each a dense array shaped so the TPU sees (sublane, lane)-tiled
loads:

  * logical weight is y = x @ W with W[K, N]  (GGUF stores W^T as [N, K])
  * quants are packed along K (two nibbles per byte -> uint8[K//2, N])
    so that N, the output-feature axis, is the 128-lane axis
  * group scales  (one per 32 or 16 k-elements) are [K//G, N]
  * superblock scales (K-quants, one fp16 per 256) are [K//256, N]

Weights stay in these planes in HBM; dequantization happens inside the
Pallas matmul kernels (zllm/ops/qmatmul.py) or — the portable fallback —
in `dequant()` below, which XLA fuses into the consuming matmul.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import QK_K, GGMLType
from . import blocks as qb

# formats the quantized execution path understands natively
REPACK_FORMATS = {
    GGMLType.Q4_0,
    GGMLType.Q4_1,
    GGMLType.Q5_0,
    GGMLType.Q5_1,
    GGMLType.Q8_0,
    GGMLType.Q2_K,
    GGMLType.Q3_K,
    GGMLType.Q4_K,
    GGMLType.Q5_K,
    GGMLType.Q6_K,
    GGMLType.MXFP4,
    GGMLType.IQ4_NL,
    GGMLType.IQ4_XS,
    GGMLType.IQ2_XXS,
    GGMLType.IQ2_XS,
    GGMLType.IQ2_S,
    GGMLType.IQ3_XXS,
    GGMLType.IQ3_S,
    GGMLType.IQ1_S,
    GGMLType.IQ1_M,
    GGMLType.TQ1_0,
    GGMLType.TQ2_0,
}


@jax.tree_util.register_pytree_node_class
@dataclass
class QTensor:
    """A quantized weight as a set of device arrays (planes).

    Logical value: f32[K, N]; used as `y = x @ qt`.  The planes dict is the
    pytree leaves; fmt/shape are static aux data.
    """

    fmt: GGMLType
    shape: tuple[int, int]  # (K, N)
    planes: dict[str, Any] = field(default_factory=dict)
    fold: int = 0  # split-half packing chunk (see choose_fold)
    # collective flags set by zllm.parallel.shard_params: inside shard_map,
    # a K-sharded weight's matmul yields partial sums (psum_axis) and an
    # N(vocab)-sharded head's logits need reassembly (gather_axis)
    psum_axis: str | None = None
    gather_axis: str | None = None
    # N-major packed-byte layout (see to_npack): qs is [K, N//2] with byte
    # (c) = code[c] | code[c + N/2] << 4, XOR 0x80 — the decode kernel's
    # dual-dot consumes the bytes on the MXU without a nibble unpack
    npack: bool = False

    def tree_flatten(self):
        keys = tuple(sorted(self.planes))
        aux = (self.fmt, self.shape, keys, self.fold, self.psum_axis,
               self.gather_axis, self.npack)
        return tuple(self.planes[k] for k in keys), aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        fmt, shape, keys, fold, psum_axis, gather_axis, npack = aux
        return cls(fmt=fmt, shape=shape, planes=dict(zip(keys, leaves)), fold=fold,
                   psum_axis=psum_axis, gather_axis=gather_axis, npack=npack)

    def with_collectives(self, psum_axis=None, gather_axis=None) -> "QTensor":
        return QTensor(fmt=self.fmt, shape=self.shape, planes=self.planes,
                       fold=self.fold, psum_axis=psum_axis, gather_axis=gather_axis,
                       npack=self.npack)

    @property
    def nbytes(self) -> int:
        return sum(int(np.prod(p.shape)) * p.dtype.itemsize for p in self.planes.values())

    # portable dequantization (jnp; XLA fuses into the consumer)
    def dequant(self, dtype=jnp.float32) -> jax.Array:
        if self.npack:
            return _dequant_npack(self, dtype)
        return _DEQUANT[self.fmt](self.planes, self.shape, dtype, self.fold)


# ---------------------------------------------------------------------------
# packing helpers (host numpy, load time)
# ---------------------------------------------------------------------------

def choose_fold(k: int) -> int:
    """K-chunk size for split-half packing.  Within each chunk of `fold`
    rows, one byte holds rows (r, r + fold/2) [nibbles] or (r, r+fold/4,
    r+fold/2, r+3fold/4) [crumbs], so the matmul kernel restores natural
    k-order with cheap concats instead of sublane interleaves.  The Pallas
    kernels use TK == fold."""
    for fold in (256, 64, 32):
        if k % fold == 0:
            return fold
    return 0  # not packable; caller keeps dense


def _pack_nibbles_k(q: np.ndarray, fold: int) -> np.ndarray:
    """uint8[K, N] 4-bit values -> uint8[K//2, N] with split-half fold."""
    k, n = q.shape
    g = q.reshape(k // fold, 2, fold // 2, n)
    return (g[:, 0] | (g[:, 1] << 4)).astype(np.uint8).reshape(k // 2, n)


def _unpack_nibbles_k(p, fold: int, xp=jnp):
    """Inverse on device: uint8[K//2, N] -> int32[K, N] (natural order)."""
    kh, n = p.shape
    g = p.reshape(kh // (fold // 2), fold // 2, n)
    lo = (g & 0xF).astype(xp.int32)
    hi = (g >> 4).astype(xp.int32)
    return xp.concatenate([lo, hi], axis=1).reshape(kh * 2, n)


def _pack_crumbs_k(q: np.ndarray, fold: int) -> np.ndarray:
    """uint8[K, N] 2-bit values -> uint8[K//4, N] with split-quarter fold."""
    k, n = q.shape
    g = q.reshape(k // fold, 4, fold // 4, n)
    out = g[:, 0] | (g[:, 1] << 2) | (g[:, 2] << 4) | (g[:, 3] << 6)
    return out.astype(np.uint8).reshape(k // 4, n)


def _unpack_crumbs_k(p, fold: int, xp=jnp):
    kq, n = p.shape
    g = p.reshape(kq // (fold // 4), fold // 4, n)
    parts = [((g >> (2 * i)) & 0x3).astype(xp.int32) for i in range(4)]
    return xp.concatenate(parts, axis=1).reshape(kq * 4, n)


def _f32s(x):
    """Scale plane -> f32.  Planes store fp16 BIT PATTERNS as uint16 so
    the matmul kernels take integer loads directly; keeping them f16 made
    every jitted step re-run a bitcast_convert_type per plane per call
    (measured 178 ops / 37us per decode step on TinyLlama)."""
    if x.dtype == jnp.uint16:
        return jax.lax.bitcast_convert_type(x, jnp.float16).astype(jnp.float32)
    return x.astype(jnp.float32)


def _group_repeat(s: jax.Array, group: int) -> jax.Array:
    """[K//G, N] per-group values -> [K, N] by repeat along K."""
    return jnp.repeat(s, group, axis=0)


# ---------------------------------------------------------------------------
# per-format repack: blocks (numpy, [N, K] GGUF row-major) -> planes
# each function receives the element-ordered decode intermediates
# ---------------------------------------------------------------------------

def _u16_bits(v: np.ndarray) -> np.ndarray:
    """fp16 planes -> uint16 bit patterns (see _f32s)."""
    return v.view(np.uint16) if v.dtype == np.float16 else v


def repack(raw: np.ndarray, gguf_shape: tuple[int, ...], fmt: GGMLType) -> QTensor:
    """raw uint8[N, row_bytes] (GGUF layout: one row per output feature) ->
    QTensor with [K, N] planes."""
    fmt = GGMLType(fmt)
    if len(gguf_shape) != 2:
        raise ValueError(f"repack expects 2-D weights, got {gguf_shape}")
    n, k = gguf_shape  # GGUF numpy shape: (N rows, K row-elements)
    fold = choose_fold(k)
    if fold == 0:
        raise ValueError(f"K={k} not foldable for repack")
    raw = raw.reshape(n, -1)
    planes = None
    if n * k >= 1 << 20:  # large tensors: multithreaded C++ engine (native/)
        planes = _native_repack(fmt, raw, n, k, fold)
    if planes is None:
        planes = _REPACK[fmt](raw, n, k, fold)
    return QTensor(
        fmt=fmt, shape=(k, n), fold=fold,
        planes={key: jnp.asarray(_u16_bits(v)) for key, v in planes.items()},
    )


def concat_n(qts: list[QTensor]) -> QTensor:
    """Concatenate QTensors along the output-feature (N) axis — the
    load-time projection fusion (wq|wk|wv -> wqkv, gate|up -> gateup) that
    turns several small kernel launches into one.  Valid because every
    plane of every format is laid out [rows, N]: column blocks of the
    fused weight are exactly the original tensors."""
    fmt, k, fold = qts[0].fmt, qts[0].shape[0], qts[0].fold
    assert all(q.fmt == fmt and q.shape[0] == k and q.fold == fold for q in qts)
    planes = {
        key: jnp.concatenate([q.planes[key] for q in qts], axis=-1) for key in qts[0].planes
    }
    return QTensor(fmt=fmt, shape=(k, sum(q.shape[1] for q in qts)), planes=planes, fold=fold)


def pad_n(qt: QTensor, mult: int) -> QTensor:
    """Zero-pad the output-feature axis to a multiple of `mult` so the
    matmul kernels can use their widest N tile (the vocab head's 32000
    otherwise forces a narrow tile).  Padded columns dequantize to zero
    (all planes zero -> q*a - b with a=b=0); callers slice logits back to
    the true vocab."""
    k, n = qt.shape
    pad = (-n) % mult
    if pad == 0:
        return qt
    planes = {
        key: jnp.concatenate(
            [p, jnp.zeros(p.shape[:-1] + (pad,), p.dtype)], axis=-1
        )
        for key, p in qt.planes.items()
    }
    return QTensor(fmt=qt.fmt, shape=(k, n + pad), planes=planes, fold=qt.fold,
                   psum_axis=qt.psum_axis, gather_axis=qt.gather_axis)


def split_n(qt: QTensor, sizes: list[int]) -> list[QTensor]:
    """Inverse of concat_n: slice planes at N boundaries."""
    outs, off = [], 0
    for n in sizes:
        planes = {key: p[..., off : off + n] for key, p in qt.planes.items()}
        outs.append(QTensor(fmt=qt.fmt, shape=(qt.shape[0], n), planes=planes, fold=qt.fold))
        off += n
    assert off == qt.shape[1]
    return outs


@jax.tree_util.register_pytree_node_class
@dataclass
class QTensorE:
    """A stacked mixture-of-experts weight [E, K, N] kept quantized in HBM
    (reference: the 3-D ggml tensors consumed by ggml_mul_mat_id,
    src/llama-graph.cpp:761-774).  Planes carry a leading expert axis;
    `gather(idx)` selects experts' planes (XLA lowers to a sliced HBM
    read), so sparse top-k dispatch only pays bandwidth for the experts it
    uses."""

    fmt: GGMLType
    shape: tuple[int, int, int]  # (E, K, N)
    planes: dict[str, Any] = field(default_factory=dict)
    fold: int = 0

    def tree_flatten(self):
        keys = tuple(sorted(self.planes))
        return tuple(self.planes[k] for k in keys), (self.fmt, self.shape, keys, self.fold)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        fmt, shape, keys, fold = aux
        return cls(fmt=fmt, shape=shape, planes=dict(zip(keys, leaves)), fold=fold)

    @property
    def nbytes(self) -> int:
        return sum(int(np.prod(p.shape)) * p.dtype.itemsize for p in self.planes.values())

    def dequant(self, dtype=jnp.float32) -> jax.Array:
        """Full dense [E, K, N] (prefill path: most experts active anyway)."""
        e, k, n = self.shape
        fn = _DEQUANT[self.fmt]
        return jax.vmap(lambda pl: fn(pl, (k, n), dtype, self.fold))(self.planes)

    def dequant_gather(self, idx: jax.Array, dtype=jnp.float32) -> jax.Array:
        """Dense weights of selected experts: idx [...,] int32 -> [..., K, N].
        Only the gathered experts' quantized planes are read from HBM."""
        e, k, n = self.shape
        sel = {key: p[idx] for key, p in self.planes.items()}
        fn = _DEQUANT[self.fmt]
        flat = jax.tree_util.tree_map(lambda p: p.reshape((-1,) + p.shape[idx.ndim:]), sel)
        out = jax.vmap(lambda pl: fn(pl, (k, n), dtype, self.fold))(flat)
        return out.reshape(idx.shape + (k, n))


def repack_experts(raw: np.ndarray, gguf_shape: tuple[int, ...], fmt: GGMLType) -> QTensorE:
    """raw uint8[E, N, row_bytes] (GGUF expert-stacked layout) -> QTensorE
    with [E, ...] planes, repacking each expert like a 2-D weight."""
    fmt = GGMLType(fmt)
    e, n, k = gguf_shape
    fold = choose_fold(k)
    if fold == 0:
        raise ValueError(f"K={k} not foldable for repack")
    raw = raw.reshape(e, n, -1)
    per = [_REPACK[fmt](raw[i], n, k, fold) for i in range(e)]
    planes = {key: np.stack([p[key] for p in per]) for key in per[0]}
    return QTensorE(
        fmt=fmt, shape=(e, k, n), fold=fold,
        planes={key: jnp.asarray(_u16_bits(v)) for key, v in planes.items()},
    )


def _native_repack(fmt, raw, n, k, fold):
    """Byte-exact C++ fast path (zllm/native.py); None -> numpy fallback."""
    try:
        from .. import native
    except ImportError:
        return None
    if fmt == GGMLType.Q4_K:
        return native.repack_q4k(raw, n, k, fold)
    return None


_REPACK = {}
_DEQUANT = {}


def _repack_fmt(fmt):
    def wrap(fn):
        _REPACK[fmt] = fn
        return fn

    return wrap


def _dequant_fmt(fmt):
    def wrap(fn):
        _DEQUANT[fmt] = fn
        return fn

    return wrap


@_repack_fmt(GGMLType.Q4_0)
def _rp_q4_0(raw, n, k, fold):
    b = raw.reshape(-1, 18)
    d = b[:, :2].view("<f2").reshape(n, k // 32)
    q = qb._nib_lo_hi(b[:, 2:], 16).reshape(n, k)  # element-ordered, 0..15
    return {
        "qs": _pack_nibbles_k(q.T.astype(np.uint8), fold),
        "d": np.ascontiguousarray(d.T),  # fp16 [K//32, N]
    }


@_dequant_fmt(GGMLType.Q4_0)
def _dq_q4_0(p, shape, dtype, fold):
    q = _unpack_nibbles_k(p["qs"], fold) - 8
    d = _group_repeat(_f32s(p["d"]), 32)
    return (q.astype(jnp.float32) * d).astype(dtype)


@_repack_fmt(GGMLType.Q8_0)
def _rp_q8_0(raw, n, k, fold):
    b = raw.reshape(-1, 34)
    d = b[:, :2].view("<f2").reshape(n, k // 32)
    q = b[:, 2:].view(np.int8).reshape(n, k)
    return {"qs": np.ascontiguousarray(q.T), "d": np.ascontiguousarray(d.T)}


@_dequant_fmt(GGMLType.Q8_0)
def _dq_q8_0(p, shape, dtype, fold):
    d = _group_repeat(_f32s(p["d"]), 32)
    return (p["qs"].astype(jnp.float32) * d).astype(dtype)


def _bitplane_k(bits_nk: np.ndarray, k: int, n: int) -> np.ndarray:
    """per-element 0/1 bits [N, K] -> packed bit-plane uint8[K//8, N]
    (bit i of byte r holds k = 8r + i; expanded in-kernel by _q5k_bits)."""
    return np.packbits(
        bits_nk.T.astype(np.uint8).reshape(k // 8, 8, n), axis=1, bitorder="little"
    ).reshape(k // 8, n)


def _jnp_bitplane(qh, xp=jnp):
    """uint8[K//8, N] bit-plane -> int32[K, N]."""
    parts = xp.stack([((qh.astype(xp.int32) >> i) & 1) for i in range(8)], axis=1)
    return parts.reshape(qh.shape[0] * 8, qh.shape[1])


@_repack_fmt(GGMLType.Q4_1)
def _rp_q4_1(raw, n, k, fold):
    b = raw.reshape(-1, 20)
    d = b[:, :2].view("<f2").astype(np.float32)
    m = b[:, 2:4].view("<f2").astype(np.float32)
    q = qb._nib_lo_hi(b[:, 4:], 16).reshape(n, k)
    # uniform kernel contract w = q*a - b  ->  b = -m
    a = d.astype("<f2").reshape(n, k // 32)
    bb = (-m).astype("<f2").reshape(n, k // 32)
    return {
        "qs": _pack_nibbles_k(q.T.astype(np.uint8), fold),
        "a": np.ascontiguousarray(a.T),
        "b": np.ascontiguousarray(bb.T),
    }


@_dequant_fmt(GGMLType.Q4_1)
def _dq_q4_1(p, shape, dtype, fold):
    q = _unpack_nibbles_k(p["qs"], fold).astype(jnp.float32)
    a = _group_repeat(_f32s(p["a"]), 32)
    b = _group_repeat(_f32s(p["b"]), 32)
    return (q * a - b).astype(dtype)


@_repack_fmt(GGMLType.Q5_0)
def _rp_q5_0(raw, n, k, fold):
    b = raw.reshape(-1, 22)
    d = b[:, :2].view("<f2")
    lo = qb._nib_lo_hi(b[:, 6:], 16)
    hi = qb._qh_bits32(b[:, 2:6])
    return {
        "qs": _pack_nibbles_k(lo.reshape(n, k).T.astype(np.uint8), fold),
        "qh": _bitplane_k(hi.reshape(n, k), k, n),
        "a": np.ascontiguousarray(d.astype("<f2").reshape(n, k // 32).T),
    }


@_dequant_fmt(GGMLType.Q5_0)
def _dq_q5_0(p, shape, dtype, fold):
    lo = _unpack_nibbles_k(p["qs"], fold)
    q = (lo | (_jnp_bitplane(p["qh"]) << 4)).astype(jnp.float32) - 16.0
    a = _group_repeat(_f32s(p["a"]), 32)
    return (q * a).astype(dtype)


@_repack_fmt(GGMLType.Q5_1)
def _rp_q5_1(raw, n, k, fold):
    b = raw.reshape(-1, 24)
    d = b[:, :2].view("<f2").astype(np.float32)
    m = b[:, 2:4].view("<f2").astype(np.float32)
    lo = qb._nib_lo_hi(b[:, 8:], 16)
    hi = qb._qh_bits32(b[:, 4:8])
    return {
        "qs": _pack_nibbles_k(lo.reshape(n, k).T.astype(np.uint8), fold),
        "qh": _bitplane_k(hi.reshape(n, k), k, n),
        "a": np.ascontiguousarray(d.astype("<f2").reshape(n, k // 32).T),
        "b": np.ascontiguousarray((-m).astype("<f2").reshape(n, k // 32).T),
    }


@_dequant_fmt(GGMLType.Q5_1)
def _dq_q5_1(p, shape, dtype, fold):
    lo = _unpack_nibbles_k(p["qs"], fold)
    q = (lo | (_jnp_bitplane(p["qh"]) << 4)).astype(jnp.float32)
    a = _group_repeat(_f32s(p["a"]), 32)
    b = _group_repeat(_f32s(p["b"]), 32)
    return (q * a - b).astype(dtype)


@_repack_fmt(GGMLType.Q2_K)
def _rp_q2_k(raw, n, k, fold):
    b = raw.reshape(-1, 84)
    scales, qs = b[:, :16], b[:, 16:80]
    d = b[:, 80:82].view("<f2").astype(np.float32)
    dmin = b[:, 82:84].view("<f2").astype(np.float32)
    a = (d * (scales & 0x0F)).astype("<f2").reshape(n, k // 16)
    bb = (dmin * (scales >> 4)).astype("<f2").reshape(n, k // 16)
    q = np.concatenate(
        [qb._bits_unpack(qs[:, c * 32 : (c + 1) * 32], 2, 32) for c in range(2)], axis=1
    ).reshape(n, k)
    return {
        "qs": _pack_crumbs_k(q.T.astype(np.uint8), fold),
        "a": np.ascontiguousarray(a.T),  # fp16 [K//16, N] = d*sc
        "b": np.ascontiguousarray(bb.T),  # fp16 [K//16, N] = dmin*mn
    }


@_dequant_fmt(GGMLType.Q2_K)
def _dq_q2_k(p, shape, dtype, fold):
    q = _unpack_crumbs_k(p["qs"], fold).astype(jnp.float32)
    a = _group_repeat(_f32s(p["a"]), 16)
    b = _group_repeat(_f32s(p["b"]), 16)
    return (q * a - b).astype(dtype)


@_repack_fmt(GGMLType.Q3_K)
def _rp_q3_k(raw, n, k, fold):
    b = raw.reshape(-1, 110)
    hmask, qs, sb = b[:, :32], b[:, 32:96], b[:, 96:108]
    d = b[:, 108:110].view("<f2").astype(np.float32)
    lo6 = np.concatenate([sb[:, :8] & 0x0F, sb[:, :8] >> 4], axis=1)
    hi6 = qb._bits_unpack(sb[:, 8:12], 2, 4)
    scales = ((lo6 | (hi6 << np.uint8(4))).astype(np.int8) - np.int8(32)).astype(np.float32)
    a = (d * scales).astype("<f2").reshape(n, k // 16)
    ql = np.concatenate(
        [qb._bits_unpack(qs[:, c * 32 : (c + 1) * 32], 2, 32) for c in range(2)], axis=1
    ).reshape(n, k)
    hb = qb._bits_unpack(hmask, 1, 32).reshape(n, k)  # 1 -> no -4 offset
    return {
        "qs": _pack_crumbs_k(ql.T.astype(np.uint8), fold),
        "qh": _bitplane_k(hb, k, n),
        "a": np.ascontiguousarray(a.T),  # fp16 [K//16, N] = d*sc (signed)
    }


@_dequant_fmt(GGMLType.Q3_K)
def _dq_q3_k(p, shape, dtype, fold):
    lo = _unpack_crumbs_k(p["qs"], fold)
    q = ((lo | (_jnp_bitplane(p["qh"]) << 2)) - 4).astype(jnp.float32)
    a = _group_repeat(_f32s(p["a"]), 16)
    return (q * a).astype(dtype)


@_repack_fmt(GGMLType.MXFP4)
def _rp_mxfp4(raw, n, k, fold):
    b = raw.reshape(-1, 17)
    e = b[:, :1].reshape(n, k // 32)
    q = qb._nib_lo_hi(b[:, 1:], 16).reshape(n, k)
    return {"qs": _pack_nibbles_k(q.T.astype(np.uint8), fold), "e": np.ascontiguousarray(e.T)}


@_dequant_fmt(GGMLType.MXFP4)
def _dq_mxfp4(p, shape, dtype, fold):
    idx = _unpack_nibbles_k(p["qs"], fold)
    lut = jnp.asarray(qb.MXFP4_VALUES, dtype=jnp.float32)
    q = lut[idx]
    e = p["e"].astype(jnp.uint32)
    bits = jnp.where(e < 2, jnp.uint32(0x00200000) << e, (e - 1) << jnp.uint32(23))
    d = _group_repeat(jax.lax.bitcast_convert_type(bits, jnp.float32), 32)
    return (q * d).astype(dtype)


@_repack_fmt(GGMLType.IQ4_NL)
def _rp_iq4_nl(raw, n, k, fold):
    b = raw.reshape(-1, 18)
    d = b[:, :2].view("<f2").reshape(n, k // 32)
    q = qb._nib_lo_hi(b[:, 2:], 16).reshape(n, k)
    return {"qs": _pack_nibbles_k(q.T.astype(np.uint8), fold), "d": np.ascontiguousarray(d.T)}


@_dequant_fmt(GGMLType.IQ4_NL)
def _dq_iq4_nl(p, shape, dtype, fold):
    idx = _unpack_nibbles_k(p["qs"], fold)
    lut = jnp.asarray(qb.IQ4NL_VALUES, dtype=jnp.float32)
    d = _group_repeat(_f32s(p["d"]), 32)
    return (lut[idx] * d).astype(dtype)


@_repack_fmt(GGMLType.Q4_K)
def _rp_q4_k(raw, n, k, fold):
    # two-level scales kept EXACT ("diet" layout): sm packs the raw 6-bit
    # (scale, min) fields (sc | mn << 6, one u16 per 32-group), sd/sb are
    # the per-256-superblock fp16 d/dmin.  vs the old collapsed fp16
    # a=d*sc / b=dmin*mn planes this halves the scale-plane HBM traffic
    # (2.5B vs 4B per 32 weights — ~10% of a Q4_K model's total stream)
    # AND removes the f16 product rounding: the kernels now compute d*sc
    # in f32 exactly like ggml's dequantize_row_q4_K.
    b = raw.reshape(-1, 144)
    d = b[:, :2].view("<f2")
    dmin = b[:, 2:4].view("<f2")
    sc, mn = qb._unpack_kscales(b[:, 4:16])  # [nb, 8] 6-bit
    sm = (sc.astype(np.uint16) | (mn.astype(np.uint16) << 6)).reshape(n, k // 32)
    q = qb._nib_lo_hi(b[:, 16:], 32).reshape(n, k)  # element-ordered 0..15
    return {
        "qs": _pack_nibbles_k(q.T.astype(np.uint8), fold),
        "sm": np.ascontiguousarray(sm.T),  # u16 [K//32, N]: sc | mn<<6
        # super planes padded to 8-row multiples: the kernels' dynamic
        # sublane roll (_q4k_group_scales) rejects unaligned shapes
        "sd": _pad8_rows(np.ascontiguousarray(d.reshape(n, k // 256).T)),
        "sb": _pad8_rows(np.ascontiguousarray(dmin.reshape(n, k // 256).T)),
    }


def _pad8_rows(p: np.ndarray) -> np.ndarray:
    pad = (-p.shape[0]) % 8
    if pad == 0:
        return p
    return np.concatenate([p, np.zeros((pad, p.shape[1]), p.dtype)], axis=0)


def q4k_scale_planes(p):
    """Diet planes -> per-32-group f32 (a, b) [K//32, N] (exact d*sc).
    The super planes may carry 8-alignment padding rows; sm's extent is
    authoritative."""
    smi = p["sm"].astype(jnp.int32)
    g = smi.shape[0]
    a = _group_repeat(_f32s(p["sd"]), 8)[:g] * (smi & 63).astype(jnp.float32)
    b = _group_repeat(_f32s(p["sb"]), 8)[:g] * (smi >> 6).astype(jnp.float32)
    return a, b


def q4k_to_ab(qt: QTensor) -> QTensor:
    """Diet-layout Q4_K -> collapsed a/b planes (the pre-diet layout, still
    understood by every kernel).  Used where the [K//256, N] super planes
    can't shard (tensor-parallel K splits need rows % tp == 0).  The planes
    stay f32 so the products are EXACT — bit-identical to the diet kernels'
    in-kernel d*sc math (an f16 cast here made TP outputs drift from the
    single-chip reference)."""
    if qt.fmt != GGMLType.Q4_K or "sm" not in qt.planes:
        return qt
    a, b = q4k_scale_planes(qt.planes)
    planes = {"qs": qt.planes["qs"], "a": a, "b": b}
    return QTensor(fmt=qt.fmt, shape=qt.shape, planes=planes, fold=qt.fold,
                   psum_axis=qt.psum_axis, gather_axis=qt.gather_axis,
                   npack=qt.npack)


@_dequant_fmt(GGMLType.Q4_K)
def _dq_q4_k(p, shape, dtype, fold):
    q = _unpack_nibbles_k(p["qs"], fold).astype(jnp.float32)
    if "sm" in p:
        a32, b32 = q4k_scale_planes(p)
        a, b = _group_repeat(a32, 32), _group_repeat(b32, 32)
    else:
        a = _group_repeat(_f32s(p["a"]), 32)
        b = _group_repeat(_f32s(p["b"]), 32)
    return (q * a - b).astype(dtype)


@_repack_fmt(GGMLType.Q5_K)
def _rp_q5_k(raw, n, k, fold):
    b = raw.reshape(-1, 176)
    d = b[:, :2].view("<f2")  # [nb, 1]
    dmin = b[:, 2:4].view("<f2")
    sc, mn = qb._unpack_kscales(b[:, 4:16])
    lo = qb._nib_lo_hi(b[:, 48:], 32)
    hi = qb._bits_unpack(b[:, 16:48], 1, 32)
    q = (lo | (hi << np.uint8(4))).reshape(n, k)  # 0..31
    qlo = q & 0x0F
    qhi = q >> 4  # one bit
    a = (d.astype(np.float32) * sc).astype("<f2").reshape(n, k // 32)
    bb = (dmin.astype(np.float32) * mn).astype("<f2").reshape(n, k // 32)
    return {
        "qs": _pack_nibbles_k(qlo.T.astype(np.uint8), fold),
        "qh": np.packbits(qhi.T.astype(np.uint8).reshape(k // 8, 8, n), axis=1, bitorder="little").reshape(k // 8, n),
        "a": np.ascontiguousarray(a.T),  # fp16 [K//32, N] = d*sc
        "b": np.ascontiguousarray(bb.T),
    }


@_dequant_fmt(GGMLType.Q5_K)
def _dq_q5_k(p, shape, dtype, fold):
    lo = _unpack_nibbles_k(p["qs"], fold)
    qh = p["qh"].astype(jnp.int32)  # [K//8, N] bit i of byte -> k = 8*row + i
    bits = jnp.stack([(qh >> i) & 1 for i in range(8)], axis=1).reshape(
        qh.shape[0] * 8, qh.shape[1]
    )
    q = (lo | (bits << 4)).astype(jnp.float32)
    a = _group_repeat(_f32s(p["a"]), 32)
    b = _group_repeat(_f32s(p["b"]), 32)
    return (q * a - b).astype(dtype)


@_repack_fmt(GGMLType.Q6_K)
def _rp_q6_k(raw, n, k, fold):
    b = raw.reshape(-1, 210)
    d = b[:, 208:210].view("<f2").reshape(n, k // QK_K)
    sc = b[:, 192:208].view(np.int8).reshape(n, k // 16)
    lo = np.concatenate(
        [qb._nib_lo_hi(b[:, c * 64 : (c + 1) * 64], 64) for c in range(2)], axis=1
    )
    hi = np.concatenate(
        [qb._bits_unpack(b[:, 128 + c * 32 : 128 + (c + 1) * 32], 2, 32) for c in range(2)], axis=1
    )
    q = (lo | (hi << np.uint8(4))).reshape(n, k)  # 0..63 (bias 32)
    a = (d.astype(np.float32).repeat(16, axis=1) * sc).astype("<f2").reshape(n, k // 16)
    return {
        "ql": _pack_nibbles_k((q & 0x0F).T.astype(np.uint8), fold),
        "qh": _pack_crumbs_k((q >> 4).T.astype(np.uint8), fold),
        "a": np.ascontiguousarray(a.T),  # fp16 [K//16, N] = d*sc
    }


@_dequant_fmt(GGMLType.Q6_K)
def _dq_q6_k(p, shape, dtype, fold):
    lo = _unpack_nibbles_k(p["ql"], fold)
    hi = _unpack_crumbs_k(p["qh"], fold)
    q = (lo | (hi << 4)).astype(jnp.float32) - 32.0
    a = _group_repeat(_f32s(p["a"]), 16)
    return (q * a).astype(dtype)


@_repack_fmt(GGMLType.IQ4_XS)
def _rp_iq4_xs(raw, n, k, fold):
    b = raw.reshape(-1, 136)
    d = b[:, :2].view("<f2").reshape(n, k // QK_K)
    sh16 = b[:, 2:4].view("<u2").astype(np.uint32)
    sl = qb._nib_lo_hi(b[:, 4:8], 1).reshape(-1, 8)
    hi = np.stack([(sh16[:, 0] >> (2 * g)) & 3 for g in range(8)], axis=1).astype(np.uint8)
    sc = ((sl | (hi << np.uint8(4))).astype(np.int8) - np.int8(32)).reshape(n, k // 32)
    q = qb._nib_lo_hi(b[:, 8:], 16).reshape(n, k)
    a = (d.astype(np.float32).repeat(8, axis=1) * sc).astype("<f2").reshape(n, k // 32)
    return {
        "qs": _pack_nibbles_k(q.T.astype(np.uint8), fold),
        "a": np.ascontiguousarray(a.T),  # fp16 [K//32, N] = d*sc
    }


@_dequant_fmt(GGMLType.IQ4_XS)
def _dq_iq4_xs(p, shape, dtype, fold):
    idx = _unpack_nibbles_k(p["qs"], fold)
    lut = jnp.asarray(qb.IQ4NL_VALUES, dtype=jnp.float32)
    a = _group_repeat(_f32s(p["a"]), 32)
    return (lut[idx] * a).astype(dtype)


# ---------------------------------------------------------------------------
# IQ grid-codebook + ternary formats (reference: ggml/src/ggml-cuda/
# convert.cu per-format device dequant; grids ggml-common.h iq*_grid).
#
# TPU relayout: the grid*sign product of every element lands in a tiny
# value set (IQ2: +-{8,25,43}; IQ3_XXS: +-{4,12,...,52,62}; IQ3_S: odd
# +-1..15; IQ1/TQ: {-1,0,1}), so at load we fold codebook lookup + sign
# into a per-element *value index* packed as nibbles (IQ2/IQ3) or crumbs
# (IQ1/TQ), with the per-group effective scale materialized as an fp16
# "a" plane (and "b" for IQ1's +-delta offset).  In-kernel decode is then
# a short select chain / pure arithmetic — no gathers, MXU-friendly —
# while HBM stays at 3-6 bits/weight (vs 16 for the bf16 inflation the
# loader used to do).
# ---------------------------------------------------------------------------

# IQ2 nibble LUT: idx = mag_idx | (sign << 2) -> value
IQ2_VALUES = np.array([8, 25, 43, 0, -8, -25, -43, 0], dtype=np.float32)
# IQ3_XXS nibble LUT: idx = mag_idx | (sign << 3) -> value
IQ3XXS_MAGS = np.array([4, 12, 20, 28, 36, 44, 52, 62], dtype=np.float32)
IQ3XXS_VALUES = np.concatenate([IQ3XXS_MAGS, -IQ3XXS_MAGS]).astype(np.float32)


def _signed_codes(vals: np.ndarray, mags: np.ndarray, sign_shift: int) -> np.ndarray:
    """Element values from a signed magnitude set -> small index:
    mag_idx | (neg << sign_shift)."""
    mag_idx = np.searchsorted(mags, np.abs(vals)).astype(np.uint8)
    return np.where(vals < 0, mag_idx | (1 << sign_shift), mag_idx).astype(np.uint8)


def _iq2_planes(vals, db, group, n, k, fold):
    """Common IQ2-family plane build: vals [nb, 256] signed element values,
    db [nb, 256//group] per-group scales."""
    idx = _signed_codes(vals, np.array([8, 25, 43], np.float32), 2).reshape(n, k)
    return {
        "qs": _pack_nibbles_k(idx.T, fold),
        "a": np.ascontiguousarray(db.astype("<f2").reshape(n, k // group).T),
    }


@_repack_fmt(GGMLType.IQ2_XXS)
def _rp_iq2_xxs(raw, n, k, fold):
    b = raw.reshape(-1, 66)
    nb = b.shape[0]
    d = qb._f16(b[:, :2])
    u32 = b[:, 2:].copy().view("<u4").reshape(nb, 8, 2)
    codes = u32[:, :, 0].copy().view(np.uint8).reshape(nb, 8, 4)
    aux = u32[:, :, 1]
    db = d * (0.5 + (aux >> 28).astype(np.float32)) * 0.25  # [nb, 8] per-32
    signs = qb._sign_bits((aux[:, :, None] >> np.array([0, 7, 14, 21], np.uint32)).astype(np.uint8))
    grid = qb._iq_grids()["iq2_xxs_grid"][codes]  # [nb, 8, 4, 8]
    vals = (grid * signs).reshape(nb, 256)
    return _iq2_planes(vals, db, 32, n, k, fold)


@_repack_fmt(GGMLType.IQ2_XS)
def _rp_iq2_xs(raw, n, k, fold):
    b = raw.reshape(-1, 74)
    nb = b.shape[0]
    d = qb._f16(b[:, :2])
    qs = b[:, 2:66].copy().view("<u2").reshape(nb, 32)
    sl = b[:, 66:74]
    sc = np.stack([sl & 0x0F, sl >> 4], axis=-1).reshape(nb, 16)
    db = d * (0.5 + sc.astype(np.float32)) * 0.25  # [nb, 16] per-16
    signs = qb._sign_bits((qs >> 9).astype(np.uint8))  # [nb, 32, 8]
    grid = qb._iq_grids()["iq2_xs_grid"][qs & 511]
    vals = (grid * signs).reshape(nb, 256)
    return _iq2_planes(vals, db, 16, n, k, fold)


@_repack_fmt(GGMLType.IQ2_S)
def _rp_iq2_s(raw, n, k, fold):
    b = raw.reshape(-1, 82)
    nb = b.shape[0]
    d = qb._f16(b[:, :2])
    qs, sbytes, qh, sl = b[:, 2:34], b[:, 34:66], b[:, 66:74], b[:, 74:82]
    sc = np.stack([sl & 0x0F, sl >> 4], axis=-1).reshape(nb, 16)
    db = d * (0.5 + sc.astype(np.float32)) * 0.25  # [nb, 16] per-16
    hi = ((qh[:, :, None] >> np.array([0, 2, 4, 6], np.uint8)) & 3).reshape(nb, 32)
    idx = qs.astype(np.uint16) | (hi.astype(np.uint16) << 8)
    signs = qb._raw_sign_bits(sbytes).reshape(nb, 32, 8)
    grid = qb._iq_grids()["iq2_s_grid"][idx]
    vals = (grid * signs).reshape(nb, 256)
    return _iq2_planes(vals, db, 16, n, k, fold)


def _dq_iq2(p, shape, dtype, fold, group):
    idx = _unpack_nibbles_k(p["qs"], fold)
    lut = jnp.asarray(IQ2_VALUES)
    a = _group_repeat(_f32s(p["a"]), group)
    return (lut[idx] * a).astype(dtype)


_DEQUANT[GGMLType.IQ2_XXS] = partial(_dq_iq2, group=32)
_DEQUANT[GGMLType.IQ2_XS] = partial(_dq_iq2, group=16)
_DEQUANT[GGMLType.IQ2_S] = partial(_dq_iq2, group=16)


@_repack_fmt(GGMLType.IQ3_XXS)
def _rp_iq3_xxs(raw, n, k, fold):
    b = raw.reshape(-1, 98)
    nb = b.shape[0]
    d = qb._f16(b[:, :2])
    qs = b[:, 2:66]
    aux = b[:, 66:98].copy().view("<u4").reshape(nb, 8)
    db = d * (0.5 + (aux >> 28).astype(np.float32)) * 0.5  # [nb, 8] per-32
    signs = qb._sign_bits(
        (aux[:, :, None] >> np.array([0, 7, 14, 21], np.uint32)).astype(np.uint8)
    ).reshape(nb, 32, 8)
    grid = qb._iq_grids()["iq3_xxs_grid"][qs].reshape(nb, 32, 8)
    vals = (grid * signs).reshape(nb, 256)
    idx = _signed_codes(vals, IQ3XXS_MAGS, 3).reshape(n, k)
    return {
        "qs": _pack_nibbles_k(idx.T, fold),
        "a": np.ascontiguousarray(db.astype("<f2").reshape(n, k // 32).T),
    }


@_dequant_fmt(GGMLType.IQ3_XXS)
def _dq_iq3_xxs(p, shape, dtype, fold):
    idx = _unpack_nibbles_k(p["qs"], fold)
    lut = jnp.asarray(IQ3XXS_VALUES)
    a = _group_repeat(_f32s(p["a"]), 32)
    return (lut[idx] * a).astype(dtype)


@_repack_fmt(GGMLType.IQ3_S)
def _rp_iq3_s(raw, n, k, fold):
    b = raw.reshape(-1, 110)
    nb = b.shape[0]
    d = qb._f16(b[:, :2])
    qs, qh, sbytes, sl = b[:, 2:66], b[:, 66:74], b[:, 74:106], b[:, 106:110]
    sc = np.stack([sl & 0x0F, sl >> 4], axis=-1).reshape(nb, 8)
    db = d * (1 + 2 * sc.astype(np.float32))  # [nb, 8] per-32
    hi = ((qh[:, :, None] >> np.arange(8, dtype=np.uint8)) & 1).reshape(nb, 64)
    idx = qs.astype(np.uint16) | (hi.astype(np.uint16) << 8)
    signs = qb._raw_sign_bits(sbytes).reshape(nb, 64, 4)
    grid = qb._iq_grids()["iq3_s_grid"][idx].reshape(nb, 64, 4)
    vals = (grid * signs).reshape(nb, 256)
    # odd magnitudes 1..15: idx = (|v|-1)/2 | neg<<3 (pure arithmetic decode)
    code = (((np.abs(vals) - 1) / 2).astype(np.uint8)
            | np.where(vals < 0, np.uint8(8), np.uint8(0))).reshape(n, k)
    return {
        "qs": _pack_nibbles_k(code.T, fold),
        "a": np.ascontiguousarray(db.astype("<f2").reshape(n, k // 32).T),
    }


@_dequant_fmt(GGMLType.IQ3_S)
def _dq_iq3_s(p, shape, dtype, fold):
    idx = _unpack_nibbles_k(p["qs"], fold)
    q = (2 * (idx & 7) + 1) * (1 - 2 * (idx >> 3))
    a = _group_repeat(_f32s(p["a"]), 32)
    return (q.astype(jnp.float32) * a).astype(dtype)


@_repack_fmt(GGMLType.IQ1_S)
def _rp_iq1_s(raw, n, k, fold):
    b = raw.reshape(-1, 50)
    nb = b.shape[0]
    d = qb._f16(b[:, :2])
    qs = b[:, 2:34]
    qh = b[:, 34:50].copy().view("<u2").reshape(nb, 8)
    dl = d * (2 * ((qh >> 12) & 7) + 1).astype(np.float32)  # [nb, 8] per-32
    delta = np.where((qh & 0x8000) == 0, np.float32(0.125), np.float32(-0.125))
    hi = ((qh[:, :, None] >> np.array([0, 3, 6, 9], np.uint16)) & 7).reshape(nb, 32)
    idx = qs.astype(np.uint16) | (hi << 8)
    grid = qb._iq_grids()["iq1_s_grid"][idx]  # [nb, 32, 8] in {-1,0,1}
    code = (grid.reshape(nb, 256).astype(np.int8) + 1).astype(np.uint8).reshape(n, k)
    return {
        "qs": _pack_crumbs_k(code.T, fold),
        "a": np.ascontiguousarray(dl.astype("<f2").reshape(n, k // 32).T),
        "b": np.ascontiguousarray((-dl * delta).astype("<f2").reshape(n, k // 32).T),
    }


@_dequant_fmt(GGMLType.IQ1_S)
def _dq_iq1_s(p, shape, dtype, fold):
    q = (_unpack_crumbs_k(p["qs"], fold) - 1).astype(jnp.float32)
    a = _group_repeat(_f32s(p["a"]), 32)
    b = _group_repeat(_f32s(p["b"]), 32)
    return (q * a - b).astype(dtype)


@_repack_fmt(GGMLType.IQ1_M)
def _rp_iq1_m(raw, n, k, fold):
    b = raw.reshape(-1, 56)
    nb = b.shape[0]
    qs, qh = b[:, :32], b[:, 32:48]
    sraw = b[:, 48:56].copy().view("<u2").reshape(nb, 4)
    d16 = (sraw & np.uint16(0xF000)) >> np.array([12, 8, 4, 0], np.uint16)
    d = (d16[:, 0] | d16[:, 1] | d16[:, 2] | d16[:, 3]).astype("<u2").view("<f2").astype(np.float32)
    sc = ((sraw[:, :, None] >> np.array([0, 3, 6, 9], np.uint16)) & 7).reshape(nb, 16)
    dl = d[:, None] * (2 * sc.astype(np.float32) + 1)  # [nb, 16] per-16
    hi = np.stack([qh & 0x0F, qh >> 4], axis=-1).reshape(nb, 32)
    idx = qs.astype(np.uint16) | ((hi.astype(np.uint16) & 7) << 8)
    delta = np.where((hi & 0x08) == 0, np.float32(0.125), np.float32(-0.125))  # [nb, 32] per-8
    grid = qb._iq_grids()["iq1_m_grid"][idx]  # [nb, 32, 8]
    code = (grid.reshape(nb, 256).astype(np.int8) + 1).astype(np.uint8).reshape(n, k)
    dl8 = dl.repeat(2, axis=1)  # delta varies per-8; b at per-8 granularity
    return {
        "qs": _pack_crumbs_k(code.T, fold),
        "a": np.ascontiguousarray(dl.astype("<f2").reshape(n, k // 16).T),
        "b": np.ascontiguousarray((-dl8 * delta).astype("<f2").reshape(n, k // 8).T),
    }


@_dequant_fmt(GGMLType.IQ1_M)
def _dq_iq1_m(p, shape, dtype, fold):
    q = (_unpack_crumbs_k(p["qs"], fold) - 1).astype(jnp.float32)
    a = _group_repeat(_f32s(p["a"]), 16)
    b = _group_repeat(_f32s(p["b"]), 8)
    return (q * a - b).astype(dtype)


def _rp_ternary(code_nk, d, n, k, fold):
    """code [n, k] in {0,1,2}; d [nb] per-256 scale replicated to per-32
    (keeps the 'a' plane on the uniform kdiv=32 tile used by the kernels)."""
    a = np.repeat(d.reshape(n, k // 256), 8, axis=1)
    return {
        "qs": _pack_crumbs_k(code_nk.T, fold),
        "a": np.ascontiguousarray(a.astype("<f2").T),
    }


@_repack_fmt(GGMLType.TQ1_0)
def _rp_tq1_0(raw, n, k, fold):
    b = raw.reshape(-1, 54)
    nb = b.shape[0]
    qs, qh, dby = b[:, :48], b[:, 48:52], b[:, 52:54]
    d = qb._f16(dby).reshape(nb)
    m5 = np.array([1, 3, 9, 27, 81], dtype=np.uint8).reshape(1, 1, 5, 1)
    q0 = (qs[:, :32].reshape(nb, 1, 1, 32) * m5).reshape(nb, 160)
    q1 = (qs[:, 32:48].reshape(nb, 1, 1, 16) * m5).reshape(nb, 80)
    m4 = np.array([1, 3, 9, 27], dtype=np.uint8).reshape(1, 1, 4, 1)
    q2 = (qh.reshape(nb, 1, 1, 4) * m4).reshape(nb, 16)
    q = np.concatenate([q0, q1, q2], axis=1)
    code = ((q.astype(np.uint16) * 3) >> 8).astype(np.uint8).reshape(n, k)  # 0..2
    return _rp_ternary(code, d, n, k, fold)


@_repack_fmt(GGMLType.TQ2_0)
def _rp_tq2_0(raw, n, k, fold):
    b = raw.reshape(-1, 66)
    nb = b.shape[0]
    qs, dby = b[:, :64], b[:, 64:66]
    d = qb._f16(dby).reshape(nb)
    code = np.concatenate(
        [qb._bits_unpack(qs[:, c * 32 : (c + 1) * 32], 2, 32) for c in range(2)], axis=1
    ).reshape(n, k)
    return _rp_ternary(code, d, n, k, fold)


def _dq_ternary(p, shape, dtype, fold):
    q = (_unpack_crumbs_k(p["qs"], fold) - 1).astype(jnp.float32)
    a = _group_repeat(_f32s(p["a"]), 32)
    return (q * a).astype(dtype)


_DEQUANT[GGMLType.TQ1_0] = _dq_ternary
_DEQUANT[GGMLType.TQ2_0] = _dq_ternary


# ---------------------------------------------------------------------------
# N-major packed-byte ("npack") layout for pure-nibble formats
# ---------------------------------------------------------------------------
# The decode kernel's dual-dot (ops/qmatmul._w4a8np_kernel) consumes packed
# bytes directly on the MXU: byte(k, c) = code[k, c] | code[k, c+N/2] << 4,
# stored XOR 0x80 so the int8 view equals lo + 16*hi - 128 exactly.  Both
# nibbles of a byte multiply the SAME activation x[k], and the [2, N/2]
# kernel output reshapes row-major to the original column order for free.
# Applied LAST at load time (after concat_n / pad_n, which would break the
# global c <-> c+N/2 pairing); zllm.parallel.shard_params converts back
# since an N-shard of the packed plane would pair across shard boundaries.

NPACK_FORMATS = {GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q4_K,
                 GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q5_K}


def can_npack(qt: QTensor) -> bool:
    return (
        not qt.npack
        and qt.fmt in NPACK_FORMATS
        and qt.shape[1] % 256 == 0
        and qt.psum_axis is None
        and qt.gather_axis is None
    )


def to_npack(qt: QTensor) -> QTensor:
    """Convert the split-half-fold qs plane to the npack byte layout."""
    if not can_npack(qt):
        return qt
    k, n = qt.shape
    codes = _unpack_nibbles_k(qt.planes["qs"], qt.fold)  # [K, N] int32 0..15
    bp = ((codes[:, : n // 2] | (codes[:, n // 2:] << 4)) ^ 0x80).astype(jnp.uint8)
    planes = dict(qt.planes)
    planes["qs"] = jax.lax.bitcast_convert_type(bp, jnp.int8)
    return QTensor(fmt=qt.fmt, shape=qt.shape, planes=planes, fold=qt.fold,
                   psum_axis=qt.psum_axis, gather_axis=qt.gather_axis, npack=True)


def _npack_codes(qt: QTensor):
    """npack qs plane -> element codes [K, N] int32 in original order."""
    bp = jax.lax.bitcast_convert_type(qt.planes["qs"], jnp.uint8).astype(jnp.int32)
    lo = bp & 0xF
    hi = (bp >> 4) ^ 0x8  # XOR 0x80 flipped the top bit of the high nibble
    return jnp.concatenate([lo, hi], axis=1)


def from_npack(qt: QTensor) -> QTensor:
    """Inverse of to_npack (needed before N/K sharding)."""
    if not qt.npack:
        return qt
    codes = _npack_codes(qt).astype(jnp.uint8)
    k, n = qt.shape
    g = codes.reshape(k // qt.fold, 2, qt.fold // 2, n)
    qs = (g[:, 0] | (g[:, 1] << 4)).reshape(k // 2, n)
    planes = dict(qt.planes)
    planes["qs"] = qs
    return QTensor(fmt=qt.fmt, shape=qt.shape, planes=planes, fold=qt.fold,
                   psum_axis=qt.psum_axis, gather_axis=qt.gather_axis, npack=False)


def _dequant_npack(qt: QTensor, dtype):
    q = _npack_codes(qt)
    p = qt.planes
    if "qh" in p:  # Q5: the packed bytes hold the LO nibbles only
        q = q | (_jnp_bitplane(p["qh"]) << 4)
    q = q.astype(jnp.float32)
    if qt.fmt == GGMLType.Q4_0:
        return ((q - 8.0) * _group_repeat(_f32s(p["d"]), 32)).astype(dtype)
    if qt.fmt == GGMLType.Q5_0:
        return ((q - 16.0) * _group_repeat(_f32s(p["a"]), 32)).astype(dtype)
    # Q4_1 / Q4_K / Q5_1 / Q5_K share the w = q*a - b contract
    if "sm" in p:  # Q4_K diet layout
        a32, b32 = q4k_scale_planes(p)
        a, b = _group_repeat(a32, 32), _group_repeat(b32, 32)
    else:
        a = _group_repeat(_f32s(p["a"]), 32)
        b = _group_repeat(_f32s(p["b"]), 32)
    return (q * a - b).astype(dtype)


def can_repack(fmt: GGMLType, shape: tuple[int, ...]) -> bool:
    return (
        GGMLType(fmt) in _REPACK
        and len(shape) == 2
        and choose_fold(shape[-1]) > 0
    )
