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
    GGMLType.Q8_0,
    GGMLType.Q4_K,
    GGMLType.Q5_K,
    GGMLType.Q6_K,
    GGMLType.MXFP4,
    GGMLType.IQ4_NL,
    GGMLType.IQ4_XS,
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

    def tree_flatten(self):
        keys = tuple(sorted(self.planes))
        return tuple(self.planes[k] for k in keys), (self.fmt, self.shape, keys)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        fmt, shape, keys = aux
        return cls(fmt=fmt, shape=shape, planes=dict(zip(keys, leaves)))

    @property
    def nbytes(self) -> int:
        return sum(int(np.prod(p.shape)) * p.dtype.itemsize for p in self.planes.values())

    # portable dequantization (jnp; XLA fuses into the consumer)
    def dequant(self, dtype=jnp.float32) -> jax.Array:
        return _DEQUANT[self.fmt](self.planes, self.shape, dtype)


# ---------------------------------------------------------------------------
# packing helpers (host numpy, load time)
# ---------------------------------------------------------------------------

def _pack_nibbles_k(q: np.ndarray) -> np.ndarray:
    """uint8[K, N] 4-bit values -> uint8[K//2, N], adjacent k-pairs per byte
    (k even -> low nibble)."""
    return (q[0::2] | (q[1::2] << 4)).astype(np.uint8)


def _unpack_nibbles_k(p: jax.Array) -> jax.Array:
    """Inverse of _pack_nibbles_k on device: uint8[K//2, N] -> int32[K, N]."""
    lo = (p & 0xF).astype(jnp.int32)
    hi = (p >> 4).astype(jnp.int32)
    # interleave along axis 0: stack pairs then reshape
    return jnp.stack([lo, hi], axis=1).reshape(p.shape[0] * 2, p.shape[1])


def _pack_crumbs_k(q: np.ndarray) -> np.ndarray:
    """uint8[K, N] 2-bit values -> uint8[K//4, N]."""
    return (q[0::4] | (q[1::4] << 2) | (q[2::4] << 4) | (q[3::4] << 6)).astype(np.uint8)


def _unpack_crumbs_k(p: jax.Array) -> jax.Array:
    parts = [((p >> (2 * i)) & 0x3).astype(jnp.int32) for i in range(4)]
    return jnp.stack(parts, axis=1).reshape(p.shape[0] * 4, p.shape[1])


def _group_repeat(s: jax.Array, group: int) -> jax.Array:
    """[K//G, N] per-group values -> [K, N] by repeat along K."""
    return jnp.repeat(s, group, axis=0)


# ---------------------------------------------------------------------------
# per-format repack: blocks (numpy, [N, K] GGUF row-major) -> planes
# each function receives the element-ordered decode intermediates
# ---------------------------------------------------------------------------

def repack(raw: np.ndarray, gguf_shape: tuple[int, ...], fmt: GGMLType) -> QTensor:
    """raw uint8[N, row_bytes] (GGUF layout: one row per output feature) ->
    QTensor with [K, N] planes."""
    fmt = GGMLType(fmt)
    if len(gguf_shape) != 2:
        raise ValueError(f"repack expects 2-D weights, got {gguf_shape}")
    n, k = gguf_shape  # GGUF numpy shape: (N rows, K row-elements)
    raw = raw.reshape(n, -1)
    planes = _REPACK[fmt](raw, n, k)
    return QTensor(fmt=fmt, shape=(k, n), planes={key: jnp.asarray(v) for key, v in planes.items()})


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
def _rp_q4_0(raw: np.ndarray, n: int, k: int):
    b = raw.reshape(-1, 18)
    d = b[:, :2].view("<f2").reshape(n, k // 32)
    q = qb._nib_lo_hi(b[:, 2:], 16).reshape(n, k)  # element-ordered, 0..15
    return {
        "qs": _pack_nibbles_k(q.T.astype(np.uint8)),
        "d": np.ascontiguousarray(d.T),  # fp16 [K//32, N]
    }


@_dequant_fmt(GGMLType.Q4_0)
def _dq_q4_0(p, shape, dtype):
    q = _unpack_nibbles_k(p["qs"]) - 8
    d = _group_repeat(p["d"].astype(jnp.float32), 32)
    return (q.astype(jnp.float32) * d).astype(dtype)


@_repack_fmt(GGMLType.Q8_0)
def _rp_q8_0(raw: np.ndarray, n: int, k: int):
    b = raw.reshape(-1, 34)
    d = b[:, :2].view("<f2").reshape(n, k // 32)
    q = b[:, 2:].view(np.int8).reshape(n, k)
    return {"qs": np.ascontiguousarray(q.T), "d": np.ascontiguousarray(d.T)}


@_dequant_fmt(GGMLType.Q8_0)
def _dq_q8_0(p, shape, dtype):
    d = _group_repeat(p["d"].astype(jnp.float32), 32)
    return (p["qs"].astype(jnp.float32) * d).astype(dtype)


@_repack_fmt(GGMLType.MXFP4)
def _rp_mxfp4(raw: np.ndarray, n: int, k: int):
    b = raw.reshape(-1, 17)
    e = b[:, :1].reshape(n, k // 32)
    q = qb._nib_lo_hi(b[:, 1:], 16).reshape(n, k)
    return {"qs": _pack_nibbles_k(q.T.astype(np.uint8)), "e": np.ascontiguousarray(e.T)}


@_dequant_fmt(GGMLType.MXFP4)
def _dq_mxfp4(p, shape, dtype):
    idx = _unpack_nibbles_k(p["qs"])
    lut = jnp.asarray(qb.MXFP4_VALUES, dtype=jnp.float32)
    q = lut[idx]
    e = p["e"].astype(jnp.uint32)
    bits = jnp.where(e < 2, jnp.uint32(0x00200000) << e, (e - 1) << jnp.uint32(23))
    d = _group_repeat(jax.lax.bitcast_convert_type(bits, jnp.float32), 32)
    return (q * d).astype(dtype)


@_repack_fmt(GGMLType.IQ4_NL)
def _rp_iq4_nl(raw: np.ndarray, n: int, k: int):
    b = raw.reshape(-1, 18)
    d = b[:, :2].view("<f2").reshape(n, k // 32)
    q = qb._nib_lo_hi(b[:, 2:], 16).reshape(n, k)
    return {"qs": _pack_nibbles_k(q.T.astype(np.uint8)), "d": np.ascontiguousarray(d.T)}


@_dequant_fmt(GGMLType.IQ4_NL)
def _dq_iq4_nl(p, shape, dtype):
    idx = _unpack_nibbles_k(p["qs"])
    lut = jnp.asarray(qb.IQ4NL_VALUES, dtype=jnp.float32)
    d = _group_repeat(p["d"].astype(jnp.float32), 32)
    return (lut[idx] * d).astype(dtype)


@_repack_fmt(GGMLType.Q4_K)
def _rp_q4_k(raw: np.ndarray, n: int, k: int):
    b = raw.reshape(-1, 144)
    d = b[:, :2].view("<f2").reshape(n, k // QK_K)
    dmin = b[:, 2:4].view("<f2").reshape(n, k // QK_K)
    sc, mn = qb._unpack_kscales(b[:, 4:16])  # [nb, 8] 6-bit
    q = qb._nib_lo_hi(b[:, 16:], 32).reshape(n, k)  # element-ordered 0..15
    return {
        "qs": _pack_nibbles_k(q.T.astype(np.uint8)),
        "sc": np.ascontiguousarray(sc.reshape(n, k // 32).T),  # uint8 [K//32, N]
        "mn": np.ascontiguousarray(mn.reshape(n, k // 32).T),
        "d": np.ascontiguousarray(d.T),  # fp16 [K//256, N]
        "dmin": np.ascontiguousarray(dmin.T),
    }


@_dequant_fmt(GGMLType.Q4_K)
def _dq_q4_k(p, shape, dtype):
    q = _unpack_nibbles_k(p["qs"]).astype(jnp.float32)
    scale = _group_repeat(p["d"].astype(jnp.float32), QK_K) * _group_repeat(
        p["sc"].astype(jnp.float32), 32
    )
    mins = _group_repeat(p["dmin"].astype(jnp.float32), QK_K) * _group_repeat(
        p["mn"].astype(jnp.float32), 32
    )
    return (q * scale - mins).astype(dtype)


@_repack_fmt(GGMLType.Q5_K)
def _rp_q5_k(raw: np.ndarray, n: int, k: int):
    b = raw.reshape(-1, 176)
    d = b[:, :2].view("<f2").reshape(n, k // QK_K)
    dmin = b[:, 2:4].view("<f2").reshape(n, k // QK_K)
    sc, mn = qb._unpack_kscales(b[:, 4:16])
    lo = qb._nib_lo_hi(b[:, 48:], 32)
    hi = qb._bits_unpack(b[:, 16:48], 1, 32)
    q = (lo | (hi << np.uint8(4))).reshape(n, k)  # 0..31
    qlo = q & 0x0F
    qhi = q >> 4  # one bit
    return {
        "qs": _pack_nibbles_k(qlo.T.astype(np.uint8)),
        "qh": np.packbits(qhi.T.astype(np.uint8).reshape(k // 8, 8, n), axis=1, bitorder="little").reshape(k // 8, n),
        "sc": np.ascontiguousarray(sc.reshape(n, k // 32).T),
        "mn": np.ascontiguousarray(mn.reshape(n, k // 32).T),
        "d": np.ascontiguousarray(d.T),
        "dmin": np.ascontiguousarray(dmin.T),
    }


@_dequant_fmt(GGMLType.Q5_K)
def _dq_q5_k(p, shape, dtype):
    lo = _unpack_nibbles_k(p["qs"])
    qh = p["qh"].astype(jnp.int32)  # [K//8, N] bit i of byte -> k = 8*row + i
    bits = jnp.stack([(qh >> i) & 1 for i in range(8)], axis=1).reshape(shape[0], shape[1])
    q = (lo | (bits << 4)).astype(jnp.float32)
    scale = _group_repeat(p["d"].astype(jnp.float32), QK_K) * _group_repeat(
        p["sc"].astype(jnp.float32), 32
    )
    mins = _group_repeat(p["dmin"].astype(jnp.float32), QK_K) * _group_repeat(
        p["mn"].astype(jnp.float32), 32
    )
    return (q * scale - mins).astype(dtype)


@_repack_fmt(GGMLType.Q6_K)
def _rp_q6_k(raw: np.ndarray, n: int, k: int):
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
    return {
        "ql": _pack_nibbles_k((q & 0x0F).T.astype(np.uint8)),
        "qh": _pack_crumbs_k((q >> 4).T.astype(np.uint8)),
        "sc": np.ascontiguousarray(sc.T),  # int8 [K//16, N]
        "d": np.ascontiguousarray(d.T),
    }


@_dequant_fmt(GGMLType.Q6_K)
def _dq_q6_k(p, shape, dtype):
    lo = _unpack_nibbles_k(p["ql"])
    hi = _unpack_crumbs_k(p["qh"])
    q = (lo | (hi << 4)).astype(jnp.float32) - 32.0
    scale = _group_repeat(p["d"].astype(jnp.float32), QK_K) * _group_repeat(
        p["sc"].astype(jnp.float32), 16
    )
    return (q * scale).astype(dtype)


@_repack_fmt(GGMLType.IQ4_XS)
def _rp_iq4_xs(raw: np.ndarray, n: int, k: int):
    b = raw.reshape(-1, 136)
    d = b[:, :2].view("<f2").reshape(n, k // QK_K)
    sh16 = b[:, 2:4].view("<u2").astype(np.uint32)
    sl = qb._nib_lo_hi(b[:, 4:8], 1).reshape(-1, 8)
    hi = np.stack([(sh16[:, 0] >> (2 * g)) & 3 for g in range(8)], axis=1).astype(np.uint8)
    sc = ((sl | (hi << np.uint8(4))).astype(np.int8) - np.int8(32)).reshape(n, k // 32)
    q = qb._nib_lo_hi(b[:, 8:], 16).reshape(n, k)
    return {
        "qs": _pack_nibbles_k(q.T.astype(np.uint8)),
        "sc": np.ascontiguousarray(sc.T),  # int8 [K//32, N]
        "d": np.ascontiguousarray(d.T),
    }


@_dequant_fmt(GGMLType.IQ4_XS)
def _dq_iq4_xs(p, shape, dtype):
    idx = _unpack_nibbles_k(p["qs"])
    lut = jnp.asarray(qb.IQ4NL_VALUES, dtype=jnp.float32)
    scale = _group_repeat(p["d"].astype(jnp.float32), QK_K) * _group_repeat(
        p["sc"].astype(jnp.float32), 32
    )
    return (lut[idx] * scale).astype(dtype)


# ---------------------------------------------------------------------------

def can_repack(fmt: GGMLType, shape: tuple[int, ...]) -> bool:
    return GGMLType(fmt) in _REPACK and len(shape) == 2
