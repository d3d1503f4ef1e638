"""ctypes bindings for the native C++ repack engine (native/repack.cpp).

Auto-builds the shared library on first use (g++ is part of the image);
every entry point has a numpy fallback in zllm/quant/repack.py, selected
automatically when the library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO = os.path.join(_DIR, "libzllm_native.so")
_lib = None
_tried = False


def _src_hash(src: str) -> str:
    import hashlib

    if not os.path.exists(src):
        return ""
    with open(src, "rb") as fh:
        return hashlib.sha256(fh.read()).hexdigest()


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR, "-s"], check=True, capture_output=True, timeout=120)
        return os.path.exists(_SO)
    except Exception:
        return False


def get_lib():
    """The loaded library or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(_DIR, "repack.cpp")
    # rebuild whenever the source hash differs from the one the library was
    # built from (mtimes are arbitrary after checkout; the .so is never
    # committed, so what runs is always compiled from the reviewed source)
    stamp = _SO + ".srchash"
    cur = _src_hash(src)
    built = None
    if os.path.exists(stamp):
        with open(stamp) as fh:
            built = fh.read().strip()
    if not os.path.exists(_SO) or built != cur:
        if not _build():
            return None
        with open(stamp, "w") as fh:
            fh.write(cur)
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i64 = ctypes.c_int64
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    i8p = ctypes.POINTER(ctypes.c_int8)
    lib.zllm_repack_q4k.argtypes = [u8p, i64, i64, i64, u8p, u16p, u16p, u16p]
    lib.zllm_repack_q8_0.argtypes = [u8p, i64, i64, i8p, u16p]
    lib.zllm_repack_q4_0.argtypes = [u8p, i64, i64, i64, u8p, u16p]
    lib.zllm_repack_q6k.argtypes = [u8p, i64, i64, i64, u8p, u8p, u16p]
    _lib = lib
    return _lib


def _ptr(arr, typ):
    return arr.ctypes.data_as(ctypes.POINTER(typ))


def repack_q4k(raw, n, k, fold):
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw.reshape(-1)).view(np.uint8)
    qs = np.empty((k // 2, n), np.uint8)
    sm = np.empty((k // 32, n), np.uint16)
    kkp = -(-(k // 256) // 8) * 8  # 8-row padded (see repack._pad8_rows)
    sd = np.zeros((kkp, n), np.uint16)
    sb = np.zeros((kkp, n), np.uint16)
    lib.zllm_repack_q4k(_ptr(raw, ctypes.c_uint8), n, k, fold,
                        _ptr(qs, ctypes.c_uint8), _ptr(sm, ctypes.c_uint16),
                        _ptr(sd, ctypes.c_uint16), _ptr(sb, ctypes.c_uint16))
    # sm stays integral; sd/sb are raw f16 bit patterns (see repack._rp_q4_k)
    return {"qs": qs, "sm": sm, "sd": sd.view("<f2"), "sb": sb.view("<f2")}


def repack_q8_0(raw, n, k):
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw.reshape(-1)).view(np.uint8)
    qs = np.empty((k, n), np.int8)
    d = np.empty((k // 32, n), np.uint16)
    lib.zllm_repack_q8_0(_ptr(raw, ctypes.c_uint8), n, k,
                         _ptr(qs, ctypes.c_int8), _ptr(d, ctypes.c_uint16))
    return {"qs": qs, "d": d.view("<f2")}


def repack_q4_0(raw, n, k, fold):
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw.reshape(-1)).view(np.uint8)
    qs = np.empty((k // 2, n), np.uint8)
    d = np.empty((k // 32, n), np.uint16)
    lib.zllm_repack_q4_0(_ptr(raw, ctypes.c_uint8), n, k, fold,
                         _ptr(qs, ctypes.c_uint8), _ptr(d, ctypes.c_uint16))
    return {"qs": qs, "d": d.view("<f2")}


def repack_q6k(raw, n, k, fold):
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw.reshape(-1)).view(np.uint8)
    ql = np.empty((k // 2, n), np.uint8)
    qh = np.empty((k // 4, n), np.uint8)
    a = np.empty((k // 16, n), np.uint16)
    lib.zllm_repack_q6k(_ptr(raw, ctypes.c_uint8), n, k, fold,
                        _ptr(ql, ctypes.c_uint8), _ptr(qh, ctypes.c_uint8), _ptr(a, ctypes.c_uint16))
    return {"ql": ql, "qh": qh, "a": a.view("<f2")}
