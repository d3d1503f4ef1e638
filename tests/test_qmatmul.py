"""Fused dequant-matmul kernel vs reference dequant matmul
(pattern: reference tests/test-backend-ops.cpp MODE_TEST — every format
x shape grid compared against the reference path with NMSE tolerance).

Runs the Pallas kernel in interpreter mode on the CPU test platform; the
same code compiles for TPU (exercised by bench.py / __graft_entry__.py).
"""

import numpy as np
import pytest

from zllm.gguf.constants import GGMLType
from zllm.ops import qmatmul as qmm
from zllm.quant import blocks as qb
from zllm.quant import repack as rp

RNG = np.random.default_rng(11)

FORMATS = sorted(qmm._PLANE_ORDER, key=int)


def nmse(a, b):
    d = np.mean((a - b) ** 2)
    s = np.mean(b**2) + 1e-12
    return float(d / s)


@pytest.mark.parametrize("fmt", FORMATS, ids=lambda t: t.name)
@pytest.mark.parametrize("m", [1, 8])
def test_kernel_matches_reference(fmt, m):
    import jax.numpy as jnp

    k, n = 512, 256
    w = RNG.standard_normal((n, k)).astype(np.float32)
    qt = rp.repack(qb.quantize(w, fmt), (n, k), fmt)
    assert qmm.supports(qt), f"{fmt.name} k={k} should be supported"

    x = RNG.standard_normal((m, k)).astype(np.float32)
    ref = np.asarray(x.astype(np.float32) @ np.asarray(qt.dequant(jnp.float32)))
    got = np.asarray(qmm.qmatmul(jnp.asarray(x), qt, interpret=True))

    assert got.shape == (m, n)
    # kernel computes in bf16; reference in f32 — NMSE bound accounts for it
    assert nmse(got, ref) < 2e-4, f"{fmt.name}: nmse {nmse(got, ref)}"


def test_fallback_path_small_k():
    """K not foldable to >=256 -> clean fallback to dequant matmul."""
    import jax.numpy as jnp

    k, n = 64, 128
    w = RNG.standard_normal((n, k)).astype(np.float32)
    qt = rp.repack(qb.quantize(w, GGMLType.Q8_0), (n, k), GGMLType.Q8_0)
    assert not qmm.supports(qt)
    x = RNG.standard_normal((4, k)).astype(np.float32)
    got = np.asarray(qmm.qmatmul(jnp.asarray(x), qt))
    ref = np.asarray(x @ np.asarray(qt.dequant(jnp.float32)))
    assert nmse(got, ref) < 1e-6


def test_kernel_exact_scales():
    """With power-of-two-friendly data the bf16 path should be very close."""
    import jax.numpy as jnp

    k, n = 512, 128
    w = (RNG.integers(-8, 8, (n, k)) * 0.25).astype(np.float32)
    qt = rp.repack(qb.quantize(w, GGMLType.Q8_0), (n, k), GGMLType.Q8_0)
    x = RNG.standard_normal((2, k)).astype(np.float32)
    got = np.asarray(qmm.qmatmul(jnp.asarray(x), qt, interpret=True))
    ref = np.asarray(x @ np.asarray(qt.dequant(jnp.float32)))
    assert nmse(got, ref) < 5e-5
