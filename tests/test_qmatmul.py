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

    from zllm.testing import make_quantized_raw

    k, n = 512, 256
    qt = rp.repack(make_quantized_raw(fmt, n, k, RNG), (n, k), fmt)
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


@pytest.mark.parametrize("fmt", [f for f in FORMATS if f in qmm._INT_FMT], ids=lambda t: t.name)
def test_w4a8_matches_bf16_path(fmt):
    """The int8-MXU decode path vs the bf16 dequant path vs f32 reference
    (reference analogue: mmvq.cu int8 GEMV == dequant matmul)."""
    import jax.numpy as jnp

    from zllm.testing import make_quantized_raw

    k, n = 512, 256
    qt = rp.repack(make_quantized_raw(fmt, n, k, RNG), (n, k), fmt)
    x = RNG.standard_normal((1, k)).astype(np.float32)
    ref = np.asarray(x @ np.asarray(qt.dequant(jnp.float32)))
    got = np.asarray(qmm.qmatmul_w4a8(jnp.asarray(x), qt, interpret=True))
    assert got.shape == (1, n)
    assert nmse(got, ref) < 2e-4, f"{fmt.name}: nmse {nmse(got, ref)}"


def test_w4a8_integer_products_exact():
    """With activations already on the int8 grid and unit scales, the int
    path must be exact (validates the block-diagonal MXU formulation)."""
    import jax.numpy as jnp

    k, n = 512, 128
    # weights whose dequant is integer-valued: Q8_0 with d=1 blocks
    q = RNG.integers(-100, 100, (n, k)).astype(np.int8)
    import zllm.quant.blocks as qbl
    w = q.astype(np.float32)
    qt = rp.repack(qbl.quantize(w, GGMLType.Q8_0), (n, k), GGMLType.Q8_0)
    # activations exactly representable on the int8 grid: integer values
    # with every group-32 max pinned to 127 so dx == 1.0
    x = RNG.integers(-126, 127, (1, k)).astype(np.float32)
    x[0, ::32] = 127.0
    ref = x @ np.asarray(qt.dequant(jnp.float32))
    got = np.asarray(qmm.qmatmul_w4a8(jnp.asarray(x), qt, interpret=True))
    # integer partial products are exact; only f32 summation order differs
    np.testing.assert_allclose(got, ref, rtol=3e-5)


@pytest.mark.parametrize("fmt", sorted(qmm._DUALDOT_FMTS, key=int), ids=lambda t: t.name)
def test_dualdot_matches_plain_w4a8(fmt, monkeypatch):
    """The packed-byte dual-dot kernel must agree with the unpacking int8
    path to summation-order tolerance (both pipelines are integer-exact
    before the f32 epilogue)."""
    import jax.numpy as jnp

    k, n = 512, 256
    w = RNG.standard_normal((n, k)).astype(np.float32)
    qt = rp.repack(qb.quantize(w, fmt), (n, k), fmt)
    x = RNG.standard_normal((1, k)).astype(np.float32)
    monkeypatch.setenv("ZLLM_QMM_DUALDOT", "1")
    y_dd = np.asarray(qmm.qmatmul_w4a8(jnp.asarray(x), qt, interpret=True))
    monkeypatch.setenv("ZLLM_QMM_DUALDOT", "0")
    y_std = np.asarray(qmm.qmatmul_w4a8(jnp.asarray(x), qt, interpret=True))
    np.testing.assert_allclose(y_dd, y_std, rtol=1e-5, atol=1e-4)
