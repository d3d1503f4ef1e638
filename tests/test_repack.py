"""Repack correctness: planar TPU layout dequant must reproduce the
reference block decode exactly (transposed)."""

import numpy as np
import pytest

from zllm.gguf.constants import GGMLType
from zllm.quant import blocks as qb
from zllm.quant import repack as rp

RNG = np.random.default_rng(7)


# K-quants fuse the two-level scales into fp16 planes at repack (d*sc and
# dmin*mn rounded to fp16): up to 2^-11 relative deviation from the exact
# block decode, far below the quantization noise itself
FUSED_SCALE = {
    GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q5_K,
    GGMLType.Q6_K, GGMLType.IQ4_XS,
    GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
    GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S, GGMLType.IQ1_M,
}


@pytest.mark.parametrize("fmt", sorted(rp.REPACK_FORMATS, key=int), ids=lambda t: t.name)
def test_repack_dequant_matches_block_decode(fmt):
    from zllm.testing import make_quantized_raw

    n, k = 24, 512  # N outputs, K contraction
    raw = make_quantized_raw(fmt, n, k, RNG)  # [n, row_bytes] GGUF layout
    want = qb.dequantize(raw, fmt)  # [n, k]

    qt = rp.repack(raw, (n, k), fmt)
    assert qt.shape == (k, n)
    got = np.asarray(qt.dequant())
    if fmt in FUSED_SCALE:
        # affine formats (q*a - b) have absolute error ~2^-11 * (15a + b)
        # near zero-crossings; scales here are O(0.3) for unit-variance data
        np.testing.assert_allclose(got, want.T, rtol=1e-3, atol=5e-3)
    else:
        np.testing.assert_allclose(got, want.T, rtol=0, atol=0)


@pytest.mark.parametrize("fmt", [GGMLType.Q4_0, GGMLType.Q4_K], ids=lambda t: t.name)
def test_repack_bits_per_weight(fmt):
    n, k = 128, 1024
    x = RNG.standard_normal((n, k)).astype(np.float32)
    qt = rp.repack(qb.quantize(x, fmt), (n, k), fmt)
    bits = qt.nbytes * 8 / (n * k)
    # must stay close to the on-disk density (the memory-bandwidth win)
    disk_bits = {GGMLType.Q4_0: 4.5, GGMLType.Q4_K: 4.5}[fmt]
    assert bits <= disk_bits + 1.2, f"{fmt.name}: {bits} bits/weight"


def test_qtensor_is_pytree():
    import jax

    n, k = 8, 64
    x = RNG.standard_normal((n, k)).astype(np.float32)
    qt = rp.repack(qb.quantize(x, GGMLType.Q8_0), (n, k), GGMLType.Q8_0)
    leaves = jax.tree_util.tree_leaves(qt)
    assert len(leaves) == 2
    qt2 = jax.tree_util.tree_map(lambda a: a, qt)
    np.testing.assert_array_equal(np.asarray(qt2.dequant()), np.asarray(qt.dequant()))
