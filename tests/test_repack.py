"""Repack correctness: planar TPU layout dequant must reproduce the
reference block decode exactly (transposed)."""

import numpy as np
import pytest

from zllm.gguf.constants import GGMLType
from zllm.quant import blocks as qb
from zllm.quant import repack as rp

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("fmt", sorted(rp.REPACK_FORMATS, key=int), ids=lambda t: t.name)
def test_repack_dequant_matches_block_decode(fmt):
    n, k = 24, 512  # N outputs, K contraction
    x = RNG.standard_normal((n, k)).astype(np.float32)
    raw = qb.quantize(x, fmt)  # [n, row_bytes] GGUF layout
    want = qb.dequantize(raw, fmt)  # [n, k]

    qt = rp.repack(raw, (n, k), fmt)
    assert qt.shape == (k, n)
    got = np.asarray(qt.dequant())
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
