"""IQ/ternary grid-format decoders vs the gguf-py oracle on random block
bytes (scale fields pinned to finite fp16 values)."""

import numpy as np
import pytest

from zllm.gguf.constants import GGML_BLOCK_SIZES, GGMLType
from zllm.quant import blocks as qb

RNG = np.random.default_rng(77)

# format -> byte ranges holding fp16 scales that must stay finite
SCALE_BYTES = {
    GGMLType.IQ2_XXS: [(0, 2)],
    GGMLType.IQ2_XS: [(0, 2)],
    GGMLType.IQ2_S: [(0, 2)],
    GGMLType.IQ3_XXS: [(0, 2)],
    GGMLType.IQ3_S: [(0, 2)],
    GGMLType.IQ1_S: [(0, 2)],
    GGMLType.IQ1_M: [],
    GGMLType.TQ1_0: [(52, 54)],
}


@pytest.mark.parametrize("fmt", sorted(SCALE_BYTES, key=int), ids=lambda t: t.name)
def test_iq_decode_matches_oracle(fmt, oracle_gguf):
    blk, bsz = GGML_BLOCK_SIZES[fmt]
    n = 64
    raw = RNG.integers(0, 256, (n, bsz), dtype=np.uint8)
    for lo, hi in SCALE_BYTES[fmt]:
        # pin fp16 scale to a small finite value with random mantissa bits
        half = (RNG.integers(0, 1 << 10, n, dtype=np.uint16) | (14 << 10)).astype("<u2")
        raw[:, lo:hi] = half.view(np.uint8).reshape(n, 2)
    ours = qb.dequantize(raw, fmt)
    theirs = oracle_gguf.quants.dequantize(
        raw.reshape(-1), oracle_gguf.GGMLQuantizationType(int(fmt))
    ).reshape(n, blk)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)
