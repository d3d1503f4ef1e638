"""Quant codec tests: bit-exact decode vs the reference gguf-py oracle,
round-trip sanity for our encoders, and error-bound checks per format
(pattern: reference tests/test-quantize-fns.cpp RMSE bounds)."""

import numpy as np
import pytest

from zllm.gguf.constants import GGML_BLOCK_SIZES, GGMLType
from zllm.quant import blocks as qb

RNG = np.random.default_rng(42)

# formats with both our encoder and oracle decoder — decode must be bit-exact
EXACT_FORMATS = [
    GGMLType.F16,
    GGMLType.BF16,
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
    GGMLType.IQ4_NL,
    GGMLType.IQ4_XS,
    GGMLType.MXFP4,
    GGMLType.TQ2_0,
]

# max acceptable RMSE (relative to data std=1) per format, generous bounds
# mirroring reference test-quantize-fns.cpp tolerances
RMSE_BOUND = {
    GGMLType.F16: 1e-3,
    GGMLType.BF16: 5e-3,
    GGMLType.Q8_0: 0.01,
    GGMLType.Q8_K: 0.01,
    GGMLType.Q6_K: 0.02,
    GGMLType.Q5_0: 0.05,
    GGMLType.Q5_1: 0.05,
    GGMLType.Q5_K: 0.05,
    GGMLType.Q4_0: 0.1,
    GGMLType.Q4_1: 0.1,
    GGMLType.Q4_K: 0.1,
    GGMLType.IQ4_NL: 0.1,
    GGMLType.IQ4_XS: 0.1,
    GGMLType.MXFP4: 0.2,
    GGMLType.Q3_K: 0.2,
    GGMLType.Q2_K: 0.35,
    GGMLType.TQ2_0: 1.0,  # ternary; only meaningful on ternary-trained weights
}


def _sample(n_rows: int, n_cols: int) -> np.ndarray:
    # mix of gaussian + occasional outliers, like real weights
    x = RNG.standard_normal((n_rows, n_cols)).astype(np.float32)
    mask = RNG.random((n_rows, n_cols)) < 0.01
    return np.where(mask, x * 8.0, x).astype(np.float32)


@pytest.mark.parametrize("gtype", EXACT_FORMATS, ids=lambda t: t.name)
def test_decode_matches_oracle(gtype, oracle_gguf):
    """Our decoder must agree bit-exactly with gguf-py on our encoded blocks."""
    blk, _ = GGML_BLOCK_SIZES[gtype]
    x = _sample(16, max(blk * 4, 512))
    raw = qb.quantize(x, gtype)
    ours = qb.dequantize(raw, gtype)
    theirs = oracle_gguf.quants.dequantize(raw.reshape(-1), oracle_gguf.GGMLQuantizationType(int(gtype)))
    np.testing.assert_array_equal(ours.reshape(-1), theirs.reshape(-1))


@pytest.mark.parametrize(
    "gtype",
    [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q8_0, GGMLType.MXFP4, GGMLType.BF16],
    ids=lambda t: t.name,
)
def test_encode_matches_oracle(gtype, oracle_gguf):
    """For formats where gguf-py has a quantizer, our encoder must produce
    identical bytes (both follow the ggml reference rounding)."""
    blk, _ = GGML_BLOCK_SIZES[gtype]
    x = _sample(8, max(blk * 8, 512))
    ours = qb.quantize(x, gtype)
    theirs = oracle_gguf.quants.quantize(x, oracle_gguf.GGMLQuantizationType(int(gtype)))
    np.testing.assert_array_equal(ours.reshape(-1), theirs.reshape(-1))


@pytest.mark.parametrize("gtype", sorted(RMSE_BOUND, key=int), ids=lambda t: t.name)
def test_roundtrip_rmse(gtype):
    blk, _ = GGML_BLOCK_SIZES[gtype]
    x = RNG.standard_normal((32, max(blk * 4, 512))).astype(np.float32)
    raw = qb.quantize(x, gtype)
    y = qb.dequantize(raw, gtype)
    assert y.shape == x.shape
    rmse = float(np.sqrt(np.mean((x - y) ** 2)))
    assert rmse < RMSE_BOUND[gtype], f"{gtype.name}: rmse {rmse}"


def test_row_bytes_consistency():
    for gtype, (blk, bsz) in GGML_BLOCK_SIZES.items():
        if gtype in qb.supported_encode() and gtype in qb.supported_decode():
            x = RNG.standard_normal((2, blk * 2)).astype(np.float32)
            raw = qb.quantize(x, gtype)
            assert raw.shape == (2, 2 * bsz)


def test_q8_k_bsums():
    """Q8_K carries per-16 group sums used by int8 dot kernels."""
    x = RNG.standard_normal((4, 256)).astype(np.float32)
    raw = qb.quantize(x, GGMLType.Q8_K)
    q = raw[:, 4:260].view(np.int8)
    bsums = raw[:, 260:292].view("<i2").reshape(4, 16)
    np.testing.assert_array_equal(q.reshape(4, 16, 16).sum(axis=-1, dtype=np.int16), bsums)


def test_weighted_q4_k_improves_weighted_error():
    """imatrix-weighted encoding must cut the weighted reconstruction error
    on the high-importance columns."""
    rng = np.random.default_rng(123)
    x = rng.standard_normal((64, 512)).astype(np.float32)
    w = np.ones(512, np.float32)
    w[::7] = 100.0  # a few very important columns
    plain = qb.dequantize(qb.quantize(x, GGMLType.Q4_K), GGMLType.Q4_K)
    wq = qb.dequantize(qb.quantize(x, GGMLType.Q4_K, weights=w), GGMLType.Q4_K)
    err_plain = np.mean(w * (x - plain) ** 2)
    err_w = np.mean(w * (x - wq) ** 2)
    assert err_w < err_plain * 0.98, (err_plain, err_w)
