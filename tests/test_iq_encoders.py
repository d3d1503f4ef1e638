"""IQ/TQ1 grid-codebook encoders (reference capability: quantize_iq2_xxs
etc., ggml/src/ggml-quants.c): encoded blocks must be valid format bytes —
the gguf-py oracle decode must agree exactly with ours — and the error
ladder must be sane and imatrix-steerable."""

import numpy as np
import pytest

from zllm.gguf.constants import GGML_BLOCK_SIZES, GGMLType
from zllm.quant import blocks as qb

RNG = np.random.default_rng(3)

IQ_FMTS = [
    GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
    GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S,
    GGMLType.IQ1_M, GGMLType.TQ1_0,
]


@pytest.fixture(scope="module")
def data():
    return RNG.standard_normal((16, 512)).astype(np.float32)


@pytest.mark.parametrize("fmt", IQ_FMTS, ids=lambda t: t.name)
def test_encode_valid_format(fmt, data, oracle_gguf):
    """Oracle decode of our encoding == our decode (byte-level validity)."""
    enc = qb.quantize(data, fmt)
    ours = qb.dequantize(enc, fmt)
    theirs = oracle_gguf.quants.dequantize(
        enc.reshape(-1), oracle_gguf.GGMLQuantizationType(int(fmt))
    ).reshape(data.shape)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("fmt", IQ_FMTS, ids=lambda t: t.name)
def test_encode_roundtrip_quality(fmt, data):
    """Correlation after a round trip must reflect the format's bitrate."""
    dec = qb.dequantize(qb.quantize(data, fmt), fmt)
    corr = np.corrcoef(dec.ravel(), data.ravel())[0, 1]
    floor = {
        GGMLType.IQ1_S: 0.80, GGMLType.IQ1_M: 0.84, GGMLType.TQ1_0: 0.65,
        GGMLType.IQ2_XXS: 0.90, GGMLType.IQ2_XS: 0.92, GGMLType.IQ2_S: 0.94,
        GGMLType.IQ3_XXS: 0.96, GGMLType.IQ3_S: 0.97,
    }[fmt]
    assert corr > floor, (fmt.name, corr)


def test_error_ladder(data):
    """More bits -> lower RMSE (within each family)."""
    def rmse(fmt):
        dec = qb.dequantize(qb.quantize(data, fmt), fmt)
        return float(np.sqrt(((dec - data) ** 2).mean()))

    assert rmse(GGMLType.IQ2_XXS) > rmse(GGMLType.IQ2_XS) > rmse(GGMLType.IQ2_S)
    assert rmse(GGMLType.IQ3_XXS) > rmse(GGMLType.IQ3_S)
    assert rmse(GGMLType.IQ2_S) > rmse(GGMLType.IQ3_XXS)
    assert rmse(GGMLType.IQ1_S) > rmse(GGMLType.IQ2_XXS)


@pytest.mark.parametrize(
    "fmt", [GGMLType.IQ2_XXS, GGMLType.IQ3_XXS, GGMLType.IQ1_S, GGMLType.IQ1_M],
    ids=lambda t: t.name,
)
def test_imatrix_steers(fmt, data):
    """Importance weights must reduce the weighted reconstruction error."""
    w = np.abs(RNG.standard_normal(data.shape[-1]).astype(np.float32)) + 0.05
    dec_u = qb.dequantize(qb.quantize(data, fmt), fmt)
    dec_w = qb.dequantize(qb.quantize(data, fmt, weights=w), fmt)
    err_u = float((w * (dec_u - data) ** 2).sum())
    err_w = float((w * (dec_w - data) ** 2).sum())
    assert err_w <= err_u * 1.02, (err_w, err_u)


def test_supported_encode_covers_reference_ftypes():
    """Every reference quantize ftype's block format now has an encoder."""
    enc = qb.supported_encode()
    for fmt in IQ_FMTS:
        assert fmt in enc, fmt.name
