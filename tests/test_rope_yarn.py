"""YaRN rope-scaling parity against the HF implementation.

The reference kernel is ggml's rope_yarn + ggml_rope_yarn_corr_dims
(ggml/src/ggml-cpu/ops.cpp); HF's _compute_yarn_parameters implements the
same paper formula (truncate=True matches ggml's floor/ceil corr dims),
so it serves as the independent oracle: high-frequency pairs (below the
beta_fast corr dim) must keep the original frequency, low-frequency pairs
(above the beta_slow corr dim) must be fully interpolated.
"""

import numpy as np
import pytest

from zllm.ops.layers import RopeParams, _rope_freqs


def _hf_yarn(dim, base, factor, orig_ctx, beta_fast=32.0, beta_slow=1.0):
    torch = pytest.importorskip("torch")
    from transformers import modeling_rope_utils as mru

    class Cfg:
        rope_theta = base
        hidden_size = dim * 4
        num_attention_heads = 4
        head_dim = dim
        max_position_embeddings = orig_ctx * factor
        rope_scaling = {
            "rope_type": "yarn",
            "factor": factor,
            "original_max_position_embeddings": orig_ctx,
            "beta_fast": beta_fast,
            "beta_slow": beta_slow,
        }

    inv_freq, attention_factor = mru._compute_yarn_parameters(Cfg(), device="cpu")
    return inv_freq.numpy(), attention_factor


@pytest.mark.parametrize(
    "dim,base,factor,orig_ctx",
    [(128, 10000.0, 4.0, 4096), (64, 1000000.0, 8.0, 32768), (96, 10000.0, 2.0, 2048)],
)
def test_yarn_inv_freq_matches_hf(dim, base, factor, orig_ctx):
    p = RopeParams(
        dim=dim, base=base, scaling="yarn", scale_factor=factor, orig_ctx=orig_ctx
    )
    ours, mscale = _rope_freqs(p)
    want, attn = _hf_yarn(dim, base, factor, orig_ctx)
    np.testing.assert_allclose(np.asarray(ours), want, rtol=1e-5)
    assert mscale == pytest.approx(attn, rel=1e-6)


def test_yarn_extremes():
    """Pairs below the fast corr dim keep base frequency; pairs above the
    slow corr dim are divided by the scale factor."""
    p = RopeParams(dim=128, base=10000.0, scaling="yarn", scale_factor=4.0, orig_ctx=4096)
    ours, _ = _rope_freqs(p)
    ours = np.asarray(ours)
    half = p.dim // 2
    base_freq = 1.0 / (p.base ** (np.arange(half) * 2.0 / p.dim))
    # first pair: highest frequency — must be untouched (extrapolation)
    np.testing.assert_allclose(ours[0], base_freq[0], rtol=1e-6)
    # last pair: lowest frequency — must be fully interpolated
    np.testing.assert_allclose(ours[-1], base_freq[-1] / p.scale_factor, rtol=1e-6)
