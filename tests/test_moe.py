"""Sparse MoE dispatch + quantized expert stacks.

Parity model: the reference's build_moe_ffn (src/llama-graph.cpp:964-1140)
computes identical results whether dispatch is dense (all experts) or
sparse (ggml_mul_mat_id gather) — so do our two regimes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zllm.gguf.constants import GGMLType
from zllm.models.config import ModelConfig, MoeConfig
from zllm.models.llama import moe_ffn
from zllm.quant import blocks as qb
from zllm.quant.repack import QTensorE, repack, repack_experts


def _mk_cfg(n_experts=8, n_used=2):
    return ModelConfig(
        arch="llama", n_layers=1, n_embd=64, n_heads=4, n_kv_heads=2,
        head_dim=16, n_ff=96, vocab_size=32, norm_eps=1e-6,
        moe=MoeConfig(n_experts=n_experts, n_experts_used=n_used, n_ff_exp=96,
                      norm_topk_prob=True),
    )


def _mk_layer(rng, k=64, f=96, e=8, dtype=jnp.float32):
    return {
        "ffn_gate_inp": jnp.asarray(rng.standard_normal((k, e)) * 0.3, dtype),
        "ffn_gate_exps": jnp.asarray(rng.standard_normal((e, k, f)) * 0.1, dtype),
        "ffn_up_exps": jnp.asarray(rng.standard_normal((e, k, f)) * 0.1, dtype),
        "ffn_down_exps": jnp.asarray(rng.standard_normal((e, f, k)) * 0.1, dtype),
    }


def test_sparse_matches_dense_dispatch():
    """T=1 (sparse gather regime) must equal the same token inside a large
    batch (dense all-expert regime)."""
    rng = np.random.default_rng(0)
    cfg = _mk_cfg()
    layer = _mk_layer(rng)
    h8 = jnp.asarray(rng.standard_normal((1, 8, 64)), jnp.float32)  # dense regime
    out_dense = np.asarray(moe_ffn(layer, cfg, h8))
    for t in range(8):
        out_sparse = np.asarray(moe_ffn(layer, cfg, h8[:, t : t + 1]))
        np.testing.assert_allclose(out_sparse[0, 0], out_dense[0, t], rtol=2e-5, atol=2e-6)


def test_repack_experts_matches_per_expert_repack():
    rng = np.random.default_rng(1)
    e, n, k = 4, 32, 256
    w = rng.standard_normal((e, n, k)).astype(np.float32)
    raw = np.stack([qb.quantize(w[i], GGMLType.Q8_0) for i in range(e)])
    qt = repack_experts(raw, (e, n, k), GGMLType.Q8_0)
    assert isinstance(qt, QTensorE) and qt.shape == (e, k, n)
    full = np.asarray(qt.dequant(jnp.float32))
    for i in range(e):
        one = repack(raw[i], (n, k), GGMLType.Q8_0)
        np.testing.assert_array_equal(full[i], np.asarray(one.dequant(jnp.float32)))


def test_dequant_gather_reads_selected_experts():
    rng = np.random.default_rng(2)
    e, n, k = 4, 32, 256
    w = rng.standard_normal((e, n, k)).astype(np.float32)
    raw = np.stack([qb.quantize(w[i], GGMLType.Q4_K) for i in range(e)])
    qt = repack_experts(raw, (e, n, k), GGMLType.Q4_K)
    idx = jnp.asarray([[2, 0], [1, 3]], jnp.int32)  # [T=2, k=2]
    got = np.asarray(qt.dequant_gather(idx, jnp.float32))
    full = np.asarray(qt.dequant(jnp.float32))
    assert got.shape == (2, 2, k, n)
    for t in range(2):
        for j in range(2):
            np.testing.assert_array_equal(got[t, j], full[int(idx[t, j])])


def test_moe_quantized_experts_close_to_dense():
    """moe_ffn over QTensorE expert stacks tracks the float reference
    within quantization error, in both dispatch regimes."""
    rng = np.random.default_rng(3)
    e, k, f = 4, 256, 512
    cfg = _mk_cfg(n_experts=e, n_used=2)
    gate = rng.standard_normal((e, f, k)).astype(np.float32) * 0.05
    up = rng.standard_normal((e, f, k)).astype(np.float32) * 0.05
    down = rng.standard_normal((e, k, f)).astype(np.float32) * 0.05

    def q(w3, npl, kpl):  # [E, N, K] quantize rows
        raw = np.stack([qb.quantize(w3[i], GGMLType.Q8_0) for i in range(w3.shape[0])])
        return repack_experts(raw, (e, npl, kpl), GGMLType.Q8_0)

    layer_f = {
        "ffn_gate_inp": jnp.asarray(rng.standard_normal((k, e)) * 0.3, jnp.float32),
        "ffn_gate_exps": jnp.asarray(np.swapaxes(gate, 1, 2)),
        "ffn_up_exps": jnp.asarray(np.swapaxes(up, 1, 2)),
        "ffn_down_exps": jnp.asarray(np.swapaxes(down, 1, 2)),
    }
    layer_q = dict(layer_f, ffn_gate_exps=q(gate, f, k), ffn_up_exps=q(up, f, k),
                   ffn_down_exps=q(down, k, f))
    for t in (1, 8):  # sparse and dense regimes
        h = jnp.asarray(rng.standard_normal((1, t, k)), jnp.float32)
        ref = np.asarray(moe_ffn(layer_f, cfg, h))
        got = np.asarray(moe_ffn(layer_q, cfg, h))
        np.testing.assert_allclose(got, ref, rtol=0.05, atol=2e-2)
