"""Pipeline parallelism: GPipe microbatch rotation over a "pp" mesh axis
must reproduce the single-device forward bit-for-tolerance (reference
capability: layer-split mode + microbatch overlap, ggml-backend.cpp:712).
Runs on the 8-virtual-CPU-device mesh from conftest."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zllm.gguf.constants import GGMLType
from zllm.models.llama import forward
from zllm.models.loader import Model
from zllm.parallel.pp import (
    make_pp_mesh, pp_forward_fn, pp_kv_create, pp_put, stage_params,
)
from zllm.runtime.kvcache import KVCache
from zllm.testing import make_llama_gguf


@pytest.fixture(scope="module")
def model():
    path = os.path.join(tempfile.gettempdir(), "zllm_pp_test.gguf")
    if not os.path.exists(path):
        make_llama_gguf(
            path, n_layers=4, n_embd=128, n_heads=4, n_kv_heads=2,
            n_ff=256, vocab_size=512, gtype=GGMLType.Q8_0,
        )
    return Model.load(path, quantized=True, dtype=jnp.float32)


@pytest.mark.parametrize("pp,n_micro", [(2, 2), (4, 2), (2, 4)])
def test_pp_prefill_parity(model, pp, n_micro):
    cfg = model.cfg
    mesh = make_pp_mesh(jax.devices()[:pp], pp=pp)
    shared, stages = stage_params(model.params, pp)
    shared, stages = pp_put(shared, stages, mesh)

    b, t = n_micro * 2, 8
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)).astype(np.int32))
    positions = jnp.asarray(np.broadcast_to(np.arange(t, dtype=np.int32), (b, t)))

    step = pp_forward_fn(cfg, mesh, n_micro)
    got = np.asarray(step(shared, stages, tokens, positions))
    want, _ = forward(model.params, cfg, tokens, positions, None)
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-4, atol=2e-4)


def test_pp_kv_decode_parity(model):
    """Prefill through the pipeline cache, then a T=1 decode step — both
    must match the plain KVCache path."""
    cfg = model.cfg
    pp, n_micro = 2, 2
    mesh = make_pp_mesh(jax.devices()[:pp], pp=pp)
    shared, stages = stage_params(model.params, pp)
    shared, stages = pp_put(shared, stages, mesh)

    b, t, s_max = n_micro * 2, 8, 32
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)).astype(np.int32))
    positions = jnp.asarray(np.broadcast_to(np.arange(t, dtype=np.int32), (b, t)))

    step = pp_forward_fn(cfg, mesh, n_micro, with_kv=True, logits_for="last")
    kvk, kvv = pp_kv_create(cfg, mesh, n_micro, b, s_max, jnp.float32)
    got, kvk, kvv = step(shared, stages, tokens, positions, kvk, kvv)

    kv = KVCache.create(cfg.n_layers, b, s_max, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    want, kv = forward(model.params, cfg, tokens, positions, kv, logits_for="last")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

    # cache contents must agree (stages hold [pp, Lp, B+mb, H, S, D])
    mb = b // n_micro
    kk = np.asarray(kvk).reshape(cfg.n_layers, b + mb, cfg.n_kv_heads, s_max, cfg.head_dim)
    for il in range(cfg.n_layers):
        np.testing.assert_allclose(
            kk[il, :b, :, :t, :], np.asarray(kv.k[il])[:, :, :t, :], rtol=2e-3, atol=2e-3
        )

    # decode one token from the cache
    tok1 = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, 1)).astype(np.int32))
    pos1 = jnp.full((b, 1), t, jnp.int32)
    got1, kvk, kvv = step(shared, stages, tok1, pos1, kvk, kvv)
    want1, kv = forward(model.params, cfg, tok1, pos1, kv, logits_for="last")
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1), rtol=2e-4, atol=2e-4)


def test_pp_interleaved_swa_parity(model):
    """gemma2/3-class interleaved sliding-window stacks run under PP via a
    per-layer lax.cond on the global layer index — must match the
    single-device forward (the round-3 guard rejected these)."""
    cfg = model.cfg.with_(sliding_window=4, swa_pattern=2)
    pp, n_micro = 2, 2
    mesh = make_pp_mesh(jax.devices()[:pp], pp=pp)
    shared, stages = stage_params(model.params, pp)
    shared, stages = pp_put(shared, stages, mesh)

    b, t = n_micro * 2, 8
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)).astype(np.int32))
    positions = jnp.asarray(np.broadcast_to(np.arange(t, dtype=np.int32), (b, t)))

    step = pp_forward_fn(cfg, mesh, n_micro)
    got = np.asarray(step(shared, stages, tokens, positions))
    want, _ = forward(model.params, cfg, tokens, positions, None)
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-4, atol=2e-4)


def _pp_vs_single(cfg, params, pp=2, n_micro=2, t=8, seed=5):
    mesh = make_pp_mesh(jax.devices()[:pp], pp=pp)
    shared, stages = stage_params(params, pp)
    shared, stages = pp_put(shared, stages, mesh)
    b = n_micro * 2
    rng = np.random.default_rng(seed)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)).astype(np.int32))
    positions = jnp.asarray(np.broadcast_to(np.arange(t, dtype=np.int32), (b, t)))
    step = pp_forward_fn(cfg, mesh, n_micro)
    got = np.asarray(step(shared, stages, tokens, positions))
    want, _ = forward(params, cfg, tokens, positions, None)
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-4, atol=2e-4)


def test_pp_nope_parity(model):
    """smollm3/exaone4-class per-layer NoPE runs under PP via lax.cond on
    the gathered global-layer mask (the round-4 guard rejected these)."""
    _pp_vs_single(model.cfg.with_(nope_step=2), model.params)


def test_pp_nope_swa_combined_parity(model):
    """cohere2 geometry: interleaved SWA where the full-attention layer of
    each group is NoPE — the 4-way lax.switch dispatch."""
    cfg = model.cfg.with_(sliding_window=4, swa_pattern=2, nope_step=2)
    _pp_vs_single(cfg, model.params)


def test_pp_xielu_parity(model):
    """apertus xIELU: per-layer activation params gathered by the GLOBAL
    traced layer index (distinct per layer, so a local-index bug would
    show as a mismatch)."""
    params = dict(model.params)
    params["layers"] = [
        {k: v for k, v in layer.items() if k != "ffn_gate"}
        for layer in model.params["layers"]
    ]
    xielu = tuple((0.8 + 0.1 * i, 0.6 + 0.05 * i, 0.5 - 0.03 * i, -1e-6)
                  for i in range(model.cfg.n_layers))
    cfg = model.cfg.with_(act="xielu", xielu=xielu)
    _pp_vs_single(cfg, params)


def test_pp_gptoss_geometry_parity():
    """gpt-oss geometry under PP: dense-first interleaved SWA + clamped
    swiglu_oai MoE + per-head attention sinks (reference
    src/models/gpt-oss.cpp; PP is the reference's default multi-GPU
    mode, include/llama.h:193)."""
    path = os.path.join(tempfile.gettempdir(), "zllm_pp_gptoss.gguf")
    if not os.path.exists(path):
        make_llama_gguf(
            path, n_layers=4, n_embd=128, n_heads=4, n_kv_heads=2,
            n_ff=256, vocab_size=512, gtype=GGMLType.Q8_0, n_experts=4,
        )
    m = Model.load(path, quantized=True, dtype=jnp.float32)
    rng = np.random.default_rng(11)
    params = dict(m.params)
    params["layers"] = [dict(layer) for layer in m.params["layers"]]
    for layer in params["layers"]:
        layer["attn_sinks"] = jnp.asarray(
            rng.normal(size=(m.cfg.n_heads,)).astype(np.float32))
    cfg = m.cfg.with_(sliding_window=4, swa_pattern=2, swa_dense_first=True,
                      act="swiglu_oai")
    _pp_vs_single(cfg, params)


def test_pp_rejects_per_layer_variation(model):
    """Archs whose layers differ in graph STRUCTURE by concrete index
    (recurrent/hybrid stacks) must be rejected, not silently mis-served."""
    import jax
    import pytest as _pytest

    from zllm.parallel.pp import make_pp_mesh, pp_forward_fn

    mesh = make_pp_mesh(jax.devices()[:2], pp=2)
    hybrid = model.cfg.with_(attn_layers=(1, 3))
    with _pytest.raises(NotImplementedError):
        pp_forward_fn(hybrid, mesh, 2)
