"""Hybrid (dcn, dp, tp) mesh: the multi-host layout (reference capability:
ggml-rpc multi-node serving) validated on the virtual 8-device CPU mesh —
the dcn axis is semantically a host boundary; collectives crossing it are
the same XLA collectives, just on a slower fabric."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from zllm.gguf.constants import GGMLType
from zllm.models.llama import forward
from zllm.models.loader import Model
from zllm.parallel import kv_spec, make_hybrid_mesh, shard_params, sharded_forward_fn
from zllm.parallel.dist import batch_axes, init_distributed
from zllm.runtime.kvcache import KVCache
from zllm.testing import make_llama_gguf


def _model():
    path = os.path.join(tempfile.gettempdir(), "zllm_mh_test.gguf")
    if not os.path.exists(path):
        make_llama_gguf(
            path, n_layers=2, n_embd=128, n_heads=4, n_kv_heads=2,
            n_ff=1024, vocab_size=512, gtype=GGMLType.Q8_0,
        )
    return Model.load(path, quantized=True, dtype=jnp.float32)


def test_init_distributed_noop_single_process(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert init_distributed() is False


def test_hybrid_mesh_axes():
    mesh = make_hybrid_mesh(dcn=2, dp=2, tp=2)
    assert mesh.axis_names == ("dcn", "dp", "tp")
    assert mesh.shape == {"dcn": 2, "dp": 2, "tp": 2}
    assert batch_axes(mesh) == ("dcn", "dp")


def test_hybrid_sharded_forward_parity():
    """Full decode step on a (dcn=2, dp=2, tp=2) mesh == single-device."""
    m = _model()
    cfg = m.cfg
    mesh = make_hybrid_mesh(dcn=2, dp=2, tp=2)
    params, leaf_specs, plan = shard_params(m.params, mesh, cfg)
    assert plan.attn and plan.ffn
    step = sharded_forward_fn(cfg, mesh, leaf_specs, plan, with_kv=True)

    b, t, s_max = 4, 4, 32  # batch shards over dcn*dp = 4
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)).astype(np.int32))
    positions = jnp.asarray(np.broadcast_to(np.arange(t, dtype=np.int32), (b, t)))
    kv = KVCache.create(cfg.n_layers, b, s_max, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    kv = jax.device_put(kv, jax.sharding.NamedSharding(mesh, kv_spec(plan, mesh)))
    dspec = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(("dcn", "dp"), None))
    tokens = jax.device_put(tokens, dspec)
    positions = jax.device_put(positions, dspec)

    got, kv2 = step(params, tokens, positions, kv)

    kv_ref = KVCache.create(cfg.n_layers, b, s_max, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    want, _ = forward(m.params, cfg, tokens, positions, kv_ref)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)
