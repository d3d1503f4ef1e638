"""plamo2 (hybrid plamo-style mamba + attention; reference
src/models/plamo2.cpp).  No HF class ships offline, so verification is
internal-consistency: incremental decode through (KVCache, mamba states)
must match the full-sequence forward, and the engine must reproduce lone
greedy decodes.  Tensor names/KVs follow the reference GGUF contract
(per-layer head_count_kv arrays mark the mamba layers, fused attn_qkv,
fused [gate|up] as ffn_up, B/C/dt norms, dt up-projection)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zllm.gguf.writer import GGUFWriter


def _w(rng, *shape):
    return (rng.standard_normal(shape) * 0.05).astype(np.float32)


def _write_plamo2(path, n_layers=4, h=64, nh=4, nkv=2, hd=16, f=96, v=151,
                  di=64, ds=16, dc=4, mh=4, seed=0):
    """Alternating [mamba, attn, ...] stack; dt_dim = 32."""
    rng = np.random.default_rng(seed)
    dt_dim = 32
    dh = di // mh
    w = GGUFWriter(path)
    arch = "plamo2"
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layers)
    w.add(f"{arch}.context_length", 128)
    w.add(f"{arch}.embedding_length", h)
    w.add(f"{arch}.feed_forward_length", f)
    is_attn = [il % 2 == 1 for il in range(n_layers)]
    w.add(f"{arch}.attention.head_count", [nh] * n_layers)
    w.add(f"{arch}.attention.head_count_kv",
          [nkv if a else 0 for a in is_attn])
    w.add(f"{arch}.attention.key_length", hd)
    w.add(f"{arch}.attention.value_length", hd)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add(f"{arch}.rope.freq_base", 10000.0)
    w.add(f"{arch}.rope.dimension_count", hd)
    w.add(f"{arch}.vocab_size", v)
    w.add(f"{arch}.ssm.conv_kernel", dc)
    w.add(f"{arch}.ssm.state_size", ds)
    w.add(f"{arch}.ssm.inner_size", di)
    w.add(f"{arch}.ssm.time_step_rank", mh)
    w.add(f"{arch}.ssm.group_count", 0)

    w.add_tensor("token_embd.weight", _w(rng, v, h))
    for il in range(n_layers):
        o = f"blk.{il}."
        w.add_tensor(o + "attn_norm.weight", _w(rng, h) + 1.0)
        if is_attn[il]:
            w.add_tensor(o + "attn_qkv.weight", _w(rng, (nh + 2 * nkv) * hd, h))
            w.add_tensor(o + "attn_output.weight", _w(rng, h, nh * hd))
            w.add_tensor(o + "attn_q_norm.weight", _w(rng, hd) + 1.0)
            w.add_tensor(o + "attn_k_norm.weight", _w(rng, hd) + 1.0)
        else:
            # per-head [z | x] in_proj
            w.add_tensor(o + "ssm_in.weight", _w(rng, 2 * di, h))
            w.add_tensor(o + "ssm_conv1d.weight", _w(rng, di, dc))
            w.add_tensor(o + "ssm_x.weight", _w(rng, 2 * ds + dt_dim, di))
            w.add_tensor(o + "ssm_b_norm.weight", _w(rng, ds) + 1.0)
            w.add_tensor(o + "ssm_c_norm.weight", _w(rng, ds) + 1.0)
            w.add_tensor(o + "ssm_dt_norm.weight", _w(rng, dt_dim) + 1.0)
            w.add_tensor(o + "ssm_dt.weight", _w(rng, mh, dt_dim))
            w.add_tensor(o + "ssm_dt.bias", _w(rng, mh))
            w.add_tensor(o + "ssm_a", -np.exp(_w(rng, mh)))
            w.add_tensor(o + "ssm_d", _w(rng, mh) + 1.0)
            w.add_tensor(o + "ssm_out.weight", _w(rng, h, di))
        w.add_tensor(o + "post_attention_norm.weight", _w(rng, h) + 1.0)
        w.add_tensor(o + "ffn_norm.weight", _w(rng, h) + 1.0)
        w.add_tensor(o + "ffn_up.weight", _w(rng, 2 * f, h))  # fused gate|up
        w.add_tensor(o + "ffn_down.weight", _w(rng, h, f))
        w.add_tensor(o + "post_ffw_norm.weight", _w(rng, h) + 1.0)
    w.add_tensor("output_norm.weight", _w(rng, h) + 1.0)
    w.add_tensor("output.weight", _w(rng, v, h))
    w.write()
    return path


@pytest.fixture(scope="module")
def p2_gguf(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("p2") / "plamo2.gguf")
    return _write_plamo2(path)


def test_plamo2_loads_and_runs(p2_gguf):
    from zllm.models.hybrid import hybrid_forward
    from zllm.models.loader import Model

    m = Model.load(p2_gguf, quantized=False, dtype=jnp.float32)
    cfg = m.cfg
    assert cfg.is_hybrid and cfg.attn_layers == (False, True, False, True)
    assert cfg.ssm is not None and not cfg.ssm.is_mamba2
    assert "ffn_gateup" in m.params["layers"][0]  # fused [gate|up] remap
    toks = jnp.asarray([[3, 9, 27, 5, 8]], jnp.int32)
    pos = jnp.asarray(np.arange(5, dtype=np.int32)[None])
    logits, _, _ = hybrid_forward(m.params, cfg, toks, pos, None, None)
    assert np.isfinite(np.asarray(logits)).all()


def test_plamo2_incremental_decode(p2_gguf):
    from zllm.models.hybrid import hybrid_forward, make_hybrid_state
    from zllm.models.loader import Model
    from zllm.runtime.kvcache import KVCache

    m = Model.load(p2_gguf, quantized=False, dtype=jnp.float32)
    cfg = m.cfg
    rng = np.random.default_rng(2)
    seq = rng.integers(1, 150, size=9).tolist()

    full, _, _ = hybrid_forward(
        m.params, cfg, jnp.asarray([seq], jnp.int32),
        jnp.arange(len(seq), dtype=jnp.int32)[None], None, None, logits_for="last")

    kv = KVCache.create(cfg.n_attn_layers, 1, 32, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    state = make_hybrid_state(cfg, 1)
    for i, tok in enumerate(seq):
        step, kv, state = hybrid_forward(
            m.params, cfg, jnp.asarray([[tok]], jnp.int32),
            jnp.asarray([[i]], jnp.int32), kv, state, logits_for="last")
    np.testing.assert_allclose(
        np.asarray(step)[0, -1], np.asarray(full)[0, -1], rtol=2e-4, atol=2e-4)


def test_plamo2_engine_serving(p2_gguf):
    import time

    from test_jamba import _hybrid_oracle
    from zllm.models.loader import Model
    from zllm.server.engine import Engine, Request

    m = Model.load(p2_gguf, quantized=False, dtype=jnp.float32)
    prompts = [
        list(np.random.default_rng(0).integers(1, 150, size=13)),
        list(np.random.default_rng(1).integers(1, 150, size=4)),
    ]
    n_new = 6
    eng = Engine(m, n_slots=2, max_len=128, prefill_chunk=8, kv_dtype=jnp.float32)
    assert eng.hybrid
    eng.start()
    try:
        reqs = [eng.submit(Request(prompt_tokens=p, max_new=n_new, temp=0.0))
                for p in prompts]
        deadline = time.time() + 180
        while not all(r.done for r in reqs):
            assert time.time() < deadline, "engine timed out"
            time.sleep(0.02)
        assert all(r.error == "" for r in reqs), [r.error for r in reqs]
    finally:
        eng.stop()
    for p, r in zip(prompts, reqs):
        assert list(r.out_tokens) == _hybrid_oracle(m, p, n_new), r.out_tokens
