"""Pruned SWA ring cache (reference: llama-kv-cache-iswa): sliding-window
layers keep only ~window slots; logits must match the full cache exactly,
including decode far past the window."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def swa_model(tmp_path_factory):
    """A llama-family model with a sliding window on alternating layers
    (gemma2 pattern) — built by patching the config after load."""
    import jax.numpy as jnp

    from zllm.gguf.constants import GGMLType
    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf

    path = str(tmp_path_factory.mktemp("m") / "swa.gguf")
    make_llama_gguf(path, n_layers=4, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=128, vocab_size=256, gtype=GGMLType.F32)
    m = Model.load(path, quantized=False, dtype=jnp.float32)
    m.cfg = m.cfg.with_(sliding_window=64, swa_pattern=2)  # odd layers SWA
    return m


def test_swa_ring_matches_full(swa_model):
    import jax
    import jax.numpy as jnp

    from zllm.models.llama import forward
    from zllm.runtime.kvcache import KVCache, KVCacheSWA

    m = swa_model
    cfg = m.cfg
    chunk = 128
    max_len = 512
    rng = np.random.default_rng(0)

    full = KVCache.create(cfg.n_layers, 1, max_len + chunk, cfg.n_kv_heads,
                          cfg.head_dim, jnp.float32)
    ring = KVCacheSWA.create_swa(cfg, 1, max_len, chunk, jnp.float32)
    # memory actually shrinks on SWA layers
    assert ring.k[0].shape[2] < full.k[0].shape[2]
    assert not cfg.is_swa_layer(1)  # pattern 2: every 2nd layer full
    assert ring.k[1].shape[2] == full.k[1].shape[2]

    step = jax.jit(lambda p, t, q, kv: forward(p, cfg, t, q, kv, logits_for="last"))

    # chunk-aligned prefill of 256 tokens, then decode to position 400
    # (far beyond the 64-token window)
    toks = rng.integers(3, 250, 256).astype(np.int32)
    for start in (0, 128):
        tt = jnp.asarray(toks[start : start + 128][None])
        pp = jnp.asarray(np.arange(start, start + 128, dtype=np.int32)[None])
        lf, full = step(m.params, tt, pp, full)
        lr, ring = step(m.params, tt, pp, ring)
        np.testing.assert_allclose(np.asarray(lr), np.asarray(lf), rtol=2e-4, atol=2e-4)

    tok = int(np.asarray(lf)[0, -1].argmax())
    for p in range(256, 400):
        tt = jnp.asarray([[tok]], jnp.int32)
        pp = jnp.asarray([[p]], jnp.int32)
        lf, full = step(m.params, tt, pp, full)
        lr, ring = step(m.params, tt, pp, ring)
        tok = int(np.asarray(lf)[0, -1].argmax())
        if p % 37 == 0 or p > 395:
            np.testing.assert_allclose(np.asarray(lr), np.asarray(lf),
                                       rtol=3e-4, atol=3e-4, err_msg=f"pos {p}")


def test_swa_trash_rows_isolated(swa_model):
    """Inactive-row trash writes (position == horizon) must not corrupt
    live ring slots (the engine's mixed-step convention)."""
    import jax
    import jax.numpy as jnp

    from zllm.models.llama import forward
    from zllm.runtime.kvcache import KVCacheSWA

    m = swa_model
    cfg = m.cfg
    chunk, max_len = 128, 512
    rng = np.random.default_rng(1)
    ring = KVCacheSWA.create_swa(cfg, 2, max_len, chunk, jnp.float32)
    step = jax.jit(lambda p, t, q, kv: forward(p, cfg, t, q, kv, logits_for="last"))

    toks = rng.integers(3, 250, (2, 128)).astype(np.int32)
    pos = np.broadcast_to(np.arange(128, dtype=np.int32), (2, 128)).copy()
    l0, ring = step(m.params, jnp.asarray(toks), jnp.asarray(pos), ring)

    # row 1 writes trash at the horizon while row 0 decodes
    t2 = np.asarray([[int(np.asarray(l0)[0, -1].argmax())], [7]], np.int32)
    p2 = np.asarray([[128], [max_len]], np.int32)
    l1, ring = step(m.params, jnp.asarray(t2), jnp.asarray(p2), ring)

    # row 0's next logits must equal a trash-free run
    ring2 = KVCacheSWA.create_swa(cfg, 2, max_len, chunk, jnp.float32)
    _, ring2 = step(m.params, jnp.asarray(toks), jnp.asarray(pos), ring2)
    p3 = np.asarray([[128], [max_len]], np.int32)
    l1b, ring2 = step(m.params, jnp.asarray(t2), jnp.asarray(p3), ring2)
    np.testing.assert_allclose(np.asarray(l1)[0], np.asarray(l1b)[0], rtol=1e-5)
