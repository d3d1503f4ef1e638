"""State save/restore tests (pattern: reference examples/save-load-state +
test-state-restore-fragmented): a restored session must continue decoding
exactly as the original."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    import jax.numpy as jnp

    from zllm.gguf.constants import GGMLType
    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf

    path = str(tmp_path_factory.mktemp("m") / "st.gguf")
    make_llama_gguf(path, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=128, vocab_size=128, gtype=GGMLType.Q8_0)
    return Model.load(path, quantized=True, dtype=jnp.float32)


def _decode(model, kv, tokens, start_pos, n):
    import jax
    import jax.numpy as jnp

    from zllm.models.llama import forward

    step = jax.jit(lambda p, t, q, c: forward(p, model.cfg, t, q, c, logits_for="last"))
    out = []
    tok = tokens[-1]
    for i in range(n):
        lg, kv = step(model.params, jnp.asarray([[tok]], jnp.int32),
                      jnp.asarray([[start_pos + i]], jnp.int32), kv)
        tok = int(np.argmax(np.asarray(lg)[0, -1]))
        out.append(tok)
    return out, kv


def test_session_roundtrip(model, tmp_path):
    import jax
    import jax.numpy as jnp

    from zllm.models.llama import forward
    from zllm.runtime.kvcache import KVCache
    from zllm.runtime.state import load_session, save_session

    cfg = model.cfg
    prompt = [3, 17, 42, 9, 23]
    kv = KVCache.create(cfg.n_layers, 1, 64, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    pre = jax.jit(lambda p, t, q, c: forward(p, cfg, t, q, c))
    _, kv = pre(model.params, jnp.asarray([prompt], jnp.int32),
                jnp.asarray([np.arange(len(prompt))], jnp.int32), kv)

    cont_a, _ = _decode(model, kv, prompt, len(prompt), 5)

    path = str(tmp_path / "sess.npz")
    save_session(path, model, kv, prompt, len(prompt))

    kv2 = KVCache.create(cfg.n_layers, 1, 64, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    kv2, toks, n_past = load_session(path, model, kv2)
    assert toks == prompt and n_past == len(prompt)
    cont_b, _ = _decode(model, kv2, prompt, n_past, 5)
    assert cont_a == cont_b


def test_seq_state_slot_migration(model, tmp_path):
    import jax
    import jax.numpy as jnp

    from zllm.models.llama import forward
    from zllm.runtime.kvcache import KVCache
    from zllm.runtime.state import seq_load_file, seq_save_file

    cfg = model.cfg
    prompt = [5, 6, 7, 8]
    kv = KVCache.create(cfg.n_layers, 2, 64, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    pre = jax.jit(lambda p, t, q, c: forward(p, cfg, t, q, c))
    toks2 = np.zeros((2, len(prompt)), np.int32)
    toks2[0] = prompt
    pos2 = np.broadcast_to(np.arange(len(prompt), dtype=np.int32), (2, len(prompt)))
    _, kv = pre(model.params, jnp.asarray(toks2), jnp.asarray(pos2), kv)

    path = str(tmp_path / "seq.npz")
    seq_save_file(path, model, kv, 0, len(prompt))

    # restore into slot 1 of a fresh cache; continuation must match slot 0's
    kv3 = KVCache.create(cfg.n_layers, 2, 64, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    kv3, n_past = seq_load_file(path, model, kv3, 1)
    for a, b in zip(kv.k, kv3.k):
        np.testing.assert_array_equal(np.asarray(a[0, :, :n_past]), np.asarray(b[1, :, :n_past]))


def test_session_rejects_mismatched_model(model, tmp_path):
    import jax.numpy as jnp

    from zllm.runtime.kvcache import KVCache
    from zllm.runtime.state import load_session, save_session

    cfg = model.cfg
    kv = KVCache.create(cfg.n_layers, 1, 32, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    path = str(tmp_path / "bad.npz")
    save_session(path, model, kv, [1], 1)

    class FakeCfg:
        arch = "llama"
        n_layers = 99
        n_kv_heads = cfg.n_kv_heads
        head_dim = cfg.head_dim

    class FakeModel:
        cfg = FakeCfg()

    with pytest.raises(ValueError, match="n_layers"):
        load_session(path, FakeModel(), kv)
