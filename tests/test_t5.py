"""T5 encoder-decoder parity vs HF T5ForConditionalGeneration
(reference: src/models/t5-enc.cpp / t5-dec.cpp + llama_encode cross
state)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from zllm.gguf.constants import GGMLType

T5_CFG = dict(
    vocab_size=256,
    d_model=64,
    d_kv=16,
    d_ff=96,
    num_layers=2,
    num_decoder_layers=2,
    num_heads=4,
    relative_attention_num_buckets=8,
    relative_attention_max_distance=32,
    dropout_rate=0.0,
    feed_forward_proj="gated-gelu",
    tie_word_embeddings=False,
    decoder_start_token_id=0,
    pad_token_id=0,
    eos_token_id=1,
)


@pytest.fixture(scope="module")
def t5_ref(tmp_path_factory):
    from conftest import subprocess_env

    out = tmp_path_factory.mktemp("hf") / "t5.npz"
    script = os.path.join(os.path.dirname(__file__), "hf_oracle.py")
    r = subprocess.run(
        [sys.executable, script, str(out), json.dumps(T5_CFG), "t5"],
        timeout=600, capture_output=True, env=subprocess_env(),
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    data = np.load(str(out))
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    return sd, data["enc_toks"], data["dec_toks"], data["logits"], data["greedy"]


@pytest.fixture(scope="module")
def t5_gguf(t5_ref, tmp_path_factory):
    from zllm.convert.hf import convert_hf_t5

    sd, *_ = t5_ref
    path = str(tmp_path_factory.mktemp("m") / "t5.gguf")
    convert_hf_t5(sd, T5_CFG, path, gtype=GGMLType.F32)
    return path


def test_t5_logit_parity(t5_ref, t5_gguf):
    import jax
    import jax.numpy as jnp

    from zllm.models.loader import Model
    from zllm.models.t5 import cross_kv, t5_decode, t5_encode

    _, enc_toks, dec_toks, want, _ = t5_ref
    m = Model.load(t5_gguf, quantized=False, dtype=jnp.float32)
    cfg = m.cfg
    assert cfg.is_encoder_decoder and cfg.rel_buckets == 8
    assert len(m.params["enc_layers"]) == 2 and len(m.params["dec_layers"]) == 2

    @jax.jit
    def fwd(p, et, dt):
        h = t5_encode(p, cfg, et)
        ckv = cross_kv(p, cfg, h)
        pos = jnp.broadcast_to(jnp.arange(dt.shape[1], dtype=jnp.int32), dt.shape)
        logits, _ = t5_decode(p, cfg, dt, pos, ckv)
        return logits

    got = np.asarray(fwd(m.params, jnp.asarray(enc_toks.astype(np.int32)),
                         jnp.asarray(dec_toks.astype(np.int32))))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_t5_incremental_greedy_matches_hf(t5_ref, t5_gguf):
    """Encode once, decode token-by-token through a KV cache: greedy
    output must equal HF .generate()."""
    import jax.numpy as jnp

    from zllm.models.loader import Model
    from zllm.models.t5 import cross_kv, t5_decode, t5_encode
    from zllm.runtime.kvcache import KVCache

    _, enc_toks, _, _, greedy = t5_ref
    m = Model.load(t5_gguf, quantized=False, dtype=jnp.float32)
    cfg = m.cfg

    h = t5_encode(m.params, cfg, jnp.asarray(enc_toks[:1].astype(np.int32)))
    ckv = cross_kv(m.params, cfg, h)
    kv = KVCache.create(len(m.params["dec_layers"]), 1, 16, cfg.n_kv_heads,
                        cfg.head_dim, jnp.float32)
    cur = cfg.dec_start_token
    out = [cur]
    for i in range(6):
        logits, kv = t5_decode(
            m.params, cfg, jnp.asarray([[cur]], jnp.int32),
            jnp.asarray([[i]], jnp.int32), ckv, kv, logits_for="last")
        cur = int(np.asarray(logits)[0, -1].argmax())
        out.append(cur)
    # HF generate output starts with decoder_start_token
    assert out == list(greedy)[: len(out)], (out, list(greedy))
