"""BERT encoder parity vs HF BertForSequenceClassification (torch
subprocess oracle — the embeddings/reranker arch family, reference
src/models/bert.cpp + build_pooling rank head)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from zllm.gguf.constants import GGMLType

BERT_CFG = dict(
    vocab_size=128,
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=128,
    max_position_embeddings=64,
    layer_norm_eps=1e-12,
)


@pytest.fixture(scope="module")
def bert_ref(tmp_path_factory):
    from conftest import subprocess_env

    out = tmp_path_factory.mktemp("hf") / "bert.npz"
    script = os.path.join(os.path.dirname(__file__), "hf_oracle.py")
    subprocess.run(
        [sys.executable, script, str(out), json.dumps(BERT_CFG), "bert"],
        check=True, timeout=300, capture_output=True, env=subprocess_env(),
    )
    data = np.load(str(out))
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    return sd, data["toks"], data["hidden"], data["score"]


@pytest.fixture(scope="module")
def bert_gguf(bert_ref, tmp_path_factory):
    from zllm.convert.hf import convert_hf_bert

    sd, *_ = bert_ref
    path = str(tmp_path_factory.mktemp("m") / "bert.gguf")
    convert_hf_bert(sd, BERT_CFG, path, gtype=GGMLType.F32, pooling=4)
    return path


def test_bert_hidden_parity(bert_ref, bert_gguf):
    import jax
    import jax.numpy as jnp

    from zllm.models.bert import bert_forward
    from zllm.models.loader import Model

    _, toks, want, _ = bert_ref
    m = Model.load(bert_gguf, quantized=False, dtype=jnp.float32)
    assert m.cfg.is_encoder and m.cfg.pooling == "rank"

    toks = toks.astype(np.int32)
    positions = np.broadcast_to(np.arange(toks.shape[1], dtype=np.int32), toks.shape)
    fwd = jax.jit(lambda p, t, q: bert_forward(p, m.cfg, t, q))
    got = np.asarray(fwd(m.params, jnp.asarray(toks), jnp.asarray(positions)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_bert_rank_score_parity(bert_ref, bert_gguf):
    import jax
    import jax.numpy as jnp

    from zllm.models.bert import bert_forward, rank_score
    from zllm.models.loader import Model

    _, toks, _, want = bert_ref
    m = Model.load(bert_gguf, quantized=False, dtype=jnp.float32)
    toks = toks.astype(np.int32)
    positions = np.broadcast_to(np.arange(toks.shape[1], dtype=np.int32), toks.shape)
    hidden = bert_forward(m.params, m.cfg, jnp.asarray(toks), jnp.asarray(positions))
    got = np.asarray(rank_score(m.params, hidden))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


def test_bert_quantized_close_to_dense(bert_ref, tmp_path):
    import jax.numpy as jnp

    from zllm.convert.hf import convert_hf_bert
    from zllm.models.bert import bert_forward, pool
    from zllm.models.loader import Model

    sd, toks, want, _ = bert_ref
    path = str(tmp_path / "bert_q8.gguf")
    convert_hf_bert(sd, BERT_CFG, path, gtype=GGMLType.Q8_0, pooling=1)
    m = Model.load(path, quantized=True, dtype=jnp.float32)
    assert m.cfg.pooling == "mean"
    toks = toks.astype(np.int32)
    positions = np.broadcast_to(np.arange(toks.shape[1], dtype=np.int32), toks.shape)
    hidden = bert_forward(m.params, m.cfg, jnp.asarray(toks), jnp.asarray(positions))
    emb = np.asarray(pool(hidden, m.cfg.pooling))
    ref = want.mean(axis=1)
    cos = (emb * ref).sum(-1) / (np.linalg.norm(emb, axis=-1) * np.linalg.norm(ref, axis=-1))
    assert (cos > 0.99).all(), cos


def test_bert_rerank_server(bert_ref, bert_gguf):
    """Serve the reranker: /rerank scores come from the cross-encoder rank
    head, and /embeddings works through the encoder pooling path."""
    import json as _json
    import urllib.request

    import jax.numpy as jnp

    from zllm.models.loader import Model
    from zllm.server import ZllmServer
    from zllm.tokenizer import Tokenizer
    from zllm.tokenizer.vocab import TokenType, Vocab

    m = Model.load(bert_gguf, quantized=False, dtype=jnp.float32)
    # byte-ish WPM vocab so encode() works
    tokens = ["[PAD]", "[CLS]", "[SEP]"] + [f"▁{chr(97 + i)}" for i in range(26)] + [
        chr(97 + i) for i in range(26)
    ] + [f"tok{i}" for i in range(128 - 55)]
    types = [int(TokenType.CONTROL)] * 3 + [int(TokenType.NORMAL)] * 125
    m.tokenizer = Tokenizer(Vocab(
        model="bert", pre="default", tokens=tokens, scores=[0.0] * 128,
        types=types, bos_id=1, eos_id=2, unk_id=0, add_bos=True, add_eos=True,
        add_space_prefix=False,
    ))
    srv = ZllmServer(m, n_slots=1, max_len=64, port=0)
    srv.start_background()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/rerank",
            data=_json.dumps({"query": "ab", "documents": ["ab cd", "zz"]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        out = _json.loads(urllib.request.urlopen(req, timeout=120).read())
        assert len(out["results"]) == 2
        assert all("relevance_score" in r for r in out["results"])

        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/embeddings",
            data=_json.dumps({"input": "ab cd"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        out = _json.loads(urllib.request.urlopen(req, timeout=120).read())
        emb = out["data"][0]["embedding"]
        assert len(emb) == 64
    finally:
        srv.shutdown()
