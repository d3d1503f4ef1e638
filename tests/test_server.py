"""Server integration tests (pattern: reference tools/server/tests pytest
suites — real HTTP against a live server on a tiny model)."""

import json
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    import jax.numpy as jnp

    from zllm.gguf.constants import GGMLType
    from zllm.models.loader import Model
    from zllm.server import ZllmServer
    from zllm.testing import make_llama_gguf
    from zllm.tokenizer import Tokenizer
    from zllm.tokenizer.vocab import TokenType, Vocab

    path = str(tmp_path_factory.mktemp("m") / "srv.gguf")
    make_llama_gguf(path, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=128, vocab_size=256, gtype=GGMLType.Q8_0)
    m = Model.load(path, quantized=True, dtype=jnp.float32)
    # attach a trivial byte-level tokenizer (synthetic model has none)
    tokens = ["<unk>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(253)]
    types = [int(TokenType.UNKNOWN), int(TokenType.CONTROL), int(TokenType.CONTROL)] + [
        int(TokenType.BYTE)
    ] * 253
    m.tokenizer = Tokenizer(Vocab(
        model="llama", pre="default", tokens=tokens, scores=[0.0] * 256,
        types=types, bos_id=1, eos_id=2, unk_id=0, add_bos=True, add_space_prefix=False,
    ))

    srv = ZllmServer(m, n_slots=2, max_len=256, port=0)
    srv.start_background()
    yield srv
    srv.shutdown()


def _post(srv, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def _get(srv, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}{path}", timeout=30) as r:
        return r.read().decode()


def test_health_and_models(served):
    assert json.loads(_get(served, "/health"))["status"] == "ok"
    models = json.loads(_get(served, "/v1/models"))
    assert models["data"][0]["object"] == "model"


def test_completion(served):
    out = _post(served, "/v1/completions", {"prompt": "ab", "max_tokens": 8, "temperature": 0})
    assert out["object"] == "text_completion"
    assert out["usage"]["completion_tokens"] >= 1
    assert out["choices"][0]["finish_reason"] in ("length", "stop")


def test_chat_completion(served):
    out = _post(served, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 4, "temperature": 0,
    })
    assert out["object"] == "chat.completion"
    assert out["choices"][0]["message"]["role"] == "assistant"


def test_concurrent_requests_consistent(served):
    """Two concurrent greedy requests must match two sequential ones
    (continuous batching must not cross-contaminate slots)."""
    def run(prompt):
        return _post(served, "/v1/completions", {"prompt": prompt, "max_tokens": 6, "temperature": 0})

    seq_a = run("abcd")["choices"][0]["text"]
    seq_b = run("xyz")["choices"][0]["text"]

    results = {}
    def worker(name, prompt):
        results[name] = run(prompt)["choices"][0]["text"]

    ts = [threading.Thread(target=worker, args=("a", "abcd")),
          threading.Thread(target=worker, args=("b", "xyz"))]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
    assert results["a"] == seq_a
    assert results["b"] == seq_b


def test_streaming(served):
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", served.port, timeout=120)
    conn.request("POST", "/v1/completions",
                 json.dumps({"prompt": "ab", "max_tokens": 4, "temperature": 0, "stream": True}),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200
    body = resp.read().decode()
    events = [ln for ln in body.splitlines() if ln.startswith("data: ")]
    assert events[-1] == "data: [DONE]"
    assert len(events) >= 3


def test_tokenize_roundtrip(served):
    out = _post(served, "/tokenize", {"content": "hi"})
    assert len(out["tokens"]) >= 2
    back = _post(served, "/detokenize", {"tokens": out["tokens"]})
    assert back["content"] == "hi"


def test_metrics(served):
    text = _get(served, "/metrics")
    assert "zllm_requests_total" in text


def test_embeddings_and_rerank(served):
    out = _post(served, "/v1/embeddings", {"input": ["ab", "cd"]})
    assert len(out["data"]) == 2
    v = out["data"][0]["embedding"]
    assert abs(sum(x * x for x in v) - 1.0) < 1e-3  # L2-normalized
    rr = _post(served, "/rerank", {"query": "ab", "documents": ["ab", "zz"]})
    assert len(rr["results"]) == 2
    assert rr["results"][0]["relevance_score"] >= rr["results"][1]["relevance_score"]


def test_grammar_constrained_completion(served):
    # bytes tokenizer: constrain output to "aaa…" via GBNF
    out = _post(served, "/v1/completions", {
        "prompt": "x", "max_tokens": 6, "temperature": 0.9, "seed": 7,
        "grammar": 'root ::= [a]*\n',
    })
    text = out["choices"][0]["text"]
    assert set(text) <= {"a"}, text


def test_slots_introspection(served):
    slots = json.loads(_get(served, "/slots"))
    assert len(slots) == 2
    assert {"id", "state", "n_past", "n_cached"} <= set(slots[0])


def test_stop_strings(served):
    # learn the greedy continuation, then stop on a substring of it
    base = _post(served, "/v1/completions", {"prompt": "qq", "max_tokens": 10, "temperature": 0})
    text = base["choices"][0]["text"]
    assert len(text) >= 3
    stop = text[2:4]
    out = _post(served, "/v1/completions",
                {"prompt": "qq", "max_tokens": 10, "temperature": 0, "stop": [stop]})
    trimmed = out["choices"][0]["text"]
    assert stop not in trimmed
    assert text.startswith(trimmed)
    assert out["choices"][0]["finish_reason"] == "stop"
    # streaming path must trim identically (holdback buffering)
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", served.port, timeout=120)
    conn.request("POST", "/v1/completions",
                 json.dumps({"prompt": "qq", "max_tokens": 10, "temperature": 0,
                             "stop": [stop], "stream": True}),
                 {"Content-Type": "application/json"})
    body = conn.getresponse().read().decode()
    streamed = "".join(
        json.loads(ln[6:])["choices"][0].get("text") or ""
        for ln in body.splitlines()
        if ln.startswith("data: ") and ln != "data: [DONE]"
    )
    assert streamed == trimmed


def test_slot_save_restore_roundtrip(served, tmp_path):
    served.slot_save_path = str(tmp_path)
    # cache a deterministic prompt into slot state via a completion
    _post(served, "/v1/completions", {"prompt": "abcd", "max_tokens": 4, "temperature": 0})
    info = _post(served, "/slots/0?action=save", {"filename": "s0.bin"})
    assert info["n_past"] > 0 and (tmp_path / "s0.bin").exists()
    erased = _post(served, "/slots/0?action=erase", {})
    assert erased["id"] == 0
    restored = _post(served, "/slots/0?action=restore", {"filename": "s0.bin"})
    assert restored["n_past"] == info["n_past"]


def test_apply_template_endpoint(served):
    out = _post(served, "/apply-template",
                {"messages": [{"role": "user", "content": "hi"}]})
    assert "hi" in out["prompt"]


def test_infill(served):
    # synthetic vocab has no FIM ids -> graft them onto byte tokens
    v = served.model.tokenizer.vocab
    old = (v.fim_pre_id, v.fim_suf_id, v.fim_mid_id)
    v.fim_pre_id, v.fim_suf_id, v.fim_mid_id = 10, 11, 12
    try:
        out = _post(served, "/infill",
                    {"input_prefix": "ab", "input_suffix": "cd", "max_tokens": 4, "temperature": 0})
        assert out["tokens_predicted"] >= 1
    finally:
        v.fim_pre_id, v.fim_suf_id, v.fim_mid_id = old


def test_infill_unsupported_when_no_fim_tokens(served):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(served, "/infill", {"input_prefix": "a", "input_suffix": "b", "max_tokens": 2})
    assert ei.value.code == 501


_TOOLS = [{
    "type": "function",
    "function": {
        "name": "get_weather",
        "description": "Get the weather",
        "parameters": {
            "type": "object",
            # enum-bounded so even a random-weights model must terminate
            "properties": {"city": {"enum": ["Oslo", "Bergen"]}},
            "required": ["city"],
        },
    },
}]


@pytest.fixture(scope="module")
def served_tools(served):
    """Same model, bigger context: the tool preamble alone is ~800 byte
    tokens on the synthetic byte-level vocab."""
    from zllm.server import ZllmServer

    srv = ZllmServer(served.model, n_slots=1, max_len=1536, port=0)
    srv.start_background()
    yield srv
    srv.shutdown()


def test_tool_call_forced(served_tools):
    served = served_tools
    """tool_choice=required grammar-forces a parseable <tool_call> block
    even from a random-weights model (reference: common/chat.cpp forced
    tool grammars)."""
    out = _post(served, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "weather in Oslo?"}],
        "tools": _TOOLS, "tool_choice": "required",
        "max_tokens": 160, "temperature": 0,
    })
    choice = out["choices"][0]
    if choice["finish_reason"] == "length":
        pytest.skip("random model ran out of budget mid-JSON (grammar still held)")
    assert choice["finish_reason"] == "tool_calls"
    calls = choice["message"]["tool_calls"]
    assert calls[0]["function"]["name"] == "get_weather"
    args = json.loads(calls[0]["function"]["arguments"])
    assert args["city"] in ("Oslo", "Bergen")


def test_tool_call_streaming_forced(served_tools):
    """Streaming buffers the <tool_call> block and emits a tool_calls
    delta before the final chunk."""
    served = served_tools
    body = {
        "messages": [{"role": "user", "content": "weather?"}],
        "tools": _TOOLS, "tool_choice": "required",
        "max_tokens": 160, "temperature": 0, "stream": True,
    }
    req = urllib.request.Request(
        f"http://127.0.0.1:{served.port}/v1/chat/completions",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    deltas = []
    finish = None
    with urllib.request.urlopen(req, timeout=120) as r:
        for line in r:
            line = line.strip()
            if not line.startswith(b"data: ") or line == b"data: [DONE]":
                continue
            c = json.loads(line[6:])["choices"][0]
            deltas.append(c["delta"])
            finish = c["finish_reason"] or finish
    if finish == "length":
        pytest.skip("random model ran out of budget mid-JSON")
    assert finish == "tool_calls"
    tc = [d for d in deltas if d and "tool_calls" in d]
    assert tc and tc[0]["tool_calls"][0]["function"]["name"] == "get_weather"
    # no raw <tool_call> text leaked into content deltas
    content = "".join(d.get("content", "") for d in deltas if d)
    assert "<tool_call>" not in content
