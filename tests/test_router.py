"""Multi-model router + Anthropic Messages API (reference: tools/server
router mode server-models.cpp; /v1/messages README.md:1306)."""

import json
import urllib.error
import urllib.request

import pytest


def _post(port, path, body, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    return json.loads(urllib.request.urlopen(req, timeout=timeout).read())


def _get(port, path):
    return json.loads(urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=30).read())


@pytest.fixture(scope="module")
def router(tmp_path_factory):
    from zllm.gguf.constants import GGMLType
    from zllm.server.router import RouterServer
    from zllm.testing import make_llama_gguf

    d = tmp_path_factory.mktemp("models")
    for name, seed in (("alpha.gguf", 0), ("beta.gguf", 7)):
        make_llama_gguf(str(d / name), n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                        n_ff=128, vocab_size=260, gtype=GGMLType.Q8_0, seed=seed,
                        with_tokenizer=True)
    r = RouterServer(str(d), port=0, models_max=1, n_slots=1, max_len=512)
    r.start_background()
    yield r
    r.shutdown()


def test_router_lists_models(router):
    out = _get(router.port, "/v1/models")
    ids = [m["id"] for m in out["data"]]
    assert ids == ["alpha.gguf", "beta.gguf"]


def test_router_forwards_by_model(router):
    out = _post(router.port, "/v1/chat/completions",
                {"model": "alpha.gguf", "max_tokens": 4, "temperature": 0,
                 "messages": [{"role": "user", "content": "hi"}]})
    assert out["choices"][0]["finish_reason"] in ("length", "stop")
    assert "alpha.gguf" in router.instances


def test_router_lru_eviction(router):
    """models_max=1: loading beta evicts alpha."""
    _post(router.port, "/v1/chat/completions",
          {"model": "beta.gguf", "max_tokens": 4, "temperature": 0,
           "messages": [{"role": "user", "content": "yo"}]})
    assert list(router.instances) == ["beta.gguf"]


def test_router_unknown_model(router):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(router.port, "/v1/chat/completions",
              {"model": "nope.gguf", "max_tokens": 2, "messages": []})
    assert e.value.code == 404


def test_anthropic_messages(router):
    out = _post(router.port, "/v1/messages",
                {"model": "beta.gguf", "max_tokens": 6, "temperature": 0,
                 "system": "be terse",
                 "messages": [{"role": "user", "content": "hello"}]})
    assert out["type"] == "message" and out["role"] == "assistant"
    assert out["content"][0]["type"] == "text"
    assert out["stop_reason"] in ("end_turn", "max_tokens")
    assert out["usage"]["output_tokens"] == 6


def test_anthropic_count_tokens(router):
    out = _post(router.port, "/v1/messages/count_tokens",
                {"model": "beta.gguf",
                 "messages": [{"role": "user", "content": "hello world"}]})
    assert out["input_tokens"] > 2


def test_anthropic_streaming(router):
    body = json.dumps({"model": "beta.gguf", "max_tokens": 5, "temperature": 0,
                       "stream": True,
                       "messages": [{"role": "user", "content": "go"}]}).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{router.port}/v1/messages", data=body,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        raw = resp.read().decode()
    events = [l.split(": ", 1)[1] for l in raw.splitlines() if l.startswith("event: ")]
    assert events[0] == "message_start"
    assert "content_block_delta" in events
    assert events[-1] == "message_stop"


def test_replica_round_robin(tmp_path):
    """--replicas N: one model served by N engines, requests alternating
    across them (data-parallel replica serving)."""
    import json
    import urllib.request

    from zllm.gguf.constants import GGMLType
    from zllm.server.router import RouterServer
    from zllm.testing import make_llama_gguf

    make_llama_gguf(str(tmp_path / "m.gguf"), n_layers=2, n_embd=64, n_heads=4,
                    n_kv_heads=2, n_ff=128, vocab_size=260, gtype=GGMLType.Q8_0,
                    with_tokenizer=True)
    r = RouterServer(str(tmp_path), port=0, models_max=1, n_slots=1,
                     max_len=128, replicas=2)
    r.start_background()
    try:
        name = r.available()[0]
        inst = r.load(name)
        assert len(inst.servers) == 2
        ports = set()
        for _ in range(4):
            ports.add(inst.pick().port)
        assert len(ports) == 2  # alternates between both replicas
        body = json.dumps({"model": name, "prompt": "ab", "max_tokens": 2,
                           "temperature": 0}).encode()
        for _ in range(2):
            req = urllib.request.Request(
                f"http://127.0.0.1:{r.port}/v1/completions", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as resp:
                out = json.loads(resp.read())
            assert out["choices"][0]["finish_reason"] == "length"
    finally:
        r.shutdown()
