"""Tool-call (function calling) tests.

Pattern: reference tools/server/tests unit/test_tool_call.py + the
grammar-trigger tests in tests/test-chat.cpp — rendering, grammar
forcing, output parsing, and lazy-trigger activation.
"""

import json

from zllm.grammar.gbnf import GrammarState, parse_gbnf
from zllm.server.toolcall import (
    TOOL_OPEN,
    LazyGrammarSampler,
    parse_tool_calls,
    prepare_messages,
    tool_call_gbnf,
)

WEATHER = {
    "type": "function",
    "function": {
        "name": "get_weather",
        "description": "Get the weather",
        "parameters": {
            "type": "object",
            "properties": {"city": {"type": "string"}},
            "required": ["city"],
        },
    },
}
TIME = {
    "type": "function",
    "function": {
        "name": "get_time",
        "parameters": {"type": "object", "properties": {}},
    },
}


def test_prepare_messages_injects_tools_and_flattens_history():
    msgs = [
        {"role": "system", "content": "Be brief."},
        {"role": "user", "content": "weather in Oslo?"},
        {"role": "assistant", "tool_calls": [{
            "id": "call_1", "type": "function",
            "function": {"name": "get_weather", "arguments": '{"city": "Oslo"}'},
        }]},
        {"role": "tool", "tool_call_id": "call_1", "content": '{"temp": -3}'},
    ]
    out = prepare_messages(msgs, [WEATHER])
    assert out[0]["role"] == "system"
    assert "get_weather" in out[0]["content"] and "Be brief." in out[0]["content"]
    assert TOOL_OPEN in out[2]["content"] and '"Oslo"' in out[2]["content"]
    assert out[3]["role"] == "user" and "<tool_response>" in out[3]["content"]
    # no system message: one is created
    out2 = prepare_messages([{"role": "user", "content": "hi"}], [WEATHER])
    assert out2[0]["role"] == "system" and "<tools>" in out2[0]["content"]


def test_tool_grammar_accepts_exact_calls_and_rejects_junk():
    g = parse_gbnf(tool_call_gbnf([WEATHER, TIME]))
    ok = '<tool_call>{"name": "get_weather", "arguments": {"city": "Oslo"}}</tool_call>'
    st = GrammarState(g)
    assert st.accepts_text(ok)
    st2 = GrammarState(g)
    assert not st2.accepts_text('<tool_call>{"name": "nope"')
    # only= restricts the name alternatives
    g1 = parse_gbnf(tool_call_gbnf([WEATHER, TIME], only="get_time"))
    st3 = GrammarState(g1)
    assert st3.accepts_text('<tool_call>{"name": "get_time", "arguments": {}}</tool_call>')
    st4 = GrammarState(g1)
    assert not st4.accepts_text('<tool_call>{"name": "get_weather"')


def test_parse_tool_calls_roundtrip():
    text = (
        "Let me check.\n<tool_call>\n"
        '{"name": "get_weather", "arguments": {"city": "Oslo"}}\n'
        "</tool_call>"
    )
    content, calls = parse_tool_calls(text, "r1")
    assert content == "Let me check."
    assert len(calls) == 1
    assert calls[0]["function"]["name"] == "get_weather"
    assert json.loads(calls[0]["function"]["arguments"]) == {"city": "Oslo"}
    # bare-JSON fallback (forced-JSON models)
    content, calls = parse_tool_calls('{"name": "get_time", "arguments": {}}')
    assert calls and calls[0]["function"]["name"] == "get_time"
    # plain text: no calls
    content, calls = parse_tool_calls("just words")
    assert content == "just words" and calls == []


class _ByteTok:
    """decode(ids) = chr(id); eos_id 0."""

    eos_id = 0

    def decode(self, ids, skip_special=False):
        return "".join(chr(i) for i in ids if i != 0)


def test_lazy_grammar_dormant_then_constrains():
    tok = _ByteTok()
    g = parse_gbnf(tool_call_gbnf([TIME]))
    lazy = LazyGrammarSampler(g, tok, trigger=TOOL_OPEN)
    # dormant: anything allowed
    cand = [ord(c) for c in "Hello"]
    assert lazy.allowed(cand) == cand
    for c in "I will call it now. ":
        lazy.accept_token(ord(c))
    assert lazy.active is None
    for c in TOOL_OPEN:
        lazy.accept_token(ord(c))
    assert lazy.active is not None
    # constrained: next char must begin the JSON object (or whitespace)
    allowed = lazy.allowed([ord("{"), ord("z"), ord(" ")])
    assert ord("{") in allowed and ord("z") not in allowed
    # accepting the valid continuation keeps the automaton alive
    for c in '{"name": "get_time", "arguments": {}}':
        lazy.accept_token(ord(c))
    assert ord("<") in lazy.allowed([ord("<")])  # closing tag
