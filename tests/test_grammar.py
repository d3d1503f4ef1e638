"""Grammar engine tests (pattern: reference tests/test-grammar-parser.cpp,
test-grammar-integration.cpp, test-json-schema-to-grammar.cpp)."""

import json

import pytest

from zllm.grammar import GrammarState, json_schema_to_gbnf, parse_gbnf


def accepts(g, text: str) -> bool:
    st = GrammarState(g)
    for ch in text:
        if not st.accept(ord(ch)):
            return False
    return st.can_stop


def test_literal_alternates():
    g = parse_gbnf('root ::= "yes" | "no"\n')
    assert accepts(g, "yes")
    assert accepts(g, "no")
    assert not accepts(g, "maybe")
    assert not accepts(g, "ye")


def test_char_classes_and_repetition():
    g = parse_gbnf('root ::= [a-z]+ "-" [0-9]*\n')
    assert accepts(g, "abc-123")
    assert accepts(g, "x-")
    assert not accepts(g, "-1")
    assert not accepts(g, "ABC-1")


def test_nested_rules_and_recursion():
    g = parse_gbnf(
        'root ::= expr\n'
        'expr ::= term (("+" | "-") term)*\n'
        'term ::= [0-9]+ | "(" expr ")"\n'
    )
    assert accepts(g, "1+2-3")
    assert accepts(g, "(1+2)-3")
    assert accepts(g, "((7))")
    assert not accepts(g, "1+")
    assert not accepts(g, "(1")


def test_optional_and_bounded_repeat():
    g = parse_gbnf('root ::= "a"? "b"{2,3}\n')
    assert accepts(g, "bb")
    assert accepts(g, "abbb")
    assert not accepts(g, "b")
    assert not accepts(g, "abbbb")


def test_negated_class():
    g = parse_gbnf('root ::= "\\"" [^"]* "\\""\n')
    assert accepts(g, '"hello"')
    assert not accepts(g, '"a"b"')


def test_partial_prefix_ok():
    g = parse_gbnf('root ::= "hello"\n')
    st = GrammarState(g)
    for ch in "hel":
        assert st.accept(ord(ch))
    assert not st.can_stop  # incomplete


JSON_GRAMMAR = (
    'root ::= object\n'
    'object ::= "{" ( string ":" value ("," string ":" value)* )? "}"\n'
    'value ::= object | string | number\n'
    'string ::= "\\"" [a-z]* "\\""\n'
    'number ::= [0-9]+\n'
)


def test_json_like_grammar():
    g = parse_gbnf(JSON_GRAMMAR)
    assert accepts(g, '{}')
    assert accepts(g, '{"a":1}')
    assert accepts(g, '{"a":{"b":22},"c":3}')
    assert not accepts(g, '{"a":}')


def test_schema_to_gbnf_object():
    schema = {
        "type": "object",
        "properties": {"name": {"type": "string"}, "age": {"type": "integer"}},
        "required": ["name", "age"],
    }
    g = parse_gbnf(json_schema_to_gbnf(schema))
    assert accepts(g, '{"name": "bob", "age": 42}')
    assert accepts(g, '{"name": "x", "age": -1}')
    assert not accepts(g, '{"age": 42}')
    assert not accepts(g, '{"name": 3, "age": 42}')


def test_schema_enum_and_array():
    schema = {
        "type": "object",
        "properties": {
            "color": {"enum": ["red", "green"]},
            "nums": {"type": "array", "items": {"type": "integer"}, "minItems": 1},
        },
        "required": ["color", "nums"],
    }
    g = parse_gbnf(json_schema_to_gbnf(schema))
    assert accepts(g, '{"color": "red", "nums": [1, 2]}')
    assert not accepts(g, '{"color": "blue", "nums": [1]}')
    assert not accepts(g, '{"color": "red", "nums": []}')


def test_grammar_sampler_with_tokenizer():
    from zllm.tokenizer import Tokenizer
    from zllm.tokenizer.vocab import TokenType, Vocab

    tokens = ["<unk>", "<s>", "</s>", "yes", "no", "maybe", "y", "es"]
    vocab = Vocab(model="llama", pre="default", tokens=tokens,
                  scores=[0.0] * len(tokens),
                  types=[int(TokenType.UNKNOWN), int(TokenType.CONTROL), int(TokenType.CONTROL)]
                        + [int(TokenType.NORMAL)] * 5,
                  bos_id=1, eos_id=2, unk_id=0, add_bos=False, add_space_prefix=False)
    tok = Tokenizer(vocab)

    from zllm.grammar.gbnf import GrammarSampler

    g = parse_gbnf('root ::= "yes" | "no"\n')
    gs = GrammarSampler(g, tok)
    allowed = gs.allowed(range(len(tokens)))
    assert set(allowed) == {3, 4, 6}  # yes, no, y (eos not yet)
    gs.accept_token(6)  # "y"
    allowed = gs.allowed(range(len(tokens)))
    assert set(allowed) == {7}  # only "es"
    gs.accept_token(7)
    allowed = gs.allowed(range(len(tokens)))
    assert set(allowed) == {2}  # only EOS now
