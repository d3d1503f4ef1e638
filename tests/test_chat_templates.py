"""Chat template formatter goldens (reference: tests/test-chat-template.cpp
and src/llama-chat.cpp llm_chat_apply_template).

Golden strings below are derived from the reference formatters' string
construction for the shared 4-message conversation.
"""

import pytest

from zllm.server.chat import FORMATS, apply_chat_template, detect_format

MSGS = [
    {"role": "system", "content": "You are a helpful assistant"},
    {"role": "user", "content": "Hello"},
    {"role": "assistant", "content": "Hi there"},
    {"role": "user", "content": "Who are you"},
]


class _FakeModel:
    def __init__(self, template="", arch="llama"):
        self.chat_template = template
        self.cfg = type("C", (), {"arch": arch})()


GOLDENS = {
    "chatml": (
        "<|im_start|>system\nYou are a helpful assistant<|im_end|>\n"
        "<|im_start|>user\nHello<|im_end|>\n"
        "<|im_start|>assistant\nHi there<|im_end|>\n"
        "<|im_start|>user\nWho are you<|im_end|>\n"
        "<|im_start|>assistant\n"
    ),
    "llama2-sys": (
        "[INST] <<SYS>>\nYou are a helpful assistant\n<</SYS>>\n\n"
        "Hello [/INST]Hi there</s>[INST] Who are you [/INST]"
    ),
    "mistral-v7": (
        "[SYSTEM_PROMPT] You are a helpful assistant[/SYSTEM_PROMPT]"
        "[INST] Hello[/INST] Hi there</s>[INST] Who are you[/INST]"
    ),
    "mistral-v3": (
        "[INST] You are a helpful assistant\n\nHello[/INST] Hi there</s>"
        "[INST] Who are you[/INST]"
    ),
    "phi3": (
        "<|system|>\nYou are a helpful assistant<|end|>\n<|user|>\nHello<|end|>\n"
        "<|assistant|>\nHi there<|end|>\n<|user|>\nWho are you<|end|>\n<|assistant|>\n"
    ),
    "phi4": (
        "<|im_start|>system<|im_sep|>You are a helpful assistant<|im_end|>"
        "<|im_start|>user<|im_sep|>Hello<|im_end|>"
        "<|im_start|>assistant<|im_sep|>Hi there<|im_end|>"
        "<|im_start|>user<|im_sep|>Who are you<|im_end|>"
        "<|im_start|>assistant<|im_sep|>"
    ),
    "zephyr": (
        "<|system|>\nYou are a helpful assistant<|endoftext|>\n"
        "<|user|>\nHello<|endoftext|>\n<|assistant|>\nHi there<|endoftext|>\n"
        "<|user|>\nWho are you<|endoftext|>\n<|assistant|>\n"
    ),
    "gemma": (
        "<start_of_turn>user\nYou are a helpful assistant\n\nHello<end_of_turn>\n"
        "<start_of_turn>model\nHi there<end_of_turn>\n"
        "<start_of_turn>user\nWho are you<end_of_turn>\n<start_of_turn>model\n"
    ),
    "vicuna": (
        "You are a helpful assistant\n\nUSER: Hello\nASSISTANT: Hi there</s>\n"
        "USER: Who are you\nASSISTANT:"
    ),
    "deepseek3": (
        "You are a helpful assistant\n\n<｜User｜>Hello<｜Assistant｜>Hi there"
        "<｜end▁of▁sentence｜><｜User｜>Who are you<｜Assistant｜>"
    ),
    "command-r": (
        "<|START_OF_TURN_TOKEN|><|SYSTEM_TOKEN|>You are a helpful assistant<|END_OF_TURN_TOKEN|>"
        "<|START_OF_TURN_TOKEN|><|USER_TOKEN|>Hello<|END_OF_TURN_TOKEN|>"
        "<|START_OF_TURN_TOKEN|><|CHATBOT_TOKEN|>Hi there<|END_OF_TURN_TOKEN|>"
        "<|START_OF_TURN_TOKEN|><|USER_TOKEN|>Who are you<|END_OF_TURN_TOKEN|>"
        "<|START_OF_TURN_TOKEN|><|CHATBOT_TOKEN|>"
    ),
    "rwkv-world": (
        "System: You are a helpful assistant\n\nUser: Hello\n\nAssistant: Hi there\n\n"
        "User: Who are you\n\nAssistant:"
    ),
    "granite": (
        "<|start_of_role|>system<|end_of_role|>You are a helpful assistant<|end_of_text|>\n"
        "<|start_of_role|>user<|end_of_role|>Hello<|end_of_text|>\n"
        "<|start_of_role|>assistant<|end_of_role|>Hi there<|end_of_text|>\n"
        "<|start_of_role|>user<|end_of_role|>Who are you<|end_of_text|>\n"
        "<|start_of_role|>assistant<|end_of_role|>"
    ),
    "gpt-oss": (
        "<|start|>system<|message|>You are a helpful assistant<|end|>"
        "<|start|>user<|message|>Hello<|end|>"
        "<|start|>assistant<|message|>Hi there<|return|>"
        "<|start|>user<|message|>Who are you<|end|>"
        "<|start|>assistant"
    ),
    "kimi-k2": (
        "<|im_system|>system<|im_middle|>You are a helpful assistant<|im_end|>"
        "<|im_user|>user<|im_middle|>Hello<|im_end|>"
        "<|im_assistant|>assistant<|im_middle|>Hi there<|im_end|>"
        "<|im_user|>user<|im_middle|>Who are you<|im_end|>"
        "<|im_assistant|>assistant<|im_middle|>"
    ),
    "exaone3": (
        "[|system|]You are a helpful assistant[|endofturn|]\n[|user|]Hello\n"
        "[|assistant|]Hi there[|endofturn|]\n[|user|]Who are you\n[|assistant|]"
    ),
    "chatglm4": (
        "[gMASK]<sop><|system|>\nYou are a helpful assistant<|user|>\nHello"
        "<|assistant|>\nHi there<|user|>\nWho are you<|assistant|>\n"
    ),
    "solar-open": (
        "<|begin|>system<|content|>You are a helpful assistant<|end|>"
        "<|begin|>user<|content|>Hello<|end|>"
        "<|begin|>assistant<|content|>Hi there<|end|>"
        "<|begin|>user<|content|>Who are you<|end|>"
        "<|begin|>assistant"
    ),
}


@pytest.mark.parametrize("fmt", sorted(GOLDENS))
def test_format_goldens(fmt):
    model = _FakeModel()
    got = apply_chat_template(model, MSGS, fmt=fmt)
    assert got == GOLDENS[fmt], f"{fmt}:\n{got!r}\n!=\n{GOLDENS[fmt]!r}"


def test_registry_covers_reference_formats():
    """Every named format the reference registers (src/llama-chat.cpp
    LLM_CHAT_TEMPLATES) has a working formatter here."""
    assert len(FORMATS) >= 45
    for name, fn in FORMATS.items():
        out = fn(MSGS, True)
        assert isinstance(out, str) and out, name


DETECT_CASES = [
    # (jinja fragment, expected format)
    ("{% for m %}<|im_start|>{{m.role}}...<|im_end|>", "chatml"),
    ("<|im_start|>{{role}}<|im_sep|>{{content}}<|im_end|>", "phi4"),
    ("{{bos}}[INST] <<SYS>> {{sys}} <</SYS>> [/INST]", "llama2-sys"),
    ("[INST] {{c}} [/INST] {{x}} [AVAILABLE_TOOLS]", "mistral-v3"),
    ("[SYSTEM_PROMPT]{{s}}[/SYSTEM_PROMPT][INST]{{u}}[/INST]", "mistral-v7"),
    ("<|assistant|>{{c}}<|end|>", "phi3"),
    ("[gMASK]<sop><|user|>", "chatglm4"),
    ("<|user|>\n{{c}}<|endoftext|>", "zephyr"),
    ("<start_of_turn>user {{c}}<end_of_turn>", "gemma"),
    ("USER: {{c}}\nASSISTANT: {{r}}", "vicuna"),
    ("SYSTEM: {{s}} USER: {{c}} ASSISTANT: {{r}}", "vicuna-orca"),
    ("### Instruction:\n{{c}}<|EOT|>", "deepseek"),
    ("<|START_OF_TURN_TOKEN|><|USER_TOKEN|>{{c}}", "command-r"),
    ("<|start_header_id|>user<|end_header_id|>{{c}}<|eot_id|>", "llama3"),
    ("<|header_start|>user<|header_end|>{{c}}<|eot|>", "llama4"),
    ("<｜User｜>{{c}}<｜Assistant｜>{{r}}<｜end▁of▁sentence｜>", "deepseek3"),
    ("[|system|]{{s}}[|endofturn|] [|user|] [|assistant|]", "exaone3"),
    ("<|start_of_role|>user<|end_of_role|>", "granite"),
    ("<|role_start|>user<|role_end|>", "megrez"),
    ("{{c}} Ассистент:", "yandex"),
    ("<seed:bos>user\n{{c}}<seed:eos>", "seed-oss"),
    ("<|start|>{{role}}<|channel|>{{ch}}<|message|>", "gpt-oss"),
    ("<|im_assistant|>assistant<|im_middle|>{{c}}", "kimi-k2"),
    ("[unused9]系统：[unused10]{{c}}", "pangu"),
    ("<|begin|>user<|content|>{{c}}<|end|>", "solar-open"),
    ("<|userprompt|>{{c}}<|endofuserprompt|>", "dots1"),
    ("<|startoftext|>{{c}}<|extra_0|>{{r}}<|extra_4|>", "hunyuan-moe"),
]


@pytest.mark.parametrize("tmpl,want", DETECT_CASES)
def test_detect_format(tmpl, want):
    assert detect_format(_FakeModel(template=tmpl)) == want


def test_detect_named_and_arch_fallbacks():
    assert detect_format(_FakeModel(template="mistral-v7-tekken")) == "mistral-v7-tekken"
    assert detect_format(_FakeModel(arch="gemma3")) == "gemma"
    assert detect_format(_FakeModel(arch="qwen2")) == "chatml"
    assert detect_format(_FakeModel(arch="rwkv6")) == "rwkv-world"
    assert detect_format(_FakeModel(arch="llama")) == "llama3"


CHATML_JINJA = (
    "{% for message in messages %}"
    "{{'<|im_start|>' + message['role'] + '\n' + message['content'] + '<|im_end|>' + '\n'}}"
    "{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}{% endif %}"
)


def test_jinja_rendering_matches_builtin():
    """--jinja mode evaluates the embedded template with a real engine
    (reference: common/jinja minja evaluation); for a known chatml
    template the output must equal the builtin formatter's."""
    m = _FakeModel(template=CHATML_JINJA)
    m.tokenizer = None
    got = apply_chat_template(m, MSGS, jinja=True)
    want = apply_chat_template(m, MSGS, fmt="chatml")
    assert got == want


def test_jinja_bos_token_and_exception_fallback():
    from zllm.server.chat import render_jinja

    class _Tok:
        class vocab:
            tokens = ["<unk>", "<s>", "</s>"]
            bos_id = 1
            eos_id = 2

    m = _FakeModel(template="{{ bos_token }}{% for m in messages %}{{ m['content'] }}{% endfor %}{{ eos_token }}")
    m.tokenizer = _Tok()
    out = render_jinja(m, [{"role": "user", "content": "x"}])
    assert out == "<s>x</s>"

    # raise_exception inside the template -> apply falls back to builtin
    m2 = _FakeModel(template="{{ raise_exception('nope') }}", arch="qwen2")
    m2.tokenizer = None
    got = apply_chat_template(m2, MSGS, jinja=True)
    assert "<|im_start|>" in got  # chatml arch fallback
