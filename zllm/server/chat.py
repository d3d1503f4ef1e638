"""Built-in chat template formatters.

The analogue of the reference's llama_chat_apply_template (reference:
src/llama-chat.cpp llm_chat_detect_template / llm_chat_apply_template,
~45 formats): a registry of common formats selected by sniffing the GGUF
tokenizer.chat_template jinja source (the same marker heuristics the
reference uses — it never evaluates jinja either) or arch defaults.
"""

from __future__ import annotations


def detect_format(model) -> str:
    """Map the model's raw jinja template to a named builtin format
    (reference: llm_chat_detect_template's substring heuristics)."""
    tmpl = getattr(model, "chat_template", "") or ""
    arch = model.cfg.arch
    if "<|im_start|>" in tmpl:
        return "chatml"
    if "<|start_header_id|>" in tmpl:
        return "llama3"
    if "<|START_OF_TURN_TOKEN|>" in tmpl:
        return "command-r"
    if "<|start_of_turn|>" in tmpl or "<start_of_turn>" in tmpl:
        return "gemma"
    if "<｜User｜>" in tmpl or "<｜Assistant｜>" in tmpl:
        return "deepseek3"
    if "<|end|>" in tmpl and "<|assistant|>" in tmpl:
        return "phi3"
    if "</s>" in tmpl and "<|user|>" in tmpl:
        return "zephyr"
    if "<|user|>" in tmpl and "<|assistant|>" in tmpl:
        return "falcon3"
    if "[INST]" in tmpl:
        return "llama2"
    if "USER:" in tmpl and "ASSISTANT:" in tmpl:
        return "vicuna"
    # arch fallbacks when no template is embedded
    if arch.startswith("gemma"):
        return "gemma"
    if arch.startswith(("qwen", "phi")) and arch.startswith("phi"):
        return "phi3"
    if arch.startswith("qwen"):
        return "chatml"
    if arch.startswith("deepseek"):
        return "deepseek3"
    if arch == "llama":
        return "llama3"
    return "chatml"


def _system_merged(messages):
    """(system_text, non-system messages) for formats without a system role."""
    system = "\n".join(m["content"] for m in messages if m["role"] == "system")
    return system, [m for m in messages if m["role"] != "system"]


def apply_chat_template(model, messages: list[dict], fmt: str | None = None, add_assistant: bool = True) -> str:
    fmt = fmt or detect_format(model)
    out: list[str] = []
    if fmt == "chatml":
        for msg in messages:
            out.append(f"<|im_start|>{msg['role']}\n{msg['content']}<|im_end|>\n")
        if add_assistant:
            out.append("<|im_start|>assistant\n")
    elif fmt == "llama3":
        out.append("<|begin_of_text|>")
        for msg in messages:
            out.append(f"<|start_header_id|>{msg['role']}<|end_header_id|>\n\n{msg['content']}<|eot_id|>")
        if add_assistant:
            out.append("<|start_header_id|>assistant<|end_header_id|>\n\n")
    elif fmt == "llama2":
        system = ""
        for msg in messages:
            if msg["role"] == "system":
                system = msg["content"]
        first = True
        for msg in messages:
            if msg["role"] == "user":
                content = msg["content"]
                if first and system:
                    content = f"<<SYS>>\n{system}\n<</SYS>>\n\n{content}"
                    first = False
                out.append(f"[INST] {content} [/INST]")
            elif msg["role"] == "assistant":
                out.append(f" {msg['content']} ")
    elif fmt == "gemma":
        for msg in messages:
            role = "model" if msg["role"] == "assistant" else "user"
            out.append(f"<start_of_turn>{role}\n{msg['content']}<end_of_turn>\n")
        if add_assistant:
            out.append("<start_of_turn>model\n")
    elif fmt == "phi3":
        for msg in messages:
            out.append(f"<|{msg['role']}|>\n{msg['content']}<|end|>\n")
        if add_assistant:
            out.append("<|assistant|>\n")
    elif fmt == "zephyr":
        for msg in messages:
            out.append(f"<|{msg['role']}|>\n{msg['content']}</s>\n")
        if add_assistant:
            out.append("<|assistant|>\n")
    elif fmt == "falcon3":
        for msg in messages:
            out.append(f"<|{msg['role']}|>\n{msg['content']}\n")
        if add_assistant:
            out.append("<|assistant|>\n")
    elif fmt == "vicuna":
        for msg in messages:
            if msg["role"] == "system":
                out.append(f"{msg['content']}\n\n")
            elif msg["role"] == "user":
                out.append(f"USER: {msg['content']}\n")
            else:
                out.append(f"ASSISTANT: {msg['content']}</s>\n")
        if add_assistant:
            out.append("ASSISTANT:")
    elif fmt == "deepseek3":
        system, rest = _system_merged(messages)
        if system:
            out.append(system)
        for msg in rest:
            if msg["role"] == "user":
                out.append(f"<｜User｜>{msg['content']}")
            else:
                out.append(f"<｜Assistant｜>{msg['content']}<｜end▁of▁sentence｜>")
        if add_assistant:
            out.append("<｜Assistant｜>")
    elif fmt == "command-r":
        for msg in messages:
            role = {"system": "SYSTEM", "user": "USER", "assistant": "CHATBOT"}.get(msg["role"], "USER")
            out.append(
                f"<|START_OF_TURN_TOKEN|><|{role}_TOKEN|>{msg['content'].strip()}<|END_OF_TURN_TOKEN|>"
            )
        if add_assistant:
            out.append("<|START_OF_TURN_TOKEN|><|CHATBOT_TOKEN|>")
    else:
        for msg in messages:
            out.append(f"{msg['role']}: {msg['content']}\n")
        if add_assistant:
            out.append("assistant: ")
    return "".join(out)
