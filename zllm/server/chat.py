"""Built-in chat template formatters.

The analogue of the reference's llama_chat_apply_template (reference:
src/llama-chat.cpp, ~45 formats): a registry of common formats selected
from GGUF metadata (tokenizer.chat_template heuristics) or arch defaults.
Full Jinja evaluation is intentionally out of scope; these canonical
formats cover the llama/qwen/gemma/chatml families.
"""

from __future__ import annotations


def detect_format(model) -> str:
    # GGUF may carry the raw jinja template; sniff well-known markers
    tmpl = ""
    try:
        # metadata travels on the config only via arch; tokenizer may hold it
        tmpl = getattr(model, "chat_template", "") or ""
    except Exception:
        pass
    arch = model.cfg.arch
    if "<|im_start|>" in tmpl:
        return "chatml"
    if "<|start_header_id|>" in tmpl:
        return "llama3"
    if "[INST]" in tmpl:
        return "llama2"
    if "<start_of_turn>" in tmpl or arch.startswith("gemma"):
        return "gemma"
    if arch.startswith("qwen"):
        return "chatml"
    if arch == "llama":
        return "llama3"
    return "chatml"


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
    else:
        for msg in messages:
            out.append(f"{msg['role']}: {msg['content']}\n")
        if add_assistant:
            out.append("assistant: ")
    return "".join(out)
