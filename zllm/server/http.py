"""OpenAI-compatible HTTP server over the continuous-batching engine.

The counterpart of tools/server (reference: server-http.cpp + README
endpoint list): /v1/completions, /v1/chat/completions (+streaming SSE),
/completion (llama.cpp native), /tokenize, /detokenize, /health, /props,
/v1/models, /metrics (Prometheus).  Stdlib ThreadingHTTPServer — requests
block on per-request queues fed by the engine thread.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .chat import apply_chat_template
from .engine import Engine, Request


def _sse(obj) -> bytes:
    return b"data: " + json.dumps(obj).encode() + b"\n\n"


def _extract_media(msgs: list) -> tuple[list, list]:
    """Replace image content parts with media markers; returns the
    rewritten messages and the raw image bytes in order of appearance
    (OpenAI `image_url` data URIs / Anthropic base64 `image` blocks)."""
    from ..mtmd.media import DEFAULT_MARKER, decode_media_part

    media: list = []  # [(kind, bytes)]
    out = []
    for m in msgs:
        content = m.get("content", "")
        if not isinstance(content, list):
            out.append(m)
            continue
        pieces = []
        for part in content:
            if not isinstance(part, dict):
                continue
            if part.get("type") in ("image_url", "image", "input_audio"):
                media.append(decode_media_part(part))
                pieces.append(DEFAULT_MARKER)
            elif part.get("type") == "text":
                pieces.append(part.get("text", ""))
        out.append({**m, "content": "".join(pieces)})
    return out, media


class ZllmServer:
    def __init__(self, model, n_slots: int = 4, max_len: int = 2048, host="127.0.0.1", port=8080,
                 slot_save_path: str = "", speculative: bool = False, n_draft: int = 6,
                 kv_layout: str = "auto", draft_model=None, jinja: bool = False,
                 tp: int = 1, dp: int = 1, pp: int = 1, kv_dtype=None,
                 mmproj: str = "", lookahead: bool = False):
        self.model = model
        self.jinja = jinja
        self.clip = None
        if mmproj:  # multimodal: vision/audio encoders for content parts
            from ..mtmd import MtmdModel

            self.clip = MtmdModel(mmproj)
        self.engine = Engine(model, n_slots=n_slots, max_len=max_len,
                             speculative=speculative, n_draft=n_draft, kv_layout=kv_layout,
                             draft_model=draft_model, tp=tp, dp=dp, pp=pp,
                             kv_dtype=kv_dtype, lookahead=lookahead)
        self.slot_save_path = slot_save_path
        self.host = host
        self.port = port
        self.httpd: ThreadingHTTPServer | None = None
        self._t0 = time.time()
        self._embed_fn = None
        self._rank_fn = None

    # -- request building ---------------------------------------------------
    def _make_request(self, body: dict, prompt_tokens: list[int],
                      grammar=None) -> Request:
        tok = self.model.tokenizer
        stop_tokens = {tok.eos_id} if tok and tok.eos_id >= 0 else set()
        gbnf = None if grammar is not None else body.get("grammar")
        schema = body.get("json_schema") or (
            body.get("response_format", {}).get("json_schema", {}).get("schema")
            if isinstance(body.get("response_format"), dict) else None
        )
        if schema is not None and gbnf is None:
            from ..grammar import json_schema_to_gbnf

            gbnf = json_schema_to_gbnf(schema)
        if gbnf:
            from ..grammar import parse_gbnf
            from ..grammar.gbnf import GrammarSampler

            grammar = GrammarSampler(parse_gbnf(gbnf), tok)
        stop = body.get("stop", body.get("stop_strings", []))
        if isinstance(stop, str):
            stop = [stop]
        return Request(
            grammar=grammar,
            prompt_tokens=prompt_tokens,
            max_new=int(body.get("max_tokens", body.get("n_predict", 128))),
            temp=float(body.get("temperature", 0.8)),
            top_k=int(body.get("top_k", 40)),
            top_p=float(body.get("top_p", 0.95)),
            min_p=float(body.get("min_p", 0.05)),
            typical_p=float(body.get("typical_p", body.get("typ_p", 1.0))),
            top_n_sigma=float(body.get("top_n_sigma", 0.0)),
            xtc_probability=float(body.get("xtc_probability", 0.0)),
            xtc_threshold=float(body.get("xtc_threshold", 0.1)),
            dry_multiplier=float(body.get("dry_multiplier", 0.0)),
            dry_base=float(body.get("dry_base", 1.75)),
            dry_allowed_length=int(body.get("dry_allowed_length", 2)),
            dynatemp_range=float(body.get("dynatemp_range", 0.0)),
            dynatemp_exponent=float(body.get("dynatemp_exponent", 1.0)),
            mirostat=int(body.get("mirostat", 0)),
            mirostat_tau=float(body.get("mirostat_tau", 5.0)),
            mirostat_eta=float(body.get("mirostat_eta", 0.1)),
            repeat_penalty=float(body.get("repeat_penalty", 1.0)),
            freq_penalty=float(body.get("frequency_penalty", 0.0)),
            presence_penalty=float(body.get("presence_penalty", 0.0)),
            seed=int(body.get("seed", -1)),
            n_keep=int(body.get("n_keep", 0)),
            stop_tokens=frozenset(stop_tokens),
            stop_strings=tuple(stop),
        )

    def embed(self, text: str):
        """L2-normalized pooled embedding.  Encoder models (bert family)
        run the bidirectional encoder with their GGUF pooling type;
        decoder models mean-pool the final hidden state (reference:
        /embeddings with --pooling)."""
        import jax
        import numpy as np

        tok = self.model.tokenizer
        cfg = self.model.cfg
        ids = tok.encode(text, add_special=True)[: self.engine.max_len - 1]
        n = len(ids)
        toks = np.asarray(ids, np.int32)[None]
        pos = np.arange(n, dtype=np.int32)[None]

        if cfg.is_encoder:
            from ..models.bert import bert_forward, pool

            if self._embed_fn is None:
                self._embed_fn = jax.jit(
                    lambda p, t, q: bert_forward(p, cfg, t, q)
                )
            h = self._embed_fn(self.model.params, toks, pos)
            v = np.asarray(pool(h, cfg.pooling if cfg.pooling != "none" else "mean"))[0]
            return v / (np.linalg.norm(v) + 1e-9)

        from ..models.llama import forward

        if self._embed_fn is None:
            def fn(params, toks, pos):
                taps = {}
                forward(params, cfg, toks, pos, None, taps=taps)
                return taps["hidden"]

            self._embed_fn = jax.jit(fn)
        h = np.asarray(self._embed_fn(self.model.params, toks, pos))[0]
        v = h.mean(axis=0)
        return v / (np.linalg.norm(v) + 1e-9)

    def rerank_scores(self, query: str, docs: list[str]) -> list[float]:
        """Cross-encoder relevance: each (query, doc) pair runs through the
        encoder jointly and the rank head scores it (reference: /rerank
        with a LLAMA_POOLING_TYPE_RANK model, build_pooling cls head).
        Falls back to embedding dot products for decoder-only models."""
        import jax
        import numpy as np

        cfg = self.model.cfg
        tok = self.model.tokenizer
        if not cfg.is_encoder:
            q = self.embed(query)
            return [float(np.dot(q, self.embed(d))) for d in docs]

        from ..models.bert import bert_forward, rank_score

        if self._rank_fn is None:
            self._rank_fn = jax.jit(
                lambda p, t, q: rank_score(p, bert_forward(p, cfg, t, q))
            )
        v = tok.vocab
        out = []
        qi = tok.encode(query)
        for doc in docs:
            # [CLS] query [SEP] doc [SEP] (the reference's rank prompt)
            ids = [v.bos_id] + qi + [v.eos_id] + tok.encode(doc) + [v.eos_id]
            ids = [i for i in ids if i >= 0][: self.engine.max_len]
            toks = np.asarray(ids, np.int32)[None]
            pos = np.arange(len(ids), dtype=np.int32)[None]
            out.append(float(np.asarray(self._rank_fn(self.model.params, toks, pos))[0]))
        return out

    def serve_forever(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):
                pass

            def _json(self, code: int, obj):
                data = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _read_body(self) -> dict:
                n = int(self.headers.get("Content-Length", 0))
                return json.loads(self.rfile.read(n) or b"{}")

            # ---- GET ----
            def do_GET(self):
                if self.path == "/health":
                    self._json(200, {"status": "ok"})
                elif self.path == "/v1/models":
                    self._json(200, {
                        "object": "list",
                        "data": [{"id": server.model.path or "model", "object": "model",
                                  "created": int(server._t0), "owned_by": "zllm"}],
                    })
                elif self.path == "/props":
                    cfg = server.model.cfg
                    self._json(200, {
                        "model_path": server.model.path,
                        "n_ctx": server.engine.max_len,
                        "n_slots": server.engine.n_slots,
                        "arch": cfg.arch,
                        "n_params_shape": {"layers": cfg.n_layers, "embd": cfg.n_embd},
                    })
                elif self.path == "/slots":
                    self._json(200, server.engine.slot_info())
                elif self.path == "/metrics":
                    m = server.engine.metrics_view()
                    lines = []
                    for k, v in m.items():
                        lines.append(f"# TYPE zllm_{k} counter")
                        lines.append(f"zllm_{k} {v}")
                    for name, h in (
                        ("zllm_time_to_first_token_seconds", server.engine.hist_ttft),
                        ("zllm_inter_token_latency_seconds", server.engine.hist_per_token),
                        ("zllm_request_duration_seconds", server.engine.hist_request),
                    ):
                        lines.append(f"# TYPE {name} histogram")
                        lines.append(h.prometheus(name))
                    data = ("\n".join(lines) + "\n").encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/plain; version=0.0.4")
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                else:
                    self._json(404, {"error": "not found"})

            # ---- POST ----
            def do_POST(self):
                try:
                    body = self._read_body()
                    if self.path in ("/v1/completions", "/completion", "/completions"):
                        self._completion(body, chat=False)
                    elif self.path == "/v1/chat/completions":
                        self._completion(body, chat=True)
                    elif self.path == "/v1/messages":
                        self._anthropic_messages(body)
                    elif self.path == "/v1/messages/count_tokens":
                        self._anthropic_count(body)
                    elif self.path in ("/embeddings", "/v1/embeddings"):
                        self._embeddings(body)
                    elif self.path in ("/rerank", "/v1/rerank"):
                        self._rerank(body)
                    elif self.path == "/tokenize":
                        ids = server.model.tokenizer.encode(
                            body.get("content", ""), add_special=bool(body.get("add_special", False)),
                            parse_special=bool(body.get("parse_special", False)),
                        )
                        self._json(200, {"tokens": ids})
                    elif self.path == "/detokenize":
                        text = server.model.tokenizer.decode(body.get("tokens", []))
                        self._json(200, {"content": text})
                    elif self.path == "/apply-template":
                        text = apply_chat_template(
                            server.model, body.get("messages", []),
                            add_assistant=bool(body.get("add_generation_prompt", True)),
                            jinja=server.jinja or bool(body.get("jinja", False)),
                        )
                        self._json(200, {"prompt": text})
                    elif self.path == "/infill":
                        self._infill(body)
                    elif self.path.startswith("/slots/"):
                        self._slot_action(body)
                    else:
                        self._json(404, {"error": "not found"})
                except BrokenPipeError:
                    pass
                except Exception as e:  # noqa: BLE001
                    try:
                        self._json(500, {"error": {"message": str(e), "type": type(e).__name__}})
                    except Exception:
                        pass

            def _embeddings(self, body):
                inputs = body.get("input", body.get("content", ""))
                if isinstance(inputs, str):
                    inputs = [inputs]
                vecs = [server.embed(t).tolist() for t in inputs]
                self._json(200, {
                    "object": "list", "model": "zllm",
                    "data": [{"object": "embedding", "index": i, "embedding": v}
                             for i, v in enumerate(vecs)],
                    "usage": {"prompt_tokens": 0, "total_tokens": 0},
                })

            def _rerank(self, body):
                docs = body.get("documents", body.get("texts", []))
                vals = server.rerank_scores(body["query"], docs)
                scores = [
                    {"index": i, "relevance_score": v} for i, v in enumerate(vals)
                ]
                scores.sort(key=lambda s: -s["relevance_score"])
                self._json(200, {"model": "zllm", "results": scores})

            def _infill(self, body: dict):
                """Fill-in-the-middle completion (reference: tools/server
                /infill endpoint, README.md:424-470): builds the FIM prompt
                <fim_pre>prefix<fim_suf>suffix<fim_mid> from the vocab's FIM
                special ids and decodes from there."""
                tok = server.model.tokenizer
                v = tok.vocab
                if v.fim_pre_id < 0 or v.fim_suf_id < 0 or v.fim_mid_id < 0:
                    self._json(501, {"error": "model lacks FIM tokens (infill unsupported)"})
                    return
                prefix = body.get("input_prefix", body.get("prompt", ""))
                suffix = body.get("input_suffix", "")
                ids = [v.fim_pre_id] + tok.encode(prefix) + [v.fim_suf_id] + tok.encode(suffix) + [v.fim_mid_id]
                if v.add_bos and v.bos_id >= 0:
                    ids = [v.bos_id] + ids
                req = server._make_request(body, ids)
                if v.eot_id >= 0:
                    req.stop_tokens = frozenset(set(req.stop_tokens) | {v.eot_id})
                server.engine.submit(req)
                while req.stream_q.get() is not None:
                    pass
                out_text = tok.decode(req.out_tokens)
                self._json(200, {
                    "content": out_text,
                    "tokens_predicted": len(req.out_tokens),
                    "stop_type": req.finish_reason,
                })

            def _slot_action(self, body: dict):
                """POST /slots/{id}?action=save|restore|erase (reference:
                tools/server README slots endpoints over state files)."""
                import urllib.parse as _up

                path, _, query = self.path.partition("?")
                idx = int(path.rsplit("/", 1)[1])
                action = _up.parse_qs(query).get("action", [""])[0]
                if not 0 <= idx < server.engine.n_slots:
                    self._json(400, {"error": "invalid slot id"})
                    return
                import os as _os

                fname = body.get("filename", f"slot{idx}.bin")
                fpath = _os.path.join(server.slot_save_path or ".", _os.path.basename(fname))
                if action == "save":
                    self._json(200, server.engine.save_slot(idx, fpath))
                elif action == "restore":
                    self._json(200, server.engine.restore_slot(idx, fpath, body.get("tokens")))
                elif action == "erase":
                    self._json(200, server.engine.erase_slot(idx))
                else:
                    self._json(400, {"error": f"unknown action {action!r}"})

            # -- Anthropic Messages API (reference: tools/server
            # README.md:1306-1377 /v1/messages + count_tokens) ------------
            def _anthropic_prompt(self, body: dict):
                msgs = []
                system = body.get("system")
                if system:
                    if isinstance(system, list):  # content blocks
                        system = "".join(b.get("text", "") for b in system)
                    msgs.append({"role": "system", "content": system})
                for m in body.get("messages", []):
                    content = m.get("content", "")
                    if isinstance(content, list):
                        content = "".join(
                            b.get("text", "") for b in content if b.get("type") == "text"
                        )
                    msgs.append({"role": m.get("role", "user"), "content": content})
                tok = server.model.tokenizer
                text = apply_chat_template(server.model, msgs, jinja=server.jinja)
                ids = tok.encode(text, add_special=True, parse_special=True)
                if len(ids) >= 2 and ids[0] == tok.bos_id and ids[1] == tok.bos_id:
                    ids = ids[1:]
                return ids

            def _anthropic_count(self, body: dict):
                self._json(200, {"input_tokens": len(self._anthropic_prompt(body))})

            def _anthropic_messages(self, body: dict):
                ids = self._anthropic_prompt(body)
                oai_body = {
                    "max_tokens": body.get("max_tokens", 4096),
                    "temperature": body.get("temperature", 1.0),
                    "top_p": body.get("top_p", 1.0),
                    "top_k": body.get("top_k", 0),
                    "stop": body.get("stop_sequences", []),
                }
                req = server._make_request(oai_body, ids)
                server.engine.submit(req)
                mid = "msg_" + req.rid
                model_name = body.get("model", "zllm")
                stop_map = {"stop": "end_turn", "length": "max_tokens"}

                if not body.get("stream", False):
                    while req.stream_q.get() is not None:
                        pass
                    text = server.model.tokenizer.decode(req.out_tokens)
                    stop_reason = stop_map.get(req.finish_reason, "end_turn")
                    for ss in req.stop_strings:
                        i = text.find(ss)
                        if i >= 0:
                            text, stop_reason = text[:i], "stop_sequence"
                            break
                    self._json(200, {
                        "id": mid, "type": "message", "role": "assistant",
                        "model": model_name,
                        "content": [{"type": "text", "text": text}],
                        "stop_reason": stop_reason, "stop_sequence": None,
                        "usage": {"input_tokens": len(ids),
                                  "output_tokens": len(req.out_tokens)},
                    })
                    return

                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()

                def chunked(data: bytes):
                    self.wfile.write(f"{len(data):x}\r\n".encode() + data + b"\r\n")

                def ev(name: str, obj: dict):
                    chunked(f"event: {name}\ndata: {json.dumps(obj)}\n\n".encode())

                ev("message_start", {"type": "message_start", "message": {
                    "id": mid, "type": "message", "role": "assistant",
                    "model": model_name, "content": [],
                    "stop_reason": None, "stop_sequence": None,
                    "usage": {"input_tokens": len(ids), "output_tokens": 0}}})
                ev("content_block_start", {"type": "content_block_start", "index": 0,
                                           "content_block": {"type": "text", "text": ""}})
                from ..tokenizer import IncrementalDecoder

                inc = IncrementalDecoder(server.model.tokenizer)
                while True:
                    t = req.stream_q.get()
                    piece = inc.flush() if t is None else inc.push(t)
                    if piece:
                        ev("content_block_delta", {"type": "content_block_delta", "index": 0,
                                                   "delta": {"type": "text_delta", "text": piece}})
                    if t is None:
                        break
                ev("content_block_stop", {"type": "content_block_stop", "index": 0})
                ev("message_delta", {"type": "message_delta",
                                     "delta": {"stop_reason": stop_map.get(req.finish_reason, "end_turn"),
                                               "stop_sequence": None},
                                     "usage": {"output_tokens": len(req.out_tokens)}})
                ev("message_stop", {"type": "message_stop"})
                chunked(b"")

            def _completion(self, body: dict, chat: bool):
                tok = server.model.tokenizer
                tools = body.get("tools") or []
                tool_choice = body.get("tool_choice", "auto")
                tools_on = bool(chat and tools and tool_choice != "none")
                grammar_obj = None
                media_imgs: list = []
                if chat:
                    msgs = body.get("messages", [])
                    if server.clip is not None:
                        msgs, media_imgs = _extract_media(msgs)
                    if tools_on:
                        from .toolcall import make_tool_grammar, prepare_messages

                        msgs = prepare_messages(msgs, tools)
                        only = None
                        forced = tool_choice == "required"
                        if isinstance(tool_choice, dict):
                            only = tool_choice.get("function", {}).get("name")
                            forced = True
                        grammar_obj = make_tool_grammar(
                            tools, tok, only=only, lazy=not forced
                        )
                    text = apply_chat_template(server.model, msgs, jinja=server.jinja)
                else:
                    text = body.get("prompt", "")
                if isinstance(text, list):
                    text = "".join(text)
                media = []
                if media_imgs:
                    from ..mtmd.media import tokenize_with_media

                    embeds = [server.clip.encode_media(kind, b)
                              for kind, b in media_imgs]
                    ids, media = tokenize_with_media(tok, text, embeds)
                else:
                    ids = tok.encode(text, add_special=True, parse_special=True)
                # chat templates that render their own BOS (llama3's
                # <|begin_of_text|>) would otherwise double it — the case
                # the reference explicitly warns about
                if len(ids) >= 2 and ids[0] == tok.bos_id and ids[1] == tok.bos_id:
                    ids = ids[1:]
                    media = [(s - 1, e) for s, e in media]
                req = server._make_request(body, ids, grammar=grammar_obj)
                req.media = media
                stream = bool(body.get("stream", False))
                server.engine.submit(req)

                created = int(time.time())
                oid = ("chatcmpl-" if chat else "cmpl-") + req.rid
                if stream:
                    self.send_response(200)
                    self.send_header("Content-Type", "text/event-stream")
                    self.send_header("Cache-Control", "no-cache")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()

                    def chunked(data: bytes):
                        self.wfile.write(f"{len(data):x}\r\n".encode() + data + b"\r\n")

                    from ..tokenizer import IncrementalDecoder

                    inc = IncrementalDecoder(tok)
                    sent = 0
                    done = False
                    # stop-string holdback: never emit the tail that could
                    # be a prefix of a stop string (reference: server
                    # "stopping_word" partial-match buffering).  With tools
                    # enabled, <tool_call> is held back the same way: the
                    # block is buffered whole and parsed at the end.
                    from .toolcall import TOOL_OPEN

                    holds = list(req.stop_strings)
                    if tools_on:
                        holds.append(TOOL_OPEN)
                    holdback = max((len(s) for s in holds), default=1) - 1
                    pending = ""
                    stopped = False
                    tc_buf = ""
                    while not done:
                        t = req.stream_q.get()
                        done = t is None
                        if stopped:
                            continue
                        pending += inc.flush() if done else inc.push(t)
                        if tc_buf:
                            tc_buf += pending
                            pending = ""
                            continue
                        hit = min((i for i in (pending.find(s) for s in req.stop_strings) if i >= 0),
                                  default=-1)
                        thit = pending.find(TOOL_OPEN) if tools_on else -1
                        if thit >= 0 and (hit < 0 or thit < hit):
                            # content before the tool block streams; the
                            # block itself buffers for parsing
                            piece, tc_buf, pending = pending[:thit], pending[thit:], ""
                        elif hit >= 0:
                            piece, pending, stopped = pending[:hit], "", True
                        elif done:
                            piece, pending = pending, ""
                        elif len(pending) > holdback:
                            cut = len(pending) - holdback
                            piece, pending = pending[:cut], pending[cut:]
                        else:
                            piece = ""
                        if not piece:
                            continue
                        if chat:
                            delta = {"role": "assistant", "content": piece} if sent == 0 else {"content": piece}
                            payload = {"id": oid, "object": "chat.completion.chunk", "created": created,
                                       "model": "zllm", "choices": [{"index": 0, "delta": delta, "finish_reason": None}]}
                        else:
                            payload = {"id": oid, "object": "text_completion", "created": created,
                                       "model": "zllm", "choices": [{"index": 0, "text": piece, "finish_reason": None}]}
                        chunked(_sse(payload))
                        sent += 1
                    finish = req.finish_reason
                    if tc_buf:
                        from .toolcall import parse_tool_calls

                        _, calls = parse_tool_calls(tc_buf, req.rid)
                        if calls:
                            finish = "tool_calls"
                            for ci, c in enumerate(calls):
                                c["index"] = ci
                            chunked(_sse({
                                "id": oid, "object": "chat.completion.chunk",
                                "created": created, "model": "zllm",
                                "choices": [{"index": 0,
                                             "delta": {"tool_calls": calls},
                                             "finish_reason": None}]}))
                    fin = {"id": oid, "object": "chat.completion.chunk" if chat else "text_completion",
                           "created": created, "model": "zllm",
                           "choices": [{"index": 0, "delta": {} if chat else None, "text": None if chat else "",
                                        "finish_reason": finish}]}
                    chunked(_sse(fin))
                    chunked(b"data: [DONE]\n\n")
                    chunked(b"")
                    return

                # non-streaming: drain
                while True:
                    if req.stream_q.get() is None:
                        break
                out_text = tok.decode(req.out_tokens)
                for ss in req.stop_strings:
                    i = out_text.find(ss)
                    if i >= 0:
                        out_text = out_text[:i]
                        break
                usage = {"prompt_tokens": len(ids), "completion_tokens": len(req.out_tokens),
                         "total_tokens": len(ids) + len(req.out_tokens)}
                if chat:
                    message = {"role": "assistant", "content": out_text}
                    finish = req.finish_reason
                    if tools_on:
                        from .toolcall import parse_tool_calls

                        content, calls = parse_tool_calls(out_text, req.rid)
                        if calls:
                            message = {"role": "assistant",
                                       "content": content or None,
                                       "tool_calls": calls}
                            finish = "tool_calls"
                    self._json(200, {
                        "id": oid, "object": "chat.completion", "created": created, "model": "zllm",
                        "choices": [{"index": 0, "message": message,
                                     "finish_reason": finish}],
                        "usage": usage,
                    })
                else:
                    self._json(200, {
                        "id": oid, "object": "text_completion", "created": created, "model": "zllm",
                        "choices": [{"index": 0, "text": out_text, "finish_reason": req.finish_reason}],
                        "usage": usage,
                    })

        self.engine.start()
        self.httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self.httpd.server_address[1]
        self.httpd.serve_forever()

    def start_background(self):
        t = threading.Thread(target=self.serve_forever, daemon=True, name="zllm-http")
        t.start()
        while self.httpd is None:
            time.sleep(0.02)
        return t

    def shutdown(self):
        if self.httpd:
            self.httpd.shutdown()
        self.engine.stop()
