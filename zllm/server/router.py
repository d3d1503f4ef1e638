"""Multi-model router server.

Reference: tools/server router mode (tools/server/server-models.cpp +
README.md "Using multiple models"): the router process discovers GGUFs
in a models directory, loads instances on demand (bounded by
`models_max`, LRU-evicted), and forwards each request to the instance
named by its "model" field.  Here instances are in-process ZllmServer
threads on loopback ports and forwarding is a streamed HTTP proxy — the
TPU-native analogue of the reference's child-process spawning (one JAX
runtime, N engines).
"""

from __future__ import annotations

import json
import os
import threading
import time
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class ModelInstance:
    """One model's replica group: requests round-robin across `servers`
    (data-parallel replica serving — the TPU-native counterpart of the
    reference's multiple server processes behind a router; each replica
    is an independent engine with its own KV cache and slots)."""

    def __init__(self, name: str, servers: list):
        self.name = name
        self.servers = servers
        self.last_used = time.time()
        self._rr = 0

    def pick(self):
        srv = self.servers[self._rr % len(self.servers)]
        self._rr += 1
        return srv

    def shutdown(self):
        for s in self.servers:
            s.shutdown()


class RouterServer:
    def __init__(self, models_dir: str, host="127.0.0.1", port: int = 8080,
                 models_max: int = 2, autoload: bool = True, n_slots: int = 2,
                 max_len: int = 2048, model_kwargs: dict | None = None,
                 replicas: int = 1):
        self.models_dir = models_dir
        self.host = host
        self.port = port
        self.models_max = models_max
        self.autoload = autoload
        self.n_slots = n_slots
        self.max_len = max_len
        self.model_kwargs = model_kwargs or {}
        self.replicas = max(1, replicas)
        self.instances: dict[str, ModelInstance] = {}
        self._lock = threading.Lock()
        self.httpd: ThreadingHTTPServer | None = None

    # -- model management ---------------------------------------------------
    def available(self) -> list[str]:
        return [f for f in sorted(os.listdir(self.models_dir)) if f.endswith(".gguf")]

    def load(self, name: str) -> ModelInstance:
        with self._lock:
            inst = self.instances.get(name)
            if inst is not None:
                inst.last_used = time.time()
                return inst
            path = os.path.join(self.models_dir, os.path.basename(name))
            if not os.path.exists(path):
                raise FileNotFoundError(name)
            # LRU-evict beyond models_max (reference --models-max)
            while self.models_max and len(self.instances) >= self.models_max:
                victim = min(self.instances.values(), key=lambda i: i.last_used)
                self._unload(victim.name)

            import jax.numpy as jnp

            from ..models.loader import Model
            from .http import ZllmServer

            m = Model.load(path, quantized=True, dtype=jnp.float32, **self.model_kwargs)
            servers = []
            for _ in range(self.replicas):
                srv = ZllmServer(m, n_slots=self.n_slots, max_len=self.max_len, port=0)
                srv.start_background()
                servers.append(srv)
            inst = ModelInstance(name, servers)
            self.instances[name] = inst
            return inst

    def _unload(self, name: str):
        inst = self.instances.pop(name, None)
        if inst is not None:
            inst.shutdown()

    def unload(self, name: str):
        with self._lock:
            self._unload(name)

    # -- HTTP ---------------------------------------------------------------
    def serve_forever(self):
        router = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):
                pass

            def _json(self, code, obj):
                data = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/health":
                    self._json(200, {"status": "ok"})
                elif self.path in ("/models", "/v1/models"):
                    loaded = set(router.instances)
                    self._json(200, {"object": "list", "data": [
                        {"id": name, "object": "model",
                         "state": "loaded" if name in loaded else "available"}
                        for name in router.available()
                    ]})
                else:
                    self._json(404, {"error": "router: unknown GET endpoint"})

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(n) if n else b"{}"
                try:
                    body = json.loads(raw or b"{}")
                except json.JSONDecodeError:
                    self._json(400, {"error": "bad json"})
                    return
                if self.path == "/models/load":
                    try:
                        router.load(body["model"])
                        self._json(200, {"success": True})
                    except FileNotFoundError:
                        self._json(404, {"error": f"no such model {body.get('model')!r}"})
                    return
                if self.path == "/models/unload":
                    router.unload(body.get("model", ""))
                    self._json(200, {"success": True})
                    return

                name = body.get("model", "")
                if not name or name == "zllm":
                    avail = router.available()
                    if len(router.instances) == 1:
                        name = next(iter(router.instances))
                    elif len(avail) == 1:
                        name = avail[0]
                    else:
                        self._json(400, {"error": "request must name a model"})
                        return
                if name not in router.instances and not router.autoload:
                    self._json(400, {"error": f"model {name!r} not loaded (autoload off)"})
                    return
                try:
                    inst = router.load(name)
                except FileNotFoundError:
                    self._json(404, {"error": f"no such model {name!r}"})
                    return

                # forward verbatim and stream the reply back
                url = f"http://127.0.0.1:{inst.pick().port}{self.path}"
                freq = urllib.request.Request(
                    url, data=raw, headers={"Content-Type": "application/json"}
                )
                try:
                    with urllib.request.urlopen(freq, timeout=600) as resp:
                        self.send_response(resp.status)
                        ctype = resp.headers.get("Content-Type", "application/json")
                        self.send_header("Content-Type", ctype)
                        if "event-stream" in ctype:
                            self.send_header("Transfer-Encoding", "chunked")
                            self.end_headers()
                            while True:
                                chunk = resp.read(4096)
                                if not chunk:
                                    break
                                self.wfile.write(f"{len(chunk):x}\r\n".encode() + chunk + b"\r\n")
                            self.wfile.write(b"0\r\n\r\n")
                        else:
                            data = resp.read()
                            self.send_header("Content-Length", str(len(data)))
                            self.end_headers()
                            self.wfile.write(data)
                except urllib.error.HTTPError as e:  # pass through model errors
                    data = e.read()
                    self.send_response(e.code)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)

        self.httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self.httpd.server_address[1]
        self.httpd.serve_forever()

    def start_background(self):
        t = threading.Thread(target=self.serve_forever, daemon=True, name="zllm-router")
        t.start()
        while self.httpd is None:
            time.sleep(0.02)
        return t

    def shutdown(self):
        if self.httpd:
            self.httpd.shutdown()
        for name in list(self.instances):
            self.unload(name)
