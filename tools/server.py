#!/usr/bin/env python
"""llama-server analogue: OpenAI-compatible continuous-batching HTTP server.

Usage: python tools/server.py MODEL.gguf [--port 8080 --slots 4 --ctx 2048]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--dense", action="store_true")
    ap.add_argument("--spec", action="store_true",
                    help="n-gram speculative decoding for greedy requests")
    ap.add_argument("--draft-max", type=int, default=6, help="draft tokens per step")
    args = ap.parse_args()

    import jax.numpy as jnp

    from zllm.models.loader import Model
    from zllm.server import ZllmServer

    print(f"loading {args.model} ...", file=sys.stderr)
    m = Model.load(args.model, quantized=not args.dense, dtype=jnp.bfloat16)
    srv = ZllmServer(m, n_slots=args.slots, max_len=args.ctx, host=args.host, port=args.port,
                     speculative=args.spec, n_draft=args.draft_max)
    print(f"listening on http://{args.host}:{args.port}", file=sys.stderr)
    srv.serve_forever()


if __name__ == "__main__":
    main()
