#!/usr/bin/env python
"""llama-server analogue: OpenAI/Anthropic-compatible continuous-batching
HTTP server; router mode when launched without a model (reference:
tools/server, server-models.cpp router).

Usage: python tools/server.py MODEL.gguf [--port 8080 --slots 4 --ctx 2048]
       python tools/server.py --models-dir ./models   (router mode)
Flags fall back to ZLLM_ARG_* environment variables and --preset INI
defaults (reference: common/arg.cpp LLAMA_ARG_* + presets).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zllm.utils.args import EnvDefault, add_common_args, parse_with_presets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", nargs="?", default=os.environ.get("ZLLM_ARG_MODEL", ""))
    add_common_args(ap, server=True)
    ap.add_argument("--spec", action="store_true",
                    default=os.environ.get("ZLLM_ARG_SPEC", "") == "1",
                    help="n-gram speculative decoding for greedy requests [ZLLM_ARG_SPEC=1]")
    ap.add_argument("--draft-max", action=EnvDefault, type=int, default=6,
                    help="draft tokens per step [ZLLM_ARG_DRAFT_MAX]")
    ap.add_argument("--model-draft", action=EnvDefault, default="",
                    help="draft model GGUF for speculative decoding [ZLLM_ARG_MODEL_DRAFT]")
    ap.add_argument("--lookahead", action="store_true",
                    default=os.environ.get("ZLLM_ARG_LOOKAHEAD", "") == "1",
                    help="Jacobi lookahead decoding for greedy requests [ZLLM_ARG_LOOKAHEAD=1]")
    ap.add_argument("--jinja", action="store_true",
                    default=os.environ.get("ZLLM_ARG_JINJA", "") == "1",
                    help="render the GGUF's embedded jinja chat template [ZLLM_ARG_JINJA=1]")
    ap.add_argument("--models-dir", action=EnvDefault, default="",
                    help="router mode: serve every GGUF in this directory [ZLLM_ARG_MODELS_DIR]")
    ap.add_argument("--models-max", action=EnvDefault, type=int, default=2,
                    help="router mode: max simultaneously loaded models [ZLLM_ARG_MODELS_MAX]")
    ap.add_argument("--replicas", action=EnvDefault, type=int, default=1,
                    help="router mode: data-parallel replicas per model, round-robin [ZLLM_ARG_REPLICAS]")
    ap.add_argument("--kv-layout", action=EnvDefault, default="auto",
                    choices=["auto", "contiguous", "paged"],
                    help="KV cache layout: paged = shared page pool + cross-slot prefix sharing [ZLLM_ARG_KV_LAYOUT]")
    ap.add_argument("--kv-type", action=EnvDefault, default="bf16",
                    choices=["bf16", "f16", "q8"],
                    help="KV cache element type (q8 = int8-quantized cache, "
                         "reference -ctk/-ctv q8_0) [ZLLM_ARG_KV_TYPE]")
    ap.add_argument("--tp", action=EnvDefault, type=int, default=1,
                    help="tensor-parallel devices (shards weights + KV heads over the mesh) [ZLLM_ARG_TP]")
    ap.add_argument("--dp", action=EnvDefault, type=int, default=1,
                    help="data-parallel devices (shards the slot batch) [ZLLM_ARG_DP]")
    ap.add_argument("--pp", action=EnvDefault, type=int, default=1,
                    help="pipeline-parallel devices (layer-split stages + GPipe "
                         "microbatch rotation; the reference's LLAMA_SPLIT_MODE_LAYER) "
                         "[ZLLM_ARG_PP]")
    ap.add_argument("--mmproj", action=EnvDefault, default="",
                    help="multimodal projector GGUF (vision tower); enables "
                         "image content parts in chat requests [ZLLM_ARG_MMPROJ]")
    args = parse_with_presets(ap)

    if not args.model and args.models_dir:
        from zllm.server.router import RouterServer

        r = RouterServer(args.models_dir, host=args.host, port=int(args.port),
                         models_max=int(args.models_max), n_slots=int(args.slots),
                         max_len=int(args.ctx), replicas=int(args.replicas))
        print(f"router on http://{args.host}:{args.port} serving {r.available()}", file=sys.stderr)
        r.serve_forever()
        return
    if not args.model:
        ap.error("MODEL.gguf or --models-dir required")

    import jax.numpy as jnp

    from zllm.models.loader import Model
    from zllm.server import ZllmServer

    print(f"loading {args.model} ...", file=sys.stderr)
    m = Model.load(args.model, quantized=not args.dense, dtype=jnp.bfloat16)
    draft = None
    if args.model_draft:
        print(f"loading draft {args.model_draft} ...", file=sys.stderr)
        draft = Model.load(args.model_draft, quantized=not args.dense, dtype=jnp.bfloat16)
    srv = ZllmServer(m, n_slots=int(args.slots), max_len=int(args.ctx), host=args.host,
                     port=int(args.port), speculative=args.spec, n_draft=int(args.draft_max),
                     kv_layout=args.kv_layout, draft_model=draft, jinja=args.jinja,
                     tp=int(args.tp), dp=int(args.dp), pp=int(args.pp),
                     kv_dtype={"bf16": None, "f16": jnp.float16, "q8": "q8"}[args.kv_type],
                     mmproj=args.mmproj, lookahead=args.lookahead)
    print(f"listening on http://{args.host}:{args.port}", file=sys.stderr)
    srv.serve_forever()


if __name__ == "__main__":
    main()
