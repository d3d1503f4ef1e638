#!/usr/bin/env python
"""Multimodal CLI: text+image prompting against a GGUF + mmproj pair.

The analogue of llama-mtmd-cli (reference: tools/mtmd/mtmd-cli.cpp):
  python tools/mtmd_cli.py MODEL.gguf --mmproj MMPROJ.gguf \
      --image cat.jpg -p "describe <__media__>" -n 64
Each `<__media__>` marker in the prompt consumes one --image (repeatable,
in order).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("--mmproj", required=True, help="mmproj GGUF (vision tower)")
    ap.add_argument("--image", action="append", default=[],
                    help="image file; one per <__media__> marker (repeatable)")
    ap.add_argument("--audio", action="append", default=[],
                    help="WAV audio file; consumed after images, in order")
    ap.add_argument("-p", "--prompt", required=True)
    ap.add_argument("-n", "--n-predict", type=int, default=64)
    ap.add_argument("-c", "--ctx", type=int, default=2048)
    ap.add_argument("--temp", type=float, default=0.2)
    ap.add_argument("--greedy", action="store_true")
    ap.add_argument("--chat", action="store_true",
                    help="wrap the prompt with the model's chat template")
    args = ap.parse_args()

    import jax.numpy as jnp

    from zllm.models.loader import Model
    from zllm.mtmd import MtmdModel, generate_mm

    model = Model.load(args.model, dtype=jnp.bfloat16)
    if model.tokenizer is None:
        sys.exit("model has no tokenizer")
    clip = MtmdModel(args.mmproj)
    media = [("image", p) for p in args.image] + [("audio", p) for p in args.audio]

    prompt = args.prompt
    if args.chat:
        from zllm.server.chat import apply_chat_template

        prompt = apply_chat_template(model, [{"role": "user", "content": prompt}])

    sampler = None
    if not args.greedy and args.temp > 0:
        import jax

        from zllm.sampling.samplers import SamplerChain

        chain = SamplerChain(temp=args.temp)
        key = jax.random.PRNGKey(42)

        def sampler(logits):
            nonlocal key
            key, sub = jax.random.split(key)
            return int(chain.sample(logits, sub))
    res = generate_mm(model, clip, prompt, media, max_new=args.n_predict,
                      max_len=args.ctx, sampler=sampler)
    print(res.text)
    print(f"[prefill {res.n_prefill} tok | decode {len(res.tokens)} tok]",
          file=sys.stderr)


if __name__ == "__main__":
    main()
