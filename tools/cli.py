#!/usr/bin/env python
"""Interactive / one-shot chat & completion CLI.

The analogue of llama-cli (reference: tools/cli/cli.cpp): load a GGUF,
tokenize the prompt, stream generated tokens with a sampler chain.

Usage:
  python tools/cli.py MODEL.gguf -p "prompt" -n 64 [--temp 0.8 --top-k 40]
  python tools/cli.py MODEL.gguf -i            # interactive REPL
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("-p", "--prompt", default=None)
    ap.add_argument("-f", "--file", default=None, help="read the prompt from a file")
    ap.add_argument("-n", "--n-predict", type=int, default=64)
    ap.add_argument("-r", "--reverse-prompt", action="append", default=[],
                    help="stop generation at this string (repeatable; reference antiprompts)")
    ap.add_argument("--prompt-cache", default="", metavar="FILE",
                    help="session file: reuse the cached prompt's KV on a shared "
                         "prefix and save the updated session after generation "
                         "(reference: tools/completion --prompt-cache)")
    ap.add_argument("-c", "--ctx", type=int, default=2048)
    ap.add_argument("-i", "--interactive", action="store_true")
    ap.add_argument("--temp", type=float, default=0.8)
    ap.add_argument("--top-k", type=int, default=40)
    ap.add_argument("--top-p", type=float, default=0.95)
    ap.add_argument("--min-p", type=float, default=0.05)
    ap.add_argument("--repeat-penalty", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--greedy", action="store_true")
    ap.add_argument("--dense", action="store_true")
    ap.add_argument("--profile", default="", metavar="DIR",
                    help="dump a jax.profiler device trace (TensorBoard format) to DIR")
    ap.add_argument("--perf", action="store_true", help="print per-phase perf counters on exit")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from zllm.models.loader import Model
    from zllm.runtime.generate import Generator
    from zllm.sampling.samplers import SamplerChain
    from zllm.utils import perf as perfmod

    perfc = perfmod.PerfCounters()
    print(f"loading {args.model} ...", file=sys.stderr)
    with perfc.phase("load"):
        m = Model.load(args.model, quantized=not args.dense, dtype=jnp.bfloat16)
    if m.tokenizer is None:
        raise SystemExit("model has no tokenizer")
    gen = Generator(m, max_len=args.ctx)

    chain = SamplerChain(
        temp=args.temp, top_k_n=args.top_k, top_p_p=args.top_p, min_p_p=args.min_p,
        repeat_penalty=args.repeat_penalty, greedy=args.greedy,
    )
    key = jax.random.PRNGKey(args.seed)

    def sampler_factory():
        nonlocal key

        def sample(logits):
            nonlocal key
            key, sub = jax.random.split(key)
            return int(chain.sample(logits, sub))

        return sample

    def run_once(prompt: str):
        ids = m.tokenizer.encode(prompt, add_special=True, parse_special=True)
        start = 0
        if args.prompt_cache and os.path.exists(args.prompt_cache):
            from zllm.runtime.state import load_session

            try:
                kv, cached, n_past = load_session(args.prompt_cache, m, gen.kv)
                # longest shared prefix is reusable: the slot==position
                # cache re-writes every later position before any query
                # attends it (write-before-attend), so a stale tail is safe
                ncp = 0
                limit = min(n_past, len(ids) - 1)
                while ncp < limit and cached[ncp] == ids[ncp]:
                    ncp += 1
                if ncp >= 16:  # not worth it below this
                    gen.kv = kv
                    start = ncp
                    print(f"[prompt cache: reused {ncp} tokens]", file=sys.stderr)
            except ValueError as e:
                print(f"[prompt cache ignored: {e}]", file=sys.stderr)
        with perfmod.trace(args.profile):
            res = gen.generate(ids, max_new=args.n_predict, sampler=sampler_factory(),
                               eos_id=m.tokenizer.eos_id, start=start,
                               stop_strings=tuple(args.reverse_prompt))
        if args.prompt_cache:
            from zllm.runtime.state import save_session

            hist = ids + res.tokens[:-1]
            save_session(args.prompt_cache, m, gen.kv, hist, len(hist))
        perfc.t_prefill_ms += res.t_prefill * 1e3
        perfc.n_prefill += res.n_prefill
        perfc.t_decode_ms += res.t_decode * 1e3
        perfc.n_decode += len(res.tokens)
        print(res.text)
        pp_tps = res.n_prefill / res.t_prefill if res.t_prefill else 0
        tg_tps = (len(res.tokens) - 1) / res.t_decode if res.t_decode else 0
        print(
            f"[prefill {res.n_prefill} tok @ {pp_tps:.1f} t/s | decode {len(res.tokens)} tok @ {tg_tps:.1f} t/s]",
            file=sys.stderr,
        )

    if args.interactive:
        print("interactive mode; empty line or Ctrl-D to exit", file=sys.stderr)
        while True:
            try:
                line = input("> ")
            except EOFError:
                break
            if not line.strip():
                break
            gen.reset()
            run_once(line)
    else:
        prompt = args.prompt
        if prompt is None and args.file:
            with open(args.file, encoding="utf-8") as fh:
                prompt = fh.read()
        if prompt is None:
            raise SystemExit("need -p PROMPT, -f FILE or -i")
        run_once(prompt)
    if args.perf:
        perfc.report()
    if args.profile:
        print(f"profiler trace written to {args.profile}", file=sys.stderr)


if __name__ == "__main__":
    main()
