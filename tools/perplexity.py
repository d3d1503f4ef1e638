#!/usr/bin/env python
"""WikiText-2-style perplexity evaluation.

The analogue of the reference's llama-perplexity (reference:
tools/perplexity/perplexity.cpp:107-140 — chunked eval, nll accumulation
with running sigma).  Tokenizes a corpus, splits into n_ctx windows, runs
batched forwards with the second half of each window scored, and reports
PPL +- sigma.

Usage: python tools/perplexity.py MODEL.gguf corpus.txt [--ctx 512]
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def perplexity(model, token_ids, n_ctx: int = 512, batch: int = 4, progress=True):
    """Returns (ppl, ppl_err, n_scored). Scores the second half of every
    non-overlapping n_ctx window, like the reference default."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zllm.models.llama import forward

    cfg = model.cfg

    @jax.jit
    def chunk_logits(params, toks, positions):
        logits, _ = forward(params, cfg, toks, positions, None)
        return jax.nn.log_softmax(logits, axis=-1)

    ids = np.asarray(token_ids, dtype=np.int32)
    n_chunks = len(ids) // n_ctx
    if n_chunks == 0:
        raise ValueError(f"corpus too short: {len(ids)} tokens < n_ctx {n_ctx}")

    first = n_ctx // 2
    nll = 0.0
    nll2 = 0.0
    count = 0
    positions = np.broadcast_to(np.arange(n_ctx, dtype=np.int32), (batch, n_ctx))

    for start in range(0, n_chunks, batch):
        nb = min(batch, n_chunks - start)
        toks = np.zeros((batch, n_ctx), dtype=np.int32)
        for j in range(nb):
            toks[j] = ids[(start + j) * n_ctx : (start + j + 1) * n_ctx]
        logp = np.asarray(chunk_logits(model.params, jnp.asarray(toks), jnp.asarray(positions)))
        for j in range(nb):
            for t in range(first, n_ctx - 1):
                ll = float(logp[j, t, toks[j, t + 1]])
                nll -= ll
                nll2 += ll * ll
                count += 1
        if progress:
            ppl = math.exp(nll / count)
            print(f"[{start + nb}/{n_chunks}] ppl={ppl:.4f}", file=sys.stderr)

    mean = nll / count
    var = nll2 / count - mean * mean
    ppl = math.exp(mean)
    err = ppl * math.sqrt(var / count)
    return ppl, err, count


def kl_divergence(model, token_ids, base_logits_path: str = "", n_ctx: int = 512,
                  batch: int = 4, save_path: str = ""):
    """KL-divergence mode (reference: perplexity.cpp --kl-divergence):
    either SAVE this model's chunk logits (--kl-divergence-base author
    step) or COMPARE against a saved base, reporting mean KL and
    same-top-token rate between the two models' predictive
    distributions."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zllm.models.llama import forward

    cfg = model.cfg

    @jax.jit
    def chunk_logp(params, toks, positions):
        logits, _ = forward(params, cfg, toks, positions, None)
        return jax.nn.log_softmax(logits, axis=-1)

    ids = np.asarray(token_ids, dtype=np.int32)
    n_chunks = len(ids) // n_ctx
    positions = np.broadcast_to(np.arange(n_ctx, dtype=np.int32), (batch, n_ctx))
    first = n_ctx // 2

    all_logp = []
    for start in range(0, n_chunks, batch):
        nb = min(batch, n_chunks - start)
        toks = np.zeros((batch, n_ctx), dtype=np.int32)
        for j in range(nb):
            toks[j] = ids[(start + j) * n_ctx : (start + j + 1) * n_ctx]
        lp = np.asarray(chunk_logp(model.params, jnp.asarray(toks), jnp.asarray(positions)))
        all_logp.append(lp[:nb, first:-1].astype(np.float16))
    logp = np.concatenate(all_logp)  # [chunks, T, V] f16

    if save_path:
        np.savez_compressed(save_path, logp=logp, n_ctx=n_ctx)
        return {"saved": save_path, "chunks": int(logp.shape[0])}

    base = np.load(base_logits_path)["logp"].astype(np.float32)
    cur = logp.astype(np.float32)
    assert base.shape == cur.shape, (base.shape, cur.shape)
    p = np.exp(base)
    kl = np.sum(p * (base - cur), axis=-1)  # per-position KL(base || cur)
    same_top = (base.argmax(-1) == cur.argmax(-1)).mean()
    return {
        "mean_kl": float(kl.mean()),
        "max_kl": float(kl.max()),
        "p99_kl": float(np.percentile(kl, 99)),
        "same_top_frac": float(same_top),
        "n_positions": int(kl.size),
    }


def hellaswag(model, tasks: list[dict], batch: int = 4):
    """HellaSwag scoring (reference: perplexity.cpp hellaswag_score):
    each task is {"context": str-or-ids, "endings": [4 x str-or-ids],
    "label": int}; the ending with the highest length-normalized
    log-likelihood wins.  Returns (accuracy, n)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zllm.models.llama import forward

    cfg = model.cfg
    tok = model.tokenizer

    @jax.jit
    def logp_fn(params, toks, positions):
        logits, _ = forward(params, cfg, toks, positions, None)
        return jax.nn.log_softmax(logits, axis=-1)

    def enc(x, bos):
        if isinstance(x, str):
            return tok.encode(x, add_special=bos)
        return list(x)

    n_correct = 0
    for task in tasks:
        ctx = enc(task["context"], True)
        scores = []
        for ending in task["endings"]:
            end_ids = enc(ending, False)
            ids = (ctx + end_ids)[:1024]
            toks = np.asarray(ids, np.int32)[None]
            pos = np.arange(len(ids), dtype=np.int32)[None]
            lp = np.asarray(logp_fn(model.params, jnp.asarray(toks), jnp.asarray(pos)))[0]
            ll = sum(float(lp[t - 1, ids[t]]) for t in range(len(ctx), len(ids)))
            scores.append(ll / max(len(end_ids), 1))
        if int(np.argmax(scores)) == int(task["label"]):
            n_correct += 1
    return n_correct / max(len(tasks), 1), len(tasks)


def _continuation_ll(model, prefix_ids: list[int], cont_ids: list[int]):
    """Length-normalized log-likelihood of `cont_ids` given `prefix_ids`."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zllm.models.llama import forward

    cfg = model.cfg
    key = "_cll_fn"
    fn = getattr(model, key, None)
    if fn is None:
        @jax.jit
        def fn(params, toks, positions):
            logits, _ = forward(params, cfg, toks, positions, None)
            return jax.nn.log_softmax(logits, axis=-1)

        setattr(model, key, fn)
    ids = (prefix_ids + cont_ids)[:1024]
    toks = np.asarray(ids, np.int32)[None]
    pos = np.arange(len(ids), dtype=np.int32)[None]
    lp = np.asarray(fn(model.params, jnp.asarray(toks), jnp.asarray(pos)))[0]
    start = len(prefix_ids)
    ll = sum(float(lp[t - 1, ids[t]]) for t in range(start, len(ids)))
    return ll / max(len(ids) - start, 1)


def winogrande(model, tasks: list[tuple[str, str, str, int]]):
    """Winogrande scoring (reference: perplexity.cpp winogrande_score,
    CSV rows `idx,sentence-with-_,choice1,choice2,answer`): substitute
    each choice for the `_`, score the trailing part's normalized
    log-likelihood, higher wins.  Returns (accuracy, n)."""
    tok = model.tokenizer
    n_correct = 0
    for sentence, c1, c2, answer in tasks:
        cut = sentence.index("_")
        ending = sentence[cut + 1 :]
        scores = []
        for choice in (c1, c2):
            prefix = tok.encode(sentence[:cut] + choice, add_special=True)
            cont = tok.encode(ending)
            scores.append(_continuation_ll(model, prefix, cont))
        pick = 1 if scores[0] >= scores[1] else 2
        n_correct += int(pick == int(answer))
    return n_correct / max(len(tasks), 1), len(tasks)


def load_winogrande_csv(text: str):
    """Parse the llama.cpp winogrande eval CSV (reference:
    load_winogrande_from_csv; commas inside quoted sentences honored)."""
    import csv
    import io

    out = []
    for row in csv.reader(io.StringIO(text)):
        if len(row) < 5 or row[0].strip().lower() in ("", "idx", "index"):
            continue
        sentence, c1, c2, ans = row[1], row[2], row[3], row[4]
        if "_" in sentence:
            out.append((sentence, c1, c2, int(ans)))
    return out


def multiple_choice(model, tasks: list[dict]):
    """Generic multiple-choice scoring (reference: perplexity.cpp
    multiple_choice_score — ARC/TruthfulQA-style): each task is
    {"question": str, "choices": [str, ...], "label": int}; the choice
    with the highest normalized continuation log-likelihood wins."""
    import numpy as np

    tok = model.tokenizer
    n_correct = 0
    for task in tasks:
        prefix = tok.encode(task["question"], add_special=True)
        scores = [
            _continuation_ll(model, prefix, tok.encode(" " + c.lstrip()))
            for c in task["choices"]
        ]
        if int(np.argmax(scores)) == int(task["label"]):
            n_correct += 1
    return n_correct / max(len(tasks), 1), len(tasks)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("corpus")
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dense", action="store_true", help="dequantize weights at load")
    ap.add_argument("--kl-divergence-base", default="",
                    help="saved base logits (.npz) to compare against")
    ap.add_argument("--save-logits", default="", help="save this model's logits as the KL base")
    ap.add_argument("--hellaswag", action="store_true",
                    help="treat corpus as HellaSwag JSONL (context/endings/label)")
    ap.add_argument("--winogrande", action="store_true",
                    help="treat corpus as winogrande CSV (idx,sentence,c1,c2,answer)")
    ap.add_argument("--multiple-choice", action="store_true",
                    help="treat corpus as JSONL (question/choices/label)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from zllm.models.loader import Model

    m = Model.load(args.model, quantized=not args.dense, dtype=jnp.bfloat16)
    if m.tokenizer is None:
        raise SystemExit("model has no tokenizer")
    with open(args.corpus, encoding="utf-8") as fh:
        text = fh.read()
    if args.hellaswag:
        import json

        tasks = [json.loads(l) for l in text.splitlines() if l.strip()]
        acc, n = hellaswag(m, tasks, batch=args.batch)
        print(f"hellaswag accuracy = {100*acc:.2f}% ({n} tasks)")
        return
    if args.winogrande:
        acc, n = winogrande(m, load_winogrande_csv(text))
        print(f"winogrande accuracy = {100*acc:.2f}% ({n} tasks)")
        return
    if args.multiple_choice:
        import json

        tasks = [json.loads(l) for l in text.splitlines() if l.strip()]
        acc, n = multiple_choice(m, tasks)
        print(f"multiple-choice accuracy = {100*acc:.2f}% ({n} tasks)")
        return
    ids = m.tokenizer.encode(text, add_special=True)
    print(f"{len(ids)} tokens", file=sys.stderr)

    if args.save_logits or args.kl_divergence_base:
        out = kl_divergence(m, ids, args.kl_divergence_base, n_ctx=args.ctx,
                            batch=args.batch, save_path=args.save_logits)
        print(out)
        return
    ppl, err, n = perplexity(m, ids, n_ctx=args.ctx, batch=args.batch)
    print(f"PPL = {ppl:.4f} +/- {err:.4f}  ({n} tokens scored, ctx {args.ctx})")


if __name__ == "__main__":
    main()
