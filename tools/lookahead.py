"""Lookahead decoding (Jacobi n-gram speculation without a draft model).

The counterpart of the reference's examples/lookahead/lookahead.cpp
(LADE, Fu et al.): every step runs ONE forward over a composite batch —

  [ pending tokens | W x (N-1) Jacobi window columns | G x (N-1)
    verification n-grams ]

with an explicit block attention mask (zllm.models.llama.forward's `mask`
input): window column i at level j attends the committed prefix + its own
column at lower levels (the Jacobi fixed-point iteration that makes the
window converge to plausible continuations); verification grams attend
the prefix + their own earlier tokens.  Trajectory n-grams harvested from
the window feed a per-first-token pool (G-slot ring, deduped — the
reference's ngram_container); grams whose key matches the current last
token ride along for verification, and the longest chain whose tokens
match the greedy argmax at each position is accepted.  Output is
bit-identical to plain greedy decoding — acceptance only shortcuts it.

Speculative window/verify tokens are STORED in cache slots past the
committed region (forward's `kv_positions` separates storage slots from
rope positions) and are overwritten by the next step, so no cache
cleanup pass is needed (the reference instead rolls back with
llama_kv_cache_seq_rm).
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def lookahead_generate(model, prompt_tokens, n_new: int, w: int = 8, n: int = 4,
                       g: int = 8, max_len: int = 1024):
    """Greedy lookahead decoding.  Returns (tokens, stats) where stats
    carries per-step acceptance counts."""
    import functools

    import jax
    import jax.numpy as jnp

    from zllm.models.llama import forward
    from zllm.runtime.kvcache import KVCache

    cfg = model.cfg
    lvls = n - 1
    t_batch = n + w * lvls + g * lvls  # pending (padded to N) + window + verify
    kv = KVCache.create(cfg.n_layers, 1, max_len, cfg.n_kv_heads, cfg.head_dim,
                        jnp.float32)

    @jax.jit
    def prefill(params, toks, pos, kv):
        return forward(params, cfg, toks, pos, kv, logits_for="last")

    @functools.partial(jax.jit, donate_argnums=(4,))
    def la_step(params, toks, pos, slots, kv, mask):
        logits, kv = forward(params, cfg, toks, pos, kv, mask=mask,
                             kv_positions=slots, logits_for="all")
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), kv

    prompt = list(prompt_tokens)
    logits, kv = prefill(model.params, jnp.asarray([prompt], jnp.int32),
                         jnp.asarray(np.arange(len(prompt), dtype=np.int32)[None]), kv)
    out = [int(np.asarray(logits)[0, -1].argmax())]

    rng = np.random.default_rng(0)
    vocab = cfg.vocab_size
    # Jacobi window levels [N-1, W], random-initialized like the reference
    window = rng.integers(1, vocab, size=(lvls, w)).astype(np.int64)
    pool: dict[int, list[tuple]] = {}

    pending = [out[-1]]  # committed tokens whose KV is not yet ingested
    accepted_total = 0
    steps = 0
    while len(out) < n_new:
        m = len(pending)
        p0 = len(prompt) + len(out) - m  # logical pos of pending[0]
        base = p0 + m  # first speculative storage slot
        if base + (n - m) + (t_batch - n) >= max_len:
            break

        toks = np.zeros(t_batch, np.int32)
        pos = np.zeros(t_batch, np.int32)
        slots = np.zeros(t_batch, np.int32)
        commit_edge = p0 + m  # queries may attend slots < their column's edge
        s = kv.max_len
        mask = np.zeros((1, t_batch, s), bool)

        # pending block (padded to N columns; pads attend only themselves)
        for j in range(n):
            if j < m:
                toks[j] = pending[j]
                pos[j] = slots[j] = p0 + j
                mask[0, j, : p0 + j + 1] = True
            else:
                pos[j] = slots[j] = base + (j - m)
                mask[0, j, slots[j]] = True
        col_w0 = n
        # Jacobi window: level j col i attends prefix + own column below
        for j in range(lvls):
            for i in range(w):
                c = col_w0 + j * w + i
                toks[c] = window[j, i]
                pos[c] = p0 + m + i + j
                # speculative slots: contiguous after the pending pads
                slots[c] = base + (n - m) + (c - n)
                mask[0, c, :commit_edge] = True
                for j2 in range(j):
                    mask[0, c, slots[col_w0 + j2 * w + i]] = True
                mask[0, c, slots[c]] = True
        # verification grams for the current last token
        col_v0 = col_w0 + lvls * w
        cands = list(pool.get(pending[-1], []))[:g]
        for gi in range(g):
            gram = cands[gi] if gi < len(cands) else tuple([0] * lvls)
            for t in range(lvls):
                c = col_v0 + gi * lvls + t
                toks[c] = gram[t]
                pos[c] = p0 + m + t
                slots[c] = base + (n - m) + (c - n)
                mask[0, c, :commit_edge] = True
                for t2 in range(t):
                    mask[0, c, slots[col_v0 + gi * lvls + t2]] = True
                mask[0, c, slots[c]] = True

        arg, kv = la_step(model.params, jnp.asarray(toks[None]),
                          jnp.asarray(pos[None]), jnp.asarray(slots[None]),
                          kv, jnp.asarray(mask))
        arg = np.asarray(arg)[0]

        x_next = int(arg[m - 1])  # greedy continuation of the last pending
        accepted = [x_next]
        # longest verified gram chain
        best = 0
        best_out: list[int] = []
        for gi in range(len(cands)):
            gram = cands[gi]
            cur, outs = x_next, []
            cnt = 0
            for t in range(lvls):
                if gram[t] != cur:
                    break
                cur = int(arg[col_v0 + gi * lvls + t])
                outs.append(cur)
                cnt += 1
            if cnt > best:
                best, best_out = cnt, outs
        accepted += best_out
        accepted_total += best
        steps += 1

        # harvest trajectory n-grams: key = old level-0 token of column i,
        # gram = levels 1..N-2 + the freshly sampled last level (reference
        # "update observed ngrams")
        new_last = arg[col_w0 + (lvls - 1) * w : col_w0 + lvls * w]
        for i in range(w):
            key = int(window[0, i])
            gram = tuple(int(window[j, i]) for j in range(1, lvls)) + (int(new_last[i]),)
            lst = pool.setdefault(key, [])
            if gram not in lst:
                lst.insert(0, gram)
                del lst[g:]
        # Jacobi shift: levels move down, last level resampled
        window[:-1] = window[1:]
        window[-1] = new_last

        out.extend(accepted)
        pending = accepted[: n]  # next step ingests these (cap at block)
        if len(accepted) > n:
            # extremely long acceptance: ingest the tail via plain prefill
            extra = accepted[n:]
            pstart = len(prompt) + len(out) - len(extra)
            _, kv = prefill(model.params, jnp.asarray([extra], jnp.int32),
                            jnp.asarray(np.arange(pstart, pstart + len(extra),
                                                  dtype=np.int32)[None]), kv)
    stats = {
        "steps": steps,
        "tokens": len(out),
        "accepted_from_grams": accepted_total,
        "tokens_per_step": len(out) / max(steps, 1),
    }
    return out[:n_new], stats


def main():
    import argparse

    import jax.numpy as jnp

    from zllm.models.loader import Model

    ap = argparse.ArgumentParser(description="lookahead decoding (reference examples/lookahead)")
    ap.add_argument("model")
    ap.add_argument("-p", "--prompt", default="Hello")
    ap.add_argument("-n", type=int, default=64)
    ap.add_argument("-W", type=int, default=8, help="lookahead window")
    ap.add_argument("-N", type=int, default=4, help="n-gram size")
    ap.add_argument("-G", type=int, default=8, help="verification grams")
    args = ap.parse_args()

    m = Model.load(args.model, quantized=True, dtype=jnp.bfloat16)
    if m.tokenizer is None:
        ap.error("model has no tokenizer")
    toks = m.tokenizer.encode(args.prompt)
    out, stats = lookahead_generate(m, toks, args.n, w=args.W, n=args.N, g=args.G)
    print(m.tokenizer.decode(out))
    print(f"\n{stats}", file=sys.stderr)


if __name__ == "__main__":
    main()
