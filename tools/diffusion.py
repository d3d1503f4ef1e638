"""Diffusion LM generation (dream / llada / llada-moe / rnd1).

The counterpart of the reference's examples/diffusion/diffusion-cli.cpp:
generation is iterative denoising — every step runs ONE non-causal
forward over the whole [prompt | masked region] window, samples a
candidate token for every still-masked position, scores each candidate's
confidence, and "transfers" (unmasks) the most confident ones according
to a schedule:

  algorithms   origin | entropy | margin | random | confidence
               (diffusion-cli.cpp:17 diffusion_algorithm)
  schedules    timestep (LLaDA eps-schedule, :107-110) |
               block (blockwise even split, :193-203)

Supports classifier-free guidance (mask the prompt for the
unconditional pass, logits = uncond + (scale+1)*(cond - uncond),
:322-346), dream's shift_logits convention (position i reads logits
i-1, :378-382), and the alg_temp softmax-relaxed transfer choice.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

ALGORITHMS = ("origin", "entropy", "margin", "random", "confidence")
SCHEDULES = ("timestep", "block")


def _sample_and_confidence(logits, algorithm, temperature, top_k, rng):
    """Per-position candidate + confidence from raw logits [V]."""
    lg = logits.astype(np.float64)
    if top_k > 0 and top_k < lg.shape[-1]:
        kth = np.partition(lg, -top_k)[-top_k]
        lg = np.where(lg < kth, -np.inf, lg)
    if temperature > 0:
        p = np.exp((lg - lg.max()) / temperature)
        p /= p.sum()
        tok = int(rng.choice(lg.shape[-1], p=p))
    else:
        p = np.exp(lg - lg.max())
        p /= p.sum()
        tok = int(np.argmax(lg))
    if algorithm == "confidence":
        conf = float(p[tok])
    elif algorithm == "entropy":
        conf = float(np.sum(p * np.log(p + 1e-10)))  # -entropy
    elif algorithm == "margin":
        top2 = np.partition(p, -2)[-2:]
        conf = float(top2[1] - top2[0])
    else:  # random
        conf = float(rng.uniform())
    return tok, conf


def _transfer_count(step, total_steps, remaining, schedule, eps, per_step):
    if schedule == "timestep":
        t = 1.0 - step / total_steps * (1.0 - eps)
        s = 1.0 - (step + 1) / total_steps * (1.0 - eps)
        p = (1.0 - s / t) if step < total_steps - 1 else 1.0
        return int(remaining * p)
    if per_step is not None and step < len(per_step):
        return per_step[step]
    return remaining // max(total_steps - step, 1)


def _per_step_counts(mask_count, steps):
    base, rem = divmod(mask_count, steps)
    return [base + (1 if i < rem else 0) for i in range(steps)]


def diffusion_generate(model, prompt_tokens, max_length, *, steps=64,
                       mask_id=None, algorithm="confidence",
                       schedule="timestep", block_length=0, eps=1e-3,
                       temperature=0.0, top_k=0, alg_temp=0.0,
                       cfg_scale=0.0, shift_logits=None, seed=0,
                       step_callback=None):
    """Returns the full denoised token list of length max_length."""
    import jax
    import jax.numpy as jnp

    from zllm.models.llama import forward

    cfg = model.cfg
    if mask_id is None:
        mask_id = cfg.vocab_size - 1
    if shift_logits is None:
        shift_logits = cfg.arch == "dream"  # dream predicts pos i at i-1
    rng = np.random.default_rng(seed)
    n_input = len(prompt_tokens)
    assert n_input < max_length, "prompt fills the whole window"

    out = np.full(max_length, mask_id, np.int64)
    out[:n_input] = prompt_tokens
    pos = jnp.asarray(np.arange(max_length, dtype=np.int32)[None])

    fwd = jax.jit(lambda p, t: forward(p, cfg, t, pos, None, logits_for="all")[0])

    if schedule == "block":
        assert block_length > 0 and (max_length - n_input) % block_length == 0
        n_blocks = (max_length - n_input) // block_length
        assert steps % n_blocks == 0, "steps must divide evenly over blocks"
        steps_per_block = steps // n_blocks
    else:
        n_blocks, steps_per_block = 1, steps

    for block in range(n_blocks):
        if schedule == "block":
            b_lo = n_input + block * block_length
            b_hi = min(n_input + (block + 1) * block_length, max_length)
            per_step = _per_step_counts(
                int(np.sum(out[b_lo:b_hi] == mask_id)), steps_per_block)
        else:
            b_lo, b_hi, per_step = 0, max_length, None

        for step in range(steps_per_block):
            if step_callback is not None:
                step_callback(block * steps_per_block + step, steps, out)
            logits = np.asarray(fwd(model.params, jnp.asarray(out[None].astype(np.int32))))[0]
            if cfg_scale > 0.0:
                un = out.copy()
                un[:n_input] = mask_id
                un_logits = np.asarray(
                    fwd(model.params, jnp.asarray(un[None].astype(np.int32))))[0]
                logits = un_logits + (cfg_scale + 1.0) * (logits - un_logits)
            if shift_logits:
                logits = np.concatenate([logits[:1], logits[:-1]], axis=0)

            mask_pos = [i for i in range(b_lo, b_hi) if out[i] == mask_id]
            if not mask_pos:
                break
            n_transfer = _transfer_count(step, steps_per_block, len(mask_pos),
                                         schedule, eps, per_step)
            if algorithm == "origin":
                p_t = n_transfer / max(len(mask_pos), 1)
                for i in mask_pos:
                    if rng.uniform() < p_t:
                        out[i], _ = _sample_and_confidence(
                            logits[i], "random", temperature, top_k, rng)
                continue
            cand, confs = {}, []
            for i in mask_pos:
                tok, conf = _sample_and_confidence(
                    logits[i], algorithm, temperature, top_k, rng)
                cand[i] = tok
                confs.append((conf, i))
            if n_transfer <= 0:
                continue
            if alg_temp <= 0.0:
                confs.sort(key=lambda c: (-c[0], c[1]))
                chosen = [i for _, i in confs[:n_transfer]]
            else:  # softmax-relaxed choice over confidences
                cl = np.asarray([c / alg_temp for c, _ in confs])
                chosen = []
                alive = list(range(len(confs)))
                for _ in range(min(n_transfer, len(confs))):
                    p = np.exp(cl[alive] - cl[alive].max())
                    p /= p.sum()
                    k = int(rng.choice(len(alive), p=p))
                    chosen.append(confs[alive[k]][1])
                    alive.pop(k)
            for i in chosen:
                out[i] = cand[i]
    return out.tolist()


def main():
    import argparse

    import jax.numpy as jnp

    from zllm.models.loader import Model

    ap = argparse.ArgumentParser(
        description="diffusion LM generation (reference examples/diffusion)")
    ap.add_argument("model")
    ap.add_argument("-p", "--prompt", default="Hello")
    ap.add_argument("-n", "--max-length", type=int, default=128)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--algorithm", choices=ALGORITHMS, default="confidence")
    ap.add_argument("--schedule", choices=SCHEDULES, default="timestep")
    ap.add_argument("--block-length", type=int, default=0)
    ap.add_argument("--mask-id", type=int, default=-1)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--top-k", type=int, default=0)
    ap.add_argument("--alg-temp", type=float, default=0.0)
    ap.add_argument("--cfg-scale", type=float, default=0.0)
    ap.add_argument("--eps", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    m = Model.load(args.model, quantized=True, dtype=jnp.bfloat16)
    if not m.cfg.is_diffusion:
        ap.error(f"{m.cfg.arch} is not a diffusion arch")
    if m.tokenizer is None:
        ap.error("model has no tokenizer")
    toks = m.tokenizer.encode(args.prompt)
    mask_id = args.mask_id if args.mask_id >= 0 else None
    out = diffusion_generate(
        m, toks, args.max_length, steps=args.steps, mask_id=mask_id,
        algorithm=args.algorithm, schedule=args.schedule,
        block_length=args.block_length, temperature=args.temperature,
        top_k=args.top_k, alg_temp=args.alg_temp, cfg_scale=args.cfg_scale,
        eps=args.eps, seed=args.seed,
    )
    print(m.tokenizer.decode(out[len(toks):]))


if __name__ == "__main__":
    main()
