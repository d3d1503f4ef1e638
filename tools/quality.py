#!/usr/bin/env python
"""Quantization quality gate.

Zero-egress stand-in for the reference's real-model WikiText-2 PPL ladder
(reference: tools/perplexity/README.md:51-65 — Q4_K_M must sit within
+0.18 PPL of f16 on Llama-3-8B): with no reachable weights, measure the
*relative* quality signal the PPL ladder encodes on a synthetic model —

  1. per-tensor weighted reconstruction RMSE for every ftype preset,
  2. mean KL-divergence of the quantized model's next-token distribution
     vs the f32 model's (the direct analogue of the reference's
     --kl-divergence mode, tools/perplexity/perplexity.cpp:1716-1810),
  3. top-1 agreement with the f32 model's greedy choice,
  4. the same with an imatrix, which must IMPROVE (not worsen) KL.

Emits QUALITY.json; the ladder must be monotone (more bits -> lower KL).
Usage: python tools/quality.py [--out QUALITY.json] [--big]
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# ftypes in descending bit-rate order; ladder asserts KL is non-decreasing
LADDER = [
    "Q8_0", "Q6_K", "Q5_K_M", "Q5_0", "Q4_K_M", "IQ4_NL", "Q4_0",
    "Q3_K_M", "IQ3_S", "IQ3_XXS", "Q2_K", "IQ2_S", "IQ2_XS", "IQ2_XXS",
    "IQ1_M", "IQ1_S",
]
IMATRIX_FTYPES = ["Q4_K_M", "IQ3_XXS", "IQ2_XXS", "IQ1_S"]


def _logits(model, toks):
    import jax
    import jax.numpy as jnp

    from zllm.models.llama import forward

    fwd = jax.jit(lambda p, t, q: forward(p, model.cfg, t, q, None)[0])
    pos = jnp.broadcast_to(jnp.arange(toks.shape[1]), toks.shape)
    return np.asarray(fwd(model.params, jnp.asarray(toks), pos), np.float64)


def _kl_top1(ref_lg, q_lg):
    """Mean token KL(ref || q) and top-1 agreement over [B, T, V] logits."""
    def logsm(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    lp_r, lp_q = logsm(ref_lg), logsm(q_lg)
    p_r = np.exp(lp_r)
    kl = (p_r * (lp_r - lp_q)).sum(-1)
    agree = (ref_lg.argmax(-1) == q_lg.argmax(-1)).mean()
    return float(kl.mean()), float(agree)


def run(out_path: str, big: bool = False, seed: int = 0,
        ladder=None, imatrix_ftypes=None) -> dict:
    import jax.numpy as jnp

    from quantize import quantize_file
    from zllm.gguf.constants import GGMLType
    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf

    ladder = list(ladder or LADDER)
    imatrix_ftypes = list(IMATRIX_FTYPES if imatrix_ftypes is None else imatrix_ftypes)
    tmp = tempfile.mkdtemp(prefix="zllm_quality_")
    geom = (dict(n_layers=4, n_embd=512, n_heads=8, n_kv_heads=4, n_ff=1536,
                 vocab_size=2048)
            if big else
            dict(n_layers=3, n_embd=256, n_heads=4, n_kv_heads=2, n_ff=768,
                 vocab_size=1024))
    src = os.path.join(tmp, "f32.gguf")
    make_llama_gguf(src, gtype=GGMLType.F32, **geom)

    rng = np.random.default_rng(seed)
    toks = rng.integers(0, geom["vocab_size"], (4, 128)).astype(np.int32)

    ref = Model.load(src, quantized=False, dtype=jnp.float32)
    ref_lg = _logits(ref, toks)

    # imatrix from the synthetic model's own activations
    from imatrix import collect_imatrix

    sums, counts = collect_imatrix(ref, rng.integers(
        0, geom["vocab_size"], 2048).astype(np.int32).tolist(),
        n_ctx=128, batch=2, progress=False)
    imatrix = {k: np.asarray(s) / max(c, 1) for (k, s), c
               in zip(sums.items(), counts.values())}

    report: dict = {"geometry": geom, "ftypes": {}, "imatrix": {}}
    for ftype in ladder:
        dst = os.path.join(tmp, f"{ftype}.gguf")
        stats = quantize_file(src, dst, ftype, quiet=True)
        m = Model.load(dst, quantized=False, dtype=jnp.float32)
        kl, agree = _kl_top1(ref_lg, _logits(m, toks))
        rmse = [v[2] for v in stats.values() if v[2] > 0]
        report["ftypes"][ftype] = {
            "kl_mean": kl,
            "top1_agree": agree,
            "rmse_mean": float(np.mean(rmse)) if rmse else 0.0,
            "bytes": os.path.getsize(dst),
        }
        print(f"{ftype:8s} kl={kl:.5f} top1={agree:.3f}", file=sys.stderr)

    for ftype in imatrix_ftypes:
        dst = os.path.join(tmp, f"{ftype}.im.gguf")
        quantize_file(src, dst, ftype, imatrix=imatrix, quiet=True)
        m = Model.load(dst, quantized=False, dtype=jnp.float32)
        kl, agree = _kl_top1(ref_lg, _logits(m, toks))
        report["imatrix"][ftype] = {"kl_mean": kl, "top1_agree": agree}
        delta = kl - report["ftypes"][ftype]["kl_mean"]
        print(f"{ftype:8s} imatrix kl={kl:.5f} (delta {delta:+.5f})", file=sys.stderr)

    # gates (report, don't raise: the JSON is the artifact, tests assert)
    anchors = [f for f in ("Q8_0", "Q4_K_M", "Q2_K", "IQ1_S") if f in ladder]
    lad = [report["ftypes"][f]["kl_mean"] for f in anchors]
    report["gates"] = {
        # strict per-step monotonicity is noisy at synthetic scale; gate on
        # family anchors like the reference's published ladder
        "ladder_anchors_ok": bool(all(a <= b for a, b in zip(lad, lad[1:]))),
        "q8_near_lossless": bool(
            report["ftypes"].get("Q8_0", {"kl_mean": 0})["kl_mean"] < 1e-3
        ),
        "q4km_top1": report["ftypes"].get("Q4_K_M", {}).get("top1_agree"),
        "imatrix_helps": {
            f: bool(report["imatrix"][f]["kl_mean"]
                    <= report["ftypes"][f]["kl_mean"] * 1.05)
            for f in imatrix_ftypes
        },
    }
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {out_path}", file=sys.stderr)
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="QUALITY.json")
    ap.add_argument("--big", action="store_true", help="larger synthetic geometry")
    args = ap.parse_args()
    run(args.out, big=args.big)


if __name__ == "__main__":
    main()
