"""Fit runtime parameters to device memory (reference: tools/fit-params /
llama_params_fit): project weight + KV + activation memory for a GGUF and
print the largest --ctx/--slots that fit the device HBM, reducing context
first like the reference's fitting order."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_HBM = 16 * 2**30  # per-chip HBM when no device is reachable


def project(path: str, ctx: int, slots: int, kv_bytes_per_el: int = 2):
    from zllm.gguf import read_gguf
    from zllm.models.config import ModelConfig

    f = read_gguf(path)
    cfg = ModelConfig.from_gguf(f)
    weight_bytes = sum(m.nbytes for m in f.tensors.values())
    kv_per_tok = 2 * cfg.n_layers * cfg.n_kv_heads * cfg.head_dim * kv_bytes_per_el
    kv_bytes = kv_per_tok * ctx * slots
    # activation workspace: ~4 residual-stream copies + one vocab logit row
    act_bytes = slots * (4 * cfg.n_embd * 2 + cfg.vocab_size * 4) * 128
    f.close()
    return cfg, weight_bytes, kv_per_tok, kv_bytes, act_bytes


def fit(path: str, ctx: int, slots: int, margin: int = 1 << 30, hbm: int | None = None):
    if hbm is None:
        try:
            import jax

            stats = jax.devices()[0].memory_stats() or {}
            hbm = int(stats.get("bytes_limit", V5E_HBM))
        except Exception:
            hbm = V5E_HBM
    cfg, wb, kv_tok, kvb, ab = project(path, ctx, slots)
    budget = hbm - margin
    total = wb + kvb + ab
    print(f"model weights: {wb / 2**20:.0f} MiB   kv({ctx} x {slots} slots): "
          f"{kvb / 2**20:.0f} MiB   workspace: {ab / 2**20:.0f} MiB   "
          f"device: {hbm / 2**20:.0f} MiB (margin {margin / 2**20:.0f})")
    if total <= budget:
        print(f"fits: total {total / 2**20:.0f} MiB <= budget {budget / 2**20:.0f} MiB")
        return ctx, slots
    if wb + ab > budget:
        print("model does not fit at any context size", file=sys.stderr)
        return 0, 0
    # reduce context (power-of-two steps), then slots — reference order
    new_ctx = ctx
    while new_ctx > 256 and wb + ab + kv_tok * new_ctx * slots > budget:
        new_ctx //= 2
    new_slots = slots
    while new_slots > 1 and wb + ab + kv_tok * new_ctx * new_slots > budget:
        new_slots -= 1
    print(f"fitted CLI arguments: --ctx {new_ctx} --slots {new_slots}")
    return new_ctx, new_slots


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model")
    ap.add_argument("--ctx", type=int, default=32768)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--margin-mib", type=int, default=1024)
    ap.add_argument("--hbm-gib", type=float, default=0, help="override device HBM")
    args = ap.parse_args()
    fit(args.model, args.ctx, args.slots, args.margin_mib << 20,
        int(args.hbm_gib * 2**30) if args.hbm_gib else None)


if __name__ == "__main__":
    main()
