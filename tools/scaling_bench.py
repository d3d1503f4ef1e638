#!/usr/bin/env python
"""Scaling-efficiency harness: engine decode throughput vs device count.

The north-star gate is >=90% scaling efficiency from 1 chip to a v5e-8 on
continuous batching (BASELINE.md); this harness produces the number.  It
runs the SAME mesh-sharded engine decode loop at tp=1 and tp=N (dp=1) and
at dp=N (tp=1) and reports tokens/s and efficiency = tok_s(N) / (N *
tok_s(1)) for dp (throughput scaling) and tok_s(N) / tok_s(1) for tp
(latency scaling at fixed batch).

On this image only ONE real TPU chip is reachable, so by default the
harness runs on the virtual 8-device CPU mesh — that validates the
methodology and the sharded serving path end to end; the numbers become
hardware numbers the moment jax.devices() spans real chips (reference
workflow being matched: llama-bench across -ngl/-ts grids).

Writes SCALING.json.  Usage: python tools/scaling_bench.py [--out F]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _setup_cpu(n: int):
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


def comm_model(cfg, tp: int, dp: int, n_slots: int) -> dict:
    """Analytic per-decode-step collective traffic and per-device compute
    for the Megatron-style plan (zllm.parallel.tp): per layer, wo and
    ffn_down are contraction-sharded and psum their [B,1,D] outputs (ring
    all-reduce moves 2*(tp-1)/tp of the tensor per device), and the
    vocab-sharded head all-gathers [B,1,V/tp] shards.  dp adds no decode
    collectives (slots shard row-wise).  This is the model that explains
    the virtual-CPU-mesh numbers: the per-layer psum payload is CONSTANT
    in tp while per-device compute shrinks ~1/tp, so on a mesh whose
    "interconnect" is memcpy between oversubscribed host cores the
    collective latency floor dominates at small shapes — on real ICI
    (v5e ring: ~45 GB/s/link) the same bytes cost microseconds."""
    b = n_slots
    elt = 2  # bf16
    psum_bytes = 2 * (tp - 1) / tp * b * cfg.n_embd * elt
    per_layer = 2 * psum_bytes  # wo + ffn_down
    gather_bytes = (tp - 1) / tp * b * cfg.vocab_size * 4  # f32 logits
    total = cfg.n_layers * per_layer + gather_bytes
    # per-device matmul FLOPs per token (weights split 1/tp where sharded)
    d, f, v = cfg.n_embd, cfg.n_ff, cfg.vocab_size
    qd, kvd = cfg.n_heads * cfg.head_dim, cfg.n_kv_heads * cfg.head_dim
    per_layer_flops = 2 * (d * (qd + 2 * kvd) + qd * d + 3 * d * f) / tp
    flops = b * (cfg.n_layers * per_layer_flops + 2 * d * v / tp)
    return {
        "collective_bytes_per_step": int(total),
        "psum_bytes_per_layer": int(per_layer),
        "logit_gather_bytes": int(gather_bytes),
        "device_flops_per_step": int(flops),
        # time floors at v5e ICI bandwidth (~45e9 B/s per direction) and
        # bf16 MXU peak (197e12 / 2 for the matvec-bound decode regime)
        "ici_floor_us": round(total / 45e9 * 1e6, 2),
    }


def measure(model, n_slots, steps, tp=1, dp=1, mesh=None):
    """Steady-state engine decode tokens/s with every slot generating."""
    from zllm.server.engine import Engine, Request

    eng = Engine(model, n_slots=n_slots, max_len=256, prefill_chunk=16,
                 tp=tp, dp=dp, mesh=mesh)
    eng.start()
    try:
        # fill every slot, long generations so decode dominates
        reqs = [eng.submit(Request(prompt_tokens=[(i * 3 + j) % 256 for j in range(8)],
                                   max_new=steps, temp=0.0))
                for i in range(n_slots)]
        # wait for all slots prefilled + a warmup tranche of tokens
        warm = steps // 4
        for r in reqs:
            while len(r.out_tokens) < warm and not r.done:
                time.sleep(0.005)
        t0 = time.perf_counter()
        base = sum(len(r.out_tokens) for r in reqs)
        for r in reqs:
            while not r.done:
                if r.stream_q.get(timeout=600) is None:
                    break
            assert not r.error, r.error
        dt = time.perf_counter() - t0
        produced = sum(len(r.out_tokens) for r in reqs) - base
        return produced / dt
    finally:
        eng.stop()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING.json")
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--geom", choices=["tiny", "8b-shape"], default="tiny",
                    help="8b-shape = llama-3-8B per-layer dims at 4 layers: "
                         "the per-layer compute:comm ratio of the real 8B")
    ap.add_argument("--real-overhead", action="store_true",
                    help="single REAL chip: plain step vs 1-device-mesh "
                         "sharded step (the honest mesh-overhead proxy)")
    args = ap.parse_args()

    # decide the platform BEFORE any backend client exists (jax.devices()
    # freezes it); real multi-chip runs opt in with ZLLM_SCALING_REAL=1
    if os.environ.get("ZLLM_SCALING_REAL", "0") != "1" and not args.real_overhead:
        _setup_cpu(args.devices)
    import jax
    import jax.numpy as jnp

    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf

    n = min(args.devices, len(jax.devices()))
    if args.geom == "8b-shape":
        path = os.path.join(REPO, ".cache", "scaling_model_8bshape.gguf")
        shape = dict(n_layers=4, n_embd=4096, n_heads=32, n_kv_heads=8,
                     n_ff=14336, vocab_size=32000)
    else:
        path = os.path.join(REPO, ".cache", "scaling_model.gguf")
        shape = dict(n_layers=4, n_embd=512, n_heads=8, n_kv_heads=8,
                     n_ff=1536, vocab_size=1024)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if not os.path.exists(path):
        make_llama_gguf(path, **shape)
    model = Model.load(path, quantized=True, dtype=jnp.float32)

    if args.real_overhead:
        # single real chip: the sharded (shard_map) step at tp=1 vs the
        # plain step — isolates mesh dispatch/collective-free overhead
        from zllm.parallel import make_mesh

        base = measure(model, args.slots, args.steps)
        mesh1 = make_mesh(jax.devices()[:1], dp=1, tp=1)
        v = measure(model, args.slots, args.steps, mesh=mesh1)
        report = {
            "device": str(jax.devices()[0]),
            "mode": "real_tp1_overhead",
            "geom": args.geom,
            "plain_tok_s": round(base, 2),
            "mesh_tp1_tok_s": round(v, 2),
            "mesh_overhead_frac": round(1.0 - v / base, 4),
        }
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1)
        print(json.dumps(report), file=sys.stderr)
        return

    report = {
        "device": str(jax.devices()[0]),
        "n_devices": n,
        "n_slots": args.slots,
        "geom": args.geom,
        "virtual_cpu_mesh": jax.default_backend() == "cpu",
        "interpretation": (
            "Virtual-CPU-mesh numbers measure the SHARDING MACHINERY, not "
            "hardware scaling: XLA:CPU runs collectives as memcpys between "
            "threads on oversubscribed host cores, so the constant-payload "
            "per-layer psums (see comm_model) dominate as tp grows while "
            "per-device compute shrinks.  On real ICI the same payloads "
            "cost ici_floor_us microseconds/step (v5e ring 45 GB/s), two "
            "orders below the per-step compute at these shapes.  The "
            "8b-shape geometry carries the real model's per-layer "
            "compute:comm ratio; run with ZLLM_SCALING_REAL=1 on real "
            "chips for hardware numbers."
        ),
        "entries": [],
    }
    base = measure(model, args.slots, args.steps)
    report["entries"].append({"tp": 1, "dp": 1, "tok_s": round(base, 2)})
    print(f"tp=1 dp=1: {base:.1f} tok/s", file=sys.stderr)
    for tp in (2, n // 2, n):
        if tp <= 1 or tp > n or any(e["tp"] == tp for e in report["entries"]):
            continue
        try:
            v = measure(model, args.slots, args.steps, tp=tp)
        except Exception as e:  # head counts may not divide
            print(f"tp={tp}: skipped ({e})", file=sys.stderr)
            continue
        report["entries"].append({"tp": tp, "dp": 1, "tok_s": round(v, 2),
                                  "latency_scaling": round(v / base, 3),
                                  "comm_model": comm_model(model.cfg, tp, 1, args.slots)})
        print(f"tp={tp} dp=1: {v:.1f} tok/s", file=sys.stderr)
    if n >= 2:
        dp = min(n, args.slots)
        v = measure(model, args.slots, args.steps, dp=dp)
        report["entries"].append({
            "tp": 1, "dp": dp, "tok_s": round(v, 2),
            "throughput_efficiency": round(v / (dp * base), 3),
        })
        print(f"tp=1 dp={dp}: {v:.1f} tok/s", file=sys.stderr)

    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
