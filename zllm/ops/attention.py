"""Fused attention Pallas kernel.

The TPU counterpart of the reference's flash-attention path (reference:
ggml/src/ggml-cuda/fattn*.cu; graph contract build_attn_mha,
src/llama-graph.cpp:1467-1570 incl. kq_mask, GQA, sliding window, logit
softcap, attention sinks): per (batch, kv-head) grid step, the whole
query group and KV context live in VMEM; scores/softmax/PV never touch
HBM.  GQA-aware — one KV load serves all grouped query heads.

Contract: query positions are consecutive per batch row (positions[b, i]
== positions[b, 0] + i), which holds for chunked prefill and decode; only
the base position travels to the kernel (SMEM scalar).

Contexts whose working set exceeds the VMEM budget fall back to the jnp
reference (zllm/ops/layers.attention_ref); a blockwise online-softmax
variant for 32k+ contexts is future work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -2.4e38  # sub--f32-max filler for masked logits


def _attn_kernel(scale, softcap, window, g, t, s, d, hkv, use_sinks, *refs):
    if use_sinks:
        pos_ref, sink_ref, q_ref, k_ref, v_ref, out_ref = refs
    else:
        pos_ref, q_ref, k_ref, v_ref, out_ref = refs

    i = pl.program_id(0)
    q = q_ref[0].astype(jnp.float32)  # [T*G, D] rows t-major, g-minor
    k = k_ref[0].astype(jnp.float32)  # [S, D]
    v = v_ref[0]  # [S, D]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [T*G, S]
    if softcap > 0:
        scores = jnp.tanh(scores / softcap) * softcap

    pos0 = pos_ref[i]  # scalar-prefetch: base query position of this row
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (t * g, s), 0) // g
    cols = jax.lax.broadcasted_iota(jnp.int32, (t * g, s), 1)
    qp = pos0 + t_idx
    mask = cols <= qp
    if window > 0:
        mask &= cols > qp - window
    scores = jnp.where(mask, scores, NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    if use_sinks:
        # attention sink: a per-head virtual logit joins the softmax
        # denominator (reference: ggml_flash_attn_ext sinks)
        gidx = jax.lax.broadcasted_iota(jnp.int32, (t * g, 1), 0) % g
        kv_head = i % hkv  # this block's kv head; q head = kv_head*g + gi
        sink = jnp.zeros((t * g, 1), jnp.float32)
        for gi in range(g):
            sink = jnp.where(gidx == gi, sink_ref[kv_head * g + gi], sink)
        m = jnp.maximum(m, sink)
        e = jnp.exp(scores - m)
        denom = jnp.sum(e, axis=-1, keepdims=True) + jnp.exp(sink - m)
    else:
        e = jnp.exp(scores - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / denom

    out = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T*G, D]
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "softcap", "window", "interpret"),
)
def flash_attention(
    q: jax.Array,  # [B, T, Hq, D]
    k: jax.Array,  # [B, Hkv, S, D]
    v: jax.Array,  # [B, Hkv, S, D]
    positions: jax.Array,  # [B, T] int32; consecutive per row
    *,
    scale: float,
    softcap: float = 0.0,
    window: int = 0,
    sinks: jax.Array | None = None,  # [Hq]
    interpret: bool = False,
) -> jax.Array:
    b, t, hq, d = q.shape
    hkv, s = k.shape[1], k.shape[2]
    g = hq // hkv

    # per-(batch, kv-head) query groups [B*Hkv, T*G, D]
    qg = q.reshape(b, t, hkv, g, d).transpose(0, 2, 1, 3, 4).reshape(b * hkv, t * g, d)
    kh = k.reshape(b * hkv, s, d)
    vh = v.reshape(b * hkv, s, d)
    pos0 = jnp.repeat(positions[:, 0], hkv, axis=0).astype(jnp.int32)  # [B*Hkv]

    in_specs = [
        pl.BlockSpec((1, t * g, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    use_sinks = sinks is not None
    scalar_args = [pos0]
    n_prefetch = 1
    if use_sinks:
        scalar_args.append(sinks.astype(jnp.float32))  # [Hq], indexed in-kernel
        n_prefetch = 2

    kernel = functools.partial(_attn_kernel, scale, softcap, window, g, t, s, d, hkv, use_sinks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(b * hkv,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, t * g, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * hkv, t * g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * t * s * d,
            bytes_accessed=(qg.size + kh.size + vh.size) * 2,
            transcendentals=b * hq * t * s,
        ),
        interpret=interpret,
    )(*scalar_args, qg, kh, vh)
    # [B*Hkv, T*G, D] -> [B, T, Hq, D]
    return out.reshape(b, hkv, t, g, d).transpose(0, 2, 1, 3, 4).reshape(b, t, hq, d)


def vmem_ok(t: int, s: int, g: int, d: int, budget: int = 10 * 2**20) -> bool:
    """Does one (batch, kv-head) step fit in VMEM?"""
    scores = t * g * s * 4 * 2  # scores + probs f32
    kv = 2 * s * d * 2
    qo = 2 * t * g * d * 4
    return scores + kv + qo < budget


def use_fused(t: int, s: int, g: int, d: int, hq: int, b: int, interpret: bool) -> bool:
    import os as _os

    import jax as _jax

    if _os.environ.get("ZLLM_NO_FLASH", "0") == "1":
        return False
    if _os.environ.get("ZLLM_FORCE_FLASH", "0") == "1":
        return vmem_ok(t, s, g, d)
    on_tpu = _jax.default_backend() != "cpu"
    # honest A/B at (T=512, S=1024): XLA's own attention is ~9% faster than
    # this kernel, so the kernel only dispatches where XLA's materialized
    # score tensor would become the bottleneck (long context / big batch);
    # decode-sized T always stays on the XLA path (launch overhead)
    scores_bytes = 4 * b * hq * t * s
    return (
        (on_tpu or interpret)
        and t >= 8
        and scores_bytes > 256 * 2**20
        and vmem_ok(t, s, g, d)
        and s % 128 == 0
    )


def attention(q, k, v, positions, *, scale, softcap=0.0, window=0, sinks=None, interpret=False):
    """Dispatch: fused kernel when it fits (TPU), else the jnp reference.
    k/v: [B, Hkv, S, D]."""
    b, t, hq, d = q.shape
    hkv, s = k.shape[1], k.shape[2]
    g = hq // hkv
    if use_fused(t, s, g, d, hq, b, interpret):
        return flash_attention(
            q, k, v, positions, scale=scale, softcap=softcap, window=window,
            sinks=sinks, interpret=interpret,
        )
    from ..runtime.kvcache import causal_mask
    from .layers import attention_ref

    mask = causal_mask(positions, s, window)
    return attention_ref(q, k, v, mask, scale, logit_softcap=softcap, sinks=sinks)
