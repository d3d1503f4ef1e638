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
import os
from typing import NamedTuple

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


# ---------------------------------------------------------------------------
# blockwise online-softmax attention (long context; quantized-KV consumer)
# ---------------------------------------------------------------------------
# Streams the KV context through VMEM in `bs`-column blocks with running
# (max, denom, acc) state — the TPU form of the reference's tiled fattn
# (ggml-cuda/fattn-tile.cu online softmax) — so 32k+ contexts never
# materialize [T, S] scores in HBM and VMEM use is O(bs*d), not O(s*d).
# Consumes Q8-quantized KV directly (reference: ggml-cuda/fattn-vec.cuh
# quantized-KV loads): int8 codes stream from HBM at half the bf16 bytes;
# per-vector scales fold into the score row (K) and probability row (V)
# instead of rescaling the tensors, so dequant adds no [bs, d]-sized
# multiplies.
#
# Fully-masked blocks contribute p=exp(0)=1 junk rows, but the running
# rescale alpha=exp(m_prev - m_new) zeroes them the moment a valid block
# arrives; causally every row has a valid block (its own position), so the
# finalize step always divides by a sound denominator.


def _attnb_kernel(scale, softcap, window, g, t, bs, d, hkv, nsb, use_sinks, quant, *refs):
    idx = 1
    pos_ref = refs[0]
    sink_ref = None
    if use_sinks:
        sink_ref = refs[1]
        idx = 2
    q_ref, k_ref, v_ref = refs[idx : idx + 3]
    idx += 3
    if quant:
        ks_ref, vs_ref = refs[idx : idx + 2]
        idx += 2
    out_ref = refs[idx]
    m_ref, l_ref, acc_ref = refs[idx + 1 : idx + 4]

    i = pl.program_id(0)
    j = pl.program_id(1)
    tg = t * g

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pos0 = pos_ref[i]
    col0 = j * bs
    run = col0 <= pos0 + (t - 1)  # block starts beyond every row's position
    if window > 0:
        # earliest column any row's window reaches is pos0 - window + 1
        run &= (col0 + bs) > (pos0 - window + 1)

    @pl.when(run)
    def _():
        q = q_ref[0].astype(jnp.float32)  # [TG, D]
        k = k_ref[0].astype(jnp.float32)  # [BS, D]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [TG, BS]
        if quant:
            scores = scores * ks_ref[0][None, :]  # per-key scales on the row
        if softcap > 0:
            scores = jnp.tanh(scores / softcap) * softcap

        t_idx = jax.lax.broadcasted_iota(jnp.int32, (tg, bs), 0) // g
        cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (tg, bs), 1)
        qp = pos0 + t_idx
        mask = cols <= qp
        if window > 0:
            mask &= cols > qp - window
        scores = jnp.where(mask, scores, NEG_INF)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)  # [TG, BS]
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if quant:
            p = p * vs_ref[0][None, :]  # per-value scales on the prob row
        vf = v_ref[0].astype(jnp.float32)  # [BS, D]
        pv = jax.lax.dot_general(
            p, vf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == nsb - 1)
    def _():
        m = m_ref[:, :1]
        l = l_ref[:, :1]
        acc = acc_ref[:]
        if use_sinks:
            gidx = jax.lax.broadcasted_iota(jnp.int32, (tg, 1), 0) % g
            kv_head = i % hkv
            sink = jnp.zeros((tg, 1), jnp.float32)
            for gi in range(g):
                sink = jnp.where(gidx == gi, sink_ref[kv_head * g + gi], sink)
            m_fin = jnp.maximum(m, sink)
            r = jnp.exp(m - m_fin)
            acc = acc * r
            l = l * r + jnp.exp(sink - m_fin)
        out_ref[0] = (acc / l).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "softcap", "window", "block_s", "interpret"),
)
def flash_attention_blockwise(
    q: jax.Array,  # [B, T, Hq, D]
    k: jax.Array,  # [B, Hkv, S, D] (bf16, or int8 with ks/vs)
    v: jax.Array,
    positions: jax.Array,  # [B, T]; consecutive per row
    *,
    scale: float,
    softcap: float = 0.0,
    window: int = 0,
    sinks: jax.Array | None = None,  # [Hq]
    ks: jax.Array | None = None,  # [B, Hkv, S, 1] f32 per-key scales
    vs: jax.Array | None = None,
    block_s: int = 512,
    interpret: bool = False,
) -> jax.Array:
    b, t, hq, d = q.shape
    hkv, s = k.shape[1], k.shape[2]
    g = hq // hkv
    bs = min(block_s, s)
    assert s % bs == 0, (s, bs)
    nsb = s // bs
    quant = ks is not None

    qg = q.reshape(b, t, hkv, g, d).transpose(0, 2, 1, 3, 4).reshape(b * hkv, t * g, d)
    kh = k.reshape(b * hkv, s, d)
    vh = v.reshape(b * hkv, s, d)
    pos0 = jnp.repeat(positions[:, 0], hkv, axis=0).astype(jnp.int32)

    in_specs = [
        pl.BlockSpec((1, t * g, d), lambda i, j, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bs, d), lambda i, j, *_: (i, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bs, d), lambda i, j, *_: (i, j, 0), memory_space=pltpu.VMEM),
    ]
    args = [qg, kh, vh]
    if quant:
        in_specs += [
            pl.BlockSpec((1, bs), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM),
        ]
        args += [ks.reshape(b * hkv, s), vs.reshape(b * hkv, s)]

    use_sinks = sinks is not None
    scalar_args = [pos0]
    n_prefetch = 1
    if use_sinks:
        scalar_args.append(sinks.astype(jnp.float32))
        n_prefetch = 2

    tg = t * g
    kernel = functools.partial(
        _attnb_kernel, scale, softcap, window, g, t, bs, d, hkv, nsb, use_sinks, quant
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(b * hkv, nsb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tg, d), lambda i, j, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tg, 128), jnp.float32),
            pltpu.VMEM((tg, 128), jnp.float32),
            pltpu.VMEM((tg, d), jnp.float32),
        ],
    )
    kv_bytes = kh.size * kh.dtype.itemsize + vh.size * vh.dtype.itemsize
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * hkv, tg, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * t * s * d,
            bytes_accessed=qg.size * 2 + kv_bytes,
            transcendentals=b * hq * t * s,
        ),
        interpret=interpret,
    )(*scalar_args, *args)
    return out.reshape(b, hkv, t, g, d).transpose(0, 2, 1, 3, 4).reshape(b, t, hq, d)


# ---------------------------------------------------------------------------
# paged attention (page-table-indexed blockwise online softmax)
# ---------------------------------------------------------------------------
# Same math as _attnb_kernel, but the K/V blocks live in a shared
# token-minor page pool [Hkv, D, P*ps] and each (slot, logical page)
# resolves through a scalar-prefetched page table
# (runtime/paged.PagedKVCache).  The index maps read the table, so the DMA
# engine fetches the right physical page while the previous block computes
# — the TPU-native counterpart of the reference's cell-indexed unified
# cache reads (set_input_k_idxs, src/llama-kv-cache.h:194-200).


def _paged_attn_kernel(scale, softcap, window, g, t, ps, d, hkv, nlp,
                       pos_ref, tbl_ref, q_ref, k_ref, v_ref, out_ref,
                       m_ref, l_ref, acc_ref):
    # token-minor page tiles [D, ps]: scores contract q's lanes with the
    # tile's sublanes, PV contracts both on lanes
    i = pl.program_id(0)
    j = pl.program_id(1)
    tg = q_ref.shape[1]

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pos0 = pos_ref[i]
    col0 = j * ps
    run = col0 <= pos0 + (t - 1)
    if window > 0:
        run &= (col0 + ps) > (pos0 - window + 1)

    @pl.when(run)
    def _():
        q = q_ref[0].astype(jnp.float32)  # [TG, D]
        kt = k_ref[0].astype(jnp.float32)  # [D, ps]
        scores = jax.lax.dot_general(
            q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [TG, ps]
        if softcap > 0:
            scores = jnp.tanh(scores / softcap) * softcap

        t_idx = jax.lax.broadcasted_iota(jnp.int32, (tg, ps), 0) // g
        cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (tg, ps), 1)
        qp = pos0 + t_idx
        mask = cols <= qp
        if window > 0:
            mask &= cols > qp - window
        scores = jnp.where(mask, scores, NEG_INF)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        vt = v_ref[0]  # [D, ps]
        pv = jax.lax.dot_general(
            p.astype(vt.dtype), vt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == nlp - 1)
    def _():
        out_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("page_size", "scale", "softcap", "window", "interpret"),
)
def paged_attention(
    q: jax.Array,  # [B, T, Hq, D]
    k_pool: jax.Array,  # [Hkv, D, P * ps] (token-minor)
    v_pool: jax.Array,
    table: jax.Array,  # int32 [B, LP + 1]
    positions: jax.Array,  # [B, T]; consecutive per row
    *,
    page_size: int,
    scale: float,
    softcap: float = 0.0,
    window: int = 0,
    interpret: bool = False,
) -> jax.Array:
    b, t, hq, d = q.shape
    hkv = k_pool.shape[0]
    ps = page_size
    g = hq // hkv
    nlp = table.shape[1] - 1  # logical pages (last column is the trash pin)
    tg = t * g

    qg = q.reshape(b, t, hkv, g, d).transpose(0, 2, 1, 3, 4).reshape(b * hkv, tg, d)
    pos0 = jnp.repeat(positions[:, 0], hkv, axis=0).astype(jnp.int32)

    def q_map(i, j, pos, tbl):
        return (i, 0, 0)

    def kv_map(i, j, pos, tbl):
        return (i % hkv, 0, tbl[i // hkv, j])

    in_specs = [
        pl.BlockSpec((1, tg, d), q_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d, ps), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d, ps), kv_map, memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(
        _paged_attn_kernel, scale, softcap, window, g, t, ps, d, hkv, nlp
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b * hkv, nlp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tg, d), lambda i, j, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tg, 128), jnp.float32),
            pltpu.VMEM((tg, 128), jnp.float32),
            pltpu.VMEM((tg, d), jnp.float32),
        ],
    )
    s = nlp * ps
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * hkv, tg, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * t * s * d,
            bytes_accessed=qg.size * 2 + 2 * b * hkv * s * d * k_pool.dtype.itemsize,
            transcendentals=b * hq * t * s,
        ),
        interpret=interpret,
    )(pos0, table.astype(jnp.int32), qg, k_pool, v_pool)
    return out.reshape(b, hkv, t, g, d).transpose(0, 2, 1, 3, 4).reshape(b, t, hq, d)


# ---------------------------------------------------------------------------
# fused decode step: KV-row insert + attention, one kernel per layer
# ---------------------------------------------------------------------------
# At T=1 the XLA attention path decomposes into ~15 tiny ops per layer
# (DUS writes, mask iota, score matmuls, softmax fusions) whose launch
# overhead dominates the ~1.3us of actual KV bandwidth.  This kernel does
# the reference's per-layer decode attention (ggml-cuda/fattn-vec*.cuh:
# cache insert happens in the graph before fattn) in ONE launch: the new
# K/V row is inserted into the VMEM tile, scores/softmax/PV never leave
# VMEM, and only the BS-row cache block containing `pos` is written back
# through aliased in/out buffers (in-place, no cache copy).
#
# Block specs read q and the caches in their NATIVE layouts ([B, 1, Hq, D]
# / [B, Hkv, S, D]) — reshaping/transposing outside the kernel made XLA
# materialize full K/V copies per layer (measured +165us/step at 22
# layers), which is exactly what this kernel exists to avoid.

_DECODE_BS = 256  # cache write-back granularity (rows)


def _attn_decode_kernel(scale, softcap, window, g, s, d, bs,
                        pos_ref, q_ref, kn_ref, vn_ref, kc_ref, vc_ref,
                        out_ref, kout_ref, vout_ref):
    # caches arrive TRANSPOSED ([D, S]: S on lanes).  For d < 128 XLA packs
    # the cache S-minor in HBM ((8,128) tiles would waste 1 - d/128 of
    # every tile D-minor), so this orientation is both the copy-free one at
    # the jit boundary and the full-bandwidth one for the DMA.
    b = pl.program_id(0)
    h = pl.program_id(1)
    pos = pos_ref[b]
    pw = jnp.minimum(pos, s - 1)  # trash rows (pos==max_len) clamp like DUS

    k_t = kc_ref[0, 0]  # [D, S]
    v_t = vc_ref[0, 0]
    # this kv head's new column via a masked lane reduce (a dynamic lane
    # slice would need 128-alignment Mosaic can't prove for h)
    hkv = kn_ref.shape[3]
    hsel = jax.lax.broadcasted_iota(jnp.int32, (d, hkv), 1) == h
    kn = jnp.sum(jnp.where(hsel, kn_ref[0, 0].astype(jnp.float32), 0.0),
                 axis=1, keepdims=True)  # [D, 1] f32
    vn = jnp.sum(jnp.where(hsel, vn_ref[0, 0].astype(jnp.float32), 0.0),
                 axis=1, keepdims=True)
    cols_ds = jax.lax.broadcasted_iota(jnp.int32, (d, s), 1)
    k_cur = jnp.where(cols_ds == pw, kn, k_t.astype(jnp.float32)).astype(k_t.dtype)
    v_cur = jnp.where(cols_ds == pw, vn, v_t.astype(jnp.float32)).astype(v_t.dtype)

    # write back only the BS-column block containing pos (out spec points
    # there); dynamic ref load + column insert (Mosaic has no value-level
    # dynamic_slice)
    pb = (pw // bs) * bs
    cols_b = pb + jax.lax.broadcasted_iota(jnp.int32, (d, bs), 1)
    kout_ref[0, 0] = jnp.where(
        cols_b == pw, kn.astype(k_t.dtype), kc_ref[0, 0, :, pl.ds(pb, bs)]
    )
    vout_ref[0, 0] = jnp.where(
        cols_b == pw, vn.astype(v_t.dtype), vc_ref[0, 0, :, pl.ds(pb, bs)]
    )

    q = q_ref[0, 0].astype(jnp.float32)  # [G, D]
    scores = jax.lax.dot_general(
        q, k_cur.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [G, S]
    if softcap > 0:
        scores = jnp.tanh(scores / softcap) * softcap
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, s), 1)
    mask = cols <= pos
    if window > 0:
        mask &= cols > pos - window
    scores = jnp.where(mask, scores, NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v_t.dtype)
    out = jax.lax.dot_general(
        probs, v_cur, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [G, D] (contraction over S lanes of both)
    out_ref[0, 0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "softcap", "window", "interpret"),
    donate_argnums=(3, 4),
)
def attn_decode_update(
    q: jax.Array,  # [B, 1, Hq, D]
    k_new: jax.Array,  # [B, 1, Hkv, D]
    v_new: jax.Array,  # [B, 1, Hkv, D]
    kc: jax.Array,  # [B, Hkv, S, D] cache (donated; updated in place)
    vc: jax.Array,
    positions: jax.Array,  # [B, 1] int32
    *,
    scale: float,
    softcap: float = 0.0,
    window: int = 0,
    interpret: bool = False,
):
    """-> (att [B, 1, Hq, D], kc', vc') with k_new/v_new written at pos.

    The caches cross the kernel boundary as logical transposes
    [B, Hkv, D, S]: that logical shape's default layout IS the S-minor
    layout XLA prefers for d < 128 caches (compact (8,128) tiles), so the
    outside transposes are free bitcasts and no relayout copies appear
    around the custom call."""
    b, _, hq, d = q.shape
    hkv, s = kc.shape[1], kc.shape[2]
    g = hq // hkv
    bs = _DECODE_BS
    pos0 = positions[:, 0].astype(jnp.int32)
    kct = kc.transpose(0, 1, 3, 2)  # [B, Hkv, D, S] bitcast view
    vct = vc.transpose(0, 1, 3, 2)
    knt = k_new.astype(kc.dtype).transpose(0, 1, 3, 2)  # [B, 1, D, Hkv]
    vnt = v_new.astype(vc.dtype).transpose(0, 1, 3, 2)

    def q_map(i, h, pos):
        return (i, 0, h, 0)

    def full_map(i, h, pos):
        return (i, 0, 0, 0)

    def cache_map(i, h, pos):
        return (i, h, 0, 0)

    def wb_map(i, h, pos):
        return (i, h, 0, jnp.minimum(pos[i], s - 1) // bs)

    in_specs = [
        pl.BlockSpec((1, 1, g, d), q_map, memory_space=pltpu.VMEM),  # q
        pl.BlockSpec((1, 1, d, hkv), full_map, memory_space=pltpu.VMEM),  # k_new^T
        pl.BlockSpec((1, 1, d, hkv), full_map, memory_space=pltpu.VMEM),  # v_new^T
        pl.BlockSpec((1, 1, d, s), cache_map, memory_space=pltpu.VMEM),  # kc^T
        pl.BlockSpec((1, 1, d, s), cache_map, memory_space=pltpu.VMEM),  # vc^T
    ]
    out_specs = [
        pl.BlockSpec((1, 1, g, d), q_map, memory_space=pltpu.VMEM),  # att
        pl.BlockSpec((1, 1, d, bs), wb_map, memory_space=pltpu.VMEM),  # kc'^T
        pl.BlockSpec((1, 1, d, bs), wb_map, memory_space=pltpu.VMEM),  # vc'^T
    ]
    kernel = functools.partial(_attn_decode_kernel, scale, softcap, window, g, s, d, bs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hkv),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    kv_bytes = 2 * b * hkv * s * d * kc.dtype.itemsize
    att, kc2, vc2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, hq, d), q.dtype),
            jax.ShapeDtypeStruct(kct.shape, kc.dtype),
            jax.ShapeDtypeStruct(vct.shape, vc.dtype),
        ],
        # operand indices include the scalar-prefetch arg (pos0 is 0)
        input_output_aliases={4: 1, 5: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * s * d,
            bytes_accessed=kv_bytes,
            transcendentals=b * hq * s,
        ),
        interpret=interpret,
    )(pos0, q, knt, vnt, kct, vct)
    return att, kc2.transpose(0, 1, 3, 2), vc2.transpose(0, 1, 3, 2)


# ---------------------------------------------------------------------------
# fused paged decode step: page insert + attention, one kernel per layer
# ---------------------------------------------------------------------------
# The paged pool's decode step used to pay a measured 10.6%/step penalty vs
# the contiguous cache because the token scatter (PagedKVCache.update) and
# the attention ran as separate XLA programs.  This kernel does both in one
# launch: page blocks stream through VMEM via the scalar-prefetched page
# table exactly like paged_attention (the DMA engine fetches page j+1
# during page j's compute), the new K/V row is inserted into the VMEM tile
# of the page containing `pos`, and ONLY that physical page is written back
# through an aliased pool output whose index map is constant over the page
# grid axis (one flush per (batch, head) row).  Reference analogue: the
# cell-indexed unified cache consumed directly by fattn
# (ggml-cuda/fattn-vec.cuh + src/llama-kv-cache.h:182-200).


def _paged_decode_kernel(scale, softcap, window, hq, hkv, g, ps, d, nlp,
                         pos_ref, tbl_ref, q_ref, kn_ref, vn_ref,
                         kp_ref, vp_ref, out_ref, kout_ref, vout_ref,
                         kbuf, vbuf, wkbuf, wvbuf, m_ref, l_ref, acc_ref,
                         rsem, wsem):
    i = pl.program_id(0)  # batch row
    j = pl.program_id(1)  # logical page
    pos = pos_ref[i]
    po = pos % ps  # offset within the insert page

    def page_of(lp):
        return tbl_ref[i, lp]

    def running(lp):
        r = lp * ps <= pos
        if window > 0:
            r &= (lp + 1) * ps > pos - window + 1
        return r & (lp < nlp)

    def start_fetch(lp, slot):
        page = page_of(lp)
        pltpu.make_async_copy(
            kp_ref.at[:, :, pl.ds(page * ps, ps)], kbuf.at[slot], rsem.at[slot, 0]
        ).start()
        pltpu.make_async_copy(
            vp_ref.at[:, :, pl.ds(page * ps, ps)], vbuf.at[slot], rsem.at[slot, 1]
        ).start()

    run = running(j)
    slot = jax.lax.rem(j, 2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(run)
        def _():
            start_fetch(j, slot)

    # double buffering: kick page j+1's fetch before computing page j
    @pl.when(running(j + 1))
    def _():
        start_fetch(j + 1, 1 - slot)

    is_ins = j == pos // ps  # the page receiving this step's K/V row

    @pl.when(run)
    def _():
        pltpu.make_async_copy(kp_ref.at[:, :, pl.ds(0, ps)], kbuf.at[slot],
                              rsem.at[slot, 0]).wait()
        pltpu.make_async_copy(vp_ref.at[:, :, pl.ds(0, ps)], vbuf.at[slot],
                              rsem.at[slot, 1]).wait()
        dtype = kp_ref.dtype
        sw = hkv * ps
        kt = kbuf[slot]  # [hkv, d, ps] token-minor page tiles
        vt = vbuf[slot]
        # new K/V rows as [d, 1] columns (eye-dot = the [1,d]->[d,1]
        # transpose Mosaic lacks a value op for), then head-segment select
        eye = (jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)).astype(jnp.float32)
        knr = kn_ref[0].astype(jnp.float32)  # [hkv, d]
        vnr = vn_ref[0].astype(jnp.float32)
        hsel = jax.lax.broadcasted_iota(jnp.int32, (hkv, d), 0)
        kcols, vcols = [], []
        for jh in range(hkv):
            knj = jnp.sum(jnp.where(hsel == jh, knr, 0.0), axis=0, keepdims=True)
            vnj = jnp.sum(jnp.where(hsel == jh, vnr, 0.0), axis=0, keepdims=True)
            kcols.append(jax.lax.dot_general(
                eye, knj, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32))
            vcols.append(jax.lax.dot_general(
                eye, vnj, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32))

        # heads side-by-side on lanes: [d, hkv*ps]
        if hkv == 1:
            k_wide, v_wide = kt[0], vt[0]
            kn_w, vn_w = kcols[0], vcols[0]
        else:
            k_wide = jnp.concatenate([kt[jh] for jh in range(hkv)], axis=1)
            v_wide = jnp.concatenate([vt[jh] for jh in range(hkv)], axis=1)
            colsw = jax.lax.broadcasted_iota(jnp.int32, (d, sw), 1)
            kn_w, vn_w = kcols[0], vcols[0]
            for jh in range(1, hkv):
                kn_w = jnp.where(colsw >= jh * ps, kcols[jh], kn_w)
                vn_w = jnp.where(colsw >= jh * ps, vcols[jh], vn_w)
        cols_in = jax.lax.broadcasted_iota(jnp.int32, (d, sw), 1) % ps
        ins = is_ins & (cols_in == po)
        k_wide = jnp.where(ins, kn_w.astype(dtype), k_wide)
        v_wide = jnp.where(ins, vn_w.astype(dtype), v_wide)

        @pl.when(is_ins)
        def _():
            cols_p = jax.lax.broadcasted_iota(jnp.int32, (hkv, d, ps), 2)
            hsel3 = jax.lax.broadcasted_iota(jnp.int32, (hkv, d, ps), 0)
            kn3 = jnp.where(hsel3 == 0, kcols[0], 0.0)
            vn3 = jnp.where(hsel3 == 0, vcols[0], 0.0)
            for jh in range(1, hkv):
                kn3 = jnp.where(hsel3 == jh, kcols[jh], kn3)
                vn3 = jnp.where(hsel3 == jh, vcols[jh], vn3)
            wkbuf[:] = jnp.where(cols_p == po, kn3.astype(dtype), kt)
            wvbuf[:] = jnp.where(cols_p == po, vn3.astype(dtype), vt)
            page = page_of(j)
            wk = pltpu.make_async_copy(
                wkbuf, kout_ref.at[:, :, pl.ds(page * ps, ps)], wsem.at[0])
            wv = pltpu.make_async_copy(
                wvbuf, vout_ref.at[:, :, pl.ds(page * ps, ps)], wsem.at[1])
            wk.start()
            wv.start()
            wk.wait()
            wv.wait()

        q = q_ref[0].astype(jnp.float32)  # [hq, d]
        scores = jax.lax.dot_general(
            q, k_wide.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [hq, hkv*ps]
        if softcap > 0:
            scores = jnp.tanh(scores / softcap) * softcap
        rr = jax.lax.broadcasted_iota(jnp.int32, (hq, sw), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (hq, sw), 1)
        cols = j * ps + cc % ps
        mask = (rr // g == cc // ps) & (cols <= pos)
        if window > 0:
            mask &= cols > pos - window
        scores = jnp.where(mask, scores, NEG_INF)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(dtype), v_wide, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == nlp - 1)
    def _():
        out_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("page_size", "scale", "softcap", "window", "interpret"),
    donate_argnums=(3, 4),
)
def paged_attn_decode_update(
    q: jax.Array,  # [B, 1, Hq, D] (roped)
    k_new: jax.Array,  # [B, 1, Hkv, D] (roped)
    v_new: jax.Array,
    k_pool: jax.Array,  # [Hkv, D, P * ps] token-minor (donated; updated in place)
    v_pool: jax.Array,
    table: jax.Array,  # int32 [B, LP + 1]; last column = trash page 0
    positions: jax.Array,  # [B, 1] int32; >= horizon rows skip the insert
    *,
    page_size: int,
    scale: float,
    softcap: float = 0.0,
    window: int = 0,
    interpret: bool = False,
):
    """-> (att [B, 1, Hq, D], k_pool', v_pool').

    Grid (B, LP): one step per (slot, logical page), ALL kv heads together
    (a [Hkv, ps, D] strided DMA per page, hand-double-buffered, pools in
    HBM via memory-space ANY — VMEM-blocked pool operands made XLA's
    memory-space assignment stage every layer's pool at ~120GB/s).  Scores
    run block-diagonal over the heads stacked on sublanes, so there is no
    query-group tiling constraint (g=4 llama-8B included).  Pages past
    `pos` (and outside the sliding window) are neither fetched nor
    computed — decode reads scale with the actual context, not the
    horizon."""
    b, _, hq, d = q.shape
    hkv = k_pool.shape[0]
    ps = page_size
    g = hq // hkv
    nlp = table.shape[1] - 1

    qg = q.reshape(b, hq, d)
    knr = k_new.astype(k_pool.dtype).reshape(b, hkv, d)
    vnr = v_new.astype(v_pool.dtype).reshape(b, hkv, d)
    pos0 = positions[:, 0].astype(jnp.int32)

    def row_map(i, j, pos, tbl):
        return (i, 0, 0)

    hbm = pltpu.MemorySpace.HBM
    in_specs = [
        pl.BlockSpec((1, hq, d), row_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hkv, d), row_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hkv, d), row_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=hbm),
        pl.BlockSpec(memory_space=hbm),
    ]
    out_specs = [
        pl.BlockSpec((1, hq, d), row_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=hbm),
        pl.BlockSpec(memory_space=hbm),
    ]
    kernel = functools.partial(
        _paged_decode_kernel, scale, softcap, window, hq, hkv, g, ps, d, nlp
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nlp),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, hkv, d, ps), k_pool.dtype),
            pltpu.VMEM((2, hkv, d, ps), v_pool.dtype),
            pltpu.VMEM((hkv, d, ps), k_pool.dtype),
            pltpu.VMEM((hkv, d, ps), v_pool.dtype),
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.VMEM((hq, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    att, kp2, vp2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, d), q.dtype),
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
        ],
        # operand indices count the two scalar-prefetch args
        input_output_aliases={5: 1, 6: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * nlp * ps * d,
            bytes_accessed=2 * b * hkv * nlp * ps * d * k_pool.dtype.itemsize,
            transcendentals=b * hq * nlp * ps,
        ),
        interpret=interpret,
    )(pos0, table.astype(jnp.int32), qg, knr, vnr, k_pool, v_pool)
    return att.reshape(b, 1, hq, d), kp2, vp2


def use_paged_decode_fused(t: int, ps: int, d: int, g: int, hq: int,
                           interpret: bool) -> bool:
    """Fused paged-decode eligibility: T=1, lane-aligned pages, supported
    head_dim (all heads ride one grid step, so no query-group constraint)."""
    import os as _os

    import jax as _jax

    if _os.environ.get("ZLLM_NO_FLASH", "0") == "1":
        return False
    if _os.environ.get("ZLLM_NO_PAGED_FUSED", "0") == "1":
        return False
    on_tpu = _jax.default_backend() != "cpu"
    return (
        (on_tpu or interpret)
        and t == 1
        and ps % 128 == 0
        and d in (64, 128)
    )


# ---------------------------------------------------------------------------
# fully-fused decode step: qkv-split + q/k norms + rope + KV insert + attention
# ---------------------------------------------------------------------------
# One launch per layer consuming the RAW projection output [B, Hq+2Hkv, D]:
# the q/k head split, optional per-head RMS norms (qwen3/gemma3), and rope
# all happen in-kernel, so the ~10 XLA glue ops per layer (slices, rope
# mul/concat chains, transposes) that capped decode at 66% of roofline in
# round 3 disappear.  Rope arrives as a per-position [D, D] rotation matrix
# (ops/layers.rope_rot_matrix): applying it is one tiny MXU matmul and the
# same code path covers norm/neox/partial-dim styles (reference analogue:
# ggml-cuda fuses rope into the graph per-op; TPU-native fusion happens
# here instead).  Small GQA groups (g=4: llama-8B) that the plain fused
# kernel rejects (Mosaic needs 8-row blocks) are handled by processing
# `hpb` kv heads per grid step with their caches laid side-by-side on the
# lane axis — same HBM bytes, scores masked block-diagonally.


def _decode_hpb(g: int, hq: int, hkv: int, s: int = 0, d: int = 0) -> int:
    """kv-heads per grid step: the LARGEST hpb whose q block is
    Mosaic-tileable (rows multiple of 8, or all of q) and whose side-by-side
    K+V tiles + f32 score rows fit VMEM.  Bigger hpb = fewer grid steps per
    layer = less per-step setup (measured 78us -> 48us/step at 22 layers
    going from 4 steps to 1).  0 = unsupported."""
    def fits(hpb):
        if s and d:
            tiles = hpb * 2 * s * d * 2  # bf16 K+V
            scores = 3 * (hpb * g) * (hpb * s) * 4  # scores/e/probs f32
            return tiles + scores < 10 * 2**20
        return True

    best = 1 if (g % 8 == 0 or (g == hq and hkv == 1)) and fits(1) else 0
    for hpb in (2, 4, 8, 16):
        if hkv % hpb == 0 and (hpb * g) % 8 == 0 and fits(hpb):
            best = hpb
    return best


def _attn_decode_qkv_kernel(scale, softcap, window, g, s, d, bs, hpb, hq, hkv,
                            qk_norm, eps, native, *refs):
    # `native`: caches arrive [.., S, D] (d on lanes) — the XLA-default
    # layout for d == 128, where the transposed trick below would force a
    # full relayout copy per layer (measured 336us/step at 22 layers).
    # Otherwise caches arrive logically transposed [.., D, S]: for d < 128
    # that logical shape's default layout IS the S-minor packing XLA picks
    # for the stored cache, so both are copy-free at the jit boundary.
    #
    # The caches stay in HBM (memory_space ANY) and are pulled into VMEM
    # scratch by explicit in-kernel DMA: VMEM-blocked cache operands made
    # XLA's memory-space-assignment pre-stage every layer's cache through
    # S(1) at ~80GB/s (measured ~68us/step); the in-kernel copy runs at
    # full DMA bandwidth and overlaps the q-side prep below.
    if qk_norm:
        (pos_ref, qh_ref, kvf_ref, rot_ref, qw_ref, kw_ref,
         kc_ref, vc_ref, out_ref, kout_ref, vout_ref,
         kbuf, vbuf, wkbuf, wvbuf, sems) = refs
    else:
        (pos_ref, qh_ref, kvf_ref, rot_ref,
         kc_ref, vc_ref, out_ref, kout_ref, vout_ref,
         kbuf, vbuf, wkbuf, wvbuf, sems) = refs
        qw_ref = kw_ref = None
    i = pl.program_id(0)
    h = pl.program_id(1)
    pos = pos_ref[i]
    pw = jnp.minimum(pos, s - 1)  # trash rows (pos==max_len) clamp like DUS
    rot = rot_ref[0]  # [D, D] f32
    dtype = kc_ref.dtype

    kdma = pltpu.make_async_copy(
        kc_ref.at[i, pl.ds(h * hpb, hpb)], kbuf, sems.at[0])
    vdma = pltpu.make_async_copy(
        vc_ref.at[i, pl.ds(h * hpb, hpb)], vbuf, sems.at[1])
    kdma.start()
    vdma.start()

    q = qh_ref[0].astype(jnp.float32)  # [hpb*G, D]
    if qk_norm:  # per-head RMS before rope (qwen3/gemma3 attn_{q,k}_norm)
        q = q * jax.lax.rsqrt(jnp.mean(q * q, axis=-1, keepdims=True) + eps)
        q = q * qw_ref[0].astype(jnp.float32)
    q = jax.lax.dot_general(
        q, rot, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dtype)  # roped q, cache dtype (matches the old outside-rope path)

    # new K/V rows live in the full [Hq+2Hkv, D] block (Mosaic can't tile
    # sub-8-row blocks); extract each sub-head row by masked sublane reduce
    full = kvf_ref[0].astype(jnp.float32)
    hh = hq + 2 * hkv
    rows_f = jax.lax.broadcasted_iota(jnp.int32, (hh, d), 0)

    if not native:
        # per-sub-head new K (roped) / V as [D, 1] columns; the rot dot
        # doubles as the [1, D] -> [D, 1] transpose Mosaic lacks a value op
        # for
        eye = (jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)).astype(jnp.float32)
    kcols, vcols = [], []
    for jh in range(hpb):
        knj = jnp.sum(jnp.where(rows_f == hq + h * hpb + jh, full, 0.0),
                      axis=0, keepdims=True)  # [1, D]
        vnj = jnp.sum(jnp.where(rows_f == hq + hkv + h * hpb + jh, full, 0.0),
                      axis=0, keepdims=True)
        if qk_norm:
            knj = knj * jax.lax.rsqrt(jnp.mean(knj * knj, axis=-1, keepdims=True) + eps)
            knj = knj * kw_ref[0].astype(jnp.float32)
        if native:
            kcols.append(jax.lax.dot_general(  # roped, stays a [1, D] row
                knj, rot, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
            vcols.append(vnj)
        else:
            kcols.append(jax.lax.dot_general(
                rot, knj, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32))
            vcols.append(jax.lax.dot_general(
                eye, vnj, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32))

    kdma.wait()
    vdma.wait()
    kt = kbuf  # [hpb, D, S] transposed | [hpb, S, D] native
    vt = vbuf
    cat_axis = 0 if native else 1
    if hpb == 1:
        k_wide, v_wide = kt[0], vt[0]
        kn_w, vn_w = kcols[0], vcols[0]
    else:
        # side-by-side (lanes transposed / sublanes native); same HBM bytes
        k_wide = jnp.concatenate([kt[jh] for jh in range(hpb)], axis=cat_axis)
        v_wide = jnp.concatenate([vt[jh] for jh in range(hpb)], axis=cat_axis)
        wshape = (hpb * s, d) if native else (d, hpb * s)
        posw = jax.lax.broadcasted_iota(jnp.int32, wshape, 0 if native else 1)
        kn_w, vn_w = kcols[0], vcols[0]
        for jh in range(1, hpb):
            kn_w = jnp.where(posw >= jh * s, kcols[jh], kn_w)
            vn_w = jnp.where(posw >= jh * s, vcols[jh], vn_w)
    sw = hpb * s
    wshape = (sw, d) if native else (d, sw)
    pos_in = jax.lax.broadcasted_iota(jnp.int32, wshape, 0 if native else 1) % s
    k_cur = jnp.where(pos_in == pw, kn_w.astype(dtype), k_wide)
    v_cur = jnp.where(pos_in == pw, vn_w.astype(dtype), v_wide)

    kdims = ((1,), (1,)) if native else ((1,), (0,))
    scores = jax.lax.dot_general(
        q, k_cur, (kdims, ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [hpb*G, hpb*S]
    if softcap > 0:
        scores = jnp.tanh(scores / softcap) * softcap
    r = hpb * g
    row_head = jax.lax.broadcasted_iota(jnp.int32, (r, sw), 0) // g
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (r, sw), 1)
    col_head = cols2 // s
    col_in = cols2 % s
    mask = (row_head == col_head) & (col_in <= pos)
    if window > 0:
        mask &= col_in > pos - window
    scores = jnp.where(mask, scores, NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
    vdims = ((1,), (0,)) if native else ((1,), (1,))
    out = jax.lax.dot_general(
        probs, v_cur, (vdims, ((), ())), preferred_element_type=jnp.float32
    )  # [hpb*G, D]
    out_ref[0, 0] = out.astype(out_ref.dtype)

    if native:
        # write back only the BS-row block containing pos, per sub-head
        pb = (pw // bs) * bs
        rows_b = pb + jax.lax.broadcasted_iota(jnp.int32, (bs, d), 0)
        hsel3 = jax.lax.broadcasted_iota(jnp.int32, (hpb, bs, d), 0)
        kn3 = jnp.where(hsel3 == 0, kcols[0], 0.0)
        vn3 = jnp.where(hsel3 == 0, vcols[0], 0.0)
        for jh in range(1, hpb):
            kn3 = jnp.where(hsel3 == jh, kcols[jh], kn3)
            vn3 = jnp.where(hsel3 == jh, vcols[jh], vn3)
        wkbuf[:] = jnp.where(rows_b[None] == pw, kn3.astype(dtype),
                             kbuf[:, pl.ds(pb, bs), :])
        wvbuf[:] = jnp.where(rows_b[None] == pw, vn3.astype(dtype),
                             vbuf[:, pl.ds(pb, bs), :])
        wk = pltpu.make_async_copy(
            wkbuf, kout_ref.at[i, pl.ds(h * hpb, hpb), pl.ds(pb, bs), :],
            sems.at[2])
        wv = pltpu.make_async_copy(
            wvbuf, vout_ref.at[i, pl.ds(h * hpb, hpb), pl.ds(pb, bs), :],
            sems.at[3])
        wk.start()
        wv.start()
        wk.wait()
        wv.wait()
        return

    # write back only the BS-column block containing pos, per sub-head
    pb = (pw // bs) * bs
    cols_b = pb + jax.lax.broadcasted_iota(jnp.int32, (d, bs), 1)
    hsel3 = jax.lax.broadcasted_iota(jnp.int32, (hpb, d, bs), 0)
    kn3 = jnp.where(hsel3 == 0, kcols[0], 0.0)
    vn3 = jnp.where(hsel3 == 0, vcols[0], 0.0)
    for jh in range(1, hpb):
        kn3 = jnp.where(hsel3 == jh, kcols[jh], kn3)
        vn3 = jnp.where(hsel3 == jh, vcols[jh], vn3)
    wkbuf[:] = jnp.where(cols_b[None] == pw, kn3.astype(dtype),
                         kbuf[:, :, pl.ds(pb, bs)])
    wvbuf[:] = jnp.where(cols_b[None] == pw, vn3.astype(dtype),
                         vbuf[:, :, pl.ds(pb, bs)])
    wk = pltpu.make_async_copy(
        wkbuf, kout_ref.at[i, pl.ds(h * hpb, hpb), :, pl.ds(pb, bs)],
        sems.at[2])
    wv = pltpu.make_async_copy(
        wvbuf, vout_ref.at[i, pl.ds(h * hpb, hpb), :, pl.ds(pb, bs)],
        sems.at[3])
    wk.start()
    wv.start()
    wk.wait()
    wv.wait()


@functools.partial(
    jax.jit,
    static_argnames=("scale", "softcap", "window", "eps", "interpret"),
    donate_argnums=(1, 2),
)
def attn_decode_qkv(
    qkv3: jax.Array,  # [B, Hq + 2*Hkv, D] raw projection rows (pre-norm/rope)
    kc: jax.Array,  # [B, Hkv, S, D] cache (donated; updated in place)
    vc: jax.Array,
    positions: jax.Array,  # [B, 1] int32
    rot: jax.Array,  # [B, D, D] f32 rope rotation (ops/layers.rope_rot_matrix)
    qw: jax.Array | None = None,  # [D] per-head q norm weight (with kw)
    kw: jax.Array | None = None,
    *,
    scale: float,
    softcap: float = 0.0,
    window: int = 0,
    eps: float = 1e-5,
    interpret: bool = False,
):
    """-> (att [B, 1, Hq, D], kc', vc').  The whole decode attention block
    — head split, optional per-head RMS norms, rope, cache insert, online
    attention — in one Pallas launch per layer."""
    b, hh, d = qkv3.shape
    hkv, s = kc.shape[1], kc.shape[2]
    hq = hh - 2 * hkv
    g = hq // hkv
    hpb = _decode_hpb(g, hq, hkv, s, d)
    bs = _DECODE_BS
    qk_norm = qw is not None
    # match XLA's stored-cache layout (see kernel note); ZLLM_DECODE_NATIVE
    # forces the native [S, D] orientation for d < 128 too (experiment: the
    # transposed path's jit-boundary bitcast provokes an HBM->S(1)->HBM
    # round-trip copy pair per cache per step under memory-space assignment)
    _env_native = os.environ.get("ZLLM_DECODE_NATIVE")
    native = d >= 128 if _env_native is None else _env_native == "1"
    pos0 = positions[:, 0].astype(jnp.int32)
    if native:
        kct, vct = kc, vc  # [B, Hkv, S, D]
    else:
        kct = kc.transpose(0, 1, 3, 2)  # [B, Hkv, D, S] bitcast view
        vct = vc.transpose(0, 1, 3, 2)

    def q_map(i, h, pos):
        return (i, h, 0)

    def full_map(i, h, pos):
        return (i, 0, 0)

    def rot_map(i, h, pos):
        return (i, 0, 0)

    def w_map(i, h, pos):
        return (0, 0)

    def out_map(i, h, pos):
        return (i, 0, h, 0)

    buf_shape = (hpb, s, d) if native else (hpb, d, s)
    wb_shape = (hpb, bs, d) if native else (hpb, d, bs)

    in_specs = [
        pl.BlockSpec((1, hpb * g, d), q_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hh, d), full_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d, d), rot_map, memory_space=pltpu.VMEM),
    ]
    args = [qkv3, qkv3, rot]
    if qk_norm:
        in_specs += [
            pl.BlockSpec((1, d), w_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), w_map, memory_space=pltpu.VMEM),
        ]
        args += [qw.reshape(1, d), kw.reshape(1, d)]
    # caches PINNED to HBM: the kernel DMAs the head block to scratch
    # itself.  VMEM-blocked cache operands made XLA pre-stage them at
    # ~80GB/s through alternate memory (see kernel docstring), and even
    # ANY leaves memory-space-assignment free to stage them through S(1)
    # — profiled at ~70us/step of serial copy-done waits plus ~45MB/step
    # of doubled HBM traffic on TinyLlama.
    hbm = pltpu.MemorySpace.HBM
    in_specs += [
        pl.BlockSpec(memory_space=hbm),
        pl.BlockSpec(memory_space=hbm),
    ]
    args += [kct, vct]
    out_specs = [
        pl.BlockSpec((1, 1, hpb * g, d), out_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=hbm),
        pl.BlockSpec(memory_space=hbm),
    ]
    kernel = functools.partial(
        _attn_decode_qkv_kernel, scale, softcap, window, g, s, d, bs, hpb,
        hq, hkv, qk_norm, eps, native,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hkv // hpb),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM(buf_shape, kc.dtype),
            pltpu.VMEM(buf_shape, vc.dtype),
            pltpu.VMEM(wb_shape, kc.dtype),
            pltpu.VMEM(wb_shape, vc.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    # operand indices include the scalar-prefetch arg (pos0 is 0)
    kc_op = 4 + (2 if qk_norm else 0)
    kv_bytes = 2 * b * hkv * s * d * kc.dtype.itemsize
    att, kc2, vc2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, hq, d), qkv3.dtype),
            jax.ShapeDtypeStruct(kct.shape, kc.dtype),
            jax.ShapeDtypeStruct(vct.shape, vc.dtype),
        ],
        input_output_aliases={kc_op: 1, kc_op + 1: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * s * d,
            bytes_accessed=kv_bytes,
            transcendentals=b * hq * s,
        ),
        interpret=interpret,
    )(pos0, *args)
    if native:
        return att, kc2, vc2
    return att, kc2.transpose(0, 1, 3, 2), vc2.transpose(0, 1, 3, 2)


def use_decode_qkv(t: int, s: int, d: int, g: int, hq: int, hkv: int,
                   interpret: bool) -> bool:
    """Fully-fused decode eligibility: T=1, block-divisible S, supported
    head_dim, a Mosaic-tileable head grouping, VMEM-safe tiles."""
    import os as _os

    import jax as _jax

    if _os.environ.get("ZLLM_NO_FLASH", "0") == "1":
        return False
    if _os.environ.get("ZLLM_NO_DECODE_QKV", "0") == "1":
        return False
    on_tpu = _jax.default_backend() != "cpu"
    hpb = _decode_hpb(g, hq, hkv, s, d)
    return (
        (on_tpu or interpret)
        and t == 1
        and s % _DECODE_BS == 0
        and d in (64, 128)
        and hpb > 0
    )


def use_decode_fused(t: int, s: int, d: int, g: int, hq: int, interpret: bool) -> bool:
    """Fused decode eligibility: T=1, block-divisible S, VMEM-safe tile,
    and a q-group block shape Mosaic accepts (G mult of 8, or all heads)."""
    import os as _os

    import jax as _jax

    if _os.environ.get("ZLLM_NO_FLASH", "0") == "1":
        return False
    on_tpu = _jax.default_backend() != "cpu"
    return (
        (on_tpu or interpret)
        and t == 1
        and s % _DECODE_BS == 0
        and d in (64, 128)
        and (g % 8 == 0 or g == hq)
        and 2 * s * d * 2 < 8 * 2**20  # K+V tile per (b, head) in VMEM
    )


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


class QuantKV(NamedTuple):
    """Q8 KV halves as the attention input: int8 codes + per-vector f32
    scales (reference: quantized type_k/type_v caches consumed by
    fattn-vec).  Produced by KVCacheQ8.layer()."""

    q: jax.Array  # int8 [B, Hkv, S, D]
    s: jax.Array  # f32 [B, Hkv, S, 1]

    @property
    def shape(self):
        return self.q.shape

    def dequant(self, dtype=jnp.bfloat16):
        return self.q.astype(dtype) * self.s.astype(dtype)


def use_blockwise(t: int, s: int, g: int, d: int, interpret: bool) -> bool:
    import os as _os

    import jax as _jax

    if _os.environ.get("ZLLM_NO_FLASH", "0") == "1":
        return False
    on_tpu = _jax.default_backend() != "cpu"
    if not (on_tpu or interpret) or s % 128 != 0:
        return False
    if _os.environ.get("ZLLM_FORCE_BLOCKWISE", "0") == "1":
        return True
    # long contexts: XLA's materialized [T, S] scores become the
    # bottleneck (or exceed memory); stream KV blockwise instead
    return s >= 4096 and not vmem_ok(t, s, g, d)


def attention(q, k, v, positions, *, scale, softcap=0.0, window=0, sinks=None, interpret=False):
    """Dispatch: fused kernel when it fits (TPU), else the jnp reference.
    k/v: [B, Hkv, S, D] arrays, or QuantKV (Q8 cache) consumed in-kernel."""
    from ..runtime.paged import PagedKV

    if isinstance(k, PagedKV):
        import os as _os

        import jax as _jax

        on_tpu = _jax.default_backend() != "cpu"
        if (on_tpu or interpret) and _os.environ.get("ZLLM_NO_FLASH", "0") != "1":
            return paged_attention(
                q, k.k, k.v, k.table, positions, page_size=k.page_size,
                scale=scale, softcap=softcap, window=window, interpret=interpret,
            )
        k, v = k.gather(q.dtype)

    b, t, hq, d = q.shape
    hkv, s = k.shape[1], k.shape[2]
    g = hq // hkv

    if isinstance(k, QuantKV):
        import jax as _jax
        import os as _os

        on_tpu = _jax.default_backend() != "cpu"
        blockwise_ok = s % 128 == 0 and _os.environ.get("ZLLM_NO_FLASH", "0") != "1"
        if (on_tpu or interpret) and blockwise_ok:
            return flash_attention_blockwise(
                q, k.q, v.q, positions, scale=scale, softcap=softcap,
                window=window, sinks=sinks, ks=k.s, vs=v.s, interpret=interpret,
            )
        k, v = k.dequant(q.dtype), v.dequant(q.dtype)

    if use_blockwise(t, s, g, d, interpret):
        return flash_attention_blockwise(
            q, k, v, positions, scale=scale, softcap=softcap, window=window,
            sinks=sinks, interpret=interpret,
        )
    if use_fused(t, s, g, d, hq, b, interpret):
        return flash_attention(
            q, k, v, positions, scale=scale, softcap=softcap, window=window,
            sinks=sinks, interpret=interpret,
        )
    from ..runtime.kvcache import causal_mask
    from .layers import attention_ref

    mask = causal_mask(positions, s, window)
    return attention_ref(q, k, v, mask, scale, logit_softcap=softcap, sinks=sinks)
