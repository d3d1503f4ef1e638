"""Core transformer ops (jnp; XLA fuses these into the surrounding graph).

Semantics mirror the reference's graph builders (src/llama-graph.cpp
build_norm/build_ffn; ggml rope: ggml/src/ggml-cpu/ops.cpp rope) so that
GGUF weights produce identical math, but the implementation is plain
functional JAX.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array | None, eps: float) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)


class RopeParams(NamedTuple):
    """Static rotary-embedding configuration (llama.h rope_scaling_type &
    yarn params; kernel contract: ggml rope NORM/NEOX modes)."""

    dim: int  # number of rotated dims (<= head_dim)
    base: float = 10000.0
    style: str = "norm"  # "norm": adjacent pairs; "neox": split halves
    # linear / yarn / llama3 frequency scaling
    scaling: str = "none"  # none | linear | yarn | llama3
    scale_factor: float = 1.0
    orig_ctx: int = 0
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    attn_factor: float = 1.0


def _rope_freqs(p: RopeParams) -> tuple[jax.Array, float]:
    """Per-pair inverse frequencies [dim/2] and magnitude scale."""
    half = p.dim // 2
    exponents = jnp.arange(half, dtype=jnp.float32) * (2.0 / p.dim)
    inv_freq = 1.0 / (p.base**exponents)
    mscale = 1.0
    if p.scaling == "linear":
        inv_freq = inv_freq / p.scale_factor
    elif p.scaling == "llama3":
        # smooth low/high-frequency interpolation (reference:
        # llama-model.cpp rope_freqs tensor / HF llama3 rope_scaling)
        wavelen = 2.0 * jnp.pi / inv_freq
        low_wl = p.orig_ctx / p.low_freq_factor
        high_wl = p.orig_ctx / p.high_freq_factor
        smooth = (p.orig_ctx / wavelen - p.low_freq_factor) / (
            p.high_freq_factor - p.low_freq_factor
        )
        smooth = jnp.clip(smooth, 0.0, 1.0)
        scaled = inv_freq / p.scale_factor
        mid = (1 - smooth) * scaled + smooth * inv_freq
        inv_freq = jnp.where(wavelen > low_wl, scaled, jnp.where(wavelen < high_wl, inv_freq, mid))
    elif p.scaling == "yarn":
        import math

        # YaRN (reference: ggml rope_yarn + ggml_rope_yarn_corr_dims in
        # ggml/src/ggml-cpu/ops.cpp): pair indices below `lo` keep the
        # original frequency (extrapolation — the high-frequency dims),
        # indices above `hi` are fully interpolated (divided by
        # scale_factor), with a linear ramp between.  corr_dim returns the
        # pair index whose wavelength completes n_rot rotations over the
        # original context.
        def corr_dim(n_rot):
            return p.dim * math.log(p.orig_ctx / (n_rot * 2 * math.pi)) / (2 * math.log(p.base))

        lo = max(0.0, math.floor(corr_dim(p.beta_fast)))
        hi = min(p.dim - 1.0, math.ceil(corr_dim(p.beta_slow)))
        ramp = jnp.clip((jnp.arange(half, dtype=jnp.float32) - lo) / max(hi - lo, 0.001), 0.0, 1.0)
        inv_freq = inv_freq * (ramp / p.scale_factor + (1.0 - ramp))
        mscale = p.attn_factor * (1.0 + 0.1 * math.log(p.scale_factor)) if p.scale_factor > 1 else p.attn_factor
    return inv_freq, mscale


def apply_rope(x: jax.Array, positions: jax.Array, p: RopeParams) -> jax.Array:
    """x: [..., T, H, D]; positions: broadcastable to [..., T]."""
    dtype = x.dtype
    inv_freq, mscale = _rope_freqs(p)
    theta = positions[..., :, None].astype(jnp.float32) * inv_freq  # [..., T, dim/2]
    cos = (jnp.cos(theta) * mscale)[..., :, None, :]  # [..., T, 1, dim/2]
    sin = (jnp.sin(theta) * mscale)[..., :, None, :]
    rot, rest = x[..., : p.dim], x[..., p.dim :]
    rotf = rot.astype(jnp.float32)
    if p.style == "neox":
        x1, x2 = jnp.split(rotf, 2, axis=-1)
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.concatenate([o1, o2], axis=-1)
    else:  # "norm": rotate adjacent (even, odd) pairs
        x1 = rotf[..., 0::2]
        x2 = rotf[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.stack([o1, o2], axis=-1).reshape(rotf.shape)
    return jnp.concatenate([out.astype(dtype), rest], axis=-1) if rest.shape[-1] else out.astype(dtype)


def rope_rot_matrix(positions: jax.Array, p: RopeParams | None, head_dim: int) -> jax.Array:
    """Per-position rope as a [D, D] matrix: x @ R == apply_rope(x) at that
    position.  R has two nonzeros per rotated column (cos on the diagonal,
    +/-sin on the partner dim) and identity on pass-through dims, so the
    fused decode kernel applies rope as ONE tiny MXU matmul instead of the
    slice/mul/concat chain XLA emits (the per-layer relayout glue the
    round-3 profile blamed for the 66%-of-roofline decode).  Handles both
    "norm" (adjacent pairs) and "neox" (split halves) styles and partial
    rotary dims; `positions` [B] -> R [B, D, D] f32.  p=None -> identity
    (NoPE layers)."""
    b = positions.shape[0]
    if p is None or p.dim == 0:
        return jnp.broadcast_to(jnp.eye(head_dim, dtype=jnp.float32), (b, head_dim, head_dim))
    inv_freq, mscale = _rope_freqs(p)  # [dim/2]
    theta = positions.astype(jnp.float32)[:, None] * inv_freq  # [B, dim/2]
    cos = jnp.cos(theta) * mscale
    sin = jnp.sin(theta) * mscale
    half = p.dim // 2
    import numpy as np

    j = np.arange(half)
    if p.style == "neox":
        i1, i2 = j, j + half  # partner dims (x1, x2)
    else:  # "norm": adjacent (even, odd) pairs
        i1, i2 = 2 * j, 2 * j + 1
    # out[i1] = x[i1]*cos - x[i2]*sin ; out[i2] = x[i2]*cos + x[i1]*sin
    rows = np.concatenate([i1, i2, i2, i1])
    cols = np.concatenate([i1, i2, i1, i2])
    vals = jnp.concatenate([cos, cos, -sin, sin], axis=-1)  # [B, 2*dim]
    base = jnp.zeros((b, head_dim, head_dim), jnp.float32)
    if p.dim < head_dim:  # pass-through dims stay identity
        rest = np.arange(p.dim, head_dim)
        rows = np.concatenate([rows, rest])
        cols = np.concatenate([cols, rest])
        vals = jnp.concatenate(
            [vals, jnp.ones((b, head_dim - p.dim), jnp.float32)], axis=-1
        )
    return base.at[:, rows, cols].set(vals)


def attention_ref(
    q: jax.Array,  # [B, T, Hq, D]
    k: jax.Array,  # [B, Hkv, S, D]
    v: jax.Array,  # [B, Hkv, S, D]
    mask: jax.Array,  # bool [B, T, S] or [B, 1, T, S]; True = attend
    scale: float,
    logit_softcap: float = 0.0,
    sinks: jax.Array | None = None,  # [Hq] attention-sink logits
    alibi_slopes: jax.Array | None = None,  # [Hq] ALiBi head slopes
    bias: jax.Array | None = None,  # [Hq, T, S] additive logit bias (t5 rel-pos)
) -> jax.Array:
    """Reference attention (jnp softmax path — the Pallas flash kernel in
    zllm/ops/attention.py is the fast path; contract mirrors reference
    build_attn_mha, src/llama-graph.cpp:1467)."""
    b, t, hq, d = q.shape
    hkv = k.shape[1]
    group = hq // hkv
    qf = q.astype(jnp.float32).reshape(b, t, hkv, group, d)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    logits = jnp.einsum("bthgd,bhsd->bhgts", qf, kf) * scale
    if bias is not None:  # t5-style relative position bias
        logits = logits + bias.reshape(1, hkv, group, *bias.shape[-2:]).astype(jnp.float32)
    if alibi_slopes is not None:
        # ALiBi (reference ggml_soft_max_ext max_bias path): slope * key
        # position — equivalent to slope*(j-i) since softmax is shift-
        # invariant per query row (the MPT formulation)
        s_len = kf.shape[2]
        bias = alibi_slopes.reshape(1, hkv, group, 1, 1).astype(jnp.float32) * jnp.arange(
            s_len, dtype=jnp.float32
        )
        logits = logits + bias
    if logit_softcap > 0:
        logits = jnp.tanh(logits / logit_softcap) * logit_softcap
    if mask.ndim == 4:  # [B, 1, T, S] -> [B, T, S]
        mask = mask[:, 0]
    logits = jnp.where(mask[:, None, None, :, :], logits, -1e30)
    if sinks is not None:
        sink = sinks.reshape(1, hkv, group, 1, 1).astype(jnp.float32)
        sink = jnp.broadcast_to(sink, (b, hkv, group, t, 1))
        logits = jnp.concatenate([logits, sink], axis=-1)
        probs = jax.nn.softmax(logits, axis=-1)[..., :-1]
    else:
        probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgts,bhsd->bthgd", probs, vf)
    # V's head dim may differ from Q/K's (MLA latent values)
    return out.reshape(b, t, hq, -1).astype(q.dtype)


def swiglu(gate: jax.Array, up: jax.Array) -> jax.Array:
    return jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up


def geglu(gate: jax.Array, up: jax.Array) -> jax.Array:
    return jax.nn.gelu(gate.astype(jnp.float32), approximate=True).astype(gate.dtype) * up
