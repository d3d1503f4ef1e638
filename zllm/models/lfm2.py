"""LFM2 short-convolution mixer (the conv half of the lfm2 hybrid).

Reference: src/models/lfm2.cpp build_shortconv_block — in_proj splits
into (B, C, x); the gated Bx stream runs a depthwise causal conv of
length shortconv.l_cache with a carried (L-1)-column state, C gates the
output, out_proj maps back.  Carried functionally like the mamba conv
tail (RecurrentState.conv)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.linear import linear


def shortconv_layer(layer, cfg, x, conv_state, lengths=None):
    """x: [B, T, D] (already operator-normed); conv_state [B, D, L-1].
    Returns (y [B, T, D], new_conv).  `lengths` [B] freezes each row's
    carried state after its valid tokens (batched serving)."""
    b, t, d = x.shape
    L = cfg.shortconv_l
    bcx = linear(x, layer["shortconv_in"])  # [B, T, 3D]
    bgate, cgate, xs = bcx[..., :d], bcx[..., d : 2 * d], bcx[..., 2 * d :]
    bx = (bgate * xs).transpose(0, 2, 1)  # [B, D, T]

    convx = jnp.concatenate([conv_state.astype(bx.dtype), bx], axis=-1)  # [B, D, L-1+T]
    if lengths is None:
        new_conv = convx[..., t:]
    else:
        idx = lengths[:, None, None] + jnp.arange(L - 1)[None, None, :]
        new_conv = jnp.take_along_axis(convx, jnp.broadcast_to(idx, (b, d, L - 1)), axis=-1)

    w = layer["shortconv_conv"].astype(jnp.float32)  # [D, L]
    windows = jnp.stack([convx[..., j : j + t] for j in range(L)], axis=-1)  # [B, D, T, L]
    out = jnp.einsum("bdtl,dl->bdt", windows.astype(jnp.float32), w)
    y = cgate * out.transpose(0, 2, 1).astype(x.dtype)  # [B, T, D]
    return linear(y, layer["shortconv_out"]), new_conv
