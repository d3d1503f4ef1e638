"""Mamba (S6 selective-state-space) forward pass.

Reference: src/models/mamba.cpp + graph-context-mamba.cpp
build_mamba_layer (conv window + ggml_ssm_conv / ggml_ssm_scan) and the
recurrent memory class src/llama-memory-recurrent.cpp — the per-sequence
state here is a RecurrentState pytree (conv tail [B, d_inner, d_conv-1]
and SSM state [B, d_inner, d_state] per layer) carried functionally, the
TPU-native counterpart of the reference's r/s state slots.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.layers import rms_norm
from ..ops.linear import linear


@jax.tree_util.register_pytree_node_class
@dataclass
class RecurrentState:
    """Per-layer recurrent memory (reference llama_memory_recurrent: get_r_l
    conv states + get_s_l ssm states)."""

    conv: tuple  # L x [B, d_inner, d_conv-1]
    ssm: tuple  # L x [B, d_inner, d_state]

    def tree_flatten(self):
        return (*self.conv, *self.ssm), len(self.conv)

    @classmethod
    def tree_unflatten(cls, n, leaves):
        return cls(conv=tuple(leaves[:n]), ssm=tuple(leaves[n:]))

    @classmethod
    def create(cls, cfg, batch: int, dtype=jnp.float32, n_layers: int | None = None):
        """`n_layers` overrides the state count for hybrid models whose
        recurrent layers are a subset (jamba)."""
        s = cfg.ssm
        n = cfg.n_layers if n_layers is None else n_layers
        if s.is_mamba2:
            # mamba2: conv runs over [x|B|C]; ssm state is per-head
            w = s.d_inner + 2 * s.n_group * s.d_state
            conv = tuple(jnp.zeros((batch, w, s.d_conv - 1), dtype) for _ in range(n))
            ssm = tuple(
                jnp.zeros((batch, s.n_head, s.head_dim, s.d_state), jnp.float32)
                for _ in range(n)
            )
            return cls(conv=conv, ssm=ssm)
        conv = tuple(
            jnp.zeros((batch, s.d_inner, s.d_conv - 1), dtype) for _ in range(n)
        )
        ssm = tuple(
            jnp.zeros((batch, s.d_inner, s.d_state), jnp.float32) for _ in range(n)
        )
        return cls(conv=conv, ssm=ssm)

    def with_layer(self, il: int, conv, ssm) -> "RecurrentState":
        c, s = list(self.conv), list(self.ssm)
        c[il], s[il] = conv, ssm
        return RecurrentState(conv=tuple(c), ssm=tuple(s))


def mamba_layer(layer, cfg, x, conv_state, ssm_state, lengths=None):
    """One mixer (reference build_mamba_layer): returns (y, conv', ssm').
    x: [B, T, K]; conv_state [B, di, dc-1]; ssm_state [B, di, ds].

    `lengths` [B] (optional) marks how many leading tokens of each row are
    real: state updates freeze after them, so rows padded inside a batched
    serving step leave their recurrent memory untouched (the TPU analogue
    of the reference's split_equal recurrent batching,
    src/llama-batch.h:103-110)."""
    s = cfg.ssm
    b, t, _ = x.shape
    di, ds, dc, dtr = s.d_inner, s.d_state, s.d_conv, s.dt_rank

    xz = linear(x, layer["ssm_in"])  # [B, T, 2*di]
    xi, z = xz[..., :di], xz[..., di:]

    # causal depthwise conv over time with the carried (dc-1)-column tail
    convx = jnp.concatenate([conv_state.astype(xi.dtype), xi.transpose(0, 2, 1)], axis=-1)
    if lengths is None:
        new_conv = convx[..., t:]  # last dc-1 columns
    else:
        # per-row valid tail: columns [len_b, len_b + dc - 1)
        idx = lengths[:, None, None] + jnp.arange(dc - 1)[None, None, :]
        new_conv = jnp.take_along_axis(convx, jnp.broadcast_to(idx, (b, di, dc - 1)), axis=-1)
    w = layer["ssm_conv1d"].astype(jnp.float32)  # [di, dc]
    windows = jnp.stack([convx[..., j : j + t] for j in range(dc)], axis=-1)  # [B, di, T, dc]
    xc = jnp.einsum("bdtc,dc->bdt", windows.astype(jnp.float32), w)
    xc = xc + layer["ssm_conv1d_b"].astype(jnp.float32)[None, :, None]
    xc = jax.nn.silu(xc).transpose(0, 2, 1)  # [B, T, di] f32

    xdb = linear(xc.astype(x.dtype), layer["ssm_x"])  # [B, T, dtr + 2*ds]
    dt = xdb[..., :dtr]
    B_ = xdb[..., dtr : dtr + ds].astype(jnp.float32)
    C_ = xdb[..., dtr + ds :].astype(jnp.float32)
    if "ssm_dt_norm" in layer:  # falcon-mamba/jamba B/C/dt norms
        dt = rms_norm(dt, layer["ssm_dt_norm"], cfg.norm_eps)
        B_ = rms_norm(B_, layer["ssm_b_norm"], cfg.norm_eps)
        C_ = rms_norm(C_, layer["ssm_c_norm"], cfg.norm_eps)
    dt = linear(dt, layer["ssm_dt"], layer["ssm_dt_b"]).astype(jnp.float32)
    dt = jax.nn.softplus(dt)  # [B, T, di]

    A = layer["ssm_a"].astype(jnp.float32)  # [di, ds], negative
    D = layer["ssm_d"].astype(jnp.float32)  # [di]

    def step(h, inp):
        dt_t, b_t, c_t, x_t, m_t = inp  # [B,di], [B,ds], [B,ds], [B,di], [B]
        dA = jnp.exp(dt_t[..., None] * A[None])  # [B, di, ds]
        h_new = h * dA + (dt_t * x_t)[..., None] * b_t[:, None, :]
        h = jnp.where(m_t[:, None, None], h_new, h)
        y = jnp.einsum("bds,bs->bd", h_new, c_t)
        return h, y

    mask = (
        jnp.ones((b, t), bool)
        if lengths is None
        else jnp.arange(t)[None, :] < lengths[:, None]
    )
    xs = (dt.transpose(1, 0, 2), B_.transpose(1, 0, 2), C_.transpose(1, 0, 2),
          xc.transpose(1, 0, 2), mask.transpose(1, 0))
    h_final, ys = lax.scan(step, ssm_state.astype(jnp.float32), xs)
    y = ys.transpose(1, 0, 2) + xc * D[None, None, :]  # [B, T, di]
    y = y * jax.nn.silu(z.astype(jnp.float32))
    out = linear(y.astype(x.dtype), layer["ssm_out"])
    return out, new_conv, h_final


def mamba2_layer(layer, cfg, x, conv_state, ssm_state, lengths=None):
    """Mamba2 (SSD) mixer (reference: graph-context-mamba.cpp
    build_mamba2_layer:146-284): in_proj -> [z | xBC | dt]; conv+silu over
    xBC; per-head scalar-A state scan with grouped B/C; y*silu(z); grouped
    RMS norm; out_proj.  Returns (y, conv', ssm')."""
    s = cfg.ssm
    b, t, _ = x.shape
    di, ds, dc = s.d_inner, s.d_state, s.d_conv
    H, dh, G = s.n_head, s.head_dim, s.n_group
    w_dim = di + 2 * G * ds

    zxbcdt = linear(x, layer["ssm_in"])  # [B, T, 2*di + 2*G*ds + H]
    z = zxbcdt[..., :di]
    xbc = zxbcdt[..., di : di + w_dim]
    dt = zxbcdt[..., di + w_dim :]  # [B, T, H]

    # causal depthwise conv over [x|B|C] with the carried (dc-1) tail
    convx = jnp.concatenate([conv_state.astype(xbc.dtype), xbc.transpose(0, 2, 1)], axis=-1)
    if lengths is None:
        new_conv = convx[..., t:]
    else:
        idx = lengths[:, None, None] + jnp.arange(dc - 1)[None, None, :]
        new_conv = jnp.take_along_axis(convx, jnp.broadcast_to(idx, (b, w_dim, dc - 1)), axis=-1)
    w = layer["ssm_conv1d"].astype(jnp.float32)  # [w_dim, dc]
    windows = jnp.stack([convx[..., j : j + t] for j in range(dc)], axis=-1)
    xc = jnp.einsum("bdtc,dc->bdt", windows.astype(jnp.float32), w)
    if "ssm_conv1d_b" in layer:
        xc = xc + layer["ssm_conv1d_b"].astype(jnp.float32)[None, :, None]
    xc = jax.nn.silu(xc).transpose(0, 2, 1)  # [B, T, w_dim] f32

    xs = xc[..., :di].reshape(b, t, H, dh)
    B_ = xc[..., di : di + G * ds].reshape(b, t, G, ds)
    C_ = xc[..., di + G * ds :].reshape(b, t, G, ds)
    # broadcast groups onto heads (head h -> group h // (H/G))
    hpg = H // G
    Bh = jnp.repeat(B_, hpg, axis=2)  # [B, T, H, ds]
    Ch = jnp.repeat(C_, hpg, axis=2)

    dt = jax.nn.softplus(dt.astype(jnp.float32) + layer["ssm_dt_b"].astype(jnp.float32))
    A = layer["ssm_a"].astype(jnp.float32).reshape(-1)  # [H], negative
    D = layer["ssm_d"].astype(jnp.float32).reshape(-1)  # [H]

    def step(h_state, inp):
        dt_t, x_t, b_t, c_t, m_t = inp  # [B,H], [B,H,dh], [B,H,ds], [B,H,ds], [B]
        dA = jnp.exp(dt_t * A[None])  # [B, H]
        h_new = h_state * dA[..., None, None] + (dt_t[..., None] * x_t)[..., None] * b_t[:, :, None, :]
        h_state = jnp.where(m_t[:, None, None, None], h_new, h_state)
        y = jnp.einsum("bhds,bhs->bhd", h_new, c_t)  # [B, H, dh]
        return h_state, y

    mask = (
        jnp.ones((b, t), bool)
        if lengths is None
        else jnp.arange(t)[None, :] < lengths[:, None]
    )
    xs_f = xs.astype(jnp.float32)
    seq = (dt.transpose(1, 0, 2), xs_f.transpose(1, 0, 2, 3),
           Bh.transpose(1, 0, 2, 3), Ch.transpose(1, 0, 2, 3), mask.transpose(1, 0))
    h_final, ys = lax.scan(step, ssm_state.astype(jnp.float32), seq)
    y = ys.transpose(1, 0, 2, 3) + xs_f * D[None, None, :, None]  # [B, T, H, dh]
    y = (y.reshape(b, t, di) * jax.nn.silu(z.astype(jnp.float32)))
    if "ssm_norm" in layer:
        # grouped RMS (reference: reshape to [di/G, G] then build_norm)
        yg = y.reshape(b, t, G, di // G)
        var = jnp.mean(yg * yg, axis=-1, keepdims=True)
        yg = yg * lax.rsqrt(var + cfg.norm_eps)
        yg = yg * layer["ssm_norm"].astype(jnp.float32).reshape(G, di // G)
        y = yg.reshape(b, t, di)
    out = linear(y.astype(x.dtype), layer["ssm_out"])
    return out, new_conv, h_final


def plamo2_mamba_layer(layer, cfg, x, conv_state, ssm_state, lengths=None):
    """plamo2 mamba mixer (reference: src/models/plamo2.cpp
    build_plamo2_mamba_layer): ssm_in -> per-head [z | x]; conv+silu over
    x only (no B/C channels — group_count 0); B/C/dt come from a second
    projection (ssm_x) with per-part RMS norms and a dt up-projection
    (ssm_dt + bias); per-head scalar-A scan with SHARED B/C; y + x*D;
    silu(z)*y; out_proj.  Returns (y, conv', ssm')."""
    s = cfg.ssm
    b, t, _ = x.shape
    di, ds, dc = s.d_inner, s.d_state, s.d_conv
    H, dh = s.n_head, s.head_dim

    zx = linear(x, layer["ssm_in"]).reshape(b, t, H, 2 * dh)
    z = zx[..., :dh]  # gate (first half of each head)
    xf = zx[..., dh:].reshape(b, t, di)

    convx = jnp.concatenate([conv_state.astype(xf.dtype), xf.transpose(0, 2, 1)], axis=-1)
    if lengths is None:
        new_conv = convx[..., t:]
    else:
        idx = lengths[:, None, None] + jnp.arange(dc - 1)[None, None, :]
        new_conv = jnp.take_along_axis(convx, jnp.broadcast_to(idx, (b, di, dc - 1)), axis=-1)
    w = layer["ssm_conv1d"].astype(jnp.float32)  # [di, dc]
    windows = jnp.stack([convx[..., j : j + t] for j in range(dc)], axis=-1)
    xc = jnp.einsum("bdtc,dc->bdt", windows.astype(jnp.float32), w)
    if "ssm_conv1d_b" in layer:
        xc = xc + layer["ssm_conv1d_b"].astype(jnp.float32)[None, :, None]
    xc = jax.nn.silu(xc).transpose(0, 2, 1)  # [B, T, di] f32

    from ..ops.layers import rms_norm

    xbcdt = linear(xc.astype(x.dtype), layer["ssm_x"]).astype(jnp.float32)
    B_ = rms_norm(xbcdt[..., :ds], layer["ssm_b_norm"], cfg.norm_eps)
    C_ = rms_norm(xbcdt[..., ds : 2 * ds], layer["ssm_c_norm"], cfg.norm_eps)
    dtr = rms_norm(xbcdt[..., 2 * ds :], layer["ssm_dt_norm"], cfg.norm_eps)
    dt = linear(dtr, layer["ssm_dt"]) + layer["ssm_dt_b"].astype(jnp.float32)
    dt = jax.nn.softplus(dt.astype(jnp.float32))  # [B, T, H]

    A = layer["ssm_a"].astype(jnp.float32).reshape(-1)  # [H], negative
    D = layer["ssm_d"].astype(jnp.float32).reshape(-1)  # [H]
    xs = xc.reshape(b, t, H, dh)
    Bh = jnp.broadcast_to(B_[:, :, None, :], (b, t, H, ds))
    Ch = jnp.broadcast_to(C_[:, :, None, :], (b, t, H, ds))

    def step(h_state, inp):
        dt_t, x_t, b_t, c_t, m_t = inp
        dA = jnp.exp(dt_t * A[None])
        h_new = h_state * dA[..., None, None] + (dt_t[..., None] * x_t)[..., None] * b_t[:, :, None, :]
        h_state = jnp.where(m_t[:, None, None, None], h_new, h_state)
        y = jnp.einsum("bhds,bhs->bhd", h_new, c_t)
        return h_state, y

    mask = (
        jnp.ones((b, t), bool)
        if lengths is None
        else jnp.arange(t)[None, :] < lengths[:, None]
    )
    seq = (dt.transpose(1, 0, 2), xs.transpose(1, 0, 2, 3),
           Bh.transpose(1, 0, 2, 3), Ch.transpose(1, 0, 2, 3), mask.transpose(1, 0))
    h_final, ys = lax.scan(step, ssm_state.astype(jnp.float32), seq)
    y = ys.transpose(1, 0, 2, 3) + xs * D[None, None, :, None]  # [B, T, H, dh]
    y = jax.nn.silu(z.astype(jnp.float32)) * y  # swiglu_split(z, y)
    out = linear(y.reshape(b, t, di).astype(x.dtype), layer["ssm_out"])
    return out, new_conv, h_final


def mamba_forward(
    params,
    cfg,
    tokens: jax.Array,  # [B, T]
    state: RecurrentState | None = None,
    *,
    lengths: jax.Array | None = None,
    logits_for: str = "all",
):
    """Returns (logits, state).  Unlike attention, positions are implicit —
    the recurrent state IS the context.  `lengths` [B] freezes each row's
    state after its valid tokens (batched-serving padding safety)."""
    x = params["tok_emb"][tokens]
    if state is None:
        state = RecurrentState.create(cfg, tokens.shape[0], x.dtype)
    mixer = mamba2_layer if cfg.ssm.is_mamba2 else mamba_layer
    for il, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
        y, conv, ssm = mixer(layer, cfg, h, state.conv[il], state.ssm[il], lengths)
        state = state.with_layer(il, conv, ssm)
        x = x + y
    x = rms_norm(x, params["out_norm"], cfg.norm_eps)
    if logits_for == "last":
        x = x[:, -1:, :]
    logits = linear(x, params["output"]).astype(jnp.float32)
    if logits.shape[-1] != cfg.vocab_size:
        logits = logits[..., : cfg.vocab_size]
    return logits, state
