"""RWKV6 (Finch) forward pass.

Reference: src/models/rwkv6.cpp + rwkv6-base.cpp (token-shift lerps,
time-mix wkv6 recurrence, channel mix) and the wkv6 kernel semantics in
ggml/src/ggml-cpu/ops.cpp:9410-9560 (ggml_compute_forward_rwkv_wkv6_f32).

TPU-native mapping: the per-sequence memory is an RwkvState pytree — a
token-shift pair [B, 2, C] (last att-norm / ffn-norm hidden of the
previous step, reference build_rwkv_token_shift_load/store) and the wkv
matrix state [B, H, S, S] per layer — carried functionally like Mamba's
RecurrentState.  The wkv recurrence runs as a lax.scan over time with the
[B, H, S, S] outer-product updates vectorized on the VPU; all projections
are batched matmuls on the MXU (quantizable via QTensor like any other
layer).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.layers import layer_norm
from ..ops.linear import linear


@jax.tree_util.register_pytree_node_class
@dataclass
class RwkvState:
    """Per-layer recurrent memory (reference llama_memory_recurrent:
    get_r_l token-shift states + get_s_l wkv states)."""

    shift: tuple  # L x [B, 2, C]  (row 0: att token-shift, row 1: ffn)
    wkv: tuple  # L x [B, H, S, S] f32

    def tree_flatten(self):
        return (*self.shift, *self.wkv), len(self.shift)

    @classmethod
    def tree_unflatten(cls, n, leaves):
        return cls(shift=tuple(leaves[:n]), wkv=tuple(leaves[n:]))

    @classmethod
    def create(cls, cfg, batch: int, dtype=jnp.float32):
        c = cfg.n_embd
        hs = cfg.wkv.head_size
        nh = c // hs
        shift = tuple(jnp.zeros((batch, 2, c), dtype) for _ in range(cfg.n_layers))
        wkv = tuple(jnp.zeros((batch, nh, hs, hs), jnp.float32) for _ in range(cfg.n_layers))
        return cls(shift=shift, wkv=wkv)

    def with_layer(self, il: int, shift, wkv) -> "RwkvState":
        s, w = list(self.shift), list(self.wkv)
        s[il], w[il] = shift, wkv
        return RwkvState(shift=tuple(s), wkv=tuple(w))


def wkv6(k, v, r, w, u, state, mask=None):
    """The wkv6 linear-attention recurrence (reference ggml_rwkv_wkv6,
    CPU kernel ggml-cpu/ops.cpp:9410: per head with state S[i, j],
    y[j] = sum_i r[i] * (u[i]*k[i]*v[j] + S[i,j]);
    S[i,j] <- S[i,j]*w[i] + k[i]*v[j]).

    k/v/r/w: [B, T, H, S]; u: [H, S]; state: [B, H, S, S] (i row, j col).
    `mask` [B, T] (optional) freezes state updates on padded positions.
    Returns (y [B, T, H, S], state').
    """

    def step(s, inp):
        k_t, v_t, r_t, w_t, m_t = inp  # [B, H, S] x4, [B]
        kv = k_t[..., :, None] * v_t[..., None, :]  # [B, H, S, S]
        y = jnp.einsum("bhi,bhij->bhj", r_t, u[None, :, :, None] * kv + s)
        s_new = s * w_t[..., :, None] + kv
        s = jnp.where(m_t[:, None, None, None], s_new, s)
        return s, y

    b, t = k.shape[:2]
    m = jnp.ones((b, t), bool) if mask is None else mask
    xs = (*(a.transpose(1, 0, 2, 3) for a in (k, v, r, w)), m.transpose(1, 0))
    state, ys = lax.scan(step, state, xs)
    return ys.transpose(1, 0, 2, 3), state


def _lerp_xxx(layer, cur, sx):
    """Data-dependent token-shift mixing (reference rwkv6-base.cpp:55-95):
    xxx = tanh((cur + sx*lerp_x) @ w1) per-projection lora -> 5 lerp
    offsets; returns the 5 mixed inputs [B, T, C] each (w, k, v, r, g)."""
    b, t, c = cur.shape
    xxx = cur + sx * layer["time_mix_lerp_x"][None, None, :]
    h = jnp.tanh(linear(xxx, layer["time_mix_w1"]))  # [B, T, 5*E]
    e = h.shape[-1] // 5
    h5 = h.reshape(b, t, 5, e)
    w2 = layer["time_mix_w2"].astype(h.dtype)  # [5, E, C]
    off = jnp.einsum("btpe,pec->btpc", h5, w2)  # [B, T, 5, C]
    if "time_mix_lerp_fused" in layer:
        lerp = layer["time_mix_lerp_fused"].astype(off.dtype)  # [5, C]
        mixed = (off + lerp[None, None]) * sx[:, :, None, :] + cur[:, :, None, :]
        return tuple(mixed[:, :, i] for i in range(5))
    outs = []
    for i, nm in enumerate(("w", "k", "v", "r", "g")):
        lerp = layer[f"time_mix_lerp_{nm}"].astype(off.dtype)
        outs.append((off[:, :, i] + lerp[None, None]) * sx + cur)
    return tuple(outs)


def rwkv6_time_mix(layer, cfg, cur, x_prev, wkv_state, mask=None):
    """One time-mix block (reference build_rwkv6_time_mix).  cur/x_prev:
    [B, T, C]; returns (out [B, T, C], wkv_state')."""
    b, t, c = cur.shape
    hs = cfg.wkv.head_size
    nh = c // hs
    sx = x_prev - cur
    xw, xk, xv, xr, xg = _lerp_xxx(layer, cur, sx)

    r = linear(xr, layer["time_mix_receptance"])
    k = linear(xk, layer["time_mix_key"])
    v = linear(xv, layer["time_mix_value"])
    g = jax.nn.silu(linear(xg, layer["time_mix_gate"]).astype(jnp.float32))

    # decay: w = exp(-exp(decay + (tanh(xw @ dw1) @ dw2)))
    dw = linear(jnp.tanh(linear(xw, layer["time_mix_decay_w1"])), layer["time_mix_decay_w2"])
    dw = dw.astype(jnp.float32) + layer["time_mix_decay"].astype(jnp.float32)[None, None, :]
    w = jnp.exp(-jnp.exp(dw))

    shp = (b, t, nh, hs)
    u = layer["time_mix_first"].astype(jnp.float32).reshape(nh, hs)
    y, wkv_state = wkv6(
        k.astype(jnp.float32).reshape(shp),
        v.astype(jnp.float32).reshape(shp),
        r.astype(jnp.float32).reshape(shp),
        w.reshape(shp),
        u,
        wkv_state,
        mask,
    )

    # per-head group norm (reference: ggml_norm over head_size groups at
    # eps 64e-5 then scale/shift by time_mix_ln)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.var(y, axis=-1, keepdims=True)
    y = (y - mu) * lax.rsqrt(var + 64e-5)
    y = y.reshape(b, t, c)
    y = y * layer["time_mix_ln"].astype(jnp.float32)[None, None, :] + layer[
        "time_mix_ln_b"
    ].astype(jnp.float32)[None, None, :]
    y = y * g
    return linear(y.astype(cur.dtype), layer["time_mix_output"]), wkv_state


def rwkv6_channel_mix(layer, cur, x_prev):
    """Channel mix (reference build_rwkv6_channel_mix): squared-relu FFN
    gated by a sigmoid receptance, both on token-shift-mixed inputs."""
    sx = x_prev - cur
    xk = sx * layer["channel_mix_lerp_k"][None, None, :] + cur
    xr = sx * layer["channel_mix_lerp_r"][None, None, :] + cur
    rgate = jax.nn.sigmoid(linear(xr, layer["channel_mix_receptance"]).astype(jnp.float32))
    k = jnp.square(jax.nn.relu(linear(xk, layer["channel_mix_key"]).astype(jnp.float32)))
    return rgate.astype(cur.dtype) * linear(k.astype(cur.dtype), layer["channel_mix_value"])


def _shifted(x, prev_last):
    """x_prev sequence: [prev_last, x[:-1]] along time (reference: concat
    of the token-shift state with att_norm[:, :-1])."""
    return jnp.concatenate([prev_last[:, None, :], x[:, :-1, :]], axis=1)


def rwkv6_forward(
    params,
    cfg,
    tokens: jax.Array,  # [B, T]
    state: RwkvState | None = None,
    *,
    lengths: jax.Array | None = None,
    logits_for: str = "all",
):
    """Returns (logits, state).  Positions are implicit — the recurrent
    state IS the context (reference rwkv6.cpp graph).  `lengths` [B]
    freezes each row's state after its valid tokens (batched-serving
    padding safety)."""
    b, t = tokens.shape
    x = params["tok_emb"][tokens]
    if state is None:
        state = RwkvState.create(cfg, tokens.shape[0], x.dtype)
    mask = None if lengths is None else jnp.arange(t)[None, :] < lengths[:, None]
    x = layer_norm(x, params["tok_norm"], params["tok_norm_b"], cfg.norm_eps)
    for il, layer in enumerate(params["layers"]):
        att_norm = layer_norm(x, layer["attn_norm"], layer["attn_norm_b"], cfg.norm_eps)
        x_prev = _shifted(att_norm, state.shift[il][:, 0].astype(att_norm.dtype))
        att, wkv_new = rwkv6_time_mix(layer, cfg, att_norm, x_prev, state.wkv[il], mask)
        x = x + att

        ffn_norm = layer_norm(x, layer["attn_norm_2"], layer["attn_norm_2_b"], cfg.norm_eps)
        f_prev = _shifted(ffn_norm, state.shift[il][:, 1].astype(ffn_norm.dtype))
        x = x + rwkv6_channel_mix(layer, ffn_norm, f_prev)

        new_shift = jnp.stack([att_norm[:, -1], ffn_norm[:, -1]], axis=1).astype(
            state.shift[il].dtype
        )
        if lengths is not None:
            # per-row token-shift at the last VALID position; rows with
            # lengths == 0 keep their previous shift untouched
            idx = jnp.clip(lengths - 1, 0, t - 1)
            last_att = jnp.take_along_axis(att_norm, idx[:, None, None], axis=1)[:, 0]
            last_ffn = jnp.take_along_axis(ffn_norm, idx[:, None, None], axis=1)[:, 0]
            new_shift = jnp.stack([last_att, last_ffn], axis=1).astype(state.shift[il].dtype)
            new_shift = jnp.where((lengths > 0)[:, None, None], new_shift, state.shift[il])
        state = state.with_layer(il, new_shift, wkv_new)

        if cfg.wkv.rescale_every and (il + 1) % cfg.wkv.rescale_every == 0:
            x = x * 0.5
    x = layer_norm(x, params["out_norm"], params["out_norm_b"], cfg.norm_eps)
    if logits_for == "last":
        x = x[:, -1:, :]
    logits = linear(x, params["output"]).astype(jnp.float32)
    if logits.shape[-1] != cfg.vocab_size:
        logits = logits[..., : cfg.vocab_size]
    return logits, state


# ---------------------------------------------------------------------------
# RWKV7 (Goose): generalized delta rule
# ---------------------------------------------------------------------------

def wkv7(r, w, k, v, a, b, state, mask=None):
    """The wkv7 recurrence (reference ggml_rwkv_wkv7, CPU kernel
    ggml-cpu/ops.cpp:9901): per head with state S[i, j] (i = value dim,
    j = key dim),

        sa_i    = sum_j a_j * S[i, j]          (in-context erase read)
        S[i,j] <- S[i,j]*w_j + v_i*k_j + sa_i*b_j
        y_i     = sum_j S[i, j] * r_j

    r/w/k/v/a/b: [B, T, H, S]; state [B, H, S, S]; `mask` [B, T] freezes
    state on padded rows.  Returns (y [B, T, H, S], state')."""

    def step(s, inp):
        r_t, w_t, k_t, v_t, a_t, b_t, m_t = inp
        sa = jnp.einsum("bhj,bhij->bhi", a_t, s)
        s_new = (s * w_t[..., None, :] + v_t[..., :, None] * k_t[..., None, :]
                 + sa[..., :, None] * b_t[..., None, :])
        y = jnp.einsum("bhij,bhj->bhi", s_new, r_t)
        s = jnp.where(m_t[:, None, None, None], s_new, s)
        return s, y

    bsz, t = r.shape[:2]
    m = jnp.ones((bsz, t), bool) if mask is None else mask
    xs = (*(x.transpose(1, 0, 2, 3) for x in (r, w, k, v, a, b)), m.transpose(1, 0))
    state, ys = lax.scan(step, state, xs)
    return ys.transpose(1, 0, 2, 3), state


def rwkv7_time_mix(layer, cfg, cur, x_prev, wkv_state, v_first, mask=None):
    """One rwkv7 time-mix block (reference build_rwkv7_time_mix,
    src/models/rwkv7-base.cpp:24-135).  Returns (out, wkv_state',
    v_first')."""
    b, t, c = cur.shape
    hs = cfg.wkv.head_size
    nh = c // hs
    f32 = jnp.float32
    sx = x_prev - cur
    has_gate = "time_mix_g1" in layer

    lerp = layer["time_mix_lerp_fused"].astype(cur.dtype)  # [5|6, C]
    mixed = cur[:, :, None, :] + sx[:, :, None, :] * lerp[None, None]
    xr, xw, xk, xv, xa = (mixed[:, :, i] for i in range(5))
    xg = mixed[:, :, 5] if has_gate else None

    r = linear(xr, layer["time_mix_receptance"]).astype(f32)
    w = (linear(jnp.tanh(linear(xw, layer["time_mix_w1"])), layer["time_mix_w2"])
         .astype(f32) + layer["time_mix_w0"].astype(f32)[None, None])
    # w = exp(-e^-0.5 * sigmoid(.)) (reference: exp(sigmoid(w) * -0.606531))
    w = jnp.exp(jax.nn.sigmoid(w) * -0.606531)
    k = linear(xk, layer["time_mix_key"]).astype(f32)
    v = linear(xv, layer["time_mix_value"]).astype(f32)
    if v_first is None:
        v_first = v
    else:
        vg = jax.nn.sigmoid(
            linear(linear(xv, layer["time_mix_v1"]), layer["time_mix_v2"])
            .astype(f32) + layer["time_mix_v0"].astype(f32)[None, None])
        v = v + (v_first - v) * vg
    g = None
    if has_gate:
        g = linear(jax.nn.sigmoid(linear(xg, layer["time_mix_g1"]).astype(f32))
                   .astype(cur.dtype), layer["time_mix_g2"]).astype(f32)
    a = jax.nn.sigmoid(
        linear(linear(xa, layer["time_mix_a1"]), layer["time_mix_a2"]).astype(f32)
        + layer["time_mix_a0"].astype(f32)[None, None])

    kk = (k * layer["time_mix_k_k"].astype(f32)[None, None]).reshape(b, t, nh, hs)
    kk = kk / jnp.maximum(jnp.linalg.norm(kk, axis=-1, keepdims=True), 1e-12)
    ka = k * layer["time_mix_k_a"].astype(f32)[None, None]
    k = k + a * ka - ka

    shp = (b, t, nh, hs)
    y, wkv_state = wkv7(
        r.reshape(shp), w.reshape(shp), k.reshape(shp), v.reshape(shp),
        -kk, kk * a.reshape(shp), wkv_state, mask,
    )

    if "time_mix_ln" in layer:
        # per-head group norm at eps 64e-5 (reference rwkv7-base.cpp:110)
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.var(y, axis=-1, keepdims=True)
        y = (y - mu) * lax.rsqrt(var + 64e-5)
        y = y.reshape(b, t, c)
        y = (y * layer["time_mix_ln"].astype(f32)[None, None]
             + layer["time_mix_ln_b"].astype(f32)[None, None])
    else:
        y = y.reshape(b, t, c)

    # bonus: y += v * sum_j(k_j * r_j * r_k_j) per head
    rk = jnp.sum(
        k.reshape(shp) * r.reshape(shp)
        * layer["time_mix_r_k"].astype(f32).reshape(nh, hs)[None, None],
        axis=-1, keepdims=True)
    y = y + (v.reshape(shp) * rk).reshape(b, t, c)
    if g is not None:
        y = y * g
    return linear(y.astype(cur.dtype), layer["time_mix_output"]), wkv_state, v_first


def rwkv7_channel_mix(layer, cur, x_prev):
    """rwkv7 channel mix (reference build_rwkv7_channel_mix): squared-relu
    key->value on the token-shift-mixed input; the rwkv6 receptance gate
    is gone."""
    sx = x_prev - cur
    xk = sx * layer["channel_mix_lerp_k"][None, None, :] + cur
    k = jnp.square(jax.nn.relu(linear(xk, layer["channel_mix_key"]).astype(jnp.float32)))
    return linear(k.astype(cur.dtype), layer["channel_mix_value"])


def rwkv7_forward(
    params,
    cfg,
    tokens: jax.Array,  # [B, T]
    state: RwkvState | None = None,
    *,
    lengths: jax.Array | None = None,
    logits_for: str = "all",
):
    """rwkv7 (LN norms + channel mix, reference src/models/rwkv7.cpp) and
    arwkv7 (RMS norms + SwiGLU FFN, no ffn token shift, reference
    src/models/arwkv7.cpp) forward.  Returns (logits, state)."""
    from ..ops.layers import rms_norm

    arwkv = cfg.arch == "arwkv7"
    b, t = tokens.shape
    x = params["tok_emb"][tokens]
    if state is None:
        state = RwkvState.create(cfg, b, x.dtype)
    mask = None if lengths is None else jnp.arange(t)[None, :] < lengths[:, None]

    def norm(h, layer, key):
        if arwkv:
            return rms_norm(h, layer[key], cfg.norm_eps)
        return layer_norm(h, layer[key], layer.get(key + "_b"), cfg.norm_eps)

    if "tok_norm" in params:
        x = layer_norm(x, params["tok_norm"], params["tok_norm_b"], cfg.norm_eps)
    v_first = None
    for il, layer in enumerate(params["layers"]):
        att_norm = norm(x, layer, "attn_norm")
        x_prev = _shifted(att_norm, state.shift[il][:, 0].astype(att_norm.dtype))
        att, wkv_new, v_first = rwkv7_time_mix(
            layer, cfg, att_norm, x_prev, state.wkv[il], v_first, mask)
        x = x + att

        if arwkv:
            ffn_norm = att_norm  # shift state tracks the att norm only
            h2 = rms_norm(x, layer["ffn_norm"], cfg.norm_eps)
            if "ffn_gateup" in layer:  # load-time fused gate|up projection
                gup = linear(h2, layer["ffn_gateup"])
                half = gup.shape[-1] // 2
                g_, u_ = gup[..., :half], gup[..., half:]
            else:
                g_, u_ = linear(h2, layer["ffn_gate"]), linear(h2, layer["ffn_up"])
            ff = (jax.nn.silu(g_.astype(jnp.float32)).astype(h2.dtype) * u_)
            x = x + linear(ff, layer["ffn_down"])
        else:
            ffn_norm = norm(x, layer, "attn_norm_2")
            f_prev = _shifted(ffn_norm, state.shift[il][:, 1].astype(ffn_norm.dtype))
            x = x + rwkv7_channel_mix(layer, ffn_norm, f_prev)

        new_shift = jnp.stack([att_norm[:, -1], ffn_norm[:, -1]], axis=1).astype(
            state.shift[il].dtype)
        if lengths is not None:
            idx = jnp.clip(lengths - 1, 0, t - 1)
            last_att = jnp.take_along_axis(att_norm, idx[:, None, None], axis=1)[:, 0]
            last_ffn = jnp.take_along_axis(ffn_norm, idx[:, None, None], axis=1)[:, 0]
            new_shift = jnp.stack([last_att, last_ffn], axis=1).astype(state.shift[il].dtype)
            new_shift = jnp.where((lengths > 0)[:, None, None], new_shift, state.shift[il])
        state = state.with_layer(il, new_shift, wkv_new)

    if arwkv:
        from ..ops.layers import rms_norm as _rn

        x = _rn(x, params["out_norm"], cfg.norm_eps)
    else:
        x = layer_norm(x, params["out_norm"], params["out_norm_b"], cfg.norm_eps)
    if logits_for == "last":
        x = x[:, -1:, :]
    logits = linear(x, params["output"]).astype(jnp.float32)
    if logits.shape[-1] != cfg.vocab_size:
        logits = logits[..., : cfg.vocab_size]
    return logits, state
