"""Fused attention kernel vs jnp reference (interpret mode on CPU)."""

import numpy as np
import pytest

RNG = np.random.default_rng(3)


def _mk(b, t, s, hq, hkv, d):
    import jax.numpy as jnp

    q = jnp.asarray(RNG.standard_normal((b, t, hq, d)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((b, hkv, s, d)).astype(np.float32))
    v = jnp.asarray(RNG.standard_normal((b, hkv, s, d)).astype(np.float32))
    return q, k, v


@pytest.mark.parametrize("t,cfg", [
    (1, dict(b=2, s=128, hq=8, hkv=2, d=64)),     # decode
    (16, dict(b=1, s=256, hq=4, hkv=4, d=64)),    # chunked prefill, MHA
    (32, dict(b=1, s=128, hq=8, hkv=1, d=128)),   # MQA, wide head
])
def test_flash_matches_ref(t, cfg):
    import jax.numpy as jnp

    from zllm.ops.attention import flash_attention
    from zllm.ops.layers import attention_ref
    from zllm.runtime.kvcache import causal_mask

    b, s, hq, hkv, d = cfg["b"], cfg["s"], cfg["hq"], cfg["hkv"], cfg["d"]
    q, k, v = _mk(b, t, s, hq, hkv, d)
    base = 40
    positions = jnp.asarray(np.stack([np.arange(base + i, base + i + t) for i in range(b)]).astype(np.int32))
    scale = 1.0 / d**0.5

    ref = attention_ref(q, k, v, causal_mask(positions, s), scale)
    got = flash_attention(q, k, v, positions, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_window_and_softcap():
    import jax.numpy as jnp

    from zllm.ops.attention import flash_attention
    from zllm.ops.layers import attention_ref
    from zllm.runtime.kvcache import causal_mask

    b, t, s, hq, hkv, d = 1, 8, 128, 4, 2, 64
    q, k, v = _mk(b, t, s, hq, hkv, d)
    positions = jnp.asarray(np.arange(100, 100 + t, dtype=np.int32)[None])
    scale = 0.125

    for window, cap in ((32, 0.0), (0, 30.0), (16, 50.0)):
        ref = attention_ref(q, k, v, causal_mask(positions, s, window), scale, logit_softcap=cap)
        got = flash_attention(q, k, v, positions, scale=scale, window=window, softcap=cap, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5,
                                   err_msg=f"window={window} cap={cap}")


def test_flash_sinks():
    import jax.numpy as jnp

    from zllm.ops.attention import flash_attention
    from zllm.ops.layers import attention_ref
    from zllm.runtime.kvcache import causal_mask

    b, t, s, hq, hkv, d = 1, 4, 128, 4, 2, 64
    q, k, v = _mk(b, t, s, hq, hkv, d)
    positions = jnp.asarray(np.arange(60, 60 + t, dtype=np.int32)[None])
    sinks = jnp.asarray(RNG.standard_normal(hq).astype(np.float32))

    ref = attention_ref(q, k, v, causal_mask(positions, s), 0.125, sinks=sinks)
    got = flash_attention(q, k, v, positions, scale=0.125, sinks=sinks, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5)


# ---------------------------------------------------------------------------
# blockwise online-softmax kernel
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("t,cfg", [
    (1, dict(b=2, s=512, hq=8, hkv=2, d=64, bs=128)),    # decode, 4 blocks
    (16, dict(b=1, s=1024, hq=4, hkv=4, d=64, bs=256)),  # prefill, MHA
    (8, dict(b=1, s=256, hq=8, hkv=1, d=128, bs=128)),   # MQA
])
def test_blockwise_matches_ref(t, cfg):
    import jax.numpy as jnp

    from zllm.ops.attention import flash_attention_blockwise
    from zllm.ops.layers import attention_ref
    from zllm.runtime.kvcache import causal_mask

    b, s, hq, hkv, d, bs = cfg["b"], cfg["s"], cfg["hq"], cfg["hkv"], cfg["d"], cfg["bs"]
    q, k, v = _mk(b, t, s, hq, hkv, d)
    base = 200
    positions = jnp.asarray(
        np.stack([np.arange(base + i, base + i + t) for i in range(b)]).astype(np.int32)
    )
    scale = 1.0 / d**0.5

    ref = attention_ref(q, k, v, causal_mask(positions, s), scale)
    got = flash_attention_blockwise(
        q, k, v, positions, scale=scale, block_s=bs, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_blockwise_window_softcap_sinks():
    import jax.numpy as jnp

    from zllm.ops.attention import flash_attention_blockwise
    from zllm.ops.layers import attention_ref
    from zllm.runtime.kvcache import causal_mask

    b, t, s, hq, hkv, d = 1, 8, 512, 4, 2, 64
    q, k, v = _mk(b, t, s, hq, hkv, d)
    positions = jnp.asarray(np.arange(300, 300 + t, dtype=np.int32)[None])
    scale = 0.125
    sinks = jnp.asarray(RNG.standard_normal(hq).astype(np.float32))

    for window, cap, sk in ((64, 0.0, None), (0, 30.0, None), (0, 0.0, sinks), (128, 25.0, sinks)):
        ref = attention_ref(q, k, v, causal_mask(positions, s, window), scale,
                            logit_softcap=cap, sinks=sk)
        got = flash_attention_blockwise(
            q, k, v, positions, scale=scale, window=window, softcap=cap,
            sinks=sk, block_s=128, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5,
                                   err_msg=f"window={window} cap={cap} sinks={sk is not None}")


def test_blockwise_quantized_kv():
    """In-kernel Q8 dequant must match dequantize-then-reference."""
    import jax.numpy as jnp

    from zllm.ops.attention import QuantKV, flash_attention_blockwise
    from zllm.ops.layers import attention_ref
    from zllm.runtime.kvcache import KVCacheQ8, causal_mask

    b, t, s, hq, hkv, d = 2, 4, 512, 8, 2, 64
    q, k, v = _mk(b, t, s, hq, hkv, d)
    kq, ksc = KVCacheQ8._quant(k.transpose(0, 2, 1, 3))
    vq, vsc = KVCacheQ8._quant(v.transpose(0, 2, 1, 3))
    kq = kq.transpose(0, 2, 1, 3); ksc = ksc.transpose(0, 2, 1, 3)
    vq = vq.transpose(0, 2, 1, 3); vsc = vsc.transpose(0, 2, 1, 3)
    kd = kq.astype(jnp.float32) * ksc
    vd = vq.astype(jnp.float32) * vsc

    positions = jnp.asarray(
        np.stack([np.arange(400 + i, 400 + i + t) for i in range(b)]).astype(np.int32)
    )
    scale = 1.0 / d**0.5
    ref = attention_ref(q, kd, vd, causal_mask(positions, s), scale)
    got = flash_attention_blockwise(
        q, kq, vq, positions, scale=scale, ks=ksc, vs=vsc, block_s=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-5, atol=5e-5)


def test_attention_dispatch_quantkv():
    """attention() consumes QuantKV on any backend (CPU falls back to
    dequant + reference)."""
    import jax.numpy as jnp

    from zllm.ops.attention import QuantKV, attention
    from zllm.ops.layers import attention_ref
    from zllm.runtime.kvcache import KVCacheQ8, causal_mask

    b, t, s, hq, hkv, d = 1, 2, 128, 4, 2, 64
    q, k, v = _mk(b, t, s, hq, hkv, d)
    kq, ksc = KVCacheQ8._quant(k.transpose(0, 2, 1, 3))
    vq, vsc = KVCacheQ8._quant(v.transpose(0, 2, 1, 3))
    qkv_k = QuantKV(kq.transpose(0, 2, 1, 3), ksc.transpose(0, 2, 1, 3))
    qkv_v = QuantKV(vq.transpose(0, 2, 1, 3), vsc.transpose(0, 2, 1, 3))
    positions = jnp.asarray(np.arange(50, 50 + t, dtype=np.int32)[None])
    scale = 1.0 / d**0.5

    ref = attention_ref(q, qkv_k.dequant(jnp.float32), qkv_v.dequant(jnp.float32),
                        causal_mask(positions, s), scale)
    got = attention(q, qkv_k, qkv_v, positions, scale=scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_blockwise_32k_needle():
    """32k-context retrieval: a query keyed to position 777 must pull that
    slot's value through 64 streamed blocks (the passkey mechanic at the
    attention level — SURVEY long-context plan)."""
    import jax.numpy as jnp

    from zllm.ops.attention import flash_attention_blockwise

    s, d, needle = 32768, 128, 777
    kn = np.zeros((1, 1, s, d), np.float32)
    kn[0, 0, :, 0] = -1.0
    kn[0, 0, needle, 0] = 1.0  # only the needle matches the query
    vn = np.zeros((1, 1, s, d), np.float32)
    vn[0, 0, :, 1] = np.arange(s)  # value encodes its position
    q = np.zeros((1, 1, 1, d), np.float32)
    q[..., 0] = 50.0  # sharp softmax at the needle
    positions = jnp.asarray([[s - 1]], dtype=jnp.int32)

    out = flash_attention_blockwise(
        jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn), positions,
        scale=1.0, block_s=512, interpret=True,
    )
    got = float(np.asarray(out)[0, 0, 0, 1])
    assert abs(got - needle) < 1.0, f"retrieved position {got}, wanted {needle}"


@pytest.mark.parametrize("case", ["mid", "block_edge", "start", "b2", "window"])
def test_attn_decode_update_matches_ref(case):
    """Fused decode kernel (KV insert + attention in one launch) vs
    kv-update-then-reference; checks both the attention output and the
    in-kernel cache write-back."""
    import jax.numpy as jnp

    from zllm.ops.attention import attn_decode_update
    from zllm.ops.layers import attention_ref
    from zllm.runtime.kvcache import KVCache, causal_mask

    b = 2 if case == "b2" else 1
    hq, hkv, d, s = 8, 2, 64, 512
    window = 128 if case == "window" else 0
    pos_vals = {"mid": [300], "block_edge": [255], "start": [0],
                "b2": [37, 450], "window": [400]}[case]
    positions = jnp.asarray([[p] for p in pos_vals], jnp.int32)

    kv = KVCache.create(1, b, s, hkv, d, jnp.float32)
    # pre-fill the cache with history so attention has context
    hist_k = RNG.standard_normal((b, hkv, s, d)).astype(np.float32)
    hist_v = RNG.standard_normal((b, hkv, s, d)).astype(np.float32)
    kv = KVCache(k=(jnp.asarray(hist_k),), v=(jnp.asarray(hist_v),))

    q = jnp.asarray(RNG.standard_normal((b, 1, hq, d)).astype(np.float32))
    kn = jnp.asarray(RNG.standard_normal((b, 1, hkv, d)).astype(np.float32))
    vn = jnp.asarray(RNG.standard_normal((b, 1, hkv, d)).astype(np.float32))
    scale = 1.0 / d**0.5

    # reference: DUS insert then masked softmax attention
    kv_ref = kv.update(0, kn, vn, positions)
    k_all, v_all = kv_ref.layer(0)
    mask = causal_mask(positions, s, window)
    ref = attention_ref(q, k_all, v_all, mask, scale)

    att, kl, vl = attn_decode_update(
        q, kn, vn, kv.k[0], kv.v[0], positions,
        scale=scale, window=window, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(att), np.asarray(ref), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(kl), np.asarray(k_all), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(vl), np.asarray(v_all), rtol=0, atol=0)


@pytest.mark.parametrize("style", ["neox", "norm", "partial", "none"])
def test_rope_rot_matrix_matches_apply_rope(style):
    """x @ R == apply_rope(x) for both pair styles and partial dims."""
    import jax.numpy as jnp

    from zllm.ops.layers import RopeParams, apply_rope, rope_rot_matrix

    d = 64
    p = None
    if style != "none":
        p = RopeParams(dim=32 if style == "partial" else d,
                       style="norm" if style in ("norm", "partial") else "neox",
                       base=10000.0, scaling="yarn", scale_factor=2.0,
                       orig_ctx=2048)
    x = jnp.asarray(RNG.standard_normal((2, 1, 4, d)).astype(np.float32))
    positions = jnp.asarray([[17], [403]], jnp.int32)
    want = apply_rope(x, positions, p) if p is not None else x
    rot = rope_rot_matrix(positions[:, 0], p, d)  # [B, D, D]
    got = jnp.einsum("bthd,bde->bthe", x, rot)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "case", ["g8", "g4_hpb2", "g1_hpb8", "mqa", "qknorm", "window", "b2",
             "softcap", "norm_style", "partial", "d128", "d128_qknorm"])
def test_attn_decode_qkv_matches_ref(case):
    """Fully-fused decode kernel (qkv split + per-head norms + rope + KV
    insert + attention in one launch) vs the unfused reference pipeline;
    checks the attention output and the cache write-back, including the
    multi-kv-head-per-step (hpb>1) small-group path."""
    import jax.numpy as jnp

    from zllm.ops.attention import _decode_hpb, attn_decode_qkv
    from zllm.ops.layers import RopeParams, apply_rope, attention_ref, rms_norm, rope_rot_matrix
    from zllm.runtime.kvcache import KVCache, causal_mask

    d = 128 if case.startswith("d128") else 64  # d128 = native orientation
    s = 512
    hq, hkv = {"g8": (16, 2), "g4_hpb2": (16, 4), "g1_hpb8": (8, 8),
               "mqa": (4, 1), "d128": (16, 4)}.get(case, (16, 2))
    b = 2 if case == "b2" else 1
    window = 128 if case == "window" else 0
    softcap = 30.0 if case == "softcap" else 0.0
    qk_norm = case in ("qknorm", "d128_qknorm")
    style = {"norm_style": "norm", "partial": "norm"}.get(case, "neox")
    rope = RopeParams(dim=32 if case == "partial" else d, style=style)
    eps = 1e-5
    g = hq // hkv
    assert _decode_hpb(g, hq, hkv) >= 1

    positions = jnp.asarray([[300]] if b == 1 else [[37], [450]], jnp.int32)
    hist_k = jnp.asarray(RNG.standard_normal((b, hkv, s, d)).astype(np.float32))
    hist_v = jnp.asarray(RNG.standard_normal((b, hkv, s, d)).astype(np.float32))
    qkv3 = jnp.asarray(RNG.standard_normal((b, hq + 2 * hkv, d)).astype(np.float32))
    qw = jnp.asarray(RNG.standard_normal((d,)).astype(np.float32)) if qk_norm else None
    kw = jnp.asarray(RNG.standard_normal((d,)).astype(np.float32)) if qk_norm else None
    scale = 1.0 / d**0.5

    # reference: split -> norms -> rope -> DUS insert -> masked attention
    q = qkv3[:, None, :hq, :]
    kn = qkv3[:, None, hq : hq + hkv, :]
    vn = qkv3[:, None, hq + hkv :, :]
    if qk_norm:
        q = rms_norm(q, qw, eps)
        kn = rms_norm(kn, kw, eps)
    q = apply_rope(q, positions, rope)
    kn = apply_rope(kn, positions, rope)
    kv_ref = KVCache(k=(hist_k,), v=(hist_v,)).update(0, kn, vn, positions)
    k_all, v_all = kv_ref.layer(0)
    mask = causal_mask(positions, s, window)
    ref = attention_ref(q, k_all, v_all, mask, scale, logit_softcap=softcap)

    rot = rope_rot_matrix(positions[:, 0], rope, d)
    att, kl, vl = attn_decode_qkv(
        qkv3, hist_k, hist_v, positions, rot, qw, kw,
        scale=scale, softcap=softcap, window=window, eps=eps, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(att), np.asarray(ref), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(kl), np.asarray(k_all), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vl), np.asarray(v_all), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("case", ["mid", "page_edge", "start", "b2", "window", "trash"])
def test_paged_attn_decode_update_matches_ref(case):
    """Fused paged decode (page insert + attend in one launch) vs the
    unfused PagedKVCache.update + gather + reference attention; checks the
    attention output and that ONLY the insert page changed in the pool."""
    import jax.numpy as jnp

    from zllm.ops.attention import paged_attn_decode_update
    from zllm.ops.layers import attention_ref
    from zllm.runtime.kvcache import causal_mask
    from zllm.runtime.paged import PagedKVCache

    b = 2 if case == "b2" else 1
    hq, hkv, d, ps, lp = 8, 2, 64, 128, 4  # horizon 512
    window = 96 if case == "window" else 0
    hz = lp * ps
    pos_vals = {"mid": [300], "page_edge": [255], "start": [0],
                "b2": [37, 450], "window": [400], "trash": [hz]}[case]
    positions = jnp.asarray([[p] for p in pos_vals], jnp.int32)

    kv = PagedKVCache.create(1, b, hz, hkv, d, jnp.float32, page_size=ps)
    # scramble the table so physical != logical (tests real table indirection)
    import numpy as np_

    tbl = np_.asarray(kv.table).copy()
    tbl[:, :lp] = tbl[:, :lp][:, ::-1]
    kv = kv.with_table(tbl)
    rng = np.random.default_rng(5)
    kv = PagedKVCache(
        k=(jnp.asarray(rng.standard_normal(kv.k[0].shape), jnp.float32),),
        v=(jnp.asarray(rng.standard_normal(kv.v[0].shape), jnp.float32),),
        table=kv.table, page_size=ps, horizon=hz,
    )

    q = jnp.asarray(rng.standard_normal((b, 1, hq, d)).astype(np.float32))
    kn = jnp.asarray(rng.standard_normal((b, 1, hkv, d)).astype(np.float32))
    vn = jnp.asarray(rng.standard_normal((b, 1, hkv, d)).astype(np.float32))
    scale = 1.0 / d**0.5

    # reference: scatter update then gather + masked attention
    kv_ref = kv.update(0, kn, vn, positions)
    k_all, v_all = kv_ref.layer(0)[0].gather()
    mask = causal_mask(positions, hz, window)
    ref = attention_ref(q, k_all, v_all, mask, scale)

    att, kp, vp = paged_attn_decode_update(
        q, kn, vn, jnp.array(kv.k[0]), jnp.array(kv.v[0]), kv.table, positions,
        page_size=ps, scale=scale, window=window, interpret=True,
    )
    if case != "trash":
        np.testing.assert_allclose(np.asarray(att), np.asarray(ref), rtol=2e-3, atol=2e-3)
    # pool contents: every non-trash page must match the reference pool
    np.testing.assert_allclose(
        np.asarray(kp)[:, ps:], np.asarray(kv_ref.k[0])[:, ps:], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(vp)[:, ps:], np.asarray(kv_ref.v[0])[:, ps:], rtol=1e-6, atol=1e-6)


def test_attn_decode_qkv_trash_row_clamps():
    """pos == max_len (engine trash-row convention) must clamp the write to
    the last slot and not corrupt other slots."""
    import jax.numpy as jnp

    from zllm.ops.attention import attn_decode_qkv
    from zllm.ops.layers import RopeParams, rope_rot_matrix

    b, hq, hkv, d, s = 1, 8, 1, 64, 256
    hist_k = jnp.asarray(RNG.standard_normal((b, hkv, s, d)).astype(np.float32))
    hist_v = jnp.asarray(RNG.standard_normal((b, hkv, s, d)).astype(np.float32))
    qkv3 = jnp.asarray(RNG.standard_normal((b, hq + 2 * hkv, d)).astype(np.float32))
    hk_np, hv_np = np.asarray(hist_k), np.asarray(hist_v)  # caches are donated
    positions = jnp.asarray([[s]], jnp.int32)  # trash: one past the end
    rot = rope_rot_matrix(positions[:, 0], RopeParams(dim=d, style="neox"), d)

    _, kl, vl = attn_decode_qkv(
        qkv3, hist_k, hist_v, positions, rot,
        scale=0.125, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(kl)[0, 0, :-1], hk_np[0, 0, :-1])
    np.testing.assert_array_equal(np.asarray(vl)[0, 0, :-1], hv_np[0, 0, :-1])


def test_attn_decode_update_trash_row_clamps():
    """pos == max_len (engine trash-row convention) must clamp the write to
    the last slot, like dynamic_update_slice, and not corrupt other slots."""
    import jax.numpy as jnp

    from zllm.ops.attention import attn_decode_update
    from zllm.runtime.kvcache import KVCache

    b, hq, hkv, d, s = 1, 4, 1, 64, 256
    hist_k = RNG.standard_normal((b, hkv, s, d)).astype(np.float32)
    hist_v = RNG.standard_normal((b, hkv, s, d)).astype(np.float32)
    q = jnp.asarray(RNG.standard_normal((b, 1, hq, d)).astype(np.float32))
    kn = jnp.asarray(RNG.standard_normal((b, 1, hkv, d)).astype(np.float32))
    vn = jnp.asarray(RNG.standard_normal((b, 1, hkv, d)).astype(np.float32))
    positions = jnp.asarray([[s]], jnp.int32)  # trash: one past the end

    _, kl, vl = attn_decode_update(
        q, kn, vn, jnp.asarray(hist_k), jnp.asarray(hist_v), positions,
        scale=0.125, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(kl)[0, 0, :-1], hist_k[0, 0, :-1])
    np.testing.assert_allclose(np.asarray(kl)[0, 0, -1], np.asarray(kn)[0, 0, 0])
    np.testing.assert_allclose(np.asarray(vl)[0, 0, -1], np.asarray(vn)[0, 0, 0])
