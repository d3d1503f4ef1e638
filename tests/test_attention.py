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
